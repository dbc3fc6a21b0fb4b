#!/usr/bin/env python
"""Full compression pipeline at >= 1M splats on the chip (VERDICT r3 #3).

The reference's primary compression configs target garden/bicycle-class
scenes (~5M splats, batch 2^18-2^20 over millions of rows —
/root/reference/compress.py:202-303, arguments/__init__.py:85-111); the
round-3 evidence only exercised the stack at <= 74k. This probe runs the
REAL pipeline functions at 1M+:

  sensitivity (per-view |grad| accumulation over n_views 1080p cameras)
  -> weighted k-means VQ (color batch 2^18, covariance batch 2^20)
  -> QAT finetune through the indexed renderer (blocked codebook-color
     path auto-engages at >= 2^20 splats)
  -> Morton-sorted int8 npz -> eval,

with the reference's times.json stage split and TPU peak-HBM noted.

GT protocol: the scene's own pre-compression renders serve as ground
truth (a procedural scene is "trained" by construction; what is being
proven here is the pipeline at scale, and psnr_drop vs its own renders is
exactly the preservation the reference's <= 0.5 dB claim is about).

Usage: timeout 5400 python tools/scale_compress_probe.py [--n 1200000]
Writes <out_dir>/SCALE_COMPRESS.json (default output/).
"""
import argparse
import json
import math
import os
import sys
import time
from types import SimpleNamespace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_200_000)
    ap.add_argument("--n_views", type=int, default=12)
    ap.add_argument("--res", type=str, default="1920x1080")
    ap.add_argument("--finetune_iters", type=int, default=1000)
    ap.add_argument("--out_dir", type=str, default="/root/repo/output")
    args = ap.parse_args()
    w, h = (int(v) for v in args.res.split("x"))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from c3dgs_tpu.compress.pipeline import to_compressed
    from c3dgs_tpu.config import (
        CompressionParams,
        OptimizationParams,
        setup_jax_cache,
    )
    from c3dgs_tpu.eval.metrics import render_and_eval
    from c3dgs_tpu.models import gaussians as gmod, io_npz
    from c3dgs_tpu.ops import camera_math
    from c3dgs_tpu.render.capacity import CapacityPolicy
    from c3dgs_tpu.render.types import RasterSettings
    from c3dgs_tpu.train import trainer
    from c3dgs_tpu.train.finetune import finetune

    setup_jax_cache()
    rng = np.random.default_rng(23)
    n = args.n

    # trained-scene-like statistics: clustered structure, bimodal opacity,
    # view-dependent SH
    n_ground = n // 3
    ground = np.stack(
        [
            rng.uniform(-3.0, 3.0, n_ground),
            rng.uniform(-1.05, -0.95, n_ground),
            rng.uniform(-3.0, 3.0, n_ground),
        ],
        axis=1,
    ).astype(np.float32)
    centers = rng.normal(size=(64, 3)).astype(np.float32)
    centers[:, 1] = np.abs(centers[:, 1]) * 0.7 - 0.4
    blob = (
        centers[rng.integers(0, 64, n - n_ground)]
        + rng.normal(size=(n - n_ground, 3)).astype(np.float32) * 0.25
    )
    pts = np.concatenate([ground, blob]).astype(np.float32)
    cols = rng.random(size=(n, 3)).astype(np.float32)
    scene = gmod.from_point_cloud(pts, cols, capacity=n, quantization=True)
    k = scene.num_sh_coeffs
    scene = scene.replace(
        features_rest=jnp.asarray(
            rng.normal(size=(n, k - 1, 3)).astype(np.float32) * 0.05
        ),
        scaling_factor=scene.scaling_factor + math.log(0.8),
        opacity=jnp.asarray(
            (rng.normal(size=(n, 1)) * 1.4 + 1.0).astype(np.float32)
        ),
        active_sh_degree=3,
    )
    scene = scene.update_observers()

    settings = RasterSettings(
        width=w,
        height=h,
        tanfovx=math.tan(0.6),
        tanfovy=math.tan(0.6),
        sh_degree=3,
    )
    intrinsic = np.zeros((3, 3), np.float32)
    intrinsic[0, 0] = 1.2
    intrinsic[1, 1] = 1.2
    intrinsic[0, 2] = w
    intrinsic[1, 2] = h

    # ring cameras; GT = the scene's own renders
    evs = []
    for i in range(args.n_views):
        a = 2 * math.pi * i / args.n_views
        pos = np.asarray(
            [4.5 * math.sin(a), -0.7, 4.5 * math.cos(a)], np.float32
        )
        fwd = -pos / np.linalg.norm(pos)
        up = np.asarray([0, -1, 0], np.float32)
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        upv = np.cross(fwd, right)
        rot = np.stack([right, upv, fwd], axis=0)
        t = -rot @ pos
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = rot
        m[:3, 3] = t
        evs.append(np.asarray(camera_math.mat_to_extrinsic(jnp.asarray(m))))

    policy = CapacityPolicy()
    render = jax.jit(trainer.render_scene, static_argnums=(2,))

    def render_capped(sc, ev):
        for _ in range(6):
            out = render(sc, jnp.asarray(ev), policy.apply(settings), bg)
            if not policy.update(
                int(out["num_instances"]), int(out["overflow"])
            ):
                return out
        return out

    bg = jnp.zeros(3)
    t_all = time.time()
    cams = []
    for ev in evs:
        out = render_capped(scene, ev)
        cams.append(
            SimpleNamespace(
                extrinsic_vector=np.asarray(ev),
                intrinsic=intrinsic,
                original_image=np.asarray(out["render"]),
                image_name="probe",
            )
        )
    gt_seconds = time.time() - t_all
    print(f"# GT renders: {gt_seconds:.1f}s", flush=True)

    def hbm_peak():
        try:
            st = jax.local_devices()[0].memory_stats()
            return int(st.get("peak_bytes_in_use", 0))
        except Exception:
            return 0

    comp = CompressionParams(finetune_iterations=args.finetune_iters)
    opt = OptimizationParams()
    timings = {}
    t0 = time.time()
    compressed = to_compressed(scene, cams, comp, timings=timings)
    timings["clustering"] = (
        time.time() - t0 - timings.get("sensitivity_calculation", 0.0)
    )
    print(
        f"# VQ done: active={int(compressed.num_active)} "
        f"({timings['clustering']:.1f}s cluster)",
        flush=True,
    )

    t0 = time.time()
    compressed = finetune(
        scene=compressed,
        cameras=cams,
        opt=opt,
        iterations=args.finetune_iters,
        spatial_lr_scale=4.0,
    )
    timings["finetune"] = time.time() - t0

    t0 = time.time()
    os.makedirs(args.out_dir, exist_ok=True)
    npz_path = os.path.join(args.out_dir, "scale_compress.npz")
    compressed = io_npz.save_npz(
        compressed, npz_path, sort_morton=True, xyz_u16=True
    )
    timings["encode"] = time.time() - t0

    t0 = time.time()
    results = render_and_eval(compressed, cams, npz_path=npz_path)
    base = render_and_eval(scene, cams)
    results["uncompressed_psnr"] = base["psnr"]
    # GT = the scene's own renders, so base PSNR is infinite by
    # construction and a naive drop is Infinity; the meaningful figure is
    # the compressed scene's PSNR AGAINST the uncompressed renders (pure
    # compression loss — a finetune cannot out-train a perfect baseline)
    results["fidelity_vs_uncompressed_psnr"] = results["psnr"]
    results["psnr_drop"] = (
        base["psnr"] - results["psnr"]
        if np.isfinite(base["psnr"])
        else None
    )
    timings["eval"] = time.time() - t0
    timings["total"] = sum(timings.values())

    # uncompressed size model: the splats' 59 f32 ply attributes
    raw_bytes = int(compressed.num_active) * 59 * 4
    out = {
        "n_splats": n,
        "active_after_prune": int(compressed.num_active),
        "views": args.n_views,
        "res": args.res,
        "finetune_iterations": args.finetune_iters,
        "psnr": results.get("psnr"),
        "uncompressed_psnr": results.get("uncompressed_psnr"),
        "fidelity_vs_uncompressed_psnr": results.get(
            "fidelity_vs_uncompressed_psnr"
        ),
        "psnr_drop": results.get("psnr_drop"),
        "ssim": results.get("ssim"),
        "size_bytes": results.get("size_bytes"),
        "raw_ply_bytes_equiv": raw_bytes,
        "compression_ratio_vs_ply": (
            raw_bytes / results["size_bytes"]
            if results.get("size_bytes")
            else None
        ),
        "times": {k: round(v, 1) for k, v in timings.items()},
        "peak_hbm_gb": round(hbm_peak() / 2**30, 2),
        "npz": npz_path,
    }
    with open(os.path.join(args.out_dir, "SCALE_COMPRESS.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
