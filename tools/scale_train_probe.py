#!/usr/bin/env python
"""Training-at-scale evidence (VERDICT r2 #6): thousands of REAL train
steps at >= 1M gaussians on the chip, with densify / capacity growth /
opacity reset all active, plus a measured instance-cap clamp experiment.

Protocol
1. Ground truth: an 800k-splat procedural scene rendered from `n_views`
   cameras at 1080p (synthetic — zero-egress environment).
2. Training: from a 1M-point noisy init, `steps` trainer.train_step calls
   at 1080p with the reference cadence scaled to steps (densify every
   `densify_every`, opacity reset every `reset_every`); capacity grows to
   keep ~25% headroom. EMA-PSNR logged to output/scale_train_log.jsonl.
3. Clamp experiment: the binning slot domain caps at 2^24
   (types.MAX_BINNING_CAP); a trained 5M scene can emit more instances
   than that and the clamp drops the deepest-sorted tail. The degradation
   is measured directly: one frame rendered at full capacity (exact) vs
   the same frame with instance_capacity forced to {95%, 85%, 70%, 50%}
   of its true instance count — PSNR(clamped, exact) quantifies the
   clamp's image cost per fraction dropped. The mechanism (drop the
   largest sort keys) is scale-independent, so the curve transfers to the
   2^24 ceiling.

Usage: timeout 3600 python tools/scale_train_probe.py [--steps 2000]
Writes output/SCALE_TRAIN.json + output/scale_train_log.jsonl.
"""
import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--n_init", type=int, default=1_000_000)
    ap.add_argument("--n_gt", type=int, default=600_000)
    ap.add_argument("--n_views", type=int, default=12)
    ap.add_argument("--res", type=str, default="1920x1080")
    ap.add_argument(
        "--out_dir",
        type=str,
        default="/root/repo/output",
        help="artifact directory (pytest smokes point this at tmp so the "
        "committed evidence files are never overwritten)",
    )
    args = ap.parse_args()
    w, h = (int(v) for v in args.res.split("x"))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from c3dgs_tpu.config import OptimizationParams, setup_jax_cache
    from c3dgs_tpu.models import gaussians as gmod
    from c3dgs_tpu.ops import losses as L
    from c3dgs_tpu.render.capacity import CapacityPolicy
    from c3dgs_tpu.render.types import RasterSettings
    from c3dgs_tpu.train import trainer

    setup_jax_cache()
    rng = np.random.default_rng(11)

    def make_gt_scene(n):
        # structured: ground slab + blobs, view-dependent SH
        n_g = n // 3
        ground = np.stack(
            [
                rng.uniform(-3, 3, n_g),
                rng.uniform(-1.1, -0.9, n_g),
                rng.uniform(-3, 3, n_g),
            ],
            axis=1,
        ).astype(np.float32)
        centers = rng.normal(size=(40, 3)).astype(np.float32)
        centers[:, 1] = np.abs(centers[:, 1]) * 0.7 - 0.4
        blob = (
            centers[rng.integers(0, 40, n - n_g)]
            + rng.normal(size=(n - n_g, 3)).astype(np.float32) * 0.18
        )
        pts = np.concatenate([ground, blob]).astype(np.float32)
        cols = rng.random(size=(n, 3)).astype(np.float32)
        sc = gmod.from_point_cloud(pts, cols, capacity=n, quantization=False)
        k = sc.num_sh_coeffs
        sc = sc.replace(
            features_rest=jnp.asarray(
                rng.normal(size=(n, k - 1, 3)).astype(np.float32) * 0.05
            ),
            opacity=jnp.asarray(
                (rng.normal(size=(n, 1)) * 1.2 + 1.2).astype(np.float32)
            ),
            active_sh_degree=3,
        )
        return sc

    def cam(theta, r=5.0, y=1.2):
        # look-at-origin extrinsic 7-vector (quat wxyz-last convention of
        # the repo: [tx ty tz qx qy qz qw]? -- use camera_math helpers)
        from c3dgs_tpu.ops import camera_math

        eye = np.array(
            [r * math.sin(theta), y, r * math.cos(theta)], np.float32
        )
        fwd = -eye / np.linalg.norm(eye)
        up = np.array([0, 1, 0], np.float32)
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        r_w2c = np.stack([right, up2, fwd])  # rows
        t = -r_w2c @ eye
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = r_w2c
        m[:3, 3] = t
        return jnp.asarray(camera_math.mat_to_extrinsic(jnp.asarray(m)))

    settings = RasterSettings(
        width=w, height=h, tanfovx=math.tan(0.5), tanfovy=math.tan(0.32),
        sh_degree=3,
    )
    bg = jnp.zeros(3)
    gt_scene = make_gt_scene(args.n_gt)
    evs = [cam(2 * math.pi * i / args.n_views) for i in range(args.n_views)]

    # modest initial bucket; render_gt probes + grows on overflow (a
    # 2^23-slot first guess OOMed: staged+grad+sort buffers all scale with
    # the static capacity)
    gt_policy = CapacityPolicy(initial=min(1 << 22, 16 * max(args.n_gt, args.n_init)))
    from c3dgs_tpu.eval.metrics import render_full

    print("rendering ground-truth views...", flush=True)
    gts = [
        jax.device_get(
            render_full(gt_scene, e, settings, bg, gt_policy)["render"]
        )
        for e in evs
    ]
    gts = [jnp.asarray(g) for g in gts]
    del gt_scene

    # noisy sparse-ish init at >= 1M
    n0 = args.n_init
    pts0 = rng.normal(size=(n0, 3)).astype(np.float32)
    pts0[:, 0] *= 2.4
    pts0[:, 2] *= 2.4
    pts0[:, 1] = pts0[:, 1] * 0.8 - 0.2
    cols0 = rng.random(size=(n0, 3)).astype(np.float32)
    cap0 = int(n0 * 1.25) // 128 * 128
    scene = gmod.from_point_cloud(
        pts0, cols0, capacity=cap0, quantization=True
    )
    scene = scene.replace(active_sh_degree=0)
    opt = OptimizationParams()
    state = trainer.create_train_state(scene, opt, spatial_lr_scale=4.0)

    # capacity scaled to the scene so the CPU pytest smoke's tiny
    # configs don't pay a 4M-slot domain
    capacity = CapacityPolicy(initial=min(1 << 22, 16 * args.n_init))
    steps = args.steps
    densify_every = 150
    densify_from = 200
    densify_until = int(steps * 0.7)
    reset_every = 900
    degree_every = max(1, steps // 4)

    os.makedirs(args.out_dir, exist_ok=True)
    log_path = os.path.join(args.out_dir, "scale_train_log.jsonl")
    log_f = open(log_path, "w")
    ema_psnr = None
    t0 = time.time()
    grew = 0
    for it in range(steps):
        ev = evs[it % len(evs)]
        gt = gts[it % len(gts)]
        st = capacity.apply(settings)
        state, metrics = trainer.train_step(
            state, ev, gt, st, bg, opt, 4.0
        )
        capacity.update(
            int(metrics["num_instances"]),
            int(metrics["overflow"]),
            int(metrics["grad_total"]),
            int(metrics["grad_overflow"]),
        )
        psnr = float(metrics["psnr"])
        ema_psnr = psnr if ema_psnr is None else 0.95 * ema_psnr + 0.05 * psnr
        if it < densify_until and it > densify_from and it % densify_every == 0:
            n_act = int(state.scene.num_active)
            free = state.scene.capacity - n_act
            if free < max(4096, n_act // 4):
                state = trainer.grow_capacity(state, state.scene.capacity * 2)
                grew += 1
            # screen-size pruning stays DISABLED here: the reference's
            # hardcoded 20px threshold (train.py:164) assumes a 30k-step
            # schedule where splats have shrunk before it arms; under this
            # compressed 2000-step schedule it pruned 70% of a 1M scene in
            # one sweep (measured run in git history). Its behavior incl.
            # recovery is demonstrated on the reference cadence by the
            # synth512 convergence run (RESULTS.md curve, epochs 111-185).
            state, dropped = trainer.densify_step(
                state, 4.0, opt, max_screen_size=None
            )
        if it > 0 and it % reset_every == 0 and it < densify_until:
            state = trainer.reset_opacity_step(state)
        if it % degree_every == 0 and it > 0:
            state = state._replace(scene=state.scene.oneup_sh_degree())
        if it % 50 == 0 or it == steps - 1:
            rec = {
                "step": it,
                "ema_psnr": round(ema_psnr, 3),
                "active": int(state.scene.num_active),
                "capacity": state.scene.capacity,
                "instances": int(metrics["num_instances"]),
                "seconds": round(time.time() - t0, 1),
            }
            log_f.write(json.dumps(rec) + "\n")
            log_f.flush()
            print(rec, flush=True)
    log_f.close()

    # ---- clamp experiment on the trained scene
    scene_t = state.scene
    ev = evs[0]
    gt = gts[0]
    probe = jax.jit(
        lambda sc: trainer.render_scene(
            sc, ev, capacity.apply(settings), bg
        )["num_instances"],
        static_argnums=(),
    )(scene_t)
    true_inst = int(probe)
    full_set = CapacityPolicy(initial=int(true_inst * 1.12)).apply(settings)
    exact = jax.device_get(
        jax.jit(
            lambda sc: trainer.render_scene(sc, ev, full_set, bg)["render"]
        )(scene_t)
    )
    clamp_rows = []
    for frac in (0.95, 0.85, 0.70, 0.50):
        import dataclasses

        cap_c = int(true_inst * frac) // 128 * 128
        st_c = dataclasses.replace(full_set, instance_capacity=cap_c)
        out = jax.jit(
            lambda sc, st_c=st_c: trainer.render_scene(sc, ev, st_c, bg)
        )(scene_t)
        img = jax.device_get(out["render"])
        mse = float(np.mean((img - exact) ** 2))
        psnr_c = 10 * math.log10(1.0 / max(mse, 1e-12))
        clamp_rows.append(
            {
                "capacity_fraction": frac,
                "dropped": int(out["overflow"]),
                "psnr_vs_exact": round(psnr_c, 2),
            }
        )
        print(clamp_rows[-1], flush=True)

    out = {
        "steps": steps,
        "resolution": args.res,
        "final_active": int(state.scene.num_active),
        "final_capacity": state.scene.capacity,
        "capacity_growths": grew,
        "final_ema_psnr": round(ema_psnr, 3),
        "seconds_total": round(time.time() - t0, 1),
        "true_instances_view0": true_inst,
        "clamp_experiment": clamp_rows,
        "log": log_path,
    }
    with open(os.path.join(args.out_dir, "SCALE_TRAIN.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
