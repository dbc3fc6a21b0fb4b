#!/usr/bin/env python
"""Instance-cap clamp degradation curve (VERDICT r2 #6, second half).

The binning slot domain caps at 2^24 (types.MAX_BINNING_CAP); a frame that
emits more instances drops the deepest-sorted tail. This measures the
image cost DIRECTLY: a dense synthetic 1.5M-splat 1080p frame rendered at
full capacity (exact) vs the same frame with instance_capacity forced to
{95, 85, 70, 50}% of its true instance count. The clamp mechanism (drop
the largest sort keys = the farthest instances of the back tiles) is
scale-independent, so the PSNR-vs-drop-fraction curve transfers to the
2^24 ceiling. Writes output/CLAMP_PROBE.json.

Run: timeout 1800 python tools/clamp_probe.py
"""
import dataclasses
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from c3dgs_tpu.config import setup_jax_cache
    from c3dgs_tpu.models import gaussians as gmod
    from c3dgs_tpu.render.capacity import CapacityPolicy
    from c3dgs_tpu.render.types import RasterSettings
    from c3dgs_tpu.train import trainer

    setup_jax_cache()
    rng = np.random.default_rng(4)
    n = 1_500_000
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 2.0
    pts[:, 2] += 6.0
    cols = rng.random(size=(n, 3)).astype(np.float32)
    scene = gmod.from_point_cloud(pts, cols, capacity=n, quantization=False)
    scene = scene.replace(
        scaling_factor=scene.scaling_factor + math.log(0.1)
    )
    op = np.clip(rng.beta(0.5, 0.35, size=(n, 1)), 0.005, 0.995)
    scene = scene.replace(
        opacity=jnp.asarray(np.log(op / (1.0 - op)).astype(np.float32))
    )
    settings = RasterSettings(
        width=1920, height=1080, tanfovx=math.tan(0.6), tanfovy=math.tan(0.6),
        sh_degree=3,
    )
    ev = jnp.asarray([0, 0, 0, 1, 0, 0, 0], jnp.float32)
    bg = jnp.zeros(3)

    probe = jax.jit(
        lambda sc: trainer.render_scene(
            sc, ev, CapacityPolicy(initial=1 << 23).apply(settings), bg
        )["num_instances"]
    )(scene)
    true_inst = int(probe)
    full = CapacityPolicy(initial=int(true_inst * 1.12)).apply(settings)
    exact = jax.device_get(
        jax.jit(
            lambda sc: trainer.render_scene(sc, ev, full, bg)["render"]
        )(scene)
    )
    rows = []
    for frac in (0.95, 0.85, 0.70, 0.50):
        cap_c = int(true_inst * frac) // 128 * 128
        st_c = dataclasses.replace(
            full, instance_capacity=cap_c, grad_capacity=0
        )
        out = jax.jit(
            lambda sc, st_c=st_c: trainer.render_scene(sc, ev, st_c, bg)
        )(scene)
        img = jax.device_get(out["render"])
        mse = float(np.mean((img - exact) ** 2))
        psnr_c = 10 * math.log10(1.0 / max(mse, 1e-12))
        rows.append(
            {
                "capacity_fraction": frac,
                "instances_dropped": int(out["overflow"]),
                "psnr_vs_exact_dB": round(psnr_c, 2),
            }
        )
        print(rows[-1], flush=True)

    report = {
        "n_gaussians": n,
        "true_instances": true_inst,
        "resolution": "1920x1080",
        "note": (
            "clamp drops the largest (tile|depth) sort keys — the deepest "
            "instances of the last tiles; curve transfers to the 2^24 "
            "MAX_BINNING_CAP ceiling"
        ),
        "curve": rows,
    }
    with open("/root/repo/output/CLAMP_PROBE.json", "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
