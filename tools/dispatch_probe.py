#!/usr/bin/env python
"""Quantify the per-dispatch host/tunnel gap and whether batching frames
into one jit amortizes it (docs/PERF.md: wall 40.2 vs in-jit device ~37.7
on the bench step; a round-3 serial 5-step lax.scan measured WORSE at
48 ms/frame).

Measures, on the default bench workload:
  1x: one fwd+bwd step per dispatch (the bench.py protocol);
  2x: TWO independent-camera steps inside ONE jit (summed losses —
      different extrinsics, so neither step is DCE'd), per-frame time.

Usage: timeout 580 python tools/dispatch_probe.py
"""
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from tools.profile_bench import build_step  # same workload builder

    sys.argv = [sys.argv[0]]
    step, args = build_step(packed=True)

    # rebuild the two-camera variant from the same pieces
    import dataclasses

    from c3dgs_tpu.models import gaussians as gmod
    from c3dgs_tpu.ops import losses as L
    from c3dgs_tpu.render.capacity import CapacityPolicy
    from c3dgs_tpu.render.types import RasterSettings
    from c3dgs_tpu.train import trainer

    n = 300_000
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 2.0
    pts[:, 2] += 6.0
    cols = rng.random(size=(n, 3)).astype(np.float32)
    scene = gmod.from_point_cloud(pts, cols, capacity=n, quantization=False)
    scene = scene.replace(scaling_factor=scene.scaling_factor + math.log(0.15))
    op = np.clip(rng.beta(0.5, 0.35, size=(n, 1)), 0.005, 0.995)
    scene = scene.replace(
        opacity=jnp.asarray(np.log(op / (1.0 - op)).astype(np.float32))
    )
    settings = RasterSettings(
        width=1920, height=1080, tanfovx=math.tan(0.6), tanfovy=math.tan(0.6),
        sh_degree=3,
    )
    ev1 = jnp.asarray([0, 0, 0, 1, 0, 0, 0], jnp.float32)
    ev2 = jnp.asarray([0, 0.02, 0, 1, 0.05, 0, 0], jnp.float32)
    bg = jnp.zeros(3)
    gt = jnp.zeros((3, 1080, 1920))

    probe = jax.jit(
        lambda: (
            lambda o: (o["num_instances"], o["grad_total"])
        )(trainer.render_scene(scene, ev1, settings, bg))
    )()
    need, grad_need = int(probe[0]), int(probe[1])
    policy = CapacityPolicy(
        initial=int(need * 1.12), grad_initial=int(grad_need * 1.04)
    )
    settings = policy.apply(settings)

    def loss_one(xyz, ev):
        s = scene.replace(xyz=xyz)
        out = trainer.render_scene(s, ev, settings, bg)
        return L.l1_loss(out["render"], gt)

    g1 = jax.jit(jax.grad(lambda xyz: loss_one(xyz, ev1)))
    g2 = jax.jit(
        jax.grad(lambda xyz: loss_one(xyz, ev1) + loss_one(xyz, ev2))
    )

    def timeit(f, frames):
        out = f(scene.xyz)
        float(jnp.sum(out))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(8):
                out = f(scene.xyz)
            float(jnp.sum(out))
            best = min(best, (time.perf_counter() - t0) / 8 / frames * 1e3)
        return best

    ms1 = timeit(g1, 1)
    ms2 = timeit(g2, 2)
    print(
        json.dumps(
            {
                "one_step_ms": round(ms1, 2),
                "two_step_ms_per_frame": round(ms2, 2),
                "dispatch_amortized_ms": round(ms1 - ms2, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
