#!/usr/bin/env python
"""Profile the bench step on the TPU: jax.profiler.trace + trace parsing.

Prints the top device ops by total time over 3 steady-state steps (the
per-stage sub-jit timing alternative is inflated ~3 ms/call by tunnel
dispatch — docs/PERF.md). Usage:
  timeout 580 python tools/profile_bench.py [--packed 0|1] [--top 25]
"""
import argparse
import glob
import gzip
import json
import math
import os
import sys
from collections import defaultdict

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")


def build_step(packed: bool, n=300_000, width=1920, height=1080):
    import dataclasses

    from c3dgs_tpu.models import gaussians as gmod
    from c3dgs_tpu.ops import losses as L
    from c3dgs_tpu.render.capacity import CapacityPolicy
    from c3dgs_tpu.render.types import RasterSettings
    from c3dgs_tpu.train import trainer

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 2.0
    pts[:, 2] += 6.0
    cols = rng.random(size=(n, 3)).astype(np.float32)
    scene = gmod.from_point_cloud(pts, cols, capacity=n, quantization=False)
    scene = scene.replace(scaling_factor=scene.scaling_factor + math.log(0.15))
    # same workload selector as bench.py (default = trained statistics)
    if os.environ.get("C3DGS_BENCH_OPACITY", "trained") == "trained":
        op = np.clip(rng.beta(0.5, 0.35, size=(n, 1)), 0.005, 0.995)
        scene = scene.replace(
            opacity=jnp.asarray(np.log(op / (1.0 - op)).astype(np.float32))
        )
    settings = RasterSettings(
        width=width,
        height=height,
        tanfovx=math.tan(0.6),
        tanfovy=math.tan(0.6),
        sh_degree=3,
        packed=packed,
    )
    ev = jnp.asarray([0, 0, 0, 1, 0, 0, 0], jnp.float32)
    bg = jnp.zeros(3)
    gt = jnp.zeros((3, height, width))

    probe = jax.jit(
        lambda: (
            lambda o: (o["num_instances"], o["grad_total"])
        )(trainer.render_scene(scene, ev, settings, bg))
    )()
    need, grad_need = int(probe[0]), int(probe[1])
    # probe-exact buckets, matching bench.py (round 5)
    policy = CapacityPolicy(
        initial=need + settings.num_tiles, grad_initial=max(grad_need, 1)
    )
    settings = policy.apply(settings)
    print(f"# instances={need} cap={settings.instance_capacity}", flush=True)

    args = (
        scene.xyz,
        scene.features_dc,
        scene.features_rest,
        scene.opacity,
        scene.scaling,
        scene.scaling_factor,
        scene.rotation,
    )

    def loss_fn(xyz, f_dc, f_rest, opacity, scaling, sf, rotation):
        s = scene.replace(
            xyz=xyz,
            features_dc=f_dc,
            features_rest=f_rest,
            opacity=opacity,
            scaling=scaling,
            scaling_factor=sf,
            rotation=rotation,
        )
        out = trainer.render_scene(s, ev, settings, bg)
        return L.l1_loss(out["render"], gt)

    step = jax.jit(jax.grad(loss_fn, argnums=tuple(range(7))))
    return step, args


def parse_trace(tdir, top):
    paths = glob.glob(os.path.join(tdir, "**", "*.trace.json.gz"), recursive=True)
    assert paths, f"no trace under {tdir}"
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device-lane complete events: pid/tid lanes named like TPU ops
    per_op = defaultdict(float)
    per_op_n = defaultdict(int)
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e.get("args", {}).get("name", "")
    dev_pids = {
        pid for pid, nm in names.items() if "TPU" in nm or "/device" in nm
    }
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        nm = e.get("name", "")
        if nm.startswith(("run_", "Steal", "Infeed", "program")):
            continue
        per_op[nm] += e.get("dur", 0.0)
        per_op_n[nm] += 1
    total = sum(per_op.values())
    print(f"# device total {total / 1e3:.2f} ms over trace")
    for nm, us in sorted(per_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{us / 1e3:9.3f} ms  x{per_op_n[nm]:<5d} {nm[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--packed", type=int, default=1)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()

    step, inputs = build_step(bool(args.packed))
    g = step(*inputs)
    float(jnp.sum(g[0]))  # compile + sync

    tdir = "/tmp/c3dgs_trace"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        for _ in range(args.steps):
            g = step(*inputs)
        float(jnp.sum(g[0]))
    parse_trace(tdir, args.top)


if __name__ == "__main__":
    main()
