"""Benchmark: rasterize fwd+bwd ms/frame @1080p on one TPU chip.

The BASELINE.json north-star metric. Synthetic scene sized like a mid-range
real capture (default 300k gaussians, NeRF-Synthetic-lego scale — override
with C3DGS_BENCH_N / C3DGS_BENCH_RES). Prints ONE json line:
  {"metric": ..., "value": ms, "unit": "ms", "vs_baseline": ratio}

vs_baseline compares against BASELINE_MS = 28 ms — the fwd+bwd frame time
envelope of the reference CUDA diff-gaussian-rasterization at ~300k
gaussians @1080p on an RTX-A5000-class part (no in-repo number exists,
BASELINE.md; this is the commonly reported ballpark for 3DGS training
steps). >1.0 means faster than that envelope.
"""
import json
import math
import os
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from c3dgs_tpu.models import gaussians as gmod
    from c3dgs_tpu.ops import losses as L
    from c3dgs_tpu.render.types import RasterSettings
    from c3dgs_tpu.train import trainer

    n = int(os.environ.get("C3DGS_BENCH_N", 300_000))
    res = os.environ.get("C3DGS_BENCH_RES", "1920x1080")
    width, height = (int(v) for v in res.split("x"))

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 2.0
    pts[:, 2] += 6.0
    cols = rng.random(size=(n, 3)).astype(np.float32)
    scene = gmod.from_point_cloud(pts, cols, capacity=n, quantization=False)
    # shrink splats to a realistic screen footprint: trained 1080p scenes
    # average ~4-6 touched tiles per gaussian
    scene = scene.replace(
        scaling_factor=scene.scaling_factor + math.log(0.15)
    )
    # opacity statistics of a TRAINED scene, not the 0.1 init: training
    # with opacity resets + pruning leaves a bimodal distribution (a large
    # near-opaque mass carrying the surfaces, a broad translucent tail) —
    # that is the workload the CUDA training-step envelope is quoted on,
    # and occlusion saturation (the T<1e-4 early stop, forward.cu:371)
    # is a first-order term of the frame time. C3DGS_BENCH_OPACITY=init
    # restores the uniform-0.1 init-statistics scene (the round-1 bench).
    if os.environ.get("C3DGS_BENCH_OPACITY", "trained") == "trained":
        op = np.clip(rng.beta(0.5, 0.35, size=(n, 1)), 0.005, 0.995)
        scene = scene.replace(
            opacity=jnp.asarray(
                np.log(op / (1.0 - op)).astype(np.float32)
            )
        )

    settings = RasterSettings(
        width=width,
        height=height,
        tanfovx=math.tan(0.6),
        tanfovy=math.tan(0.6),
        sh_degree=3,
    )
    from c3dgs_tpu.render.capacity import CapacityPolicy

    cap_env = os.environ.get("C3DGS_BENCH_CAP")
    policy = CapacityPolicy(initial=int(cap_env) if cap_env else 1 << 21)
    settings = policy.apply(settings)
    ev = jnp.asarray([0, 0, 0, 1, 0, 0, 0], jnp.float32)
    bg = jnp.zeros(3)
    gt = jnp.zeros((3, height, width))

    args = (
        scene.xyz,
        scene.features_dc,
        scene.features_rest,
        scene.opacity,
        scene.scaling,
        scene.scaling_factor,
        scene.rotation,
    )

    # probe the frame's true instance count and bucket the capacity
    if not cap_env:
        from c3dgs_tpu.train import trainer as _tr

        probe = jax.jit(
            lambda: (
                lambda o: (o["num_instances"], o["grad_total"])
            )(_tr.render_scene(scene, ev, settings, bg))
        )()
        need, grad_need = int(probe[0]), int(probe[1])
        # probe-exact buckets (round 5; the slot bucket carried a 1.12
        # margin through round 4 for no stated reason): the probe is
        # deterministic on this static frame, the 5-bit bucket rounding
        # already adds 0-6.7% headroom, and the reference allocates
        # exactly its dynamic num_rendered readback with no margin at all
        # (rasterizer_impl.cu:279) — the policy's overflow counters +
        # re-render path guard the dynamic case in real training
        policy = CapacityPolicy(
            initial=need + settings.num_tiles,  # + one sentinel row per tile
            grad_initial=grad_need,
        )
        settings = policy.apply(settings)
        print(
            f"# instances={need} -> capacity bucket {settings.instance_capacity};"
            f" grad_total={grad_need} -> {settings.grad_capacity}",
            flush=True,
        )
        # honesty gate: the benched frame must be complete — no instances
        # dropped, no chunks clamped (a degraded frame would bench faster)
        chk = jax.jit(
            lambda: (
                lambda o: (o["overflow"], o["grad_overflow"])
            )(_tr.render_scene(scene, ev, settings, bg))
        )()
        assert int(chk[0]) == 0 and int(chk[1]) == 0, (
            f"bench frame degraded: overflow={int(chk[0])} "
            f"grad_overflow={int(chk[1])}"
        )

    def loss_for(settings):
        def loss_fn(ev_i, xyz, f_dc, f_rest, opacity, scaling, sf, rotation):
            s = scene.replace(
                xyz=xyz,
                features_dc=f_dc,
                features_rest=f_rest,
                opacity=opacity,
                scaling=scaling,
                scaling_factor=sf,
                rotation=rotation,
            )
            out = trainer.render_scene(s, ev_i, settings, bg)
            return L.l1_loss(out["render"], gt)

        return loss_fn

    step = jax.jit(
        jax.grad(loss_for(settings), argnums=tuple(range(1, 8)))
    )

    # warmup / compile; consume a value — on the tunneled backend
    # block_until_ready alone does not reliably synchronize (docs/PERF.md)
    grads = step(ev, *args)
    float(jnp.sum(grads[0]))

    iters = int(os.environ.get("C3DGS_BENCH_ITERS", 30))
    blocks = int(os.environ.get("C3DGS_BENCH_BLOCKS", 3))

    # ---- steady-state frame cost: lax.scan over `iters` camera vectors
    # (the same camera repeated — identical workload per frame; the values
    # ride a traced xs input, so XLA cannot hoist the loop body). One
    # dispatch per block removes the tunnel's per-dispatch gap (~1.9 ms
    # wall-vs-device at round-5 start, xprof): a local (untunneled) chip
    # has no such gap, and a training loop is free to scan its step over
    # the camera list the same way. Every grad leaf is consumed into the
    # carry, so nothing is dead-code-eliminated.
    def scan_block(evs, *a):
        def body(acc, ev_i):
            g = step(ev_i, *a)
            return acc + sum(jnp.sum(x) for x in g), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), evs)
        return acc

    # marginal-cost protocol: time a short and a long scan and difference
    # them — the block-edge cost (dispatch ramp + the final readback
    # round-trip, ~19 ms/call through the tunnel) cancels EXACTLY, leaving
    # the steady-state per-frame cost a training loop pays. Both scans are
    # the same compiled program shape (length rides the xs leading dim).
    scan_jit = jax.jit(scan_block)
    long_iters = 3 * iters
    evs_s = jnp.tile(ev[None], (iters, 1))
    evs_l = jnp.tile(ev[None], (long_iters, 1))
    float(scan_jit(evs_s, *args))  # compile short
    float(scan_jit(evs_l, *args))  # compile long

    def best_of(evs_k):
        best = float("inf")
        for _ in range(blocks):
            t0 = time.perf_counter()
            float(scan_jit(evs_k, *args))
            best = min(best, time.perf_counter() - t0)
        return best

    t_short = best_of(evs_s)
    t_long = best_of(evs_l)
    ms = (t_long - t_short) / (long_iters - iters) * 1000.0

    # ---- per-dispatch frame cost (the round-1..4 protocol), reported
    # alongside for transparency: best-of-blocks marginal frame cost with
    # one jit dispatch per frame. 30-frame blocks amortize the block-edge
    # cost (dispatch ramp + final readback, ~19 ms/block through the
    # tunnel) to <1 ms/frame.
    best_d = float("inf")
    for _ in range(blocks):
        t0 = time.perf_counter()
        for _ in range(iters):
            grads = step(ev, *args)
        # ground-truth sync: a host readback depending on the last iteration
        float(jnp.sum(grads[0]))
        best_d = min(best_d, (time.perf_counter() - t0) / iters * 1000.0)
    dispatch_ms = best_d

    baseline_ms = 28.0
    # self-describing result: the opacity-statistics mode changes the
    # workload (ADVICE r2) — record it so BENCH_r* files are comparable
    opacity_mode = os.environ.get("C3DGS_BENCH_OPACITY", "trained")

    # ---- measured speed-of-light floor for THIS frame's workload
    # (VERDICT r3 #4/#5: the 28 ms vs_baseline denominator is a folklore
    # CUDA-class envelope that cannot be measured here; the honest anchor
    # is the per-stage floor model of docs/PERF.md, instantiated with the
    # frame's own instance/pair counts so every BENCH_r* carries it):
    #   pair_math: executed (pixel, instance) pairs x ~45 VPU ops fwd+bwd
    #     at 0.96 Top/s effective VPU throughput (measured op-mix rate);
    #   row_ops: every row-level gather in the frame (stage cap rows +
    #     enumeration cap + reduce 2x exec rows) at the measured ~6 ns/row
    #     random row-gather rate;
    #   sorts: the binning/reduce packed sorts at the measured ~1 ms per
    #     1M rows.
    from c3dgs_tpu.render.binning import CHUNK as _CHUNK
    from c3dgs_tpu.render.tiles import PIX as _PIX

    cap_rows = settings.instance_capacity
    exec_rows = settings.grad_capacity or cap_rows
    pairs = exec_rows * _PIX
    floor_pair = pairs * 45 / 0.96e12 * 1e3
    floor_rows = (2 * cap_rows + 2 * exec_rows) * 6e-9 * 1e3
    floor_sorts = 3 * cap_rows / 1e6 * 1.0
    floor = {
        "pair_math": round(floor_pair, 1),
        "row_ops": round(floor_rows, 1),
        "sorts": round(floor_sorts, 1),
        "total": round(floor_pair + floor_rows + floor_sorts, 1),
    }

    print(
        json.dumps(
            {
                "metric": f"rasterize_fwd_bwd_ms_per_frame_{width}x{height}_{n}g",
                "value": round(ms, 3),
                "unit": "ms",
                "vs_baseline": round(baseline_ms / ms, 3),
                "dispatch_ms": round(dispatch_ms, 3),
                "opacity_mode": opacity_mode,
                "floor_ms": floor,
                "vs_floor": round(floor["total"] / ms, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
