#!/usr/bin/env python
"""Quantify saturation-driven skip opportunity on the bench workload.

The packed kernels freeze a tile between chunks once every pixel's
log-transmittance is below log(1e-6) and no flush is pending
(tiles_packed.py): interior chunks of a saturated tile are skipped in BOTH
kernels. This probe measures, for the default bench frame:

  - chunks_exec (grid iterations that run at all),
  - how many of them the freeze actually skips (computable exactly from
    the exported per-tile freeze slots + the binning segment layout),
  - the remaining interior chunks whose lanes are ALL dead but which still
    compute (a finer-grained skip's upper bound),
  - per-pixel saturation stats (final_T) for context.

Run on the chip: timeout 580 python tools/saturation_probe.py
"""
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
    from c3dgs_tpu.render.binning import CHUNK, bin_gaussians
    from c3dgs_tpu.render.capacity import CapacityPolicy
    from c3dgs_tpu.render.preprocess import preprocess
    from c3dgs_tpu.render import rasterizer
    from c3dgs_tpu.render.types import RasterSettings
    from c3dgs_tpu.train import trainer

    setup_jax_cache()
    n = int(os.environ.get("C3DGS_BENCH_N", 300_000))
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 2.0
    pts[:, 2] += 6.0
    cols = rng.random(size=(n, 3)).astype(np.float32)
    scene = gmod.from_point_cloud(pts, cols, capacity=n, quantization=False)
    scene = scene.replace(scaling_factor=scene.scaling_factor + math.log(0.15))
    if os.environ.get("C3DGS_BENCH_OPACITY", "trained") == "trained":
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
        lambda: trainer.render_scene(
            scene, ev, CapacityPolicy(initial=1 << 21).apply(settings), bg
        )["num_instances"]
    )()
    settings = CapacityPolicy(initial=int(int(probe) * 1.12)).apply(settings)

    # forward outputs incl. the per-tile out blocks (freeze slot = row 5)
    st = trainer.settings_with_degree(settings, scene.active_sh_degree)

    @jax.jit
    def run():
        from c3dgs_tpu.render.binning import per_gaussian_table
        prep = preprocess(
            scene.get_xyz(),
            scene.get_covariance(),
            scene.get_opacity()[:, 0],
            ev,
            st,
            shs=scene.get_features(),
        )
        b = bin_gaussians(jax.lax.stop_gradient(prep), st)
        table = per_gaussian_table(prep, b.offset)
        cap, _ = st.resolve_caps(scene.capacity)
        meta = jnp.stack(
            [b.chunks_exec, jnp.int32(0), jnp.int32(st.num_tiles), jnp.int32(cap)]
        )
        out = rasterizer.blend_gaussians_packed(
            st.tiles_x, st.num_tiles, st.num_tiles, cap, cap, st.fast_grad,
            table,
            (b.gid_sorted, b.tid_sorted, b.sent_sorted, b.j_sorted,
             b.tile_lo, meta, b.perm, b.emit_cum),
        )
        return out, b.starts, b.ends, b.chunks_exec, b.num_instances

    out, starts, ends, chunks_exec, num_inst = run()
    out = np.asarray(out)
    starts = np.asarray(starts)
    ends = np.asarray(ends)
    chunks_exec = int(chunks_exec)
    t_count = st.num_tiles

    frz = out[:, 5, 0]  # freeze start slot per tile (cap if never frozen)
    final_t = out[:, 3, :]  # exp(lt) per pixel per tile

    # chunk ownership: interior chunks of tile t are chunks c with
    # tile_lo[c] == tile_lo[c+1] == t' meaning no sentinel inside ->
    # equivalently chunks strictly between the chunk containing starts[t]
    # and the chunk containing ends[t] (the sentinel chunk).
    c_of_start = starts // CHUNK
    c_of_end = ends // CHUNK
    interior = np.maximum(c_of_end - c_of_start - 1, 0)  # flush-free chunks
    # frozen-skipped: interior chunks whose slot0 >= frz (kernel skips)
    frz_chunk = np.where(frz < ends, (frz.astype(np.int64) + CHUNK - 1) // CHUNK, c_of_end)
    skipped = np.maximum(c_of_end - np.maximum(frz_chunk, c_of_start + 1), 0)
    skipped = np.minimum(skipped, interior)

    # finer-skip upper bound: if the freeze could arm mid-chunk/at flush
    # boundaries, every interior chunk past the tile's saturation point
    # would skip. Saturation point proxy: frz when armed, else none.
    sat_tiles = int((final_t.max(axis=1) < 1e-4).sum())

    report = {
        "workload": {
            "n_gaussians": n,
            "instances": int(num_inst),
            "tiles": int(t_count),
            "chunks_exec": chunks_exec,
        },
        "per_tile_chunks": {
            "total_segment_chunks": int((c_of_end - c_of_start + 1).sum()),
            "interior_flush_free_chunks": int(interior.sum()),
        },
        "freeze": {
            "tiles_frozen": int((frz < ends).sum()),
            "chunks_skipped_by_freeze": int(skipped.sum()),
            "skip_fraction_of_exec": round(
                float(skipped.sum()) / max(chunks_exec, 1), 4
            ),
        },
        "saturation": {
            "tiles_fully_saturated_final": sat_tiles,
            "pixels_saturated_fraction": round(
                float((final_t < 1e-4).mean()), 4
            ),
        },
    }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
