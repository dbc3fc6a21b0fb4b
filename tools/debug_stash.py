#!/usr/bin/env python
"""Compare the backward kernel's walk internals (stashed in grad rows 9..13)
against numpy ground truth for the bad chunk."""
import math
import os
import sys

os.environ["C3DGS_PROBE_BWD"] = "stash"

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")

from c3dgs_tpu.render import RasterSettings, rasterizer, tiles  # noqa: E402
from c3dgs_tpu.render import binning as B  # noqa: E402
from c3dgs_tpu.render.preprocess import preprocess  # noqa: E402
from c3dgs_tpu.render.types import TILE_X, TILE_Y  # noqa: E402
from tools.debug_gate_tpu import make_scene  # noqa: E402

CHUNK = B.CHUNK
MAX_ALPHA, MIN_ALPHA = tiles.MAX_ALPHA, tiles.MIN_ALPHA


def main():
    settings = RasterSettings(width=256, height=192, tanfovx=math.tan(0.6),
                              tanfovy=math.tan(0.47), sh_degree=0,
                              fast_grad=False)
    means, cov, op, ev, colors = make_scene(2000, seed=1)
    n = means.shape[0]
    cap, _ = settings.resolve_caps(n)
    T = settings.num_tiles

    @jax.jit
    def stage(m, c, o, col):
        prep = preprocess(m, c, o, ev, settings, None, col)
        bn = B.bin_gaussians(jax.lax.stop_gradient(prep), settings)
        table = B.per_gaussian_table(prep, bn.offset)
        fields = rasterizer._build_fields_packed(
            table, bn.gid_sorted, bn.tid_sorted, bn.sent_sorted, settings.tiles_x, T)
        meta = jnp.stack([bn.chunks_exec, jnp.int32(0), jnp.int32(T),
                          jnp.int32(cap)])
        return fields, meta, bn

    fields, meta, bn = stage(means, cov, op, colors)
    fields_np = np.asarray(fields)
    tid = np.asarray(bn.tid_sorted)
    starts, ends = np.asarray(bn.starts), np.asarray(bn.ends)

    @jax.jit
    def hw(fields, meta, tile_lo):
        out = rasterizer._blend_forward_call_packed(
            T, cap, fields, tile_lo, meta)
        gout = jnp.zeros((T, tiles.OUT_ROWS, tiles.PIX)).at[:, 0].set(1.0)
        grads = rasterizer._blend_backward_call_packed(
            T, cap, False, fields, tile_lo, meta, out, gout)
        return out, grads

    out, grads = (np.asarray(a) for a in hw(fields, meta, bn.tile_lo))

    tl = np.asarray(bn.tile_lo)
    print(f"ends[72..78] = {ends[72:79]}")
    print(f"tile_lo[23..28] = {tl[23:29]}")
    for c in (25, 26):
        print(f"chunk {c} tids: {tid[c*CHUNK:(c+1)*CHUNK]}")
        print(f"  lte_k: {np.round(grads[9, c*CHUNK:(c+1)*CHUNK][:12], 4)}")
        print(f"  pre_k: {np.round(grads[10, c*CHUNK:(c+1)*CHUNK][:12], 4)}")

    # ground truth for pixel 0 of each tile: per-lane entering lt
    c0 = 24
    sl = slice(c0 * CHUNK, (c0 + 1) * CHUNK)
    tid_c = tid[sl]
    print(f"chunk {c0} tids: {tid_c}")
    lte_k = grads[9, sl]
    pre_k = grads[10, sl]
    frz_k = grads[11, sl]
    suf_k = grads[12, sl]

    # numpy: entering lt at pixel 0 for each lane of the chunk
    px = np.arange(tiles.PIX) % TILE_X
    py = np.arange(tiles.PIX) // TILE_X
    for t in np.unique(tid_c):
        if t >= T:
            continue
        s, e = starts[t], ends[t]
        f = fields_np[:, s:e]
        dx = f[0][0] - 0.0  # pixel 0 at (0, 0) tile-local
        dy = f[1][0]
        dx = f[0] - px[0]
        dy = f[1] - py[0]
        power = np.minimum((f[2] * dx + f[3] * dy) * dx + (f[4] * dy) * dy,
                           0.0)
        raw = f[5] * np.exp(power)
        alpha = np.where(raw >= MIN_ALPHA, np.minimum(MAX_ALPHA, raw), 0.0)
        tlog = np.log1p(-alpha)
        lt_in = np.concatenate([[0.0], np.cumsum(tlog)[:-1]])
        lt_fin = np.cumsum(tlog)[-1] if e > s else 0.0
        # lanes of tile t inside chunk c0
        lanes = np.where(tid_c == t)[0]
        gslots = lanes + c0 * CHUNK
        idx = gslots - s
        print(f" tile {t}: lanes {lanes.min()}..{lanes.max()}")
        print(f"   pre_k : {np.round(pre_k[lanes][:8], 4)}")
        print(f"   pre_np: {np.round(lt_in[idx][:8], 4)}")
        print(f"   lte_k : {np.round(lte_k[lanes][:8], 4)}")
        print(f"   lte_np(lt_fin or walk) lt_fin={lt_fin:.4f}")
        print(f"   frz_k : {frz_k[lanes][:4]}")
        print(f"   suf_k : {np.round(suf_k[lanes][:8], 4)}")


if __name__ == "__main__":
    main()
