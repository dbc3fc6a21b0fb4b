#!/usr/bin/env python
"""Ground-truth check of the packed backward under TPU binning.

1. numpy scatter-reduce of the hardware per-slot grads vs the pipeline's
   prefix-diff reduction  -> localizes reduction-bookkeeping faults.
2. numpy recomputation of per-slot color grads from the compositing math
   (per tile segment, front-to-back) vs the hardware kernel's grads
   -> localizes kernel/bookkeeping logic faults.
"""
import math
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")

from c3dgs_tpu.render import RasterSettings, rasterizer, tiles  # noqa: E402
from c3dgs_tpu.render import binning as B  # noqa: E402
from c3dgs_tpu.render import tiles_packed  # noqa: E402
from c3dgs_tpu.render.preprocess import preprocess  # noqa: E402
from c3dgs_tpu.render.types import TILE_X, TILE_Y  # noqa: E402
from tools.debug_gate_tpu import make_scene  # noqa: E402

CHUNK = B.CHUNK
MAX_ALPHA, MIN_ALPHA, STOP_T = tiles.MAX_ALPHA, tiles.MIN_ALPHA, tiles.STOP_T


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
    fields_np, meta_np = np.asarray(fields), np.asarray(meta)
    gid = np.asarray(bn.gid_sorted)
    tid = np.asarray(bn.tid_sorted)
    starts, ends = np.asarray(bn.starts), np.asarray(bn.ends)
    perm, bcum = np.asarray(bn.perm), np.asarray(bn.boundary_cum)

    wimg = jax.random.normal(jax.random.PRNGKey(7),
                             (3, settings.height, settings.width))

    @jax.jit
    def hw(fields, meta, tile_lo):
        out = rasterizer._blend_forward_call_packed(
            T, cap, fields, tile_lo, meta)
        ty, tx = settings.tiles_y, settings.tiles_x
        wpad = jnp.zeros((3, ty * TILE_Y, tx * TILE_X)).at[
            :, : settings.height, : settings.width].set(wimg)
        blocks = wpad.reshape(3, ty, TILE_Y, tx, TILE_X)
        gout = jnp.transpose(blocks, (1, 3, 0, 2, 4)).reshape(
            T, 3, TILE_Y * TILE_X)
        gout = jnp.concatenate(
            [gout, jnp.zeros((T, tiles.OUT_ROWS - 3, tiles.PIX))], 1)
        grads = rasterizer._blend_backward_call_packed(
            T, cap, False, fields, tile_lo, meta, out, gout)
        d = rasterizer._reduce_instance_grads_packed(
            grads, jnp.asarray(perm), jnp.asarray(bcum), cap)
        return out, gout, grads, d

    out, gout, grads, d_pipe = (np.asarray(a) for a in
                                hw(fields, meta, bn.tile_lo))
    nexec = int(meta_np[0]) * CHUNK

    # ---- 1. numpy ground-truth reduction over gid (real slots only)
    real = (tid < T) & (np.arange(cap) < nexec)
    d_np = np.zeros((n, grads.shape[0]), np.float32)
    np.add.at(d_np, gid[real], grads[:, : cap].T[real] * 1.0)
    live = B.NUM_USED_FIELDS
    diff = np.abs(d_np[:, :live] - d_pipe[:, :live])
    scale = max(np.abs(d_np[:, :live]).max(), 1e-12)
    print(f"numpy-reduce vs pipeline-reduce maxrel: {diff.max()/scale:.3e}")

    # ---- 2. numpy recomputation of color grads per slot
    # fields rows: 0 x(tile-local) 1 y 2 a2 3 b2 4 c2 5 op 6..8 rgb
    px = np.arange(tiles.PIX) % TILE_X
    py = np.arange(tiles.PIX) // TILE_X
    g_rgb_np = np.zeros((3, cap), np.float32)
    wsum = np.zeros(cap, np.float32)
    for t in range(T):
        s, e = starts[t], ends[t]
        if e <= s:
            continue
        f = fields_np[:, s:e]
        dx = f[0][None, :] - px[:, None]
        dy = f[1][None, :] - py[:, None]
        power = np.minimum(
            (f[2] * dx + f[3] * dy) * dx + (f[4] * dy) * dy, 0.0)
        raw = f[5] * np.exp(power)
        alpha = np.where(raw >= MIN_ALPHA, np.minimum(MAX_ALPHA, raw), 0.0)
        tlog = np.log1p(-alpha)
        lt_in = np.concatenate(
            [np.zeros((tiles.PIX, 1)), np.cumsum(tlog, 1)[:, :-1]], 1)
        t_in = np.exp(lt_in)
        liv = t_in * (1 - alpha) >= STOP_T
        w = np.where(liv, alpha * t_in, 0.0)
        go = gout[t, 0:3]  # (3, PIX)
        g_rgb_np[:, s:e] += go @ w
        wsum[s:e] += w.sum(0)
    gr = grads[6:9, :cap]
    m = real
    dif = np.abs(g_rgb_np[:, m] - gr[:, m])
    sc = max(np.abs(g_rgb_np[:, m]).max(), 1e-12)
    print(f"numpy color-grad vs kernel maxrel: {dif.max()/sc:.3e}")
    bad = np.where(dif.max(0) / sc > 1e-3)[0]
    slots = np.where(m)[0][bad]
    if slots.size:
        print(f"  bad slots: {slots.size} e.g. {slots[:15]}")
        print(f"  their tiles: {np.unique(tid[slots])[:15]}")
        print(f"  their chunks: {np.unique(slots // CHUNK)[:15]}")
        c0 = slots[0] // CHUNK
        tl = np.asarray(bn.tile_lo)
        print(f"  first bad chunk {c0}: tile_lo {tl[c0]}..{tl[c0+1]}, "
              f"slot range tids {tid[c0*CHUNK:(c0+1)*CHUNK]}")


if __name__ == "__main__":
    main()
