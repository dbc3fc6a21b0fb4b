#!/usr/bin/env python
"""Localize the on-hardware packed-backward grad mismatch.

Runs the gate scene's backward on the TPU, dumps the per-slot grad buffer
(NUM_FIELDS, cap), and compares it to the interpret-mode (CPU) result on
identical staged inputs. Prints which chunks/lanes disagree and their
tile/group structure so the failing kernel path is identifiable.
"""
import dataclasses
import math
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")

from c3dgs_tpu.ops import quat  # noqa: E402
from c3dgs_tpu.render import RasterSettings, rasterizer  # noqa: E402
from c3dgs_tpu.render import binning as B  # noqa: E402
from c3dgs_tpu.render import tiles, tiles_packed  # noqa: E402
from c3dgs_tpu.render.preprocess import preprocess  # noqa: E402


def make_scene(n, seed=1):
    rng = np.random.default_rng(seed)
    means = rng.normal(size=(n, 3)).astype(np.float32) * 1.2
    means[:, 2] += 4.0
    scales = np.exp(rng.normal(size=(n, 3)).astype(np.float32) * 0.6 - 3.6)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    cov3d = np.asarray(
        quat.cov6_from_scaling_rotation(jnp.asarray(scales), jnp.asarray(quats))
    )
    opacity = (1 / (1 + np.exp(-rng.normal(size=n) - 0.5))).astype(np.float32)
    colors = rng.random(size=(n, 3)).astype(np.float32)
    ev = np.array([0, 0, 0, 1, 0, 0, 0], np.float32)
    return means, cov3d, opacity, ev, colors


def main():
    n = 2000
    settings = RasterSettings(
        width=256,
        height=192,
        tanfovx=math.tan(0.6),
        tanfovy=math.tan(0.47),
        sh_degree=0,
    )
    means, cov, op, ev, colors = (jnp.asarray(a) for a in make_scene(n))
    bg = jnp.asarray([0.15, 0.1, 0.3])

    @jax.jit
    def stage(means, cov, op, ev, colors):
        prep = preprocess(means, cov, op, ev, settings, None, colors)
        bn = B.bin_gaussians(jax.lax.stop_gradient(prep), settings)
        table = B.per_gaussian_table(prep, bn.offset)
        cap, _ = settings.resolve_caps(n)
        fields = rasterizer._build_fields_packed(
            table, bn.gid_sorted, bn.tid_sorted, bn.sent_sorted, settings.tiles_x,
            settings.num_tiles,
        )
        meta = jnp.stack(
            [bn.chunks_exec, jnp.int32(0), jnp.int32(settings.num_tiles),
             jnp.int32(cap)]
        )
        return fields, bn.tile_lo, meta, bn.perm, bn.boundary_cum

    fields, tile_lo, meta, perm, boundary_cum = jax.device_get(
        stage(means, cov, op, ev, colors)
    )
    cap = fields.shape[1]
    print(f"# cap={cap} chunks_exec={meta[0]} tiles={settings.num_tiles}")

    # binning/staging determinism across backends (all sort keys unique ->
    # outputs must be bit-identical)
    cpu0 = jax.devices("cpu")[0]
    with jax.default_device(cpu0):
        st_cpu = jax.device_get(jax.jit(stage.__wrapped__)(
            *(jax.device_put(a, cpu0) for a in (means, cov, op, ev, colors))
        ))
    for nm, a, b in zip(["fields", "tile_lo", "meta", "perm", "boundary"],
                        (fields, tile_lo, meta, perm, boundary_cum), st_cpu):
        d = np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64))
        print(f"  stage {nm}: maxdiff {d.max():.3e}"
              + (f" at {np.unravel_index(d.argmax(), d.shape)}"
                 if d.max() > 0 else ""))

    key = jax.random.PRNGKey(7)
    wimg = jax.random.normal(key, (3, settings.height, settings.width))

    def fwd_and_bwd(fields, tile_lo, meta):
        out = rasterizer._blend_forward_call_packed(
            settings.num_tiles, cap, jnp.asarray(fields),
            jnp.asarray(tile_lo), jnp.asarray(meta),
        )
        # cotangent of out: rows 0..2 from wimg tiles, row 3 zero
        ty, tx = settings.tiles_y, settings.tiles_x
        pad_h, pad_w = ty * 16, tx * 32
        wpad = jnp.zeros((3, pad_h, pad_w)).at[:, : settings.height,
                                               : settings.width].set(wimg)
        blocks = wpad.reshape(3, ty, 16, tx, 32)
        gout = jnp.transpose(blocks, (1, 3, 0, 2, 4)).reshape(
            ty * tx, 3, 16 * 32
        )
        # nonzero dL/dT_final row exercises the gtt path (bg term)
        gt_row = jax.random.normal(
            jax.random.PRNGKey(3), (ty * tx, 1, tiles.PIX)
        )
        gout = jnp.concatenate(
            [gout, gt_row,
             jnp.zeros((ty * tx, tiles.OUT_ROWS - 4, tiles.PIX))], 1
        )
        grads = rasterizer._blend_backward_call_packed(
            settings.num_tiles, cap, False, jnp.asarray(fields),
            jnp.asarray(tile_lo), jnp.asarray(meta), out, gout
        )
        return out, grads

    run = jax.jit(fwd_and_bwd)
    out_hw, grads_hw = jax.device_get(run(fields, tile_lo, meta))

    # same but with staging INSIDE the jit (fields becomes an XLA
    # intermediate -> eligible for buffer reuse against kernel outputs)
    @jax.jit
    def fused(means, cov, op, ev, colors):
        f2, tl2, m2, _, _ = stage.__wrapped__(means, cov, op, ev, colors)
        return fwd_and_bwd(f2, tl2, m2)

    out_f, grads_f = jax.device_get(fused(means, cov, op, ev, colors))
    df = np.abs(grads_f[:, : int(meta[0]) * 128] -
                grads_hw[:, : int(meta[0]) * 128])
    print(f"fused-stage vs input-stage grads maxdiff: {df.max():.3e}")

    # interpret mode on CPU with the same staged inputs
    tiles.interpret_mode = lambda: True  # force interpret at trace time
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        out_cpu, grads_cpu = jax.device_get(jax.jit(fwd_and_bwd)(
            jax.device_put(fields, cpu), jax.device_put(tile_lo, cpu),
            jax.device_put(meta, cpu)))

    d_out = np.abs(out_hw - out_cpu)
    print(f"forward out maxdiff: {d_out.max():.3e} at "
          f"{np.unravel_index(d_out.argmax(), d_out.shape)}")
    # per-row forward diffs (rows 4,5 are lt/freeze residuals)
    for rrow in range(tiles.OUT_ROWS):
        print(f"  fwd row {rrow}: maxdiff {d_out[:, rrow].max():.3e}")

    # only executed chunks are defined (tail rows are uninitialized on
    # hardware and masked by the reduction)
    nexec = int(meta[0]) * 128
    grads_hw = grads_hw[:, :nexec]
    grads_cpu = grads_cpu[:, :nexec]
    fields = fields[:, :nexec]
    rel = np.abs(grads_hw - grads_cpu) / np.maximum(
        np.abs(grads_cpu).max(), 1e-12
    )
    print(f"grad buffer maxreldiff: {rel.max():.3e}")
    bad = np.argwhere(rel > 1e-3)
    if bad.size:
        slots = np.unique(bad[:, 1])
        chunks = np.unique(slots // 128)
        print(f"bad slots: {slots.size} (of {cap}); bad chunks: "
              f"{chunks.size} -> {chunks[:20]}")
        tl = np.asarray(tile_lo)
        for c in chunks[:10]:
            ng = tl[c + 1] - tl[c]
            sl = slots[(slots // 128) == c]
            lanes = sl % 128
            tid = fields[tiles_packed.TID_ROW, sl].astype(int)
            print(f"  chunk {c}: ng={ng} tile_lo={tl[c]} badlanes="
                  f"{lanes[:12]} tids={np.unique(tid)[:8]}")
    else:
        print("grad buffer matches interpret mode")

    # ---- reduction determinism: same inputs on TPU vs CPU. The tail
    # (unexecuted chunks) is GARBAGE on hardware — model it with huge
    # finite noise; the reduction must mask it
    rng = np.random.default_rng(9)
    grads_full = rng.normal(size=(grads_hw.shape[0], cap)).astype(
        np.float32) * 1e17
    grads_full[:, :nexec] = grads_hw
    red = lambda g, p, b: rasterizer._reduce_instance_grads_packed(
        jnp.asarray(g), jnp.asarray(p), jnp.asarray(b), cap
    )
    d_tpu = jax.device_get(jax.jit(red)(grads_full, perm, boundary_cum))
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        d_cpu = jax.device_get(jax.jit(red)(
            jax.device_put(grads_full, cpu), jax.device_put(perm, cpu),
            jax.device_put(boundary_cum, cpu)))
    dr = np.abs(d_tpu - d_cpu) / max(np.abs(d_cpu).max(), 1e-12)
    print(f"reduction tpu-vs-cpu maxrel: {dr.max():.3e}")
    gz = np.zeros_like(grads_full)
    gz[:, :nexec] = grads_hw
    d_zero = jax.device_get(jax.jit(red)(gz, perm, boundary_cum))
    dz = np.abs(d_tpu - d_zero) / max(np.abs(d_zero).max(), 1e-12)
    print(f"reduction garbage-tail vs zero-tail maxrel: {dz.max():.3e}")
    if dz.max() > 1e-5:
        badg = np.unique(np.argwhere(dz > 1e-5)[:, 0])
        print(f"  leaking gaussians: {badg.size} -> {badg[:20]}")
    if dr.max() > 1e-4:
        badg = np.argwhere(dr > 1e-4)
        print(f"  bad gaussians: {np.unique(badg[:, 0])[:20]} "
              f"cols {np.unique(badg[:, 1])}")


if __name__ == "__main__":
    main()
