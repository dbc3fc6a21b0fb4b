#!/usr/bin/env python
"""Emulate the tile-sharded per-device slicing OUTSIDE shard_map: compute
each device's partial xyz-grad via the sliced packed blend and sum; compare
against the single-device full render's grads."""
import math
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")

from c3dgs_tpu.models import gaussians as gmod  # noqa: E402
from c3dgs_tpu.render import RasterSettings, rasterizer  # noqa: E402
from c3dgs_tpu.render import binning as B  # noqa: E402
from c3dgs_tpu.render.preprocess import preprocess  # noqa: E402
from c3dgs_tpu.render.rasterizer import assemble_image  # noqa: E402

CHUNK = B.CHUNK


def main():
    rng = np.random.default_rng(3)
    n = 20_000
    tight = rng.normal(size=(n * 4 // 5, 3)).astype(np.float32) * 0.25
    tight[:, 0] += 1.0
    wide = rng.normal(size=(n - tight.shape[0], 3)).astype(np.float32) * 2.0
    pts = np.concatenate([tight, wide])
    pts[:, 2] += 4.0
    cols = rng.random(size=(n, 3)).astype(np.float32)
    scene = gmod.from_point_cloud(pts, cols, capacity=n, quantization=False)
    scene = scene.replace(scaling_factor=scene.scaling_factor + math.log(0.5))
    settings = RasterSettings(
        width=512, height=256, tanfovx=math.tan(0.6),
        tanfovy=math.tan(0.45), sh_degree=0, instance_capacity=1 << 16,
    )
    ev = jnp.asarray([0, 0, 0, 1, 0, 0, 0], jnp.float32)
    bg = jnp.zeros(3)
    T = settings.num_tiles
    cap, _ = settings.resolve_caps(n)
    xyz = scene.get_xyz()
    cov = scene.get_covariance()
    op = scene.get_opacity()[:, 0]
    shs = scene.get_features()
    bn = B.bin_gaussians(
        jax.lax.stop_gradient(preprocess(xyz, cov, op, ev, settings, shs=shs)),
        settings,
    )
    starts = np.asarray(bn.starts)
    ends = np.asarray(bn.ends)
    w = jax.random.normal(jax.random.PRNGKey(5), (3, 256, 512))

    D = 4
    t_local = T // D
    cap_local = min(
        (2 * cap // D + CHUNK - 1) // CHUNK * CHUNK,
        (cap + CHUNK - 1) // CHUNK * CHUNK,
    )
    nc_local = cap_local // CHUNK

    def device_loss(x, d):
        prep = preprocess(x, cov, op, ev, settings, shs=shs)
        table = B.per_gaussian_table(prep, bn.offset)
        t0, t1 = d * t_local, (d + 1) * t_local
        c_lo = int(starts[t0]) // CHUNK
        c_hi = int(ends[t1 - 1]) // CHUNK + 1
        nc_exec = min(c_hi - c_lo, nc_local)
        slot0 = c_lo * CHUNK

        def sl(a, fill):
            ap = jnp.concatenate([a, jnp.full((cap_local,), fill, a.dtype)])
            return jax.lax.dynamic_slice(ap, (slot0,), (cap_local,))

        gid_l = sl(bn.gid_sorted, jnp.int32(n - 1))
        tid_l = sl(bn.tid_sorted, jnp.int32(T))
        sent_l = sl(bn.sent_sorted, True)
        j_l = sl(bn.j_sorted, jnp.int32(0))
        tl_pad = jnp.concatenate(
            [bn.tile_lo, jnp.full((nc_local + 1,), T, jnp.int32)]
        )
        tile_lo_l = jax.lax.dynamic_slice(tl_pad, (c_lo,), (nc_local + 1,))
        meta = jnp.stack(
            [jnp.int32(nc_exec), jnp.int32(t0), jnp.int32(t1), jnp.int32(cap)]
        )
        out_l = rasterizer.blend_gaussians_packed(
            settings.tiles_x, t_local, T, cap_local, cap,
            settings.fast_grad, table,
            (gid_l, tid_l, sent_l, j_l, tile_lo_l, meta, None, bn.emit_cum),
        )
        # this device's tiles = image rows [t0//16*16? tiles are row-major]
        # assemble the local block into its image slice and vdot with w's
        # matching rows
        ty0 = t0 // settings.tiles_x
        rows = t_local // settings.tiles_x * 16
        blocks = out_l[:, :4].reshape(
            t_local // settings.tiles_x, settings.tiles_x, 4, 16, 32
        )
        full = jnp.transpose(blocks, (2, 0, 3, 1, 4)).reshape(
            4, rows, settings.tiles_x * 32
        )
        color = full[:3]
        final_t = full[3]
        img = color + final_t[None] * bg[:, None, None]
        wslice = jax.lax.dynamic_slice(
            w, (0, ty0 * 16, 0), (3, rows, 512)
        )
        return jnp.vdot(wslice, img)

    def loss_full(x):
        prep = preprocess(x, cov, op, ev, settings, shs=shs)
        table = B.per_gaussian_table(prep, bn.offset)
        nc_exec = int(ends[T - 1]) // CHUNK + 1
        meta = jnp.stack(
            [jnp.int32(nc_exec), jnp.int32(0), jnp.int32(T), jnp.int32(cap)]
        )
        out = rasterizer.blend_gaussians_packed(
            settings.tiles_x, T, T, cap, cap, settings.fast_grad, table,
            (bn.gid_sorted, bn.tid_sorted, bn.sent_sorted, bn.j_sorted,
             bn.tile_lo, meta, bn.perm, bn.boundary_cum),
        )
        color, final_t = assemble_image(out, settings)
        img = color + final_t[None] * bg[:, None, None]
        return jnp.vdot(w, img)

    g_full = np.asarray(jax.jit(jax.grad(loss_full))(xyz))
    g_sum = np.zeros_like(g_full)
    for d in range(D):
        gd = np.asarray(jax.jit(jax.grad(lambda x: device_loss(x, d)))(xyz))
        g_sum += gd
    sc = np.abs(g_full).max()
    diff = np.abs(g_sum - g_full)
    print(f"sliced-sum vs full grads maxrel: {diff.max()/sc:.3e}")
    bad = np.where(diff.max(1) / sc > 1e-5)[0]
    print(f"bad: {bad.size}")
    if bad.size:
        gid_s = np.asarray(bn.gid_sorted)
        tid_s = np.asarray(bn.tid_sorted)
        mask = np.isin(gid_s, bad) & (tid_s < T)
        print("tiles of bad instances:", np.unique(tid_s[mask])[:24])


if __name__ == "__main__":
    main()
