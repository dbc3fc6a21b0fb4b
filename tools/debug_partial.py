#!/usr/bin/env python
"""Single-device isolation of the sharded partial path: run
blend_gaussians_packed with tile_end < num_tiles (no shard_map) and check
its d_table partial against a numpy ground-truth reduction restricted to
the owned tiles."""
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
from c3dgs_tpu.train import trainer  # noqa: E402

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
    scene = scene.replace(
        scaling_factor=scene.scaling_factor + math.log(0.5)
    )
    settings = RasterSettings(
        width=512, height=256, tanfovx=math.tan(0.6),
        tanfovy=math.tan(0.45), sh_degree=0, instance_capacity=1 << 16,
    )
    ev = jnp.asarray([0, 0, 0, 1, 0, 0, 0], jnp.float32)
    bg = jnp.zeros(3)
    T = settings.num_tiles
    cap, _ = settings.resolve_caps(n)
    w = jax.random.normal(jax.random.PRNGKey(5), (3, 256, 512))

    xyz = scene.get_xyz()
    cov = scene.get_covariance()
    op = scene.get_opacity()[:, 0]
    shs = scene.get_features()

    def prep_of(x):
        return preprocess(x, cov, op, ev, settings, shs=shs)

    bn = B.bin_gaussians(jax.lax.stop_gradient(prep_of(xyz)), settings)
    nc_exec = int(np.asarray(bn.ends)[T - 1]) // CHUNK + 1

    def loss_partial(x, t_end, use_perm):
        prep = prep_of(x)
        table = B.per_gaussian_table(prep, bn.offset)
        meta = jnp.stack(
            [jnp.int32(nc_exec), jnp.int32(0), jnp.int32(t_end),
             jnp.int32(cap)]
        )
        out = rasterizer.blend_gaussians_packed(
            settings.tiles_x, T, T, cap, cap, settings.fast_grad, table,
            (bn.gid_sorted, bn.tid_sorted, bn.sent_sorted, bn.j_sorted,
             bn.tile_lo, meta,
             bn.perm if use_perm else None,
             bn.boundary_cum if use_perm else bn.emit_cum),
        )
        color, final_t = assemble_image(out, settings)
        img = color + final_t[None] * bg[:, None, None]
        return jnp.vdot(w, img)

    # full coverage: partial reducer vs perm reducer (both t_end = T)
    g_perm = np.asarray(jax.jit(
        lambda x: jax.grad(loss_partial, argnums=0)(x, T, True))(xyz))
    g_part = np.asarray(jax.jit(
        lambda x: jax.grad(loss_partial, argnums=0)(x, T, False))(xyz))
    sc = np.abs(g_perm).max()
    print(f"full-coverage: partial vs perm reducer relmaxdiff "
          f"{np.abs(g_part - g_perm).max()/sc:.2e}")

    # restricted coverage t_end = T//2 with a left-half-only loss: must
    # match the full render's grads for the same loss (right-half tiles
    # contribute nothing to it)
    wh = np.zeros((3, 256, 512), np.float32)
    wh[:, :128] = np.asarray(w)[:, :128]
    whj = jnp.asarray(wh)

    def loss_half(x, t_end, use_perm):
        prep = prep_of(x)
        table = B.per_gaussian_table(prep, bn.offset)
        meta = jnp.stack(
            [jnp.int32(nc_exec), jnp.int32(0), jnp.int32(t_end),
             jnp.int32(cap)]
        )
        out = rasterizer.blend_gaussians_packed(
            settings.tiles_x, T, T, cap, cap, settings.fast_grad, table,
            (bn.gid_sorted, bn.tid_sorted, bn.sent_sorted, bn.j_sorted,
             bn.tile_lo, meta,
             bn.perm if use_perm else None,
             bn.boundary_cum if use_perm else bn.emit_cum),
        )
        color, final_t = assemble_image(out, settings)
        img = color + final_t[None] * bg[:, None, None]
        return jnp.vdot(whj, img)

    g_ref = np.asarray(jax.jit(
        lambda x: jax.grad(loss_half, argnums=0)(x, T, True))(xyz))
    g_half = np.asarray(jax.jit(
        lambda x: jax.grad(loss_half, argnums=0)(x, T // 2, False))(xyz))
    sc = np.abs(g_ref).max()
    print(f"t_end=T/2 partial vs full-perm (left-half loss) relmaxdiff "
          f"{np.abs(g_half - g_ref).max()/sc:.2e}")


if __name__ == "__main__":
    main()
