#!/usr/bin/env python
"""Run the packed loss grad on TPU with CPU-vs-TPU binning bookkeeping.

Isolates whether the on-hardware packed grad failure comes from the binning
bookkeeping computed on TPU (invariant violation) or from the blend VJP.
"""
import dataclasses
import math
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")

from c3dgs_tpu.render import RasterSettings, oracle as oracle_mod, rasterizer  # noqa: E402
from c3dgs_tpu.render import binning as B  # noqa: E402
from c3dgs_tpu.render.preprocess import preprocess  # noqa: E402
from tools.debug_gate_tpu import make_scene, relerr  # noqa: E402


def main():
    settings = RasterSettings(width=256, height=192, tanfovx=math.tan(0.6),
                              tanfovy=math.tan(0.47), sh_degree=0,
                              fast_grad=False)
    means, cov, op, ev, colors = make_scene(2000, seed=1)
    bg = jnp.asarray([0.15, 0.1, 0.3])
    wimg = jax.random.normal(jax.random.PRNGKey(7),
                             (3, settings.height, settings.width))
    n = means.shape[0]
    cap, _ = settings.resolve_caps(n)

    def binfn(m, c, o, col):
        prep = preprocess(m, c, o, ev, settings, None, col)
        return B.bin_gaussians(jax.lax.stop_gradient(prep), settings)

    bn_tpu = jax.jit(binfn)(means, cov, op, colors)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        bn_cpu = jax.device_get(jax.jit(binfn)(
            *(jax.device_put(a, cpu) for a in (means, cov, op, colors))))
    bn_cpu = jax.tree.map(jnp.asarray, bn_cpu)

    def lossgrad(bn):
        def f(m, c, o, col):
            prep = preprocess(m, c, o, ev, settings, None, col)
            table = B.per_gaussian_table(prep, bn.offset)
            meta = jnp.stack([bn.chunks_exec, jnp.int32(0),
                              jnp.int32(settings.num_tiles), jnp.int32(cap)])
            out_tiles = rasterizer.blend_gaussians_packed(
                settings.tiles_x, settings.num_tiles, cap, False, table,
                (bn.gid_sorted, bn.tid_sorted, bn.tile_lo, meta, bn.perm,
                 bn.boundary_cum),
            )
            color, final_t = rasterizer.assemble_image(out_tiles, settings)
            image = color + final_t[None] * bg[:, None, None]
            return jnp.vdot(wimg, image)
        return jax.device_get(jax.jit(jax.grad(f, argnums=(0, 1, 2, 3)))(
            means, cov, op, colors))

    def f_oracle(m, c, o, col):
        out = oracle_mod.render_oracle(m, c, o, ev, settings, bg,
                                       colors_precomp=col)
        return jnp.vdot(wimg, out["render"])

    g_o = jax.device_get(jax.jit(jax.grad(f_oracle, argnums=(0, 1, 2, 3)))(
        means, cov, op, colors))

    g_tb = lossgrad(bn_tpu)   # TPU binning
    g_cb = lossgrad(bn_cpu)   # CPU binning, same TPU kernels

    for nm, gt, gc, go in zip(["means", "cov", "opacity", "colors"],
                              g_tb, g_cb, g_o):
        print(f"{nm}: tpu-binning_vs_oracle {relerr(gt, go):.4e}   "
              f"cpu-binning_vs_oracle {relerr(gc, go):.4e}")


if __name__ == "__main__":
    main()
