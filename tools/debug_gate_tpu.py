#!/usr/bin/env python
"""Gate-scene grads ON TPU: packed vs unpacked vs oracle, pairwise."""
import dataclasses
import math
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")

from c3dgs_tpu.ops import quat  # noqa: E402
from c3dgs_tpu.render import RasterSettings, oracle as oracle_mod, rasterizer  # noqa: E402


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
    return (jnp.asarray(means), jnp.asarray(cov3d), jnp.asarray(opacity),
            jnp.asarray(ev), jnp.asarray(colors))


def relerr(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.abs(a - b).max() / max(np.abs(b).max(), 1e-12))


def main():
    assert jax.default_backend() != "cpu"
    settings = RasterSettings(
        width=256, height=192, tanfovx=math.tan(0.6),
        tanfovy=math.tan(0.47), sh_degree=0, fast_grad=False,
    )
    means, cov, op, ev, colors = make_scene(2000, seed=1)
    bg = jnp.asarray([0.15, 0.1, 0.3])
    key = jax.random.PRNGKey(7)
    wimg = jax.random.normal(key, (3, settings.height, settings.width))

    def lossfn(st):
        def f(m, c, o, col):
            out = rasterizer.render(m, c, o, ev, st, bg, colors_precomp=col)
            return jnp.vdot(wimg, out["render"])
        return jax.jit(jax.grad(f, argnums=(0, 1, 2, 3)))

    def f_oracle(m, c, o, col):
        out = oracle_mod.render_oracle(m, c, o, ev, settings, bg,
                                       colors_precomp=col)
        return jnp.vdot(wimg, out["render"])

    g_o = jax.device_get(jax.jit(jax.grad(f_oracle, argnums=(0, 1, 2, 3)))(
        means, cov, op, colors))
    g_p = jax.device_get(lossfn(settings)(means, cov, op, colors))
    g_u = jax.device_get(lossfn(dataclasses.replace(settings, packed=False))(
        means, cov, op, colors))

    for nm, gp, gu, go in zip(["means", "cov", "opacity", "colors"],
                              g_p, g_u, g_o):
        print(f"{nm}: packed_vs_oracle {relerr(gp, go):.4e}  "
              f"unpacked_vs_oracle {relerr(gu, go):.4e}  "
              f"packed_vs_unpacked {relerr(gp, gu):.4e}")


if __name__ == "__main__":
    main()
