#!/usr/bin/env python
"""Per-gaussian error pattern of the packed TPU grads vs CPU interpret."""
import dataclasses
import math
import subprocess
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

CPU_SNIPPET = r"""
import sys, math, dataclasses
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
sys.path.insert(0, "/root/repo")
from c3dgs_tpu.render import RasterSettings, rasterizer
from tools.debug_gate_tpu import make_scene
settings = RasterSettings(width=256, height=192, tanfovx=math.tan(0.6),
                          tanfovy=math.tan(0.47), sh_degree=0,
                          fast_grad=False)
means, cov, op, ev, colors = make_scene(2000, seed=1)
bg = jnp.asarray([0.15, 0.1, 0.3])
wimg = jax.random.normal(jax.random.PRNGKey(7),
                         (3, settings.height, settings.width))
def f(m, c, o, col):
    out = rasterizer.render(m, c, o, ev, settings, bg, colors_precomp=col)
    return jnp.vdot(wimg, out["render"])
g = jax.jit(jax.grad(f, argnums=(0, 1, 2, 3)))(means, cov, op, colors)
np.savez("/tmp/packed_cpu_grads.npz", means=g[0], cov=g[1], op=g[2],
         colors=g[3])
print("cpu done")
"""


def main():
    # CPU leg in a subprocess (backend config is process-global)
    subprocess.run([sys.executable, "-c", CPU_SNIPPET], check=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp

    from c3dgs_tpu.render import RasterSettings, rasterizer
    from tools.debug_gate_tpu import make_scene

    settings = RasterSettings(width=256, height=192, tanfovx=math.tan(0.6),
                              tanfovy=math.tan(0.47), sh_degree=0,
                              fast_grad=False)
    means, cov, op, ev, colors = make_scene(2000, seed=1)
    bg = jnp.asarray([0.15, 0.1, 0.3])
    wimg = jax.random.normal(jax.random.PRNGKey(7),
                             (3, settings.height, settings.width))

    def f(m, c, o, col):
        out = rasterizer.render(m, c, o, ev, settings, bg, colors_precomp=col)
        return jnp.vdot(wimg, out["render"])

    g = jax.device_get(jax.jit(jax.grad(f, argnums=(0, 1, 2, 3)))(
        means, cov, op, colors))
    ref = np.load("/tmp/packed_cpu_grads.npz")

    gc_t, gc_c = np.asarray(g[3]), ref["colors"]
    scale = np.abs(gc_c).max()
    rel = np.abs(gc_t - gc_c).max(axis=1) / scale
    bad = np.where(rel > 1e-3)[0]
    print(f"colors: {bad.size}/2000 gaussians wrong (rel>1e-3), "
          f"maxrel {rel.max():.3e}")
    if bad.size:
        print(f"  bad gids: {bad[:30]}")
        # are bad grads zero, scaled, or junk?
        r = gc_t[bad[:10]] / np.where(np.abs(gc_c[bad[:10]]) > 1e-12,
                                      gc_c[bad[:10]], np.nan)
        print(f"  ratio tpu/cpu (sample): {np.round(r, 3)}")
        np.savez("/tmp/packed_bad.npz", bad=bad, gc_t=gc_t, gc_c=gc_c)


if __name__ == "__main__":
    main()
