#!/usr/bin/env python
"""On-hardware numerics gate: Pallas renderer vs pure-JAX oracle ON THE TPU.

The CPU test suite runs the kernels in interpret mode where MXU bf16
truncation does not exist, so the documented tolerance classes
(render/types.py::RasterSettings.fast_grad) are asserted here on the chip:

  image        |pallas - oracle|        < 5e-3   (bf16 matmul residue; the
                                                  2-pass hi/lo tri split
                                                  keeps it ~1e-3 typical)
  exact grads  fast_grad=False vs jax.grad(oracle): rel < 1e-2
  fast grads   fast_grad=True  vs fast_grad=False:  rel < 5e-2
               (1-pass suffix/colsum matmuls truncate inputs to bf16; the
                back-to-front ordering keeps the perturbation un-amplified)

Run: timeout 580 python tools/verify_tpu.py   (one device process at a time)
Exit 0 + one JSON line on success; assertion with the measured number
otherwise. Driver-runnable (VERDICT.md round-1 item 6).
"""
import dataclasses
import json
import math
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")

from c3dgs_tpu.ops import quat  # noqa: E402
from c3dgs_tpu.render import RasterSettings, oracle as oracle_mod, rasterizer  # noqa: E402


def make_scene(n, seed=0):
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
    return (
        jnp.asarray(means),
        jnp.asarray(cov3d),
        jnp.asarray(opacity),
        jnp.asarray(ev),
        jnp.asarray(colors),
    )


def relerr(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    denom = max(np.abs(b).max(), 1e-12)
    return float(np.abs(a - b).max() / denom)


def main():
    assert jax.default_backend() != "cpu", (
        "this gate must run on the TPU; CPU interpret mode cannot see MXU "
        "bf16 truncation"
    )
    n = 20000
    settings = RasterSettings(
        width=512,
        height=384,
        tanfovx=math.tan(0.6),
        tanfovy=math.tan(0.47),
        sh_degree=0,
    )
    means, cov, op, ev, colors = make_scene(n)
    bg = jnp.asarray([0.15, 0.1, 0.3])
    report = {"n": n, "res": f"{settings.width}x{settings.height}"}
    t0 = time.time()

    # ---- forward: both pallas modes vs oracle
    out_o = jax.jit(
        lambda m, c, o, e, col: oracle_mod.render_oracle(
            m, c, o, e, settings, bg, colors_precomp=col
        )
    )(means, cov, op, ev, colors)
    img_o = np.asarray(out_o["render"])

    set_fast = settings
    set_exact = dataclasses.replace(settings, fast_grad=False)

    def run(st):
        return jax.jit(
            lambda m, c, o, e, col: rasterizer.render(
                m, c, o, e, st, bg, colors_precomp=col
            )
        )(means, cov, op, ev, colors)

    out_p = run(set_fast)
    assert int(out_p["overflow"]) == 0, "instance overflow in gate scene"
    assert int(out_p["grad_overflow"]) == 0
    img_p = np.asarray(out_p["render"])
    report["image_absdiff"] = float(np.abs(img_p - img_o).max())
    assert report["image_absdiff"] < 5e-3, report

    # ---- gradients: a generic (non-symmetric) cotangent via weighted sum.
    # Smaller scene: jax.grad of the oracle's N-step scan stores per-step
    # (H,W) residuals — 20k steps @512x384 exceeds HBM. The numerics being
    # gated (bf16 matmul truncation in the Pallas kernels) are
    # scale-independent.
    settings = RasterSettings(
        width=256,
        height=192,
        tanfovx=math.tan(0.6),
        tanfovy=math.tan(0.47),
        sh_degree=0,
    )
    set_fast = settings
    set_exact = dataclasses.replace(settings, fast_grad=False)
    means, cov, op, ev, colors = make_scene(2000, seed=1)
    key = jax.random.PRNGKey(7)
    wimg = jax.random.normal(key, (3, settings.height, settings.width))

    def loss_pallas(st):
        def f(m, c, o, col):
            out = rasterizer.render(m, c, o, ev, st, bg, colors_precomp=col)
            return jnp.vdot(wimg, out["render"])

        return jax.jit(jax.grad(f, argnums=(0, 1, 2, 3)))

    def f_oracle(m, c, o, col):
        out = oracle_mod.render_oracle(
            m, c, o, ev, settings, bg, colors_precomp=col
        )
        return jnp.vdot(wimg, out["render"])

    g_oracle = jax.jit(jax.grad(f_oracle, argnums=(0, 1, 2, 3)))(
        means, cov, op, colors
    )
    g_exact = loss_pallas(set_exact)(means, cov, op, colors)
    g_fast = loss_pallas(set_fast)(means, cov, op, colors)

    names = ["means", "cov", "opacity", "colors"]
    for nm, ge, go, gf in zip(names, g_exact, g_oracle, g_fast):
        assert np.isfinite(np.asarray(ge)).all(), nm
        assert np.abs(np.asarray(ge)).max() > 0, nm
        e_exact = relerr(ge, go)
        e_fast = relerr(gf, ge)
        report[f"grad_{nm}_exact_vs_oracle"] = e_exact
        report[f"grad_{nm}_fast_vs_exact"] = e_fast
        assert e_exact < 1e-2, (nm, e_exact)
        assert e_fast < 5e-2, (nm, e_fast)

    report["seconds"] = round(time.time() - t0, 1)
    report["backend"] = jax.default_backend()
    report["ok"] = True
    print(json.dumps(report))


if __name__ == "__main__":
    main()
