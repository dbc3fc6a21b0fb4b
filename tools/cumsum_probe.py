#!/usr/bin/env python
"""Micro-bench: prefix-sum formulations for the grad-reduce cumsum.

The reduction's cumsum over (exec_cap, 9) f32 rows measures ~0.87 ms/frame
at 1080p (xprof) — XLA lowers a length-475k scan as ~19 log-doubling
passes over the full array. Candidates:
  xla        jnp.cumsum(x, axis=0)                      (current)
  twolevel   within-block cumsum (512 rows) + block-offset cumsum + add
  matmul     blocked lower-triangular matmul prefix (3-pass hi/lo split)
             + block-offset cumsum + add

Prints ms/call and max abs error vs a float64 oracle.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

ROWS, COLS, K = 475136, 9, 512


def xla_cumsum(x):
    return jnp.cumsum(x, axis=0)


def twolevel(x):
    nb = ROWS // K
    y = x.reshape(nb, K, COLS)
    within = jnp.cumsum(y, axis=1)
    offs = jnp.cumsum(within[:, -1, :], axis=0)
    offs = jnp.concatenate([jnp.zeros((1, COLS), x.dtype), offs[:-1]], 0)
    return (within + offs[:, None, :]).reshape(ROWS, COLS)


def matmul_prefix(x):
    nb = ROWS // K
    y = x.reshape(nb, K, COLS)
    row = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    tri = (col <= row).astype(jnp.float32)  # inclusive lower

    def trimm(v):
        return jnp.einsum(
            "rk,bkc->brc", tri, v, preferred_element_type=jnp.float32
        )

    _ob = jax.lax.optimization_barrier
    # 3-pass split on y (tri is 0/1 = exactly bf16): ~2^-25-class residual.
    # optimization_barrier on each piece: XLA's algebraic simplifier
    # otherwise refolds trimm(a)+trimm(b)+trimm(c) into one bf16-truncated
    # trimm(a+b+c) (measured: error jumps to the 1-pass class)
    h1 = _ob(y.astype(jnp.bfloat16).astype(jnp.float32))
    r1 = y - h1
    h2 = _ob(r1.astype(jnp.bfloat16).astype(jnp.float32))
    h3 = _ob(r1 - h2)
    within = trimm(h1) + trimm(h2) + trimm(h3)  # (nb, K, COLS)
    offs = jnp.cumsum(within[:, -1, :], axis=0)
    offs = jnp.concatenate([jnp.zeros((1, COLS), x.dtype), offs[:-1]], 0)
    return (within + offs[:, None, :]).reshape(ROWS, COLS)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(ROWS, COLS)).astype(np.float32))
    oracle = np.cumsum(np.asarray(x, np.float64), axis=0)
    def matmul_hp(x):
        nb = ROWS // K
        y = x.reshape(nb, K, COLS)
        row = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
        tri = (col <= row).astype(jnp.float32)
        within = jnp.einsum(
            "rk,bkc->brc", tri, y,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        offs = jnp.cumsum(within[:, -1, :], axis=0)
        offs = jnp.concatenate([jnp.zeros((1, COLS), x.dtype), offs[:-1]], 0)
        return (within + offs[:, None, :]).reshape(ROWS, COLS)

    for name, fn in (
        ("xla", xla_cumsum),
        ("twolevel", twolevel),
        ("matmul", matmul_prefix),
        ("matmul_hp", matmul_hp),
    ):
        f = jax.jit(fn)
        out = f(x)
        err = float(np.abs(np.asarray(out, np.float64) - oracle).max())
        float(jnp.sum(out))
        n = 30
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(x)
        float(jnp.sum(out))
        ms = (time.perf_counter() - t0) / n * 1000
        print(f"{name:10s} {ms:7.3f} ms   maxerr {err:.3e}")


if __name__ == "__main__":
    main()
