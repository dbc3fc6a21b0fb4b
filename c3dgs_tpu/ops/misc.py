"""Small math helpers mirrored from utils/general_utils.py."""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def inverse_sigmoid(x):
    """logit (utils/general_utils.py:19)."""
    xp = jnp if isinstance(x, jax.Array) else np
    return xp.log(x / (1 - x))


def get_expon_lr_func(
    lr_init: float,
    lr_final: float,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
    max_steps: int = 1000000,
):
    """Log-linear LR interpolation with an optional sine-delay warmup.

    Continuous analog of utils/general_utils.py:32-61; returned callable is
    jit-traceable (step may be a traced int array).
    """

    def helper(step):
        step = jnp.asarray(step, jnp.float32)
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1)
            )
        else:
            delay_rate = 1.0
        t = jnp.clip(step / max_steps, 0, 1)
        log_lerp = jnp.exp(
            math.log(max(lr_init, 1e-32)) * (1 - t) + math.log(max(lr_final, 1e-32)) * t
        )
        lr = delay_rate * log_lerp
        # reference returns 0 when step<0 or lr_init==lr_final==0
        zero = (step < 0) | ((lr_init == 0.0) & (lr_final == 0.0))
        return jnp.where(zero, 0.0, lr)

    return helper


def mean_knn_sq_dist(xyz: jax.Array, k: int = 3, chunk: int = 4096) -> jax.Array:
    """Mean squared distance to the k nearest neighbors of each point.

    TPU-native replacement for simple_knn's distCUDA2 (used only for scale
    init on raw point clouds, scene/gaussian_model.py:459): chunked exact
    pairwise distances via MXU matmuls — O(N^2/chunk) memory, fine for the
    <=1e6-point clouds this initializes.
    """
    n = xyz.shape[0]
    sq = jnp.sum(xyz * xyz, axis=1)

    pad = (-n) % chunk
    xyz_p = jnp.pad(xyz, ((0, pad), (0, 0)))
    sq_p = jnp.pad(sq, (0, pad), constant_values=jnp.inf)
    n_chunks = xyz_p.shape[0] // chunk

    def body(i, out):
        rows = jax.lax.dynamic_slice(xyz_p, (i * chunk, 0), (chunk, 3))
        rows_sq = jax.lax.dynamic_slice(sq_p, (i * chunk,), (chunk,))
        d = (
            rows_sq[:, None]
            + sq[None, :]
            - 2.0 * jnp.dot(rows, xyz.T, preferred_element_type=jnp.float32)
        )
        # exclude self-distance
        col = jax.lax.broadcasted_iota(jnp.int32, (chunk, n), 1)
        row = i * chunk + jax.lax.broadcasted_iota(jnp.int32, (chunk, n), 0)
        d = jnp.where(col == row, jnp.inf, d)
        neg_topk = jax.lax.top_k(-d, k)[0]
        mean_k = jnp.maximum(-neg_topk, 0.0).mean(axis=1)
        return jax.lax.dynamic_update_slice(out, mean_k, (i * chunk,))

    out = jnp.zeros(xyz_p.shape[0], xyz.dtype)
    out = jax.lax.fori_loop(0, n_chunks, body, out)
    return out[:n]


# exact pairwise kNN materializes a (chunk, N) block — past this point the
# block alone outgrows HBM (4096 x 5M f32 = 82 GB) and the Morton-window
# approximation takes over
# exact-path ceiling: the blockwise distance computation materializes a
# (4096, N) f32 operand — 16 GB of HBM is the binding constraint, not
# accuracy. 600k => 9.8 GB peak block; above it the Morton-window
# approximation takes over. (Was 1.5M, which OOMed at exactly 1.5M points
# with a 24 GB block — caught by tools/clamp_probe.py.)
EXACT_KNN_MAX_POINTS = 600_000


def mean_knn_sq_dist_large(
    xyz: jax.Array, k: int = 3, window: int = 32
) -> jax.Array:
    """Approximate k-NN mean squared distance for BIG clouds (> ~1.5M
    points): sort by Morton code, take each point's k nearest among its
    +-window neighbors in Morton order. Memory O(N * window); the locality
    of the Z-order curve makes the window candidates near-optimal for the
    scale-init use (the only consumer — the reference's exact 3-NN feeds
    log() for an initial scale, so small overestimates are harmless)."""
    from . import morton

    n = xyz.shape[0]
    xyz_np = np.asarray(xyz)
    order = morton.morton_order(xyz_np)
    inv = np.empty_like(order)
    inv[order] = np.arange(n)
    xs = jnp.asarray(xyz_np[order])

    sq = jnp.sum(xs * xs, axis=1)
    ds = []
    for off in range(1, window + 1):
        for sgn in (1, -1):
            shifted = jnp.roll(xs, sgn * off, axis=0)
            d = jnp.sum((xs - shifted) ** 2, axis=1)
            # roll wraps: the first/last `off` rows see far-away points —
            # harmless (still real points, only an overestimate candidate)
            ds.append(d)
    dmat = jnp.stack(ds, axis=1)  # (n, 2*window)
    neg_topk = jax.lax.top_k(-dmat, k)[0]
    mean_k = jnp.maximum(-neg_topk, 0.0).mean(axis=1)
    return mean_k[jnp.asarray(inv)]
