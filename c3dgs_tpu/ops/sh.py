"""Spherical-harmonics color evaluation (degrees 0..3), vectorized jnp.

Parity targets: utils/sh_utils.py:57 eval_sh / :114 RGB2SH / :117 SH2RGB and
the in-kernel evaluation cuda_rasterizer/forward.cu:20-79 (computeColorFromSH:
adds +0.5, optionally clamps at 0 and records the clamp mask for backward —
in this rebuild the clamp is a plain `maximum`, so jax.grad produces the same
masked gradient automatically).

SH coefficient layout: [..., K, 3] with K = (deg+1)^2, DC first (row-major
band order identical to the reference).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)

MAX_DEGREE = 3


def num_coeffs(degree: int) -> int:
    return (degree + 1) ** 2


def eval_sh(deg: int, sh: jax.Array, dirs: jax.Array) -> jax.Array:
    """Evaluate SH at unit directions. sh: [..., K, 3], dirs: [..., 3].

    `deg` is a static Python int (the active SH degree); only the first
    (deg+1)^2 coefficients are read. Matches utils/sh_utils.py:57 and the
    CUDA band polynomials (forward.cu:30-59).
    """
    assert 0 <= deg <= MAX_DEGREE
    result = C0 * sh[..., 0, :]
    if deg > 0:
        x = dirs[..., 0:1]
        y = dirs[..., 1:2]
        z = dirs[..., 2:3]
        result = (
            result
            - C1 * y * sh[..., 1, :]
            + C1 * z * sh[..., 2, :]
            - C1 * x * sh[..., 3, :]
        )
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (
                result
                + C2[0] * xy * sh[..., 4, :]
                + C2[1] * yz * sh[..., 5, :]
                + C2[2] * (2.0 * zz - xx - yy) * sh[..., 6, :]
                + C2[3] * xz * sh[..., 7, :]
                + C2[4] * (xx - yy) * sh[..., 8, :]
            )
            if deg > 2:
                result = (
                    result
                    + C3[0] * y * (3.0 * xx - yy) * sh[..., 9, :]
                    + C3[1] * xy * z * sh[..., 10, :]
                    + C3[2] * y * (4.0 * zz - xx - yy) * sh[..., 11, :]
                    + C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy) * sh[..., 12, :]
                    + C3[4] * x * (4.0 * zz - xx - yy) * sh[..., 13, :]
                    + C3[5] * z * (xx - yy) * sh[..., 14, :]
                    + C3[6] * x * (xx - 3.0 * yy) * sh[..., 15, :]
                )
    return result


def sh_to_rgb(
    deg: int, sh: jax.Array, dirs: jax.Array, clamp_color: bool = True
) -> jax.Array:
    """SH -> RGB as the rasterizer does: eval + 0.5, optional clamp at 0.

    forward.cu:63-78. With clamp_color=False values pass through unclamped
    (used by sensitivity computation, compress.py:102).
    """
    rgb = eval_sh(deg, sh, dirs) + 0.5
    if clamp_color:
        rgb = jnp.maximum(rgb, 0.0)
    return rgb


def sh_to_rgb_indexed_blocked(
    deg: int,
    codebook: jax.Array,
    indices: jax.Array,
    dirs: jax.Array,
    clamp_color: bool = True,
    block: int = 1 << 18,
) -> jax.Array:
    """Per-splat RGB for a codebook-indexed scene WITHOUT materializing the
    dense (P, K, 3) SH array.

    The reference's indexed preprocess gathers SH from the codebook inside
    the kernel (forward_indexed.cu:226); de-indexing through the model
    accessor instead materializes ~960 MB of dense SH at 5M splats before
    staging. Here a lax.map over fixed blocks gathers (block, K, 3) rows,
    evaluates the band polynomials, and keeps only the (P, 3) colors — peak
    intermediate = block*K*3 floats (~50 MB at the default block), total
    HBM traffic unchanged (each codebook row read once per splat).

    codebook: (C, K, 3); indices: (P,) int32; dirs: (P, 3) unit.
    """
    p = indices.shape[0]
    if p <= block:
        rows = jax.lax.optimization_barrier(codebook[indices])
        return sh_to_rgb(deg, rows, dirs, clamp_color)
    nb = -(-p // block)
    pad = nb * block - p
    idx = jnp.concatenate([indices, jnp.zeros((pad,), indices.dtype)])
    dr = jnp.concatenate([dirs, jnp.zeros((pad, 3), dirs.dtype)])

    def blk(args):
        i, d = args
        rows = jax.lax.optimization_barrier(codebook[i])  # (block, K, 3)
        return sh_to_rgb(deg, rows, d, clamp_color)

    out = jax.lax.map(
        blk, (idx.reshape(nb, block), dr.reshape(nb, block, 3))
    )
    return out.reshape(nb * block, 3)[:p]


def rgb_to_sh_dc(rgb: jax.Array) -> jax.Array:
    """RGB in [0,1] -> DC SH coefficient (utils/sh_utils.py:114)."""
    return (rgb - 0.5) / C0


def sh_dc_to_rgb(dc: jax.Array) -> jax.Array:
    """DC SH coefficient -> RGB (utils/sh_utils.py:117)."""
    return dc * C0 + 0.5
