"""Quaternion / rotation / covariance math (pure jnp, batched).

Parity targets in the reference (/root/reference):
- utils/general_utils.py:84 build_rotation (quat -> R, real-first [w,x,y,z])
- utils/general_utils.py:110 build_scaling_rotation (L = R @ S)
- cuda_rasterizer/forward.cu:126 computeCov3D (Sigma = R S^2 R^T, 6-vec upper)
- utils/splats.py:7 to_full_cov, :27 extract_rot_scale (eigh -> quat+scale),
  :44 matrix_to_quaternion, :117 quaternion_to_matrix (PyTorch3D-style)

All functions are vectorized over a leading batch axis and jit-safe.
Quaternions here are real-first [w, x, y, z] (the Gaussian-attribute
convention). Camera extrinsic 7-vectors use a different layout, handled in
`camera_math`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """L2-normalize along `axis` (matches torch.nn.functional.normalize)."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """Real-first quaternion(s) [..., 4] -> rotation matrices [..., 3, 3].

    Does NOT normalize; callers normalize first (reference applies
    rotation_activation = L2 normalize before the kernel, and the kernel
    itself does not re-normalize: forward.cu:135).
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1
    )
    row1 = jnp.stack(
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1
    )
    row2 = jnp.stack(
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1
    )
    return jnp.stack([row0, row1, row2], -2)


def rotmat_to_quat(m: jax.Array) -> jax.Array:
    """Rotation matrices [..., 3, 3] -> real-first quaternions [..., 4].

    Branch-free PyTorch3D-style conversion (reference utils/splats.py:44):
    builds all four candidates and selects the best-conditioned one.
    """
    batch = m.shape[:-2]
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = jnp.moveaxis(
        m.reshape(batch + (9,)), -1, 0
    )

    def _sqrt_pos(x):
        return jnp.sqrt(jnp.maximum(x, 0.0))

    q_abs = _sqrt_pos(
        jnp.stack(
            [
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ],
            -1,
        )
    )
    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], -1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], -1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], -1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], -1),
        ],
        -2,
    )
    quat_candidates = quat_by_rijk / (2.0 * jnp.maximum(q_abs[..., None], 0.1))
    best = jnp.argmax(q_abs, axis=-1)
    return jnp.take_along_axis(
        quat_candidates, best[..., None, None].repeat(4, -1), axis=-2
    )[..., 0, :]


def build_scaling_rotation(s: jax.Array, q: jax.Array) -> jax.Array:
    """L = R @ diag(s): [..., 3] x [..., 4] -> [..., 3, 3].

    Reference: utils/general_utils.py:110 (R is built from normalized q).
    """
    r = quat_to_rotmat(normalize(q))
    return r * s[..., None, :]


def build_covariance(scaling: jax.Array, rotation: jax.Array) -> jax.Array:
    """Full 3x3 covariance Sigma = R S^2 R^T from scale + quaternion.

    Matches forward.cu:126-159 (which computes Sigma = M^T M with M = S R in
    glm column-major, i.e. R diag(s^2) R^T in row-major math) and
    gaussian_model.py:55-63.
    """
    length = build_scaling_rotation(scaling, rotation)
    return length @ jnp.swapaxes(length, -1, -2)


def strip_symmetric(cov: jax.Array) -> jax.Array:
    """[..., 3, 3] symmetric -> upper-triangle 6-vec [..., 6].

    Layout (xx, xy, xz, yy, yz, zz) = forward.cu:154-159.
    """
    return jnp.stack(
        [
            cov[..., 0, 0],
            cov[..., 0, 1],
            cov[..., 0, 2],
            cov[..., 1, 1],
            cov[..., 1, 2],
            cov[..., 2, 2],
        ],
        -1,
    )


def to_full_cov(cov6: jax.Array) -> jax.Array:
    """Upper-triangle 6-vec [..., 6] -> full symmetric [..., 3, 3].

    Reference: utils/splats.py:7.
    """
    a, b, c, d, e, f = (cov6[..., i] for i in range(6))
    row0 = jnp.stack([a, b, c], -1)
    row1 = jnp.stack([b, d, e], -1)
    row2 = jnp.stack([c, e, f], -1)
    return jnp.stack([row0, row1, row2], -2)


def extract_rot_scale(cov: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Eigendecompose covariances [..., 3, 3] -> (quat [...,4], scale [...,3]).

    Reference: utils/splats.py:27 — eigh with a 1e-8 diagonal jitter, sqrt
    eigenvalues (nan->1e-6), det-sign fix so the eigenvector matrix is a
    proper rotation, then matrix->quaternion.
    """
    jitter = jnp.eye(3, dtype=cov.dtype) * 1e-8
    eigval, eigvec = jnp.linalg.eigh(cov + jitter)
    scaling = jnp.nan_to_num(jnp.sqrt(jnp.maximum(eigval, 0.0)), nan=1e-6)
    det = jnp.linalg.det(eigvec)
    rot = rotmat_to_quat(eigvec * det[..., None, None])
    return normalize(rot), scaling


def cov6_from_scaling_rotation(scaling: jax.Array, rotation: jax.Array) -> jax.Array:
    """6-vec covariance straight from scale + quaternion.

    Algebraically strip_symmetric(build_covariance(...)) but written
    elementwise: batched (N,3,3) dot_generals and [..., i, j] slices lower
    to strided HBM traffic on TPU (~16 ms fwd+bwd at 300k splats measured);
    this form fuses into one vectorized pass over N.
    """
    q = normalize(rotation)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    s0 = scaling[..., 0] * scaling[..., 0]
    s1 = scaling[..., 1] * scaling[..., 1]
    s2 = scaling[..., 2] * scaling[..., 2]
    # Sigma_ab = sum_k s_k^2 R_ak R_bk  (Sigma = R S^2 R^T)
    xx = s0 * r00 * r00 + s1 * r01 * r01 + s2 * r02 * r02
    xy = s0 * r00 * r10 + s1 * r01 * r11 + s2 * r02 * r12
    xz = s0 * r00 * r20 + s1 * r01 * r21 + s2 * r02 * r22
    yy = s0 * r10 * r10 + s1 * r11 * r11 + s2 * r12 * r12
    yz = s0 * r10 * r20 + s1 * r11 * r21 + s2 * r12 * r22
    zz = s0 * r20 * r20 + s1 * r21 * r21 + s2 * r22 * r22
    return jnp.stack([xx, xy, xz, yy, yz, zz], -1)
