"""Camera math: the fork's FoV-radian intrinsics + quaternion extrinsics.

Conventions (all from the reference, kept exactly so datasets/checkpoints
interoperate):

- `intrinsic` is a 3x3 with the FULL FoV in radians at [0,0] (x) and [1,1]
  (y), and image W, H stuffed into [0,2], [1,2] (scene/cameras.py:39-41,
  scene/dataset_readers.py:103).
- `extrinsic_vector` is a 7-vector (qx, qy, qz, qw, tx, ty, tz) describing the
  world-to-camera transform; quat_to_mat / mat_to_quat at
  diff_gaussian_rasterization_no_camera/__init__.py:32-52.
- Projection: znear=0.01, zfar=100, z_sign=+1 (same file :19-30).

Unlike the reference (which builds transposed matrices for torch's row-vector
convention), everything here is plain column-vector math: `x_cam = E @ x_w`,
`x_clip = P @ x_cam`. Camera pose gradients come from jax.grad through
`extrinsic_to_mat` — replacing the ~110 lines of sympy-generated Jacobians in
the reference wrapper (:679-788).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

ZNEAR = 0.01
ZFAR = 100.0


def extrinsic_to_mat(ev: jax.Array) -> jax.Array:
    """7-vector (qx,qy,qz,qw,tx,ty,tz) -> 4x4 world-to-camera matrix.

    Mirrors quat_to_mat (…no_camera/__init__.py:32-40) *without* the final
    transpose (we use column-vector math). Note the reference's algebra:
    diagonal terms use 1 + 2*(a^2 - (x^2+y^2+z^2)) which equals the standard
    1 - 2*(b^2 + c^2) when the quaternion is unit-norm.
    """
    x, y, z, w, tx, ty, tz = (ev[i] for i in range(7))
    d2 = x * x + y * y + z * z
    r0 = jnp.stack([1.0 + 2.0 * (x * x - d2), 2.0 * (x * y - w * z), 2.0 * (x * z + w * y), tx])
    r1 = jnp.stack([2.0 * (x * y + w * z), 1.0 + 2.0 * (y * y - d2), 2.0 * (y * z - w * x), ty])
    r2 = jnp.stack([2.0 * (x * z - w * y), 2.0 * (y * z + w * x), 1.0 + 2.0 * (z * z - d2), tz])
    r3 = jnp.array([0.0, 0.0, 0.0, 1.0], dtype=ev.dtype)
    return jnp.stack([r0, r1, r2, r3])


def mat_to_extrinsic(m, normed: bool = True):
    """4x4 (or 3x4) world-to-camera matrix -> 7-vector.

    Functional match for mat_to_quat (scene/cameras.py:16-26) but computed
    with the branch-robust candidate method (utils/splats.py:44): the
    reference's trace formula divides by zero for 180-degree rotations.
    Works with numpy or jnp.
    """
    xp = jnp if isinstance(m, jax.Array) else __import__("numpy")
    from . import quat as quat_mod

    r = m[:3, :3]
    if xp is jnp:
        q = quat_mod.rotmat_to_quat(r)  # [w, x, y, z]
        w, x, y, z = q[0], q[1], q[2], q[3]
    else:
        import numpy as np

        q = np.asarray(quat_mod.rotmat_to_quat(jnp.asarray(r, jnp.float32)))
        w, x, y, z = (float(q[i]) for i in range(4))
    if normed:
        n = (x * x + y * y + z * z + w * w) ** 0.5
        x, y, z, w = x / n, y / n, z / n, w / n
    return xp.stack(
        [
            xp.asarray(v, dtype=m.dtype) if xp is not jnp else v
            for v in (x, y, z, w, m[0, 3], m[1, 3], m[2, 3])
        ]
    )


def projection_matrix(fovx: jax.Array, fovy: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Perspective projection (column-vector), znear .01 / zfar 100.

    getProjectionMatrix (…no_camera/__init__.py:19-30) without the transpose.
    """
    tan_half_x = jnp.tan(fovx / 2.0)
    tan_half_y = jnp.tan(fovy / 2.0)
    zero = jnp.zeros((), dtype)
    one = jnp.ones((), dtype)
    r0 = jnp.stack([1.0 / tan_half_x, zero, zero, zero])
    r1 = jnp.stack([zero, 1.0 / tan_half_y, zero, zero])
    r2 = jnp.stack(
        [zero, zero, one * ZFAR / (ZFAR - ZNEAR), -one * (ZFAR * ZNEAR) / (ZFAR - ZNEAR)]
    )
    r3 = jnp.stack([zero, zero, one, zero])
    return jnp.stack([r0, r1, r2, r3])


def camera_center_from_extrinsic(ev: jax.Array) -> jax.Array:
    """World-space camera position: inverse(W2C) translation = -R^T t.

    The reference computes extrinsic.inverse()[3, :3] on the transposed
    matrix (…no_camera/__init__.py:172); same quantity.
    """
    m = extrinsic_to_mat(ev)
    r = m[:3, :3]
    t = m[:3, 3]
    return -(r.T @ t)


def intrinsic_geometry(intrinsic) -> tuple[int, int, float, float, float, float]:
    """Static unpack: (W, H, tanfovx, tanfovy, focal_x, focal_y).

    Host-side helper (python floats/ints; intrinsic is a 3x3 numpy array):
    tanfov = tan(FoV/2) (…__init__.py:152-155), focal = S / (2*tanfov)
    (rasterize_points.cu).
    """
    import math

    width = int(intrinsic[0, 2])
    height = int(intrinsic[1, 2])
    tanfovx = math.tan(float(intrinsic[0, 0]) * 0.5)
    tanfovy = math.tan(float(intrinsic[1, 1]) * 0.5)
    focal_x = width / (2.0 * tanfovx)
    focal_y = height / (2.0 * tanfovy)
    return width, height, tanfovx, tanfovy, focal_x, focal_y


def ndc_to_pix(v: jax.Array, size: int) -> jax.Array:
    """NDC [-1,1] -> pixel coordinate (auxiliary.h ndc2Pix)."""
    return ((v + 1.0) * size - 1.0) * 0.5


def fov_to_focal(fov: float, pixels: int) -> float:
    import math

    return pixels / (2.0 * math.tan(fov / 2.0))


def focal_to_fov(focal: float, pixels: int) -> float:
    import math

    return 2.0 * math.atan(pixels / (2.0 * focal))
