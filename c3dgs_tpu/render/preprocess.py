"""Per-Gaussian preprocessing: cull, project, EWA 2D covariance, conic,
radius, tile rect, SH color — vectorized jnp over all N Gaussians at once.

This is the jnp re-design of preprocessCUDA (forward.cu:164-265) and its
helpers computeCov2D (:82-121) / computeCov3D (:126-160) / in_frustum
(auxiliary.h:139-166). One thread per Gaussian becomes one fused XLA map
over the N axis; culling becomes masking (radius 0 == culled, exactly the
reference's sentinel).

Everything here is differentiable; camera-pose gradients flow through
`extrinsic_to_mat` (replacing the reference's hand-written pose Jacobians,
…no_camera/__init__.py:679-788).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops import camera_math, sh
from .types import TILE_X, TILE_Y, RasterSettings


class Preprocessed(NamedTuple):
    """Per-Gaussian screen-space quantities (all length N)."""

    mean2d: jax.Array  # (N, 2) pixel coords
    depth: jax.Array  # (N,) view-space z
    conic: jax.Array  # (N, 3) inverse 2D covariance (a, b, c)
    color: jax.Array  # (N, 3) RGB
    opacity: jax.Array  # (N,)
    radius: jax.Array  # (N,) int32 pixel radius, 0 = culled
    tiles_touched: jax.Array  # (N,) int32
    rect_min: jax.Array  # (N, 2) int32 tile coords (x, y)
    rect_max: jax.Array  # (N, 2) int32 tile coords, exclusive


def compute_cov2d(
    mean3d: jax.Array,
    cov3d: jax.Array,
    viewmatrix: jax.Array,
    settings: RasterSettings,
) -> jax.Array:
    """EWA projection of 3D covariance to 2D (forward.cu:82-121).

    mean3d: (N,3) world; cov3d: (N,6) upper-tri; viewmatrix: (4,4) W2C.
    Returns (N,3) = (cov_xx, cov_xy, cov_yy) with the +0.3px low-pass.
    """
    r = viewmatrix[:3, :3]
    t3 = mean3d @ r.T + viewmatrix[:3, 3]
    limx = 1.3 * settings.tanfovx
    limy = 1.3 * settings.tanfovy
    # rows at (or behind) the camera plane are culled later, but 0/0 here
    # would poison gradients of every padded/inactive row (NaN via the VJP
    # of a division even under zero cotangent) — keep tz away from 0
    tz = t3[:, 2]
    tz = jnp.where(jnp.abs(tz) < 1e-6, 1e-6, tz)
    txtz = jnp.clip(t3[:, 0] / tz, -limx, limx) * tz
    tytz = jnp.clip(t3[:, 1] / tz, -limy, limy) * tz

    fx, fy = settings.focal_x, settings.focal_y
    # J = d(pix)/d(cam), 2x3 per splat (the reference carries a zero 3rd row)
    zero = jnp.zeros_like(tz)
    j00 = fx / tz
    j02 = -(fx * txtz) / (tz * tz)
    j11 = fy / tz
    j12 = -(fy * tytz) / (tz * tz)
    # T = J @ R_w2c  (2x3 per splat)
    jrow0 = jnp.stack([j00, zero, j02], -1)  # (N,3)
    jrow1 = jnp.stack([zero, j11, j12], -1)
    t0 = jrow0 @ r  # (N,3)
    t1 = jrow1 @ r

    c_xx, c_xy, c_xz, c_yy, c_yz, c_zz = (cov3d[:, i] for i in range(6))

    def quad(u, v):
        # u^T Vrk v for row vectors u, v (N,3)
        return (
            u[:, 0] * (c_xx * v[:, 0] + c_xy * v[:, 1] + c_xz * v[:, 2])
            + u[:, 1] * (c_xy * v[:, 0] + c_yy * v[:, 1] + c_yz * v[:, 2])
            + u[:, 2] * (c_xz * v[:, 0] + c_yz * v[:, 1] + c_zz * v[:, 2])
        )

    cov00 = quad(t0, t0) + 0.3
    cov01 = quad(t0, t1)
    cov11 = quad(t1, t1) + 0.3
    return jnp.stack([cov00, cov01, cov11], -1)


def preprocess(
    means3d: jax.Array,
    cov3d: jax.Array,
    opacity: jax.Array,
    extrinsic_vector: jax.Array,
    settings: RasterSettings,
    shs: Optional[jax.Array] = None,
    colors_precomp: Optional[jax.Array] = None,
) -> Preprocessed:
    """Full per-Gaussian preprocess (forward.cu:164-265).

    means3d (N,3), cov3d (N,6), opacity (N,), shs (N,K,3) or
    colors_precomp (N,3). Culled Gaussians get radius 0 / 0 tiles.
    """
    view = camera_math.extrinsic_to_mat(extrinsic_vector)
    proj = camera_math.projection_matrix(
        2.0 * jnp.arctan(jnp.float32(settings.tanfovx)),
        2.0 * jnp.arctan(jnp.float32(settings.tanfovy)),
    )
    full = proj @ view
    cam_pos = camera_math.camera_center_from_extrinsic(extrinsic_vector)

    # project
    ones = jnp.ones((means3d.shape[0], 1), means3d.dtype)
    hom = jnp.concatenate([means3d, ones], -1) @ full.T  # (N,4)
    p_w = 1.0 / (hom[:, 3] + 1e-7)
    p_proj = hom[:, :3] * p_w[:, None]
    p_view_z = means3d @ view[2, :3] + view[2, 3]

    in_front = p_view_z > 0.01  # in_frustum near cull (auxiliary.h:156)

    cov2d = compute_cov2d(means3d, cov3d, view, settings)
    det = cov2d[:, 0] * cov2d[:, 2] - cov2d[:, 1] * cov2d[:, 1]
    det_ok = det != 0.0
    det_inv = 1.0 / jnp.where(det_ok, det, 1.0)
    conic = jnp.stack(
        [cov2d[:, 2] * det_inv, -cov2d[:, 1] * det_inv, cov2d[:, 0] * det_inv], -1
    )

    mid = 0.5 * (cov2d[:, 0] + cov2d[:, 2])
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda1 = mid + disc
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, mid - disc)))

    mean2d = jnp.stack(
        [
            camera_math.ndc_to_pix(p_proj[:, 0], settings.width),
            camera_math.ndc_to_pix(p_proj[:, 1], settings.height),
        ],
        -1,
    )

    # Tile rect. The reference uses the circumscribed circle of the 3-sigma
    # ellipse (getRect with radius 3*sqrt(lambda_max)); here the rect is the
    # ellipse's exact axis-aligned bbox, further tightened to the
    # alpha >= 1/255 support: c = min(3, sqrt(2 ln(255*opacity))). Pixels
    # outside either bound are skipped by renderCUDA's own alpha cut
    # (forward.cu:352-354), so this produces IDENTICAL images with far
    # fewer (gaussian, tile) instances — low-opacity splats shrink a lot.
    c_op = jnp.sqrt(2.0 * jnp.log(jnp.maximum(255.0 * opacity, 1.0 + 1e-6)))
    invisible = opacity * 255.0 <= 1.0  # can never pass the alpha cut
    # c_op >= 3: the 3-sigma truncation dominates — use the reference's
    # circle rect bit-for-bit. c_op < 3: the alpha cut dominates and the
    # tight bbox is provably output-identical.
    tight = c_op < 3.0
    half_x = jnp.where(
        tight,
        jnp.ceil(c_op * jnp.sqrt(jnp.maximum(cov2d[:, 0], 0.0))),
        radius_f,
    )
    half_y = jnp.where(
        tight,
        jnp.ceil(c_op * jnp.sqrt(jnp.maximum(cov2d[:, 2], 0.0))),
        radius_f,
    )

    tx, ty = settings.tiles_x, settings.tiles_y
    rect_min = jnp.stack(
        [
            jnp.clip(((mean2d[:, 0] - half_x) / TILE_X).astype(jnp.int32), 0, tx),
            jnp.clip(((mean2d[:, 1] - half_y) / TILE_Y).astype(jnp.int32), 0, ty),
        ],
        -1,
    )
    rect_max = jnp.stack(
        [
            jnp.clip(
                ((mean2d[:, 0] + half_x + TILE_X - 1) / TILE_X).astype(jnp.int32),
                0,
                tx,
            ),
            jnp.clip(
                ((mean2d[:, 1] + half_y + TILE_Y - 1) / TILE_Y).astype(jnp.int32),
                0,
                ty,
            ),
        ],
        -1,
    )
    rect_w = rect_max[:, 0] - rect_min[:, 0]
    rect_h = rect_max[:, 1] - rect_min[:, 1]
    tiles = rect_w * rect_h

    alive = in_front & det_ok & (tiles > 0) & ~invisible

    if colors_precomp is not None:
        color = colors_precomp
    else:
        dirs = means3d - cam_pos
        # rsqrt(sumsq + eps) instead of /norm: a splat exactly at the camera
        # position (padded rows) must not emit NaN primals/grads
        dirs = dirs * jax.lax.rsqrt(
            jnp.sum(dirs * dirs, axis=-1, keepdims=True) + 1e-20
        )
        color = sh.sh_to_rgb(
            settings.sh_degree, shs, dirs, clamp_color=settings.clamp_color
        )

    radius = jnp.where(alive, radius_f, 0.0).astype(jnp.int32)
    tiles_touched = jnp.where(alive, tiles, 0).astype(jnp.int32)

    return Preprocessed(
        mean2d=mean2d,
        depth=p_view_z,
        conic=conic,
        color=color,
        opacity=opacity,
        radius=radius,
        tiles_touched=tiles_touched,
        rect_min=rect_min,
        rect_max=rect_max,
    )
