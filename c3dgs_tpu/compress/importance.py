"""Sensitivity (importance) computation: per-view |grad| accumulation of the
photometric loss w.r.t. SH features and the de-scaled covariance.

Parity: compress.py calc_importance_experimental (:81-119) =
GaussianModel.calc_importance (gaussian_model.py:912-952): render each
camera with an explicitly de-scaled cov3d (cov3d_scaled / scaling_factor^2,
made a differentiated input, then re-multiplied inside), backprop either
image.sum() or the L1+0.2*(1-SSIM) loss against GT, accumulate |grads| of
features_dc/features_rest/cov3d, normalize by total pixels.

TPU shape: one jitted value_and_grad per camera, accumulated in a device
buffer; cameras stream through (the image is the only host transfer).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.gaussians import GaussianScene
from ..ops import losses as L
from ..render.rasterizer import render
from ..render.types import RasterSettings
from ..train.trainer import settings_with_degree


@functools.partial(jax.jit, static_argnums=(3, 4))
def _importance_step(
    scene: GaussianScene,
    extrinsic_vector: jax.Array,
    gt_image: Optional[jax.Array],
    settings: RasterSettings,
    use_gt: bool,
):
    """|grad| of one view w.r.t. (features_dc, features_rest, cov3d/coeff)."""
    coeff = scene.get_scaling_factor() ** 2  # (P,1)
    cov3d_descaled = jax.lax.stop_gradient(scene.get_covariance() / coeff)

    def loss_fn(features_dc, features_rest, cov3d):
        s = scene.replace(features_dc=features_dc, features_rest=features_rest)
        out = render(
            s.get_xyz(),
            cov3d * coeff,
            s.get_opacity()[:, 0],
            extrinsic_vector,
            settings_with_degree(settings, s.active_sh_degree),
            jnp.zeros(3),
            shs=s.get_features(),
        )
        image = out["render"]
        if use_gt:
            # compress.py:104-108
            lambda_dssim = 0.2
            loss = (1.0 - lambda_dssim) * L.l1_loss(image, gt_image) + (
                lambda_dssim
            ) * (1.0 - L.ssim(image, gt_image))
        else:
            loss = image.sum()
        return loss, out

    def loss_with_stats(features_dc, features_rest, cov3d):
        loss, out = loss_fn(features_dc, features_rest, cov3d)
        return loss, (out["num_instances"], out["overflow"])

    (_, stats), (g_dc, g_rest, g_cov) = jax.value_and_grad(
        loss_with_stats, argnums=(0, 1, 2), has_aux=True
    )(scene.features_dc, scene.features_rest, cov3d_descaled)
    return jnp.abs(g_dc), jnp.abs(g_rest), jnp.abs(g_cov), stats


def calc_importance(
    scene: GaussianScene,
    cameras,
    use_gt: bool = True,
    render_settings_fn=None,
) -> Tuple[jax.Array, jax.Array]:
    """Accumulate over cameras -> (color_importance (P, K*3),
    gaussian_sensitivity (P, 6)), both /num_pixels (compress.py:111-119).

    `cameras` yields objects with .extrinsic_vector/.intrinsic and
    (when use_gt) .original_image. Indexed scenes are allowed: grads land on
    codebook rows, matching the reference's indexed importance.
    """
    import dataclasses

    from ..render.capacity import CapacityPolicy
    from ..render.types import settings_from_intrinsic

    accum_dc = jnp.zeros_like(scene.features_dc)
    accum_rest = jnp.zeros_like(scene.features_rest)
    accum_cov = None
    num_pixels = 0
    policy = CapacityPolicy()
    for cam in cameras:
        settings = (
            render_settings_fn(cam) if render_settings_fn else settings_from_intrinsic(cam.intrinsic)
        )
        # sensitivity path disables color clamping (compress.py:102,
        # render(..., clamp_color=False))
        settings = dataclasses.replace(settings, clamp_color=False)
        gt = (
            jnp.asarray(cam.original_image) if use_gt else None
        )
        # overflow-free: dropped instances would silently skew sensitivities
        for _ in range(8):
            g_dc, g_rest, g_cov, stats = _importance_step(
                scene,
                jnp.asarray(cam.extrinsic_vector),
                gt,
                policy.apply(settings),
                use_gt,
            )
            if not policy.update(int(stats[0]), int(stats[1])):
                break
        accum_dc = accum_dc + g_dc
        accum_rest = accum_rest + g_rest
        accum_cov = g_cov if accum_cov is None else accum_cov + g_cov
        num_pixels += settings.width * settings.height

    color_importance = jnp.concatenate([accum_dc, accum_rest], axis=1)
    color_importance = color_importance.reshape(color_importance.shape[0], -1)
    return color_importance / num_pixels, accum_cov / num_pixels
