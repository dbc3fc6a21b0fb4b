"""Losses & image metrics: L1/L2, windowed SSIM, PSNR (pure jnp).

Parity: utils/loss_utils.py (11x11 gaussian-window SSIM, sigma=1.5,
C1=0.01^2, C2=0.03^2, same-padding) and utils/image_utils.py (mse/psnr).

Images are CHW float arrays in [0,1] (the reference's layout), optionally
with a leading batch axis.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.abs(pred - target).mean()


def l2_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return ((pred - target) ** 2).mean()


def mse(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Per-image MSE, flattened like utils/image_utils.py:14."""
    diff = (pred - target) ** 2
    return diff.reshape(diff.shape[0], -1).mean(1, keepdims=True)


def psnr(pred: jax.Array, target: jax.Array) -> jax.Array:
    """PSNR in dB per image (utils/image_utils.py:17), inputs CHW or BCHW."""
    if pred.ndim == 3:
        pred, target = pred[None], target[None]
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse(pred, target)))


@functools.lru_cache(maxsize=4)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    xs = np.arange(window_size, dtype=np.float64)
    gauss = np.exp(-((xs - window_size // 2) ** 2) / (2.0 * sigma**2))
    gauss = gauss / gauss.sum()
    w2d = np.outer(gauss, gauss)
    return w2d.astype(np.float32)


def _depthwise_conv_same(img: jax.Array, window: jax.Array) -> jax.Array:
    """Per-channel 2D conv with same padding. img: [B, C, H, W].

    HIGHEST precision is required: the TPU convolution unit truncates f32
    operands to bf16 per pass, and SSIM's variance terms
    (conv(img^2) - mu^2) cancel catastrophically — measured SSIM error of
    ~0.15 absolute on real renders at default precision. The 11x11 conv is
    a negligible share of a training step, so exactness is free."""
    c = img.shape[1]
    kernel = jnp.broadcast_to(window, (c, 1) + window.shape)
    return jax.lax.conv_general_dilated(
        img,
        kernel,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )


def ssim(
    img1: jax.Array,
    img2: jax.Array,
    window_size: int = 11,
    size_average: bool = True,
) -> jax.Array:
    """Structural similarity, matching utils/loss_utils.py:33-63.

    Accepts CHW or BCHW. NOTE: the reference uses zero ('same') padding, so
    border windows see implicit zeros — reproduced here via padding='SAME'.
    """
    if img1.ndim == 3:
        img1, img2 = img1[None], img2[None]
    window = jnp.asarray(_gaussian_window(window_size, 1.5))

    mu1 = _depthwise_conv_same(img1, window)
    mu2 = _depthwise_conv_same(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2

    sigma1_sq = _depthwise_conv_same(img1 * img1, window) - mu1_sq
    sigma2_sq = _depthwise_conv_same(img2 * img2, window) - mu2_sq
    sigma12 = _depthwise_conv_same(img1 * img2, window) - mu1_mu2

    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    if size_average is None:  # raw (B,C,H,W) map (sharded slab loss)
        return ssim_map
    if size_average:
        return ssim_map.mean()
    return ssim_map.mean(axis=(1, 2, 3))


def photometric_loss(
    pred: jax.Array, target: jax.Array, lambda_dssim: float = 0.2
) -> jax.Array:
    """The training objective: (1-λ)·L1 + λ·(1-SSIM) (train.py:76-79)."""
    return (1.0 - lambda_dssim) * l1_loss(pred, target) + lambda_dssim * (
        1.0 - ssim(pred, target)
    )
