"""LPIPS perceptual metric — Flax/jnp re-implementation of lpipsPyTorch/
(modules/lpips.py:8-36, modules/networks.py:12-20: VGG16 feature slices,
per-layer 1x1 linear heads on unit-normalized activations, ImageNet scaling).

Pretrained weights cannot be downloaded in this zero-egress environment
(the reference pulls torchvision VGG16 + the official LPIPS heads at
runtime, modules/utils.py:11). This module therefore:
- computes LPIPS exactly when given a weights file (`weights_npz`) produced
  by `convert_torch_weights` on a machine that has them;
- raises a clear error otherwise (callers gate on `available()`).

The network math is self-contained (conv/relu/maxpool in jnp), so converted
weights reproduce the reference metric without torch at eval time.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 feature-extractor structure: (out_channels, n_convs) per block;
# LPIPS taps activations after the ReLU of each block (networks.py VGG16
# slices at indices 4, 9, 16, 23, 30).
VGG_BLOCKS = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]

# AlexNet feature extractor (networks.py:12-20 AlexNet slices at indices
# 1, 4, 7, 9, 11 of torchvision alexnet.features): per conv
# (out_channels, kernel, stride, padding, maxpool_after_tap) — LPIPS taps
# after every ReLU; maxpool(3, stride 2) sits between taps 1-2 and 2-3.
ALEX_CONVS = [
    (64, 11, 4, 2, True),
    (192, 5, 1, 2, True),
    (384, 3, 1, 1, False),
    (256, 3, 1, 1, False),
    (256, 3, 1, 1, False),
]

# ImageNet normalization used by lpipsPyTorch (modules/lpips.py scaling
# layer): shift/scale on [-1,1]-scaled inputs
SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
SCALE = np.array([0.458, 0.448, 0.450], np.float32)

_WEIGHTS_DIR = os.path.join(os.path.dirname(__file__), "weights")
DEFAULT_WEIGHTS = os.path.join(_WEIGHTS_DIR, "lpips_vgg.npz")


def default_weights(net_type: str = "vgg") -> str:
    return os.path.join(_WEIGHTS_DIR, f"lpips_{net_type}.npz")


def available(
    weights_npz: Optional[str] = None, net_type: str = "vgg"
) -> bool:
    return os.path.exists(weights_npz or default_weights(net_type))


# machine-readable reason attached next to every null LPIPS in
# results.json / per_view.json (the reference protocol always reports
# LPIPS, metrics.py:72-79; only the pretrained weights are egress-gated)
UNAVAILABLE_REASON = "weights unavailable (zero egress)"


def unavailable_hint(net_type: str = "vgg") -> str:
    """One-line operator instruction for enabling LPIPS."""
    return (
        f"LPIPS ({net_type}) skipped: {UNAVAILABLE_REASON}. Enable it by "
        "running, on a machine with network access, "
        f"c3dgs_tpu.eval.lpips.convert_torch_weights(net_type={net_type!r}) "
        f"and copying the npz to {default_weights(net_type)}"
    )


def convert_torch_weights(
    out_npz: Optional[str] = None, net_type: str = "vgg"
) -> None:
    """One-time conversion: torchvision VGG16/AlexNet + LPIPS linear heads
    -> npz. Requires torchvision + network access (run outside this
    environment). net_type: 'vgg' | 'alex' (networks.py:12-20; the
    reference's SqueezeNet variant is not ported)."""
    import torch
    import torchvision

    out_npz = out_npz or default_weights(net_type)
    if net_type == "vgg":
        feats = torchvision.models.vgg16(weights="IMAGENET1K_V1").features
    elif net_type == "alex":
        feats = torchvision.models.alexnet(weights="IMAGENET1K_V1").features
    else:
        raise ValueError(f"unsupported net_type {net_type!r}")
    state: Dict[str, np.ndarray] = {}
    conv_idx = 0
    for layer in feats:
        if isinstance(layer, torch.nn.Conv2d):
            state[f"conv{conv_idx}/kernel"] = layer.weight.detach().numpy()
            state[f"conv{conv_idx}/bias"] = layer.bias.detach().numpy()
            conv_idx += 1
    url = (
        "https://raw.githubusercontent.com/richzhang/PerceptualSimilarity/"
        f"master/lpips/weights/v0.1/{net_type}.pth"
    )
    lin = torch.hub.load_state_dict_from_url(url, progress=False)
    for i in range(5):
        state[f"lin{i}/kernel"] = lin[f"lin{i}.model.1.weight"].numpy()
    os.makedirs(os.path.dirname(out_npz), exist_ok=True)
    np.savez(out_npz, **state)


def _load_weights(path: str):
    data = np.load(path)
    return {k: jnp.asarray(data[k]) for k in data.files}


def _scaling_layer(x: jax.Array) -> jax.Array:
    # reference scales to [-1,1] then normalizes (ScalingLayer)
    x = x * 2.0 - 1.0
    return (x - jnp.asarray(SHIFT)[None, :, None, None]) / jnp.asarray(
        SCALE
    )[None, :, None, None]


def _vgg_features(params, x: jax.Array) -> List[jax.Array]:
    """x: (B,3,H,W) in [0,1]. Returns the 5 tapped activations."""
    x = _scaling_layer(x)
    feats = []
    conv_idx = 0
    h = x
    for block, (_, n_convs) in enumerate(VGG_BLOCKS):
        for _ in range(n_convs):
            w = params[f"conv{conv_idx}/kernel"]
            b = params[f"conv{conv_idx}/bias"]
            h = jax.lax.conv_general_dilated(
                h, w, (1, 1), "SAME", dimension_numbers=("NCHW", "OIHW", "NCHW")
            ) + b[None, :, None, None]
            h = jax.nn.relu(h)
            conv_idx += 1
        feats.append(h)
        if block < len(VGG_BLOCKS) - 1:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
            )
    return feats


def _alex_features(params, x: jax.Array) -> List[jax.Array]:
    """AlexNet taps (networks.py AlexNet slices): after each of the 5
    ReLUs, maxpool(3, stride 2) between taps 1-2 and 2-3."""
    h = _scaling_layer(x)
    feats = []
    for i, (_, k, stride, pad, pool_after) in enumerate(ALEX_CONVS):
        w = params[f"conv{i}/kernel"]
        b = params[f"conv{i}/bias"]
        h = jax.lax.conv_general_dilated(
            h,
            w,
            (stride, stride),
            [(pad, pad), (pad, pad)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ) + b[None, :, None, None]
        h = jax.nn.relu(h)
        feats.append(h)
        if pool_after:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2), "VALID"
            )
    return feats


_FEATURES = {"vgg": _vgg_features, "alex": _alex_features}


def _unit_normalize(f: jax.Array) -> jax.Array:
    return f * jax.lax.rsqrt(jnp.sum(f * f, axis=1, keepdims=True) + 1e-10)


class LPIPS:
    """Callable LPIPS(img1, img2) on CHW or BCHW images in [0,1].

    net_type: 'vgg' (default, the reference's quality-protocol backbone)
    or 'alex' (networks.py:12-20 parity)."""

    def __init__(
        self, weights_npz: Optional[str] = None, net_type: str = "vgg"
    ):
        path = weights_npz or default_weights(net_type)
        if net_type not in _FEATURES:
            raise ValueError(f"unsupported net_type {net_type!r}")
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"LPIPS weights not found at {path}; run "
                "c3dgs_tpu.eval.lpips.convert_torch_weights(net_type="
                f"{net_type!r}) on a machine with torchvision + network "
                "access."
            )
        self.params = _load_weights(path)
        self._features = _FEATURES[net_type]
        self._fn = jax.jit(self._lpips)

    def _lpips(self, x, y):
        fx = self._features(self.params, x)
        fy = self._features(self.params, y)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            d = (_unit_normalize(a) - _unit_normalize(b)) ** 2
            w = self.params[f"lin{i}/kernel"].reshape(-1)  # (C,)
            lin = jnp.sum(d * w[None, :, None, None], axis=1)
            total = total + lin.mean(axis=(1, 2))
        return total

    def __call__(self, img1: jax.Array, img2: jax.Array) -> jax.Array:
        if img1.ndim == 3:
            img1, img2 = img1[None], img2[None]
        return self._fn(img1, img2).mean()
