"""Morton (Z-order) encoding for serialization-time reordering.

Parity: scene/gaussian_model.py:997-1023 (_sort_morton), :1417-1431
(splitBy3/mortonEncode): positions are quantized to 21 bits per axis, the
axes are permuted by ascending extent (argsort of the bbox diagonal), and
the interleaved 63-bit code is sorted ascending.

This runs on the host at save time (numpy int64) — reordering for npz
compressibility is IO work, not device work, so it deliberately stays off
the TPU (JAX's default int32 world is wrong for 63-bit codes anyway).
"""
from __future__ import annotations

import numpy as np


def _split_by_3(a: np.ndarray) -> np.ndarray:
    x = a.astype(np.int64) & 0x1FFFFF  # first 21 bits
    x = (x | x << 32) & 0x1F00000000FFFF
    x = (x | x << 16) & 0x1F0000FF0000FF
    x = (x | x << 8) & 0x100F00F00F00F00F
    x = (x | x << 4) & 0x10C30C30C30C30C3
    x = (x | x << 2) & 0x1249249249249249
    return x


def morton_encode(pos_q: np.ndarray, ordering=(0, 1, 2)) -> np.ndarray:
    """Interleave 21-bit integer coords [N, 3] -> int64 Morton codes [N]."""
    x = pos_q[:, ordering[0]]
    y = pos_q[:, ordering[1]]
    z = pos_q[:, ordering[2]]
    return _split_by_3(x) | (_split_by_3(y) << 1) | (_split_by_3(z) << 2)


def morton_order(xyz: np.ndarray) -> np.ndarray:
    """Permutation that sorts points in Morton order.

    Quantization + extent-argsort axis ordering per
    scene/gaussian_model.py:999-1003.
    """
    xyz = np.asarray(xyz, dtype=np.float64)
    pp_min = xyz.min(axis=0)
    pp_diap = xyz.max(axis=0) - pp_min
    denom = np.where(pp_diap > 0, pp_diap, 1.0)
    xyz_q = ((2**21 - 1) * (xyz - pp_min) / denom).astype(np.int64)
    ordering = np.argsort(pp_diap)
    codes = morton_encode(xyz_q, tuple(int(i) for i in ordering))
    return np.argsort(codes, kind="stable")
