"""Device mesh construction for multi-chip / multi-host runs.

The reference is strictly single-GPU (SURVEY.md §2.4); this layer is new
capability. Axis conventions:

- "dp"    — data parallel over cameras (each dp row trains a different view;
            parameter gradients are psum'd across it, riding DCN between
            hosts when the dp axis spans hosts);
- "tiles" — the workload's sequence-parallel analog: the render tile grid is
            sharded across this axis (each device composites a slice of the
            image), Gaussians replicated; keeps collectives on ICI.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    dp: Optional[int] = None,
    tiles: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None and tiles is None:
        dp, tiles = 1, n
    elif dp is None:
        dp = n // tiles
    elif tiles is None:
        tiles = n // dp
    assert dp * tiles == n, f"{dp}x{tiles} != {n} devices"
    arr = np.asarray(devices).reshape(dp, tiles)
    return Mesh(arr, ("dp", "tiles"))
