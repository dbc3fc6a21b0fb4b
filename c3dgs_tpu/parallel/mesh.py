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
    n = len(devices) if devices is not None else jax.device_count()
    if dp is None and tiles is None:
        dp, tiles = 1, n
    elif dp is None:
        dp = n // tiles
    elif tiles is None:
        tiles = n // dp
    assert dp * tiles == n, f"{dp}x{tiles} != {n} devices"
    if devices is not None:
        arr = np.asarray(list(devices)).reshape(dp, tiles)
        return Mesh(arr, ("dp", "tiles"))
    from jax.experimental import mesh_utils

    nproc = jax.process_count()
    if nproc > 1 and dp % nproc == 0:
        # multi-host: the dp axis spans hosts so its grad psum rides DCN,
        # while the bandwidth-hungry tiles all_gather stays on ICI
        arr = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(dp // nproc, tiles),
            dcn_mesh_shape=(nproc, 1),
            # granule = host process: the dp axis crosses PROCESS boundaries
            # (DCN / cross-host transport), tiles stays process-local (ICI).
            # slice_index-granules would be equivalent on one-process-per-
            # slice deployments and do not exist on CPU at all (the
            # 2-process exercise in tools/dcn_probe.py runs on CPU+gloo).
            process_is_granule=True,
        )
    else:
        # single host: let jax pick the ICI-topology-friendly assignment
        arr = mesh_utils.create_device_mesh((dp, tiles))
    return Mesh(arr, ("dp", "tiles"))
