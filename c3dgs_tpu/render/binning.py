"""Fixed-shape tile binning: the XLA re-design of the reference's dynamic
duplicateWithKeys → CUB radix sort → identifyTileRanges pipeline
(rasterizer_impl.cu:70-138, 275-316).

Differences forced/afforded by TPU+XLA:
- static instance capacity instead of a device→host num_rendered readback
  (rasterizer_impl.cu:279): overflow is *counted* and returned as a
  diagnostic instead of reallocating;
- per-gaussian tile fanout capped by a static `max_tiles_per_gaussian`
  (clipped tiles are counted too);
- `jax.lax.sort` over (tile, depth) key pairs replaces the radix sort
  (both stable, so equal-depth ordering matches);
- each tile's segment of the sorted instance list is padded to a multiple of
  CHUNK (the Pallas kernel's gaussian batch), so every kernel DMA — forward
  reads and backward grad writes — is tile-aligned and race-free.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .preprocess import Preprocessed
from .types import RasterSettings

CHUNK = 128  # gaussians per kernel inner step; also the segment alignment
NUM_FIELDS = 16  # instance field rows (9 used, padded for lane alignment)


class Binning(NamedTuple):
    """Sorted, tile-segmented instance list (all shapes static)."""

    gaussian_id: jax.Array  # (K,) int32 source gaussian per instance
    instance_valid: jax.Array  # (K,) bool (False for segment padding)
    tile_starts: jax.Array  # (T,) int32 offset of each tile's segment
    tile_counts: jax.Array  # (T,) int32 padded count (multiple of CHUNK)
    num_instances: jax.Array  # () int32 true emitted instances
    overflow: jax.Array  # () int32 instances dropped (capacity)
    clipped: jax.Array  # () int32 tiles dropped (per-gaussian cap)


def bin_gaussians(
    prep: Preprocessed, settings: RasterSettings
) -> Binning:
    """Build the per-tile depth-sorted instance list."""
    n = prep.depth.shape[0]
    cap, max_tiles = settings.resolve_caps(n)
    num_tiles = settings.num_tiles
    tiles_x = settings.tiles_x
    k_pad = cap + num_tiles * CHUNK

    tiles_touched = prep.tiles_touched
    emit = jnp.minimum(tiles_touched, max_tiles)
    clipped = jnp.sum(tiles_touched - emit)
    offsets = jnp.cumsum(emit) - emit  # exclusive
    total = offsets[-1] + emit[-1]
    overflow = jnp.maximum(total - cap, 0)

    rect_w = prep.rect_max[:, 0] - prep.rect_min[:, 0]
    gauss_idx = jnp.arange(n, dtype=jnp.int32)

    # scatter pass j = 0..max_tiles-1: instance (g, j) -> slot offsets[g]+j
    sentinel = jnp.int32(num_tiles)
    init_tile = jnp.full((cap,), sentinel, jnp.int32)
    init_depth = jnp.full((cap,), jnp.inf, jnp.float32)
    init_gid = jnp.zeros((cap,), jnp.int32)

    def body(j, carry):
        tile_k, depth_k, gid_k = carry
        valid = j < emit
        ty = prep.rect_min[:, 1] + jnp.where(rect_w > 0, j // rect_w, 0)
        tx = prep.rect_min[:, 0] + jnp.where(rect_w > 0, j % rect_w, 0)
        tile_id = ty * tiles_x + tx
        slot = jnp.where(valid, offsets + j, cap)  # cap => dropped
        tile_k = tile_k.at[slot].set(
            jnp.where(valid, tile_id, sentinel), mode="drop"
        )
        depth_k = depth_k.at[slot].set(prep.depth, mode="drop")
        gid_k = gid_k.at[slot].set(gauss_idx, mode="drop")
        return tile_k, depth_k, gid_k

    tile_k, depth_k, gid_k = jax.lax.fori_loop(
        0, max_tiles, body, (init_tile, init_depth, init_gid)
    )

    # stable sort by (tile, depth) — matches CUB radix sort pair stability
    tile_s, _, gid_s = jax.lax.sort(
        (tile_k, depth_k, gid_k), num_keys=2, is_stable=True
    )

    # per-tile ranges in the sorted array
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(tile_s, tile_ids, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(tile_s, tile_ids, side="right").astype(jnp.int32)
    counts = ends - starts
    padded_counts = ((counts + CHUNK - 1) // CHUNK) * CHUNK
    padded_starts = (jnp.cumsum(padded_counts) - padded_counts).astype(jnp.int32)

    # re-scatter instances into CHUNK-aligned segments
    pos_in_tile = jnp.arange(cap, dtype=jnp.int32) - starts[
        jnp.clip(tile_s, 0, num_tiles - 1)
    ]
    new_slot = jnp.where(
        tile_s < num_tiles,
        padded_starts[jnp.clip(tile_s, 0, num_tiles - 1)] + pos_in_tile,
        k_pad,  # sentinel rows dropped
    )
    gid_pad = jnp.zeros((k_pad,), jnp.int32).at[new_slot].set(gid_s, mode="drop")
    valid_pad = (
        jnp.zeros((k_pad,), bool)
        .at[new_slot]
        .set(jnp.ones((cap,), bool), mode="drop")
    )

    return Binning(
        gaussian_id=gid_pad,
        instance_valid=valid_pad,
        tile_starts=padded_starts,
        tile_counts=padded_counts.astype(jnp.int32),
        num_instances=total.astype(jnp.int32),
        overflow=overflow.astype(jnp.int32),
        clipped=clipped.astype(jnp.int32),
    )


def stage_fields(prep: Preprocessed, binning: Binning) -> jax.Array:
    """Gather per-instance data into the (NUM_FIELDS, K) layout the Pallas
    kernel consumes (lane-major so chunk DMAs are contiguous 128-lane
    slices). Differentiable: the gather's VJP is a deterministic
    segment-sum back to gaussians — this replaces the reference backward's
    atomicAdd scatter (backward.cu:523-554).

    Rows: 0 x, 1 y, 2..4 conic(a,b,c), 5 opacity, 6..8 rgb, 9..15 zero.
    """
    gid = binning.gaussian_id
    valid = binning.instance_valid
    zeros = jnp.zeros_like(binning.gaussian_id, dtype=prep.mean2d.dtype)

    def take(col):
        return jnp.where(valid, col[gid], 0.0)

    rows = [
        take(prep.mean2d[:, 0]),
        take(prep.mean2d[:, 1]),
        take(prep.conic[:, 0]),
        take(prep.conic[:, 1]),
        take(prep.conic[:, 2]),
        take(prep.opacity),
        take(prep.color[:, 0]),
        take(prep.color[:, 1]),
        take(prep.color[:, 2]),
    ] + [zeros] * (NUM_FIELDS - 9)
    return jnp.stack(rows, axis=0)
