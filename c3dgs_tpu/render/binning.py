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


def DEPTH_BITS(num_tiles: int) -> int:
    """Bits left for quantized depth in the packed 31-bit sort key."""
    tile_bits = max(int(num_tiles + 1).bit_length(), 1)
    return 31 - tile_bits


def quantize_depth(depth, alive, num_tiles: int):
    """Monotone uint32 depth quantization for the packed sort key (shared
    with the oracle so tile and oracle orderings agree exactly)."""
    bits = DEPTH_BITS(num_tiles)
    levels = (1 << bits) - 1
    dmin = jnp.min(jnp.where(alive, depth, jnp.inf))
    dmax = jnp.max(jnp.where(alive, depth, -jnp.inf))
    dmin = jnp.where(jnp.isfinite(dmin), dmin, 0.0)
    span = jnp.maximum(dmax - dmin, 1e-12)
    q = jnp.clip((depth - dmin) / span * levels, 0.0, float(levels))
    # final clamp in integer domain: `levels` (2^b - 1) is not exactly
    # representable in f32 for b > 24, and a rounded-up float clip bound
    # would overflow the depth field into the tile bits of the packed key
    return jnp.minimum(q.astype(jnp.uint32), jnp.uint32(levels))


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
    # optimization_barrier: keep loop-producing ops (cumsum, sort, binary
    # search) out of the big gathers' fusion — XLA otherwise re-runs them
    # per gathered element (measured ~600x slowdowns)
    cum = jax.lax.optimization_barrier(jnp.cumsum(emit))  # inclusive
    offsets = jax.lax.optimization_barrier(cum - emit)  # exclusive
    total = cum[-1]
    overflow = jnp.maximum(total - cap, 0)

    rect_w = prep.rect_max[:, 0] - prep.rect_min[:, 0]

    # gather formulation (vs the reference's duplicateWithKeys scatter,
    # rasterizer_impl.cu:70-111): every instance slot locates its source
    # gaussian by binary search over the emission prefix sums — one fully
    # parallel O(K log N) pass, no sequential scatter loop.
    slots = jnp.arange(cap, dtype=jnp.int32)
    gid_k = jnp.searchsorted(cum, slots, side="right", method="sort").astype(jnp.int32)
    # materialize the binary-search result: XLA otherwise fuses the search
    # loop into every consumer gather (~600x slower, measured)
    gid_k = jax.lax.optimization_barrier(gid_k)
    gid_safe = jnp.minimum(gid_k, n - 1)
    valid = slots < total
    j = slots - offsets[gid_safe]
    rw = jnp.maximum(rect_w[gid_safe], 1)
    ty = prep.rect_min[gid_safe, 1] + j // rw
    tx = prep.rect_min[gid_safe, 0] + j % rw
    sentinel = jnp.int32(num_tiles)
    tile_k = jnp.where(valid, ty * tiles_x + tx, sentinel)
    gid_k = jnp.where(valid, gid_safe, 0)

    # single packed int32 sort key: tile bits | quantized-depth bits. Depth
    # only needs *relative* order within a tile; stability of the sort keeps
    # equal-key instances in gaussian-id order exactly like CUB radix sort
    # pairs (rasterizer_impl.cu:298-306). The oracle renderer uses the same
    # quantization so orderings agree bit-for-bit in tests.
    depth_q = quantize_depth(prep.depth, prep.radius > 0, num_tiles)
    key = ((tile_k.astype(jnp.uint32) << DEPTH_BITS(num_tiles))
           | jnp.where(valid, depth_q[gid_safe], 0)).astype(jnp.int32)
    _, gid_s = jax.lax.sort((key, gid_k), num_keys=1, is_stable=True)
    gid_s = jax.lax.optimization_barrier(gid_s)
    tile_s = jax.lax.optimization_barrier(jax.lax.sort(tile_k))

    # per-tile ranges in the sorted array
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    starts = jax.lax.optimization_barrier(
        jnp.searchsorted(tile_s, tile_ids, side="left", method="sort").astype(jnp.int32)
    )
    ends = jax.lax.optimization_barrier(
        jnp.searchsorted(tile_s, tile_ids, side="right", method="sort").astype(jnp.int32)
    )
    counts = jax.lax.optimization_barrier(ends - starts)
    padded_counts = ((counts + CHUNK - 1) // CHUNK) * CHUNK
    padded_starts = jax.lax.optimization_barrier(
        (jnp.cumsum(padded_counts) - padded_counts).astype(jnp.int32)
    )

    # CHUNK-aligned segment layout, built with gathers (scatters are slow on
    # TPU): every padded slot finds its tile by binary search, then maps back
    # into the tight sorted array.
    pos = jnp.arange(k_pad, dtype=jnp.int32)
    seg = jax.lax.optimization_barrier(
        jnp.searchsorted(padded_starts, pos, side="right", method="sort").astype(jnp.int32)
    )
    seg = jnp.clip(seg - 1, 0, num_tiles - 1)
    r = pos - padded_starts[seg]
    src = jnp.minimum(starts[seg] + r, cap - 1)
    valid_pad = (r < counts[seg]) & (pos < padded_starts[-1] + padded_counts[-1])
    gid_pad = jnp.where(valid_pad, gid_s[src], 0)

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
    n = prep.mean2d.shape[0]
    per_gaussian = jnp.concatenate(
        [
            prep.mean2d,
            prep.conic,
            prep.opacity[:, None],
            prep.color,
            jnp.zeros((n, NUM_FIELDS - 9), prep.mean2d.dtype),
        ],
        axis=1,
    )  # (N, NUM_FIELDS)
    rows = per_gaussian[gid] * valid[:, None]  # one row gather (K, NUM_FIELDS)
    return rows.T
