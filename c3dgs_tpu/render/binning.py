"""Fixed-shape tile binning: the XLA re-design of the reference's dynamic
duplicateWithKeys → CUB radix sort → identifyTileRanges pipeline
(rasterizer_impl.cu:70-138, 275-316).

Differences forced/afforded by TPU+XLA:
- static instance capacity instead of a device→host num_rendered readback
  (rasterizer_impl.cu:279): overflow is *counted* and returned as a
  diagnostic instead of reallocating;
- `jax.lax.sort` over packed (tile|quantized-depth) int32 keys replaces the
  radix sort (both stable, so equal-depth ordering matches; the oracle
  shares the quantization so orderings agree exactly);
- each tile's segment of the sorted instance list is padded to a multiple of
  CHUNK (the Pallas kernel's gaussian batch), so every kernel DMA — forward
  reads and backward grad writes — is tile-aligned and race-free.

TPU performance rules baked in (all measured on v5e):
- sorts are nearly free; `jnp.searchsorted` and scatters are pathologically
  slow at these sizes, so every "sorted-queries vs sorted-boundaries" rank
  computation uses a two-sort compaction trick instead (`_rank_in_sorted`);
- 1-D gathers fused into elementwise consumers serialize; lookups are done
  as packed row-gathers (embedding-style) behind optimization_barrier;
- per-tile quantities are computed once per CHUNK-aligned segment leader
  and broadcast across lanes, not per instance.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .preprocess import Preprocessed
from .types import RasterSettings

CHUNK = 128  # gaussians per kernel inner step; also the segment alignment
NUM_FIELDS = 16  # instance field rows (9 used, padded for lane alignment)
NUM_USED_FIELDS = 9  # x, y, conic(3), opacity, rgb(3); the rest stay zero

_ob = jax.lax.optimization_barrier


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


def _rank_in_sorted(boundaries: jax.Array, queries: jax.Array) -> jax.Array:
    """#{boundaries <= q} for every q, where BOTH inputs are ascending.

    Equivalent to jnp.searchsorted(..., side='right') but far faster on
    TPU: two stable sorts + a cumsum (searchsorted's binary-search loop
    lowers terribly at 1e6 queries — ~100ms measured where sorts take ~1ms).
    """
    n = boundaries.shape[0]
    k = queries.shape[0]
    vals = jnp.concatenate([boundaries.astype(jnp.int32), queries])
    # tag: 1 for boundaries, 0 for queries; boundaries come first so stable
    # sorting puts equal boundary values before queries => side='right'
    tag = jnp.concatenate([jnp.ones(n, jnp.int32), jnp.zeros(k, jnp.int32)])
    _, tag_s = jax.lax.sort((vals, tag), num_keys=1, is_stable=True)
    prefix = jnp.cumsum(tag_s)
    # compact query entries back to the front in their original (ascending)
    # order: sort by tag (queries=0 first); stability preserves order
    _, ranks = jax.lax.sort((tag_s, prefix), num_keys=1, is_stable=True)
    return _ob(ranks[:k].astype(jnp.int32))


def _row_gather(table: jax.Array, idx: jax.Array) -> jax.Array:
    """Embedding-style row gather, kept un-fused (the fast path on TPU)."""
    return _ob(table[idx])


class Binning(NamedTuple):
    """Sorted, tile-segmented instance list (all shapes static)."""

    gaussian_id: jax.Array  # (K,) int32 source gaussian per instance
    instance_valid: jax.Array  # (K,) bool (False for segment padding)
    tile_starts: jax.Array  # (T,) int32 offset of each tile's segment
    tile_counts: jax.Array  # (T,) int32 padded count (multiple of CHUNK)
    presort: jax.Array  # (K,) int32 pre-sort (gaussian-major) slot, or cap
    gid_rank: jax.Array  # (cap,) int32 gaussian per pre-sort slot (ascending)
    emit_offsets: jax.Array  # (N,) int32 pre-sort segment start per gaussian
    emit_counts: jax.Array  # (N,) int32 emitted instances per gaussian
    num_instances: jax.Array  # () int32 true emitted instances
    overflow: jax.Array  # () int32 instances dropped (capacity)
    clipped: jax.Array  # () int32 tiles dropped (per-gaussian cap)


def bin_gaussians(prep: Preprocessed, settings: RasterSettings) -> Binning:
    """Build the per-tile depth-sorted instance list."""
    n = prep.depth.shape[0]
    cap, max_tiles = settings.resolve_caps(n)
    num_tiles = settings.num_tiles
    tiles_x = settings.tiles_x
    k_pad = cap + num_tiles * CHUNK
    n_chunks = k_pad // CHUNK

    tiles_touched = prep.tiles_touched
    emit = jnp.minimum(tiles_touched, max_tiles)
    clipped = jnp.sum(tiles_touched - emit)
    cum = _ob(jnp.cumsum(emit))  # inclusive
    total = cum[-1]
    overflow = jnp.maximum(total - cap, 0)

    # ---- instance enumeration (gather formulation; the reference scatters
    # via duplicateWithKeys, rasterizer_impl.cu:70-111): every instance slot
    # finds its source gaussian by rank over the emission prefix sums.
    slots = jnp.arange(cap, dtype=jnp.int32)
    gid_k = _rank_in_sorted(cum, slots)
    gid_safe = jnp.minimum(gid_k, n - 1)
    valid = slots < total

    # per-gaussian int32 table packed so the per-instance lookup is ONE row
    # gather: [offset, rect_min_x, rect_min_y, rect_w, depth_q, pad...]
    depth_q = quantize_depth(prep.depth, prep.radius > 0, num_tiles)
    zeros_n = jnp.zeros(n, jnp.int32)
    g_table = jnp.stack(
        [
            (cum - emit).astype(jnp.int32),
            prep.rect_min[:, 0],
            prep.rect_min[:, 1],
            jnp.maximum(prep.rect_max[:, 0] - prep.rect_min[:, 0], 1),
            depth_q.astype(jnp.int32),
            zeros_n,
            zeros_n,
            zeros_n,
        ],
        axis=1,
    )
    rows = _row_gather(g_table, gid_safe)  # (cap, 8)
    j = slots - rows[:, 0]
    rw = rows[:, 3]
    ty = rows[:, 2] + j // rw
    tx = rows[:, 1] + j % rw
    sentinel = jnp.int32(num_tiles)
    tile_k = jnp.where(valid, ty * tiles_x + tx, sentinel)

    # ---- packed single int32 sort key: tile bits | quantized depth bits.
    # Stability keeps equal-key instances in gaussian order, exactly like
    # CUB radix sort pairs (rasterizer_impl.cu:298-306).
    key = (
        (tile_k.astype(jnp.uint32) << DEPTH_BITS(num_tiles))
        | jnp.where(valid, rows[:, 4].astype(jnp.uint32), 0)
    ).astype(jnp.int32)
    key_s, gid_s, presort_s = jax.lax.sort(
        (key, jnp.where(valid, gid_safe, 0), slots), num_keys=1, is_stable=True
    )
    # pack (gid, presort) so the padded-layout lookup is one row gather
    inst_table = _ob(jnp.stack([gid_s, presort_s], axis=1))  # (cap, 2)
    # sorted tile ids come free from the sorted keys' high bits
    tile_s = _ob(
        (key_s.astype(jnp.uint32) >> DEPTH_BITS(num_tiles)).astype(jnp.int32)
    )

    # ---- per-tile ranges from ranks over the sorted tile array
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    ends = _rank_in_sorted(tile_s, tile_ids)  # #{tile_s <= t}
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32), ends[:-1]])
    counts = ends - starts
    padded_counts = ((counts + CHUNK - 1) // CHUNK) * CHUNK
    padded_starts = _ob(
        (jnp.cumsum(padded_counts) - padded_counts).astype(jnp.int32)
    )

    # ---- CHUNK-aligned segment layout via chunk leaders: the segment id is
    # constant within each 128-slot chunk, so resolve it once per chunk and
    # broadcast (1.8M per-instance lookups -> 14k).
    leaders = jnp.arange(n_chunks, dtype=jnp.int32) * CHUNK
    seg_c = jnp.clip(
        _rank_in_sorted(padded_starts, leaders) - 1, 0, num_tiles - 1
    )
    t_table = jnp.stack([padded_starts, starts, counts], axis=1)  # (T, 3)
    trows = _row_gather(t_table, seg_c)  # (n_chunks, 3)
    lane = jnp.arange(CHUNK, dtype=jnp.int32)
    r = (leaders - trows[:, 0])[:, None] + lane[None, :]  # (n_chunks, CHUNK)
    src = jnp.minimum(trows[:, 1][:, None] + r, cap - 1)
    total_padded = padded_starts[-1] + padded_counts[-1]
    valid_pad = (r < trows[:, 2][:, None]) & (
        (leaders[:, None] + lane[None, :]) < total_padded
    )
    inst_rows = _row_gather(inst_table, src.reshape(-1)).reshape(
        n_chunks, CHUNK, 2
    )
    gid_pad = jnp.where(valid_pad, inst_rows[:, :, 0], 0)
    presort_pad = jnp.where(valid_pad, inst_rows[:, :, 1], cap)

    return Binning(
        gaussian_id=gid_pad.reshape(-1),
        instance_valid=valid_pad.reshape(-1),
        tile_starts=padded_starts,
        tile_counts=padded_counts.astype(jnp.int32),
        presort=presort_pad.reshape(-1),
        gid_rank=jnp.minimum(gid_k, n),
        emit_offsets=(cum - emit).astype(jnp.int32),
        emit_counts=emit.astype(jnp.int32),
        num_instances=total.astype(jnp.int32),
        overflow=overflow.astype(jnp.int32),
        clipped=clipped.astype(jnp.int32),
    )


@jax.custom_vjp
def _stage_gather(per_gaussian, gid, valid_f, presort, gid_rank, offsets, counts):
    rows = per_gaussian[gid] * valid_f[:, None]
    return rows.T


def _stage_gather_fwd(per_gaussian, gid, valid_f, presort, gid_rank, offsets, counts):
    out = _stage_gather(per_gaussian, gid, valid_f, presort, gid_rank, offsets, counts)
    return out, (valid_f, presort, gid_rank, offsets, counts)


def _stage_gather_bwd(res, g):
    # Deterministic segment reduction with NO scatter and NO permutation
    # gather: post-sort instance order has RANDOM gaussian ids, and TPU
    # random-index scatter-add runs at ~12 elem/us (150 ms measured;
    # jax.ops.segment_sum lowers to the same scatter even with sorted ids).
    # Random-index GATHERS are also per-row expensive (~24 ns/row at 1M rows
    # measured, independent of row width 9 vs 16). So the reorder back to
    # pre-sort (gaussian-contiguous) order is ONE multi-payload sort keyed
    # on the pre-sort slot, carrying the 9 live grad columns (13.9 ms vs
    # 2.6 ms int sort + 26.5 ms permutation row-gather at the 1080p/300k
    # bench). Per-gaussian sums are then prefix-sum differences at the
    # emission boundaries; segments are CONSECUTIVE (offsets[i] =
    # offsets[i-1] + counts[i-1]), so the start boundary is the previous
    # end boundary — one ascending row gather, shifted, instead of two.
    #
    # Precision note: the prefix-difference introduces O(eps * |prefix|)
    # absolute error per gaussian (vs exact per-segment addition). Segment
    # grads are later consumed by Adam (scale-invariant per coordinate);
    # gradient-match tests vs the oracle stay within tolerance.
    valid_f, presort, gid_rank, offsets, counts = res
    cap = gid_rank.shape[0]
    n = offsets.shape[0]
    live = NUM_USED_FIELDS
    # g rows are contiguous slices of the (16, k_pad) cotangent; padding
    # slots carry presort == cap and land at the sorted tail (dropped by
    # the [:cap] slice), and their grads are zeroed by the valid mask
    cols = tuple(g[j] * valid_f for j in range(live))
    sorted_cols = jax.lax.sort((presort,) + cols, num_keys=1, is_stable=True)
    d_pre = _ob(
        jnp.stack([c[:cap] for c in sorted_cols[1:]], axis=1)
    )  # (cap, live) gaussian-major
    cs = _ob(jnp.cumsum(d_pre, axis=0))  # (cap, live)
    end_idx = jnp.clip(offsets + counts - 1, 0, cap - 1)  # = cum-1, ascending
    cs_end = _ob(cs[end_idx])  # (n, live)
    prev = jnp.concatenate([jnp.zeros((1, live), cs.dtype), cs_end[:-1]], 0)
    seg = cs_end - jnp.where((offsets > 0)[:, None], prev, 0.0)
    seg = jnp.where((counts > 0)[:, None], seg, 0.0)
    d_per_gaussian = jnp.concatenate(
        [seg, jnp.zeros((n, NUM_FIELDS - live), seg.dtype)], axis=1
    )
    return d_per_gaussian, None, None, None, None, None, None


_stage_gather.defvjp(_stage_gather_fwd, _stage_gather_bwd)


def stage_fields(prep: Preprocessed, binning: Binning) -> jax.Array:
    """Gather per-instance data into the (NUM_FIELDS, K) layout the Pallas
    kernel consumes (lane-major so chunk DMAs are contiguous 128-lane
    slices). Differentiable: the gather's VJP is a deterministic segment-sum
    back to gaussians — this replaces the reference backward's atomicAdd
    scatter (backward.cu:523-554).

    Rows: 0 x, 1 y, 2..4 conic(a,b,c), 5 opacity, 6..8 rgb, 9..15 zero.
    """
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
    # materialize the table: the row gather serializes when the concat
    # producer fuses into it
    per_gaussian = _ob(per_gaussian)
    return _stage_gather(
        per_gaussian,
        binning.gaussian_id,
        binning.instance_valid.astype(per_gaussian.dtype),
        binning.presort,
        binning.gid_rank,
        binning.emit_offsets,
        binning.emit_counts,
    )
