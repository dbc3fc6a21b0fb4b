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
- per-tile ranges come from T sentinel rows that ride the same sort (key =
  (tile, max-depth), placed after all real rows so stability parks each at
  its tile's end) — identifyTileRanges for free instead of a second
  rank/searchsorted pass;
- tile segments stay UNPADDED: the blend kernels read 128-aligned global
  chunks covering [start, end) and lane-mask out-of-range instances, so no
  padded instance layout (and none of its big row gathers) ever exists.
  Gradients are written per (tile, chunk) to a separate 128-aligned grad
  buffer tagged with each instance's pre-sort slot, and reduced to
  gaussians by one multi-payload sort + prefix-sum differences
  (rasterizer.blend_gaussians) — deterministic, race-free, replacing the
  reference backward's atomicAdd scatter (backward.cu:523-554).

TPU performance rules baked in (all measured on v5e — see docs/PERF.md):
- sorts are cheap, scatters and fused 1-D gathers are pathologically slow;
- row gathers cost ~7ns/row *independent of row width*, so lookup tables
  are packed wide and gathered once (embedding-style) behind
  optimization_barrier;
- everything scales with the number of gathered/sorted ROWS: the design
  keeps all row-level work at instance capacity (cap), never at a padded
  multiple of it.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .preprocess import Preprocessed
from .types import RasterSettings

CHUNK = 128  # gaussians per kernel inner step; chunk/grad alignment
NUM_FIELDS = 16  # instance field rows (10 used, padded for lane alignment)
NUM_USED_FIELDS = 9  # x, y, conic(3), opacity, rgb(3)
PRESORT_ROW = 9  # field row carrying the pre-sort slot (exact in f32)

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
    lowers terribly at 1e6 queries — ~100ms measured where sorts take ~3ms).
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
    """Sorted, tile-segmented instance bookkeeping (all shapes static).

    Positions are indices into the cap-length sorted instance array, which
    holds real instances interleaved with one sentinel row per tile (at the
    end of that tile's segment) and the invalid tail.
    """

    gid_sorted: jax.Array  # (cap,) int32 source gaussian per sorted slot
    presort: jax.Array  # (cap,) int32 pre-sort slot, or >= cap for sentinels
    starts: jax.Array  # (T,) int32 first sorted slot of each tile (unpadded)
    ends: jax.Array  # (T,) int32 one-past-last sorted slot (unpadded)
    chunk0: jax.Array  # (T,) int32 first 128-aligned chunk covering the tile
    nchunks: jax.Array  # (T,) int32 chunks covering [start, end)
    grad_base: jax.Array  # (T,) int32 128-aligned grad-buffer offset
    grad_total: jax.Array  # () int32 total grad slots written
    emit_cum: jax.Array  # (N,) int32 inclusive prefix of per-gaussian emits
    num_instances: jax.Array  # () int32 true emitted instances
    overflow: jax.Array  # () int32 instances dropped (capacity)
    grad_overflow: jax.Array  # () int32 grad slots beyond grad capacity
    clipped: jax.Array  # () int32 tiles dropped (per-gaussian cap)


def bin_gaussians(prep: Preprocessed, settings: RasterSettings) -> Binning:
    """Build the per-tile depth-sorted instance bookkeeping."""
    n = prep.depth.shape[0]
    cap, max_tiles = settings.resolve_caps(n)
    grad_cap = settings.resolve_grad_cap(n)
    num_tiles = settings.num_tiles
    tiles_x = settings.tiles_x

    tiles_touched = prep.tiles_touched
    emit = jnp.minimum(tiles_touched, max_tiles)
    clipped = jnp.sum(tiles_touched - emit)
    cum = _ob(jnp.cumsum(emit))  # inclusive
    total = cum[-1]
    # T sentinel rows must fit inside the cap window for the tile ranges to
    # be recoverable; anything past that is dropped and counted
    overflow = jnp.maximum(total - (cap - num_tiles), 0)

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
    sentinel_tile = jnp.int32(num_tiles)
    tile_k = jnp.where(valid, ty * tiles_x + tx, sentinel_tile)

    # ---- packed single int32 sort key: tile bits | quantized depth bits.
    # Stability keeps equal-key instances in gaussian order, exactly like
    # CUB radix sort pairs (rasterizer_impl.cu:298-306). One sentinel row
    # per tile carries (tile, max-depth) and is appended AFTER all real
    # rows, so the stable sort parks it at the end of its tile's segment.
    db = DEPTH_BITS(num_tiles)
    levels = jnp.uint32((1 << db) - 1)
    key = (
        (tile_k.astype(jnp.uint32) << db)
        | jnp.where(valid, rows[:, 4].astype(jnp.uint32), 0)
    ).astype(jnp.int32)
    t_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    sent_key = ((t_ids.astype(jnp.uint32) << db) | levels).astype(jnp.int32)
    # pre-sort slot payload: real rows get their emission slot; sentinels get
    # cap + tile so both the sentinel flag and the tile id survive the sort
    key_all = jnp.concatenate([key, sent_key])
    gid_all = jnp.concatenate([jnp.where(valid, gid_safe, 0), t_ids * 0])
    presort_all = jnp.concatenate([slots, cap + t_ids])

    _, gid_s, presort_s = jax.lax.sort(
        (key_all, gid_all, presort_all), num_keys=1, is_stable=True
    )
    gid_s = _ob(gid_s[:cap])
    presort_s = _ob(presort_s[:cap])

    # ---- tile ranges from sentinel positions: one key+payload sort over
    # cap rows; sentinel of tile t sorts to position t of the result.
    sent_rank = jnp.where(presort_s >= cap, presort_s - cap, num_tiles)
    _, sent_pos = jax.lax.sort(
        (sent_rank, jnp.arange(cap, dtype=jnp.int32)), num_keys=1, is_stable=True
    )
    ends = _ob(sent_pos[:num_tiles])  # position of tile t's sentinel
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32), ends[:-1] + 1])
    counts = ends - starts

    # ---- 128-aligned chunk cover of each unpadded segment + grad layout
    chunk0 = starts // CHUNK
    last_chunk = jnp.where(counts > 0, (ends - 1) // CHUNK, chunk0 - 1)
    nchunks = jnp.maximum(last_chunk - chunk0 + 1, 0)
    grad_base = (
        (jnp.cumsum(nchunks) - nchunks).astype(jnp.int32) * CHUNK
    )
    grad_total = jnp.sum(nchunks) * CHUNK
    grad_overflow = jnp.maximum(grad_total - grad_cap, 0)

    return Binning(
        gid_sorted=gid_s,
        presort=presort_s,
        starts=starts.astype(jnp.int32),
        ends=ends.astype(jnp.int32),
        chunk0=chunk0.astype(jnp.int32),
        nchunks=nchunks.astype(jnp.int32),
        grad_base=grad_base,
        grad_total=grad_total.astype(jnp.int32),
        emit_cum=cum.astype(jnp.int32),
        num_instances=total.astype(jnp.int32),
        overflow=overflow.astype(jnp.int32),
        grad_overflow=grad_overflow.astype(jnp.int32),
        clipped=clipped.astype(jnp.int32),
    )


def per_gaussian_table(prep: Preprocessed) -> jax.Array:
    """(N, NUM_FIELDS) differentiable per-gaussian field table consumed by
    rasterizer.blend_gaussians. Cols: 0 x, 1 y, 2..4 conic, 5 opacity,
    6..8 rgb; the rest are zero (col PRESORT_ROW is overwritten per
    instance after staging)."""
    n = prep.mean2d.shape[0]
    table = jnp.concatenate(
        [
            prep.mean2d,
            prep.conic,
            prep.opacity[:, None],
            prep.color,
            jnp.zeros((n, NUM_FIELDS - NUM_USED_FIELDS), prep.mean2d.dtype),
        ],
        axis=1,
    )
    # materialize: the row gather serializes if the concat fuses into it
    return _ob(table)
