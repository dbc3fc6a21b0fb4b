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
- tile segments stay UNPADDED: the blend kernels assemble each loop
  iteration's CHUNK-instance window from the two aligned chunks covering
  it (one lane roll — tiles._window), so every iteration holds CHUNK real
  instances and no padded instance layout (nor its big row gathers) ever
  exists. Gradients are written per (tile, window) to a 128-aligned grad
  buffer tagged with each instance's pre-sort slot, and reduced to
  gaussians by one (key, position) sort + row gather + prefix-sum
  differences (rasterizer.blend_gaussians) — deterministic, race-free,
  replacing the reference backward's atomicAdd scatter
  (backward.cu:523-554).

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
from .types import TILE_X, TILE_Y, RasterSettings

CHUNK = 128  # gaussians per kernel inner step; chunk/grad alignment
NUM_FIELDS = 16  # instance field rows (11 used). 12 was tried (round 4)
# to cut staged/grad DMA bytes 25%, but Mosaic requires HBM<->VMEM slice
# shapes 8-aligned in the sublane dim ("Slice shape along dimension 0 must
# be aligned to tiling (8), but is 12"), and an 8+4 split array hits the
# same wall on the 4-row half while 8+8 restores the original byte count
# with MORE descriptors. 16 stands until the row set itself shrinks to 8.
NUM_USED_FIELDS = 9  # x, y, conic(3), opacity, rgb(3)
PRESORT_ROW = 9  # field row carrying the pre-sort slot (exact in f32)
OFFSET_ROW = 10  # table column carrying each gaussian's first emission slot

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
    """#{boundaries <= q} for every q, where BOTH inputs are ascending and
    non-negative with values < 2^30.

    Equivalent to jnp.searchsorted(..., side='right') but far faster on
    TPU (searchsorted's binary-search loop lowers terribly at 1e6 queries —
    ~100ms measured where sorts take ~3ms). Two single-key PACKED sorts
    (payload columns cost as much as the key column, so everything rides
    the low bits of one int32):

      1. sort (value*2 | is_query): boundaries order before equal queries
         (side='right'). A query's merged position p then satisfies
         p = #{boundaries <= q} + #{queries before it}, and since queries
         are ascending, #{queries before query j} = j.
      2. sort (is_query << 30 | position) to read each query's position
         back in query order; ranks[j] = p_j - j.
    """
    n = boundaries.shape[0]
    k = queries.shape[0]
    vals = jnp.concatenate([boundaries.astype(jnp.int32), queries])
    isq = jnp.concatenate([jnp.zeros(n, jnp.int32), jnp.ones(k, jnp.int32)])
    (packed_s,) = jax.lax.sort((vals * 2 + isq,), num_keys=1, is_stable=False)
    pos = jnp.arange(n + k, dtype=jnp.int32)
    (packed2_s,) = jax.lax.sort(
        (((packed_s & 1) << 30) | pos,), num_keys=1, is_stable=False
    )
    pos_q = packed2_s[n:] & ((1 << 30) - 1)
    return _ob(pos_q - jnp.arange(k, dtype=jnp.int32))


def _row_gather(table: jax.Array, idx: jax.Array) -> jax.Array:
    """Embedding-style row gather, kept un-fused (the fast path on TPU)."""
    return _ob(table[idx])


def blocked_prefix(v: jax.Array, k: int = 512) -> jax.Array:
    """Inclusive prefix sum along axis 0 of (rows, C) via blocked
    lower-triangular matmuls + a block-offset cumsum.

    XLA lowers a length-500k jnp.cumsum as ~19 log-doubling passes over
    the whole array (~0.9 ms/frame on the 1080p bench); one batched
    (k, k) triangular matmul at Precision.HIGHEST does the within-block
    prefixes in a single MXU pass and measures ~0.12 ms at BETTER max
    error than the sequential f32 scan (2.8e-4 vs 5.2e-4 against a
    float64 oracle, tools/cumsum_probe.py — the blocked order also
    shortens the dependent-rounding chains)."""
    rows, c = v.shape
    pad = (-rows) % k
    if pad:
        v = jnp.concatenate([v, jnp.zeros((pad, c), v.dtype)], axis=0)
    nb = v.shape[0] // k
    y = v.reshape(nb, k, c)
    row = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    tri = (col <= row).astype(v.dtype)
    within = jnp.einsum(
        "rk,bkc->brc",
        tri,
        y,
        preferred_element_type=v.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
    offs = jnp.cumsum(within[:, -1, :], axis=0)
    offs = jnp.concatenate([jnp.zeros((1, c), v.dtype), offs[:-1]], axis=0)
    out = (within + offs[:, None, :]).reshape(-1, c)
    return out[:rows]


def _row_gather_sorted(table: jax.Array, idx: jax.Array) -> jax.Array:
    """Row gather with ASCENDING in-bounds indices: indices_are_sorted lets
    the TPU gather engine stream rows instead of random-accessing them."""
    return _ob(
        table.at[idx].get(indices_are_sorted=True, mode="promise_in_bounds")
    )


def _tile_hit(
    rows: jax.Array, tx: jax.Array, ty: jax.Array, settings: RasterSettings
) -> jax.Array:
    """Per-instance ellipse-tile intersection test: can this gaussian's
    alpha reach the 1/255 cut anywhere inside tile (tx, ty)?

    The per-gaussian rect enumerates the alpha-support BBOX (preprocess);
    corner tiles of an elongated/diagonal splat often miss the ellipse
    entirely, yet the reference still walks them in renderCUDA only to fail
    the alpha cut per pixel (forward.cu:349-354). Dropping them here is
    provably output-identical and removes ~5-10% of (gaussian, tile)
    instances before the sort and the blend kernels.

    Exact test for a PSD conic: power(d) = -½(a·dx² + c·dy²) - b·dx·dy is
    concave, so its max over the tile's pixel box is 0 if the mean lies
    inside, else attained on one of the 4 box edges — each a 1-D concave
    quadratic with closed-form clamped argmax. Cull when
    op·exp(maxpower) < 1/255 with a 1e-3 log-domain safety margin (the
    continuous max upper-bounds every pixel-center value, so the margin
    only guards float-rounding disagreement with the kernels' own
    evaluation). Non-PSD rows (degenerate covariances) are always kept.
    """
    f32 = lambda col: jax.lax.bitcast_convert_type(rows[:, col], jnp.float32)
    gx, gy = f32(5), f32(6)
    a, b, c = f32(7), f32(8), f32(9)
    op = f32(10)

    psd = (a > 0.0) & (c > 0.0) & (a * c - b * b > 0.0)
    a_s = jnp.where(psd, a, 1.0)
    c_s = jnp.where(psd, c, 1.0)

    # tile pixel box in d = pixel - mean coordinates (pixels sit at integer
    # coords; the box upper edge clamps to the image border)
    x0 = (tx * TILE_X).astype(jnp.float32)
    y0 = (ty * TILE_Y).astype(jnp.float32)
    x1 = jnp.minimum(x0 + (TILE_X - 1), float(settings.width - 1))
    y1 = jnp.minimum(y0 + (TILE_Y - 1), float(settings.height - 1))
    lx, hx = x0 - gx, x1 - gx
    ly, hy = y0 - gy, y1 - gy

    def power(dx, dy):
        return -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy

    def edge_x(e):  # dx fixed at e, dy free in [ly, hy]
        dy = jnp.clip(-b * e / c_s, ly, hy)
        return power(e, dy)

    def edge_y(e):  # dy fixed at e, dx free in [lx, hx]
        dx = jnp.clip(-b * e / a_s, lx, hx)
        return power(dx, e)

    maxp = jnp.maximum(
        jnp.maximum(edge_x(lx), edge_x(hx)),
        jnp.maximum(edge_y(ly), edge_y(hy)),
    )
    inside = (lx <= 0.0) & (hx >= 0.0) & (ly <= 0.0) & (hy >= 0.0)
    maxp = jnp.where(inside, 0.0, maxp)
    thr = -jnp.log(jnp.maximum(255.0 * op, 1e-30))
    return (maxp >= thr - 1e-3) | ~psd


class Binning(NamedTuple):
    """Sorted, tile-segmented instance bookkeeping (all shapes static).

    Positions are indices into the cap-length sorted instance array, which
    holds real instances interleaved with one sentinel row per tile (at the
    end of that tile's segment) and the invalid tail.
    """

    gid_sorted: jax.Array  # (cap,) int32 source gaussian per sorted slot
    # (clamped to n-1 for sentinel/invalid rows — safe to gather with)
    j_sorted: jax.Array  # (cap,) int32 within-gaussian tile index; the
    # pre-sort slot is offset[gid] + j, recomputed during field staging
    # from the table's OFFSET_ROW column (saves a sort payload here)
    starts: jax.Array  # (T,) int32 first sorted slot of each tile (unpadded)
    ends: jax.Array  # (T,) int32 one-past-last sorted slot (unpadded)
    nchunks: jax.Array  # (T,) int32 ceil(count/CHUNK) kernel iterations (the
    # kernels window-shift the unaligned segment, so every iteration holds
    # CHUNK real instances; no boundary-chunk cover)
    grad_base: jax.Array  # (T,) int32 128-aligned grad-buffer offset
    grad_total: jax.Array  # () int32 total grad slots written
    emit_cum: jax.Array  # (N,) int32 inclusive prefix of per-gaussian
    # emits — ALSO the grad-reduction segment boundaries (culled emissions
    # ride the gaussian-major perm with exact-zero grad rows, round 5)
    offset: jax.Array  # (N,) int32 first emission slot (emit_cum - emit)
    num_instances: jax.Array  # () int32 true emitted instances
    overflow: jax.Array  # () int32 instances dropped (capacity)
    grad_overflow: jax.Array  # () int32 grad slots beyond grad capacity
    clipped: jax.Array  # () int32 tiles dropped (per-gaussian cap)
    culled: jax.Array  # () int32 instances dropped by the ellipse-tile test
    # ---- packed-chunk kernel bookkeeping (tiles_packed.py): the kernels
    # iterate aligned CHUNK-slot windows of the sorted array directly, so
    # per-tile grouping rides these instead of per-tile windows:
    tid_sorted: jax.Array  # (cap,) int32 tile of each sorted slot. Sentinel
    # rows carry their REAL tile so lane 0 of every chunk belongs to group
    # 0 even when a segment ends exactly at a chunk boundary (the packed
    # backward's walked-carry handoff reads lane 0's entering lt);
    # invalid/culled rows carry num_tiles. Deadness rides sent_sorted +
    # tid >= num_tiles at staging (opacity zeroed), NOT the tid value.
    sent_sorted: jax.Array  # (cap,) bool: sentinel rows (dead lanes that
    # still group with their tile)
    tile_lo: jax.Array  # (cap//CHUNK + 1,) int32: #tiles whose sentinel lies
    # before chunk c — tiles [tile_lo[c], tile_lo[c+1]) flush in chunk c
    chunks_exec: jax.Array  # () int32 chunks covering all sentinels (>= 1)
    perm: jax.Array  # (cap,) int32 sorted-slot permutation to gaussian-major
    # (pre-sort) order; sentinel/invalid slots sort to the tail. Replaces the
    # backward reduction's f32 key sort (rasterizer._reduce_instance_grads)


def _payload_bits(n: int, num_tiles: int):
    """The sort payload packs (gid, within-gaussian tile index j) into one
    int32: gid (incl. n..n+T-1 sentinel ids) in the high bits, j below.
    j_bits caps tiles-per-gaussian (counted in `clipped` when it binds;
    >= 12 bits whenever n + T <= 2^19, and trained splats touch ~4-6)."""
    gid_bits = int(n + num_tiles).bit_length()
    return 31 - gid_bits


def _emission_prefix(prep: Preprocessed, max_tiles: int):
    """Per-gaussian emission counts and inclusive prefix (replicated O(N))."""
    tiles_touched = prep.tiles_touched
    emit = jnp.minimum(tiles_touched, max_tiles)
    clipped = jnp.sum(tiles_touched - emit)
    cum = _ob(jnp.cumsum(emit))  # inclusive
    return emit, cum, clipped


def _instance_table(prep: Preprocessed, cum, emit, num_tiles: int):
    """Per-gaussian int32 table packed so the per-instance lookup is ONE row
    gather (row gathers cost the same regardless of width): [offset,
    rect_min_x, rect_min_y, rect_w, depth_q, then bitcast f32 fields for
    the ellipse-tile cull: x, y, conic a/b/c, opacity]."""
    depth_q = quantize_depth(prep.depth, prep.radius > 0, num_tiles)
    fbits = lambda v: jax.lax.bitcast_convert_type(
        v.astype(jnp.float32), jnp.int32
    )
    return jnp.stack(
        [
            (cum - emit).astype(jnp.int32),
            prep.rect_min[:, 0],
            prep.rect_min[:, 1],
            jnp.maximum(prep.rect_max[:, 0] - prep.rect_min[:, 0], 1),
            depth_q.astype(jnp.int32),
            fbits(prep.mean2d[:, 0]),
            fbits(prep.mean2d[:, 1]),
            fbits(prep.conic[:, 0]),
            fbits(prep.conic[:, 1]),
            fbits(prep.conic[:, 2]),
            fbits(prep.opacity),
        ],
        axis=1,
    )


def _enumerate_slots(
    g_table, cum, total, slots, n: int, settings: RasterSettings
):
    """Instance enumeration over `slots` (gather formulation; the reference
    scatters via duplicateWithKeys, rasterizer_impl.cu:70-111): every
    instance slot finds its source gaussian by rank over the emission
    prefix sums, gathers its per-gaussian row, derives its tile, and runs
    the ellipse-tile cull. Returns (key, pj) packed sort rows."""
    num_tiles = settings.num_tiles
    tiles_x = settings.tiles_x
    j_bits = _payload_bits(n, num_tiles)
    gid_k = _rank_in_sorted(cum, slots)
    gid_safe = jnp.minimum(gid_k, n - 1)
    valid = slots < total
    rows = _row_gather_sorted(g_table, gid_safe)  # (len, 11), gid ascending
    j = slots - rows[:, 0]
    rw = rows[:, 3]
    ty = rows[:, 2] + j // rw
    tx = rows[:, 1] + j % rw
    keep = valid & _tile_hit(rows, tx, ty, settings)
    sentinel_tile = jnp.int32(num_tiles)
    tile_k = jnp.where(keep, ty * tiles_x + tx, sentinel_tile)

    # ---- packed single int32 sort key: tile bits | quantized depth bits.
    # Stability keeps equal-key instances in gaussian order, exactly like
    # CUB radix sort pairs (rasterizer_impl.cu:298-306).
    db = DEPTH_BITS(num_tiles)
    key = (
        (tile_k.astype(jnp.uint32) << db)
        | jnp.where(keep, rows[:, 4].astype(jnp.uint32), 0)
    ).astype(jnp.int32)
    # ONE packed payload: (gid << j_bits) | j. Sentinels carry gid = n + t;
    # invalid rows carry gid = n + T (their keys sort past everything, and
    # the >= n high bits flag them as non-real alongside sentinels).
    # CULLED rows (round 5) keep their REAL payload: their key already
    # parks them in the dead tile-T region past every sentinel, but a real
    # (gid, j) makes the gaussian-major perm sort order ALL emissions —
    # so the grad reduction segments directly at emit_cum and the former
    # boundary_cum rank pass (2 cap+N-row sorts, ~1.1 ms/frame at 1080p)
    # disappears from the packed path. Culled slots' grad rows are exact
    # zeros: executed ones are dead lanes (tid = T), unexecuted ones are
    # masked by position in the reducer.
    pj = (gid_safe << j_bits) | j
    pj = jnp.where(valid, pj, (n + num_tiles) << j_bits)
    return key, pj, jnp.sum((valid & ~keep).astype(jnp.int32))


def bin_gaussians(
    prep: Preprocessed,
    settings: RasterSettings,
) -> Binning:
    """Build the per-tile depth-sorted instance bookkeeping (full tile
    grid; for the tile-sharded variant see bin_gaussians_routed)."""
    n = prep.depth.shape[0]
    cap, max_tiles = settings.resolve_caps(n)
    grad_cap = settings.resolve_grad_cap(n)
    num_tiles = settings.num_tiles

    j_bits = _payload_bits(n, num_tiles)
    max_tiles = min(max_tiles, 1 << j_bits)
    emit, cum, clipped = _emission_prefix(prep, max_tiles)
    total = cum[-1]
    # T sentinel rows must fit inside the cap window for the tile ranges to
    # be recoverable; anything past that is dropped and counted
    overflow = jnp.maximum(total - (cap - num_tiles), 0)

    g_table = _instance_table(prep, cum, emit, num_tiles)
    slots = jnp.arange(cap, dtype=jnp.int32)
    key, pj, culled = _enumerate_slots(g_table, cum, total, slots, n, settings)
    db = DEPTH_BITS(num_tiles)
    levels = jnp.uint32((1 << db) - 1)
    t_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    # one sentinel row per tile carries (tile, max-depth) and is appended
    # AFTER all real rows, so the stable sort parks it at the end of its
    # tile's segment
    sent_key = ((t_ids.astype(jnp.uint32) << db) | levels).astype(jnp.int32)
    key_all = jnp.concatenate([key, sent_key])
    pj_all = jnp.concatenate([pj, (n + t_ids) << j_bits])

    # lexicographic (key, pj) with pj unique and ascending in emission
    # order == stable-by-key, without the hidden iota tiebreaker a stable
    # sort materializes
    key_s, pj_s = jax.lax.sort((key_all, pj_all), num_keys=2, is_stable=False)
    pj_s = _ob(pj_s[:cap])
    # tile of each sorted slot, free from the sorted key's high bits.
    # Sentinel rows are forced to num_tiles like invalid/culled rows: the
    # packed kernels treat tid >= num_tiles as dead lanes (their grouping
    # rides tile_lo, not the tid row)
    gid_s = jnp.minimum(pj_s >> j_bits, n - 1)
    j_s = pj_s & ((1 << j_bits) - 1)
    is_sent = pj_s >= (n << j_bits)
    # sentinels keep their real tile from the key's high bits (they must
    # group with their tile in the packed kernels — see Binning.tid_sorted);
    # only invalid/culled rows get num_tiles. is_sent-but-invalid rows
    # (gid == n + T) also land on num_tiles via the key clamp.
    tid_sorted = jnp.minimum(
        (key_s[:cap].astype(jnp.uint32) >> db).astype(jnp.int32),
        jnp.int32(num_tiles),
    )
    sent_sorted = is_sent

    # ---- gaussian-major permutation (backward only): ordering slots by
    # payload puts EVERY emission (kept AND culled — culled keep their
    # real payload, see _enumerate_slots) in gaussian-major order, then
    # the T sentinels in tile order, then invalid. The grad reduction
    # therefore segments directly at emit_cum: culled emissions gather
    # exact-zero grad rows (dead lanes in executed chunks, position-masked
    # past them), so no kept-only boundary prefix is needed — the round-4
    # boundary_cum rank pass (2 sorts over cap + N rows, ~1.1 ms/frame at
    # 1080p) is gone.
    _, perm = jax.lax.sort(
        (pj_s, jnp.arange(cap, dtype=jnp.int32)), num_keys=2, is_stable=False
    )
    perm = _ob(perm)

    if settings.inference:
        # ---- tile ranges from a SINGLE-KEY sentinel-position sort (round
        # 4): sentinel rows sort in tile order (their keys ascend with
        # tile), so their positions in ascending order ARE ends[0..T).
        # Kept for forward-only graphs, where decoupling from the perm
        # sort above lets XLA DCE the 2-key perm entirely — it exists
        # only for the backward's grad reduction.
        pos_c = jnp.arange(cap, dtype=jnp.int32)
        (sent_packed,) = jax.lax.sort(
            (jnp.where(is_sent, pos_c, (1 << 24) | pos_c),),
            num_keys=1,
            is_stable=False,
        )
        ends = _ob(sent_packed[:num_tiles] & ((1 << 24) - 1))
    else:
        # ---- training: the VJP needs `perm` anyway, and sentinel t sits
        # at payload-sorted position K + t (K = #real payloads: kept AND
        # culled emissions sort below n << j_bits; sentinels (n + t)
        # ascend in tile order right after). ends[t] = perm[K + t] — the
        # round-4 sentinel sort (one cap-row pass, ~0.3 ms at 1080p)
        # folds into the perm sort for free. On an overflowing frame
        # (total > cap - T) the dynamic_slice clamp can misread ends —
        # overflow is counted and the frame re-rendered/degraded exactly
        # as with the round-4 scheme, whose surviving-sentinel positions
        # were equally partial.
        k_real = jnp.sum((pj_s < (n << j_bits)).astype(jnp.int32))
        ends = _ob(
            jax.lax.dynamic_slice(perm, (k_real,), (num_tiles,))
        )
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32), ends[:-1] + 1])
    counts = ends - starts

    # ---- kernel iteration counts + grad layout: one CHUNK window per
    # CHUNK real instances (the kernels roll-shift the unaligned segment)
    nchunks = (counts + CHUNK - 1) // CHUNK
    grad_base = (
        (jnp.cumsum(nchunks) - nchunks).astype(jnp.int32) * CHUNK
    )
    grad_total = jnp.sum(nchunks) * CHUNK
    grad_overflow = jnp.maximum(grad_total - grad_cap, 0)

    # ---- packed-chunk bookkeeping: the packed kernels walk aligned CHUNK
    # windows of the sorted array; tiles flush at their sentinel lane, so
    # per-chunk tile ranges are ranks of chunk starts among sentinel
    # positions (`ends`, strictly increasing).
    nc = cap // CHUNK
    chunk_starts = jnp.arange(nc + 1, dtype=jnp.int32) * CHUNK
    tile_lo = _rank_in_sorted(ends + 1, chunk_starts)  # #{ends < c*CHUNK}
    chunks_exec = (ends[num_tiles - 1] + 1 + CHUNK - 1) // CHUNK

    return Binning(
        gid_sorted=gid_s,
        j_sorted=j_s,
        starts=starts.astype(jnp.int32),
        ends=ends.astype(jnp.int32),
        nchunks=nchunks.astype(jnp.int32),
        grad_base=grad_base,
        grad_total=grad_total.astype(jnp.int32),
        emit_cum=cum.astype(jnp.int32),
        offset=(cum - emit).astype(jnp.int32),
        num_instances=total.astype(jnp.int32),
        overflow=overflow.astype(jnp.int32),
        grad_overflow=grad_overflow.astype(jnp.int32),
        clipped=clipped.astype(jnp.int32),
        culled=culled.astype(jnp.int32),
        tid_sorted=tid_sorted,
        sent_sorted=sent_sorted,
        tile_lo=tile_lo.astype(jnp.int32),
        chunks_exec=chunks_exec.astype(jnp.int32),
        perm=perm,
    )


class RoutedBinning(NamedTuple):
    """Per-DEVICE sorted instance bookkeeping under tile sharding (all
    shapes static; produced inside shard_map by bin_gaussians_routed).

    The local sorted array holds ONLY this device's owned tiles' kept
    instances (routed in by an all_to_all), interleaved with one sentinel
    row per owned tile, then pad rows. Within a tile the (key, payload)
    order is identical to the unsharded global sort — the routing permutes
    nothing inside a tile."""

    gid_sorted: jax.Array  # (cap_local,) int32 source gaussian (clamped)
    j_sorted: jax.Array  # (cap_local,) int32 within-gaussian tile index
    tid_sorted: jax.Array  # (cap_local,) int32 tile (global ids; sentinels
    # carry their real tile, pads num_tiles)
    sent_sorted: jax.Array  # (cap_local,) bool sentinel/pad rows
    tile_lo: jax.Array  # (cap_local//CHUNK + 1,) int32 GLOBAL-numbered
    # first-unflushed-tile per chunk boundary (t0 + #owned sentinels before)
    chunks_exec: jax.Array  # () int32 chunks covering all owned sentinels
    t0: jax.Array  # () int32 first owned tile
    t1: jax.Array  # () int32 one past last owned tile (t0 + n_owned)
    emit_cum: jax.Array  # (N,) int32 inclusive per-gaussian emission prefix
    offset: jax.Array  # (N,) int32 first emission slot (global)
    num_instances: jax.Array  # () int32 true emitted instances (global)
    overflow: jax.Array  # () int32 instances past the global slot budget
    clipped: jax.Array  # () int32 tiles dropped by the per-gaussian cap
    route_dropped: jax.Array  # () int32 LOCAL instances dropped because a
    # (source, dest) routing budget overflowed — psum for the global count


def routed_local_cap(cap: int, shard_num: int, num_tiles: int):
    """(cap_pair, t_local, cap_local) static routing geometry.

    cap_pair is each (src, dst) all_to_all budget: 2x tile-skew headroom
    over the even split of a source slice across its possible destinations.
    A slice has cap/D slots and only min(D, T) reachable destinations (a
    tiles axis wider than the tile grid routes everything into T owners),
    so the even split is cap/D/min(D, T); overshoot beyond 2x is dropped
    and counted (RoutedBinning.route_dropped)."""
    cap_l = cap // shard_num
    dests = max(1, min(shard_num, num_tiles))
    cap_pair = -(-2 * cap_l // dests)  # ceil
    t_pad = -(-num_tiles // shard_num) * shard_num
    t_local = t_pad // shard_num
    cap_local = -(-(shard_num * cap_pair + t_local) // CHUNK) * CHUNK
    return cap_pair, t_local, cap_local


def bin_gaussians_routed(
    prep: Preprocessed,
    settings: RasterSettings,
    shard_axis: str,
    shard_num: int,
) -> RoutedBinning:
    """Tile-sharded binning: enumeration AND sorts run at ~cap/D per device
    (SCALING.md roadmap item 1; replaces the round-2 scheme of sharded
    enumeration + all_gather + fully replicated sorts).

    Per device d (inside shard_map over `shard_axis`, size D):
      1. enumerate slots [d*cap/D, (d+1)*cap/D) -> (key, pj) local rows;
      2. local sort by (key, pj) — tile rides the key's high bits, so the
         locally sorted array is partitioned into D contiguous destination
         ranges (device r owns tiles [r*t_local, (r+1)*t_local));
      3. all_to_all fixed (D, cap_pair, 2) blocks (per-pair budget with 2x
         skew headroom; overshoot counted in route_dropped);
      4. local merge sort of the received rows + this device's owned-tile
         sentinel rows -> the device's sorted array; tile ranges/tile_lo
         recovered from sentinel positions exactly as in bin_gaussians.

    The final (key, pj) order within each tile equals the unsharded global
    sort's (the total order on (key, pj) does not depend on which device
    sorted it), so rendering is bit-identical to bin_gaussians + slicing.
    """
    n = prep.depth.shape[0]
    cap, max_tiles = settings.resolve_caps(n)
    num_tiles = settings.num_tiles
    assert cap % shard_num == 0, (
        f"instance capacity {cap} must divide the tiles axis {shard_num} "
        "(resolve_caps rounds to 128; use a power-of-two axis)"
    )
    j_bits = _payload_bits(n, num_tiles)
    max_tiles = min(max_tiles, 1 << j_bits)
    emit, cum, clipped = _emission_prefix(prep, max_tiles)
    total = cum[-1]
    overflow = jnp.maximum(total - (cap - num_tiles), 0)
    g_table = _instance_table(prep, cum, emit, num_tiles)

    cap_l = cap // shard_num
    d = jax.lax.axis_index(shard_axis)
    # INTERLEAVED slot slice (ADVICE r3): emission slots follow gaussian
    # order, which is spatially coherent after the save-time Morton sort —
    # a CONTIGUOUS cap/D block then concentrates into one or two owner
    # devices and chronically overflows the per-(src,dst) routing budget.
    # Striding by D makes every device's slice a uniform sample of the
    # emission order, restoring the even-spread assumption cap_pair is
    # sized for (2x headroom over cap_l/min(D,T)). Slots stay strictly
    # ascending, which _enumerate_slots requires (rank pass + sorted row
    # gather); the final per-tile order is unchanged — it is the total
    # (key, payload) order, independent of which device enumerated a slot.
    slots = d + jnp.arange(cap_l, dtype=jnp.int32) * shard_num
    key, pj, _ = _enumerate_slots(g_table, cum, total, slots, n, settings)

    # ---- 2. local sort: ascending tiles partition the rows by destination
    key_l, pj_l = jax.lax.sort((key, pj), num_keys=2, is_stable=False)
    db = DEPTH_BITS(num_tiles)
    tile_l = (key_l.astype(jnp.uint32) >> db).astype(jnp.int32)

    cap_pair, t_local, cap_local = routed_local_cap(cap, shard_num, num_tiles)
    # destination ranges: lo_r = #{tiles < r*t_local} via one rank pass
    # (clamp to num_tiles so the invalid tail, tile == T, never routes)
    qs = jnp.minimum(
        jnp.arange(1, shard_num + 1, dtype=jnp.int32) * t_local,
        jnp.int32(num_tiles),
    ) - 1
    his = _rank_in_sorted(tile_l, qs)  # (D,) hi_r = lo_{r+1}
    los = jnp.concatenate([jnp.zeros(1, jnp.int32), his[:-1]])
    route_dropped = jnp.sum(jnp.maximum(his - los - cap_pair, 0))

    # ---- 3. fixed-size send blocks + all_to_all. Pad rows: key past every
    # real key (tile bits = T), payload the invalid marker.
    pad_key = jnp.int32(
        (jnp.uint32(num_tiles) << db) | jnp.uint32((1 << db) - 1)
    )
    pad_pj = jnp.int32((n + num_tiles) << j_bits)
    idx = los[:, None] + jnp.arange(cap_pair, dtype=jnp.int32)[None, :]
    in_range = idx < his[:, None]
    idx_c = jnp.minimum(idx, cap_l - 1).reshape(-1)
    packed_l = jnp.stack([key_l, pj_l], axis=1)  # (cap_l, 2) ONE row gather
    send = _row_gather(packed_l, idx_c).reshape(shard_num, cap_pair, 2)
    send = jnp.where(
        in_range[:, :, None],
        send,
        jnp.stack([pad_key, pad_pj])[None, None, :],
    )
    recv = jax.lax.all_to_all(
        send, shard_axis, split_axis=0, concat_axis=0, tiled=False
    )
    key_r = recv[:, :, 0].reshape(-1)
    pj_r = recv[:, :, 1].reshape(-1)

    # ---- 4. local merge: received rows + owned sentinels + chunk pad
    t0 = d * t_local
    own = t0 + jnp.arange(t_local, dtype=jnp.int32)
    own_real = own < num_tiles
    levels = jnp.uint32((1 << db) - 1)
    sent_key = jnp.where(
        own_real,
        ((own.astype(jnp.uint32) << db) | levels).astype(jnp.int32),
        pad_key,
    )
    sent_pj = jnp.where(own_real, (n + own) << j_bits, pad_pj)
    n_tail = cap_local - shard_num * cap_pair - t_local
    key_all = jnp.concatenate(
        [key_r, sent_key, jnp.full((n_tail,), pad_key, jnp.int32)]
    )
    pj_all = jnp.concatenate(
        [pj_r, sent_pj, jnp.full((n_tail,), pad_pj, jnp.int32)]
    )
    key_s, pj_s = jax.lax.sort((key_all, pj_all), num_keys=2, is_stable=False)
    key_s = _ob(key_s)
    pj_s = _ob(pj_s)

    gid_s = jnp.minimum(pj_s >> j_bits, n - 1)
    j_s = pj_s & ((1 << j_bits) - 1)
    is_sent = pj_s >= (n << j_bits)
    tid_sorted = jnp.minimum(
        (key_s.astype(jnp.uint32) >> db).astype(jnp.int32),
        jnp.int32(num_tiles),
    )

    # owned-tile ends from sentinel positions (pads are is_sent too but
    # sort past every owned sentinel — same invariant as bin_gaussians)
    pos_c = jnp.arange(cap_local, dtype=jnp.int32)
    (sent_packed,) = jax.lax.sort(
        (jnp.where(is_sent, pos_c, (1 << 24) | pos_c),),
        num_keys=1,
        is_stable=False,
    )
    ends_l = _ob(sent_packed[:t_local] & ((1 << 24) - 1))
    n_owned = jnp.clip(jnp.int32(num_tiles) - t0, 0, t_local)
    i_t = jnp.arange(t_local, dtype=jnp.int32)
    ends_valid = jnp.where(i_t < n_owned, ends_l, jnp.int32(cap_local))
    last_end = jnp.where(
        n_owned > 0, ends_l[jnp.maximum(n_owned - 1, 0)], jnp.int32(-1)
    )
    chunks_exec = (last_end + 1 + CHUNK - 1) // CHUNK

    nc = cap_local // CHUNK
    chunk_starts = jnp.arange(nc + 1, dtype=jnp.int32) * CHUNK
    tile_lo = t0 + _rank_in_sorted(ends_valid + 1, chunk_starts)

    return RoutedBinning(
        gid_sorted=gid_s,
        j_sorted=j_s,
        tid_sorted=tid_sorted,
        sent_sorted=is_sent,
        tile_lo=tile_lo.astype(jnp.int32),
        chunks_exec=chunks_exec.astype(jnp.int32),
        t0=t0.astype(jnp.int32),
        t1=(t0 + n_owned).astype(jnp.int32),
        emit_cum=cum.astype(jnp.int32),
        offset=(cum - emit).astype(jnp.int32),
        num_instances=total.astype(jnp.int32),
        overflow=overflow.astype(jnp.int32),
        clipped=clipped.astype(jnp.int32),
        route_dropped=route_dropped.astype(jnp.int32),
    )


def per_gaussian_table(prep: Preprocessed, offset: jax.Array) -> jax.Array:
    """(N, NUM_FIELDS) differentiable per-gaussian field table consumed by
    rasterizer.blend_gaussians. Cols: 0 x, 1 y, 2..4 PRE-SCALED conic
    (-0.5a, -b, -0.5c — the gaussian exponent's quadratic-form coefficients,
    so the kernels evaluate power = a'dx² + b'dxdy + c'dy² with no extra
    scaling ops on (PIX, CHUNK) operands), 5 opacity, 6..8 rgb, OFFSET_ROW
    the (non-diff) first emission slot from binning (exact in f32 for caps
    < 2^24); the rest are zero (col PRESORT_ROW is filled per instance as
    offset + j after staging)."""
    n = prep.mean2d.shape[0]
    off = jax.lax.stop_gradient(offset).astype(prep.mean2d.dtype)
    table = jnp.concatenate(
        [
            prep.mean2d,
            prep.conic * jnp.asarray([-0.5, -1.0, -0.5], prep.conic.dtype),
            prep.opacity[:, None],
            prep.color,
            jnp.zeros((n, OFFSET_ROW - NUM_USED_FIELDS), prep.mean2d.dtype),
            off[:, None],
            jnp.zeros((n, NUM_FIELDS - OFFSET_ROW - 1), prep.mean2d.dtype),
        ],
        axis=1,
    )
    # materialize: the row gather serializes if the concat fuses into it
    return _ob(table)
