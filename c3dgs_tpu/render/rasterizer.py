"""Public differentiable rasterizer API.

`render(...)` is the functional analog of GaussianModel.render
(scene/gaussian_model.py:766-886) + GaussianRasterizer
(…no_camera/__init__.py:881-1046), fused into one jittable pipeline:

  preprocess (jnp, autodiff)  ->  bin+sort (non-diff bookkeeping)
  -> blend_gaussians (custom_vjp: stage gather + Pallas fwd kernel;
     VJP = Pallas bwd kernel + one sort + prefix-sum segment reduction)
  -> image assembly (jnp)

Camera-pose gradients: `extrinsic_vector` is a differentiated input of
preprocess, so jax.grad provides the pose Jacobian the reference computes
with ~110 lines of sympy output (…no_camera/__init__.py:679-788).

Dense vs indexed rendering: index gathers happen in the model accessors
(models/gaussians.py), so one rasterizer serves both modes (the reference
maintains two kernel families, forward.cu vs forward_indexed.cu).
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import tiles, tiles_packed
from .binning import (
    CHUNK,
    NUM_FIELDS,
    NUM_USED_FIELDS,
    OFFSET_ROW,
    PRESORT_ROW,
    Binning,
    _rank_in_sorted,
    _row_gather_sorted,
    bin_gaussians,
    blocked_prefix,
    per_gaussian_table,
)
from .preprocess import preprocess
from .types import TILE_X, TILE_Y, RasterSettings

_ob = jax.lax.optimization_barrier


def _build_fields(table: jax.Array, gid_sorted: jax.Array, j_sorted: jax.Array):
    """(N, NUM_FIELDS) per-gaussian table -> (NUM_FIELDS, cap) staged
    instance fields in sorted unpadded order. The pre-sort slot
    (offset[gid] + j, exact in f32 for caps < 2^24) is assembled into row
    PRESORT_ROW from the table's OFFSET_ROW column, so the binning sort
    only carries one packed payload. Sentinel/invalid rows get a real
    gaussian's fields (gid clamped) — harmless, since the kernels mask
    every lane outside its tile's [start, end) segment."""
    rows = _ob(table[gid_sorted])  # (cap, NUM_FIELDS) ONE row gather
    presort = rows[:, OFFSET_ROW] + j_sorted.astype(jnp.float32)
    rows = rows.at[:, PRESORT_ROW].set(presort)
    return rows.T


def _build_fields_packed(
    table,
    gid_sorted,
    tid_sorted,
    sent_sorted,
    j_sorted,
    tiles_x: int,
    num_tiles: int,
    cap_total: int,
):
    """(N, NUM_FIELDS) table -> (NUM_FIELDS, cap) staged sorted instance
    fields for the PACKED kernels: means become TILE-LOCAL (so one local
    pixel-coordinate set serves lanes of different tiles inside a shared
    chunk), dead lanes (sentinel / invalid / culled) get opacity 0, row
    TID_ROW carries the lane's tile id (real tile for sentinels — they must
    group with their tile, see Binning.tid_sorted), and row OFFSET_ROW
    becomes the lane's PRE-SORT slot (offset[gid] + j; cap_total for dead
    lanes) — the backward copies it into the grad buffer so a tile-sharded
    device can reduce its local slot slice without the global permutation
    (_reduce_instance_grads, partial_coverage)."""
    rows = _ob(table[gid_sorted])  # (cap, NUM_FIELDS) ONE row gather
    tid = jnp.minimum(tid_sorted, num_tiles - 1)
    ox = ((tid % tiles_x) * TILE_X).astype(rows.dtype)
    oy = ((tid // tiles_x) * TILE_Y).astype(rows.dtype)
    dead = sent_sorted | (tid_sorted >= num_tiles)
    presort = jnp.where(
        dead,
        jnp.float32(cap_total),
        rows[:, OFFSET_ROW] + j_sorted.astype(rows.dtype),
    )
    rows = rows.at[:, 0].add(-ox)
    rows = rows.at[:, 1].add(-oy)
    rows = rows.at[:, 5].set(jnp.where(dead, 0.0, rows[:, 5]))
    rows = rows.at[:, OFFSET_ROW].set(presort)
    rows = rows.at[:, tiles_packed.TID_ROW].set(
        tid_sorted.astype(rows.dtype)
    )
    return rows.T


def _blend_forward_call_packed(num_tiles: int, cap: int, fields, tile_lo, meta):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(cap // CHUNK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, NUM_FIELDS, CHUNK), jnp.float32),  # fbuf
            pltpu.VMEM((2, tiles.OUT_ROWS, tiles.PIX), jnp.float32),  # obuf
            pltpu.VMEM((3, tiles.PIX), jnp.float32),  # carry_c
            pltpu.VMEM((tiles.PIX, 1), jnp.float32),  # carry_lt
            pltpu.SMEM((1,), jnp.int32),  # frz
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        tiles_packed.forward_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (num_tiles, tiles.OUT_ROWS, tiles.PIX), jnp.float32
        ),
        interpret=tiles.interpret_mode(),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_lo, meta, fields)


def _blend_backward_call_packed(
    num_tiles: int, cap: int, fast_grad: bool, fields, tile_lo, meta, totals, gout
):
    kernel = functools.partial(
        tiles_packed.backward_kernel,
        fast_grad=fast_grad,
        probe=os.environ.get("C3DGS_PROBE_BWD", ""),
    )
    # SLIM per-tile blocks: of the 16 totals+cotangent rows only 7 feed the
    # backward (exp(lt), lt, freeze; dL/dC x3, dL/dT_final) — packing just
    # those (padded to 8 sublanes) halves each flush's DMA bytes. Row map
    # (TG_* in tiles_packed): 0 exp(lt_final), 1 lt_final, 2 freeze slot,
    # 3..5 dL/dC, 6 dL/dT_final, 7 pad. Still ONE DMA per flush.
    tg = jnp.concatenate(
        [
            totals[:, 3:6],
            gout[:, :4],
            jnp.zeros((totals.shape[0], 1, tiles.PIX), totals.dtype),
        ],
        axis=1,
    )
    # grouped NATURAL layout for the (CHUNK, PIX) kernel: GROUP_TILES
    # row-major blocks stack to one (128, PIX) group — a FREE reshape
    # (contiguous either way; round 4's PIX-major grouping paid a real
    # XLA transpose here AND per-tile lane-rolls in the kernel)
    t_out = tg.shape[0]
    gt = tiles_packed.GROUP_TILES
    t_pad = -(-t_out // gt) * gt
    if t_pad != t_out:
        tg = jnp.pad(tg, ((0, t_pad - t_out), (0, 0), (0, 0)))
    tg_g = tg.reshape(t_pad // gt, gt * tiles_packed.TG_ROWS, tiles.PIX)

    # ---- chunk compaction: an executed chunk with no flush whose open
    # tile is already frozen (saturated) is a whole-chunk no-op — the old
    # in-kernel skip branch still paid its grid iteration, fields DMA,
    # head-block DMA and grad write. Compute the skip set HERE (it is a
    # pure function of tile_lo + the forward's exported freeze slots, out
    # row 5) and hand the kernel a descending list of ACTIVE chunks only.
    # Trained scenes saturate early, so this trims a large slice of the
    # backward grid exactly where the trained workload is slowest.
    nc = cap // CHUNK
    ci = jnp.arange(nc, dtype=jnp.int32)
    ng_c = tile_lo[1:] - tile_lo[:-1]
    frz_t = totals[:, 5, 0]  # (t_out,) freeze start slot per LOCAL tile
    open_loc = jnp.clip(tile_lo[:-1] - meta[1], 0, num_tiles - 1)
    frz_open = _ob(frz_t[:, None][open_loc])[:, 0]
    active = (ci < meta[0]) & (
        (ng_c > 0) | ((ci * CHUNK).astype(jnp.float32) < frz_open)
    )
    n_active = jnp.sum(active.astype(jnp.int32))
    # descending compaction: active chunks first, by descending chunk id;
    # inactive entries keep their (in-bounds) chunk id for safe prefetch
    sort_key = jnp.where(active, (nc - 1) - ci, nc + ci)
    _, chunk_map = jax.lax.sort((sort_key, ci), num_keys=2, is_stable=False)
    meta_b = jnp.stack([n_active, meta[1], meta[2], meta[3]])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(cap // CHUNK,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # fields
            pl.BlockSpec(memory_space=pltpu.ANY),  # tg blocks
            pl.BlockSpec(memory_space=pltpu.ANY),  # zero-init grads
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, NUM_FIELDS, CHUNK), jnp.float32),  # fbuf
            pltpu.VMEM(
                (
                    tiles_packed.TG_NGROUPS,
                    gt * tiles_packed.TG_ROWS,
                    tiles.PIX,
                ),
                jnp.float32,
            ),  # gbuf group ring
            pltpu.VMEM((tiles_packed.TG_ROWS, tiles.PIX), jnp.float32),
            pltpu.VMEM((2, NUM_FIELDS, CHUNK), jnp.float32),  # wbuf
            pltpu.VMEM((1, tiles.PIX), jnp.float32),  # s_carry
            pltpu.VMEM((1, tiles.PIX), jnp.float32),  # lt_carry
            pltpu.SMEM((2,), jnp.int32),  # gstate: [resident lo, prefetched]
            pltpu.SemaphoreType.DMA((2,)),  # fields
            pltpu.SemaphoreType.DMA((tiles_packed.TG_NGROUPS,)),  # groups
            pltpu.SemaphoreType.DMA((2,)),  # grad writes
        ],
    )
    # skipped chunks' grad rows must read as zeros in the reducers: alias a
    # zero buffer into the output (flattened input index 5 = after the 3
    # scalar-prefetch operands + fields + tg)
    zeros_grads = jnp.zeros((NUM_FIELDS, cap), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NUM_FIELDS, cap), jnp.float32),
        interpret=tiles.interpret_mode(),
        input_output_aliases={5: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_lo, chunk_map, meta_b, fields, tg_g, zeros_grads)


def _segment_prefix_diff(d_pre, end_idx, valid, compensated: bool):
    """Per-segment sums of d_pre rows via prefix differences at end_idx.

    d_pre: (rows, live) values in segment-contiguous order; end_idx: (n,)
    inclusive-end row count per segment (nondecreasing); valid: (n,) bool
    (False -> zero segment).

    compensated=True adds an error-compensated second term: the raw
    prefix-diff error is O(eps * |prefix|) ABSOLUTE per segment, and the
    moment columns' prefixes reach ~1e6 on 1080p scenes — up to ~0.3
    absolute noise on small-gradient splats (measured vs a float64
    scatter-add oracle). The realized f32 increments inc_i = cs_i -
    cs_{i-1} differ from d_pre_i by the per-step rounding r_i (computable
    exactly in f32 — Fast2Sum residue); a second prefix over r recovers
    the lost mass, leaving only second-order error. Both prefix samples
    ride ONE row gather (row gathers cost the same regardless of width)."""
    live = d_pre.shape[1]
    n = end_idx.shape[0]
    rows = d_pre.shape[0]
    # blocked matmul prefix: ~7x cheaper than the 19-pass XLA scan at
    # better max error (binning.blocked_prefix)
    cs = _ob(blocked_prefix(d_pre))
    if compensated:
        prev_cs = jnp.concatenate([jnp.zeros((1, live), cs.dtype), cs[:-1]], 0)
        r = d_pre - (cs - prev_cs)
        cr = _ob(blocked_prefix(r))
        cs = jnp.concatenate([cs, cr], axis=1)
    cs_end = jnp.where(
        valid[:, None],
        _row_gather_sorted(cs, jnp.clip(end_idx - 1, 0, rows - 1)),
        0.0,
    )
    prev = jnp.concatenate(
        [jnp.zeros((1, cs.shape[1]), cs.dtype), cs_end[:-1]], 0
    )
    seg = cs_end - prev
    if compensated:
        seg = seg[:, :live] + seg[:, live:]
    return seg


def _reduce_instance_grads_packed(
    grads, perm, boundaries, compensated: bool = False
):
    """(NUM_FIELDS, exec_cap) slot-aligned grads -> (N, NUM_FIELDS)
    per-gaussian.

    The packed kernels write one grad row per SORTED SLOT, so the
    gaussian-major reordering is the precomputed binning permutation (one
    int32 sort there replaces the round-1 reduction's f32 (key, pos) sort
    here); per-gaussian sums are prefix differences at the EMISSION
    boundaries (emit_cum — culled emissions ride the permutation with
    exact-zero grad rows, so no kept-only prefix is needed;
    error-compensated when `compensated` — exact-grad mode). The grad
    buffer may be SHORTER than the slot domain (execution capacity):
    every kept slot lies below chunks_exec*CHUNK <= exec_cap whenever
    grad_overflow == 0, so slicing perm to exec_cap positions loses
    nothing; rows past the emitted total (or perm entries past the buffer
    on an overflowing frame) are masked before the cumsum."""
    live = NUM_USED_FIELDS
    n = boundaries.shape[0]
    rows = grads.shape[1]  # exec_cap
    # transpose only the live rows: the minor-dim-16 transpose is the slow
    # XLA transpose class, and the row gather's cost is width-independent
    rows_all = _ob(grads[:live].T)  # (exec_cap, live)
    p = perm[:rows]
    d_pre = _ob(rows_all[jnp.minimum(p, rows - 1)])
    emit_total = boundaries[-1]
    idx = jnp.arange(rows, dtype=jnp.int32)
    d_pre = jnp.where(
        ((idx < emit_total) & (p < rows))[:, None], d_pre, 0.0
    )
    seg = _segment_prefix_diff(d_pre, boundaries, boundaries > 0, compensated)
    return jnp.concatenate(
        [seg, jnp.zeros((n, NUM_FIELDS - live), seg.dtype)], axis=1
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def blend_gaussians_packed(
    tiles_x: int,
    t_out: int,
    num_tiles: int,
    cap: int,
    cap_total: int,
    fast_grad: bool,
    table,
    bookkeeping,
):
    """Packed-chunk stage + alpha-composite (render/tiles_packed.py).
    Returns (t_out, OUT_ROWS, PIX) tile blocks like blend_gaussians.

    t_out: output tile-block count — num_tiles when unsharded, this
      device's tile-slice size under tile sharding (out blocks are indexed
      by tile - tile_start).
    num_tiles: GLOBAL tile count (staging dead-check domain).
    cap: slot count of this call's sorted-array slice (== cap_total when
      unsharded). cap_total: the global slot domain (presort-slot keys).
    bookkeeping: (gid_sorted, tid_sorted, sent_sorted, j_sorted, tile_lo,
      meta, perm, boundaries) with meta = [chunks_exec, tile_start,
      tile_end, cap_total] int32, all sliced to this device's chunk range
      under sharding. perm is the global sorted-slot -> gaussian-major
      permutation (full coverage) or None under sharding, where the VJP
      instead reduces the local slot slice by its presort-slot keys
      (boundaries = binning.emit_cum)."""
    (gid_sorted, tid_sorted, sent_sorted, j_sorted, tile_lo, meta, perm,
     boundaries) = bookkeeping
    fields = _build_fields_packed(
        table, gid_sorted, tid_sorted, sent_sorted, j_sorted, tiles_x,
        num_tiles, cap_total,
    )
    return _blend_forward_call_packed(t_out, cap, fields, tile_lo, meta)


def _blend_packed_fwd(
    tiles_x, t_out, num_tiles, cap, cap_total, fast_grad, table, bookkeeping
):
    (gid_sorted, tid_sorted, sent_sorted, j_sorted, tile_lo, meta, perm,
     boundaries) = bookkeeping
    fields = _build_fields_packed(
        table, gid_sorted, tid_sorted, sent_sorted, j_sorted, tiles_x,
        num_tiles, cap_total,
    )
    out = _blend_forward_call_packed(t_out, cap, fields, tile_lo, meta)
    return out, (fields, tile_lo, meta, perm, boundaries, out)


def _blend_packed_bwd(
    tiles_x, t_out, num_tiles, cap, cap_total, fast_grad, res, g
):
    fields, tile_lo, meta, perm, boundaries, out = res
    grads = _blend_backward_call_packed(
        t_out, cap, fast_grad, fields, tile_lo, meta, out, g
    )
    if perm is None:
        # tile-sharded: reduce only this device's slot slice by its
        # presort-slot keys (kernel grad row PRESORT_ROW); boundaries is
        # emit_cum. Rows past the executed chunks are uninitialized.
        d_table = _reduce_instance_grads(
            grads, boundaries, cap_total, jnp.int32(0), meta[0] * CHUNK,
            True, compensated=not fast_grad,
        )
    else:
        d_table = _reduce_instance_grads_packed(
            grads, perm, boundaries, compensated=not fast_grad
        )
    return d_table, None


blend_gaussians_packed.defvjp(_blend_packed_fwd, _blend_packed_bwd)


def _blend_forward_call(
    tiles_x: int, num_tiles: int, fields, tile_ids, starts, ends, nchunks
):
    kernel = functools.partial(tiles.forward_kernel, tiles_x=tiles_x)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, tiles.OUT_ROWS, tiles.PIX),
            lambda t, *_: (t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((3, NUM_FIELDS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (num_tiles, tiles.OUT_ROWS, tiles.PIX), jnp.float32
        ),
        interpret=tiles.interpret_mode(),
    )(tile_ids, starts, ends, nchunks, fields)


def _blend_backward_call(
    tiles_x: int,
    num_tiles: int,
    cap: int,
    grad_cap: int,
    fast_grad: bool,
    fields,
    tile_ids,
    starts,
    ends,
    nchunks,
    grad_base,
    totals,
    gout,
):
    kernel = functools.partial(
        tiles.backward_kernel,
        tiles_x=tiles_x,
        cap=cap,
        grad_cap=grad_cap,
        fast_grad=fast_grad,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # fields
            pl.BlockSpec(memory_space=pltpu.ANY),  # totals
            pl.BlockSpec(memory_space=pltpu.ANY),  # gout
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((3, NUM_FIELDS, CHUNK), jnp.float32),  # fbuf
            pltpu.VMEM((2, NUM_FIELDS, CHUNK), jnp.float32),  # gbuf
            pltpu.VMEM((tiles.OUT_ROWS, tiles.PIX), jnp.float32),  # totals
            pltpu.VMEM((tiles.OUT_ROWS, tiles.PIX), jnp.float32),  # gout
            pltpu.SemaphoreType.DMA((5,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NUM_FIELDS, grad_cap), jnp.float32),
        interpret=tiles.interpret_mode(),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_ids, starts, ends, nchunks, grad_base, fields, totals, gout)


def _reduce_instance_grads(
    grads,
    boundaries,
    cap: int,
    grad_lo,
    grad_hi,
    partial_coverage: bool,
    compensated: bool = False,
):
    """(NUM_FIELDS, grad_cap) per-instance grads -> (N, NUM_FIELDS)
    per-gaussian grads.

    Deterministic, scatter-free: ONE (key, position) sort on the pre-sort
    slot (row PRESORT_ROW; gaussian-major emission order) followed by one
    row gather brings grads to gaussian-contiguous order; per-gaussian sums
    are prefix-sum differences at the emission boundaries. Rows outside the
    [grad_lo, grad_hi) coverage are uninitialized memory (other devices'
    tiles under tile sharding) and are keyed to the >= cap sentinel; the
    kernels already sentinel-tag (and zero) foreign/dead lanes inside
    covered chunks.

    Boundaries: `boundaries` is always the slot-domain emit_cum; the
    per-device count #{covered slots <= emit_cum[i]-1} is recovered with
    one rank pass over the already-sorted keys, which absorbs both the
    cull's compaction and (under tile sharding) the device's partial
    coverage — since round 5 every caller uses this mode (the packed
    default reduces via the precomputed perm instead,
    _reduce_instance_grads_packed).

    Precision note: the raw prefix-difference introduces O(eps * |prefix|)
    absolute error per gaussian (vs exact per-segment addition) — up to
    ~0.3 absolute on the moment columns at 1080p scale. `compensated`
    (exact-grad mode) adds the Fast2Sum error-prefix second term
    (_segment_prefix_diff), reducing it to second order.
    """
    n = boundaries.shape[0]
    grad_cap = grads.shape[1]
    live = NUM_USED_FIELDS
    pos = jnp.arange(grad_cap, dtype=jnp.int32)
    covered = (pos >= grad_lo) & (pos < grad_hi)
    key = jnp.where(covered, grads[PRESORT_ROW].astype(jnp.int32), cap)
    key = jnp.where((key >= 0) & (key < cap), key, cap)
    # sort only (key, position); the grad columns are brought into sorted
    # order afterward by ONE row gather (grads transposed row-major first).
    # Carrying all `live` columns through the sort as payloads costs ~2x
    # more (measured): sort data movement scales with payload width, while
    # a (cap, NUM_FIELDS) row gather is ~7ns/row regardless of width.
    # (key, pos) lexicographic with pos unique == stable-by-key, minus the
    # hidden iota a stable sort adds
    key_s, idx_s = jax.lax.sort((key, pos), num_keys=2, is_stable=False)
    rows_all = _ob(grads[:live].T)  # (grad_cap, live), bandwidth-cheap
    # a tile-sharded local buffer can be SMALLER than the global slot
    # domain `cap`; all row-level work below runs at min(grad_cap, cap)
    key_c = key_s[:cap]
    d_pre = _ob(rows_all[idx_s[:cap]])  # (cap, live) gaussian-major
    # rows keyed >= cap (uncovered / sentinel-tagged / dead lanes) may hold
    # garbage; they sort to the tail but can still land inside [0, cap)
    d_pre = jnp.where((key_c < cap)[:, None], d_pre, 0.0)
    if partial_coverage:
        end_pos = _rank_in_sorted(key_c, boundaries - 1)
    else:
        end_pos = boundaries  # kept-instance boundary COUNTS, nondecreasing
    seg = _segment_prefix_diff(d_pre, end_pos, end_pos > 0, compensated)
    return jnp.concatenate(
        [seg, jnp.zeros((n, NUM_FIELDS - live), seg.dtype)], axis=1
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def blend_gaussians(
    tiles_x: int,
    num_tiles: int,
    cap: int,
    grad_cap: int,
    partial_coverage: bool,
    fast_grad: bool,
    table,
    bookkeeping,
    tile_ids,
    grad_range,
):
    """Stage + alpha-composite. Returns (T, OUT_ROWS, PIX): rows 0..2 color
    (no background), row 3 final transmittance.

    table: (N, NUM_FIELDS) differentiable per-gaussian fields.
    bookkeeping: tuple (gid_sorted, j_sorted, starts, ends, nchunks,
      grad_base, boundaries) — `starts..grad_base` sliced per device when
      the tile grid is sharded; gid_sorted/j_sorted/boundaries always
      global. `boundaries` is binning.emit_cum (slot domain).
    partial_coverage: True when the VJP must recover per-device gaussian
      boundaries by ranking slot-domain emit_cum against the sorted keys —
      since round 5 that is every caller (exact under full coverage too).
    tile_ids maps grid index -> global tile id (identity when unsharded).
    grad_range: (lo, hi) coverage of this call's grad writes.
    """
    gid_sorted, j_sorted, starts, ends, nchunks, grad_base, boundaries = (
        bookkeeping
    )
    fields = _build_fields(table, gid_sorted, j_sorted)
    return _blend_forward_call(
        tiles_x, num_tiles, fields, tile_ids, starts, ends, nchunks
    )


def _blend_fwd(
    tiles_x,
    num_tiles,
    cap,
    grad_cap,
    partial_coverage,
    fast_grad,
    table,
    bookkeeping,
    tile_ids,
    grad_range,
):
    gid_sorted, j_sorted, starts, ends, nchunks, grad_base, boundaries = (
        bookkeeping
    )
    fields = _build_fields(table, gid_sorted, j_sorted)
    out = _blend_forward_call(
        tiles_x, num_tiles, fields, tile_ids, starts, ends, nchunks
    )
    res = (fields, bookkeeping, tile_ids, grad_range, out)
    return out, res


def _blend_bwd(
    tiles_x, num_tiles, cap, grad_cap, partial_coverage, fast_grad, res, g
):
    fields, bookkeeping, tile_ids, grad_range, out = res
    _, _, starts, ends, nchunks, grad_base, boundaries = bookkeeping
    grads = _blend_backward_call(
        tiles_x,
        num_tiles,
        cap,
        grad_cap,
        fast_grad,
        fields,
        tile_ids,
        starts,
        ends,
        nchunks,
        grad_base,
        out,
        g,
    )
    d_table = _reduce_instance_grads(
        grads, boundaries, cap, grad_range[0], grad_range[1],
        partial_coverage, compensated=not fast_grad,
    )
    return d_table, None, None, None


blend_gaussians.defvjp(_blend_fwd, _blend_bwd)


def assemble_image(
    out_tiles: jax.Array, settings: RasterSettings, complete=None, bg=None
):
    """(T, OUT_ROWS, PIX) tile blocks -> (color (3,H,W), final_T (H,W)).

    Rows 4+ (the backward's lt_final/stop residuals) are sliced off BEFORE
    the block->image transpose: XLA does not propagate the downstream slice
    through it, so transposing all OUT_ROWS cost ~2x in both directions
    (the VJP zero-pads the sliced rows back, which is free).

    `complete`, if given, is a (T,) bool mask: incomplete tiles (never
    flushed on an exec-clamped frame) are replaced by empty-tile blocks
    (T=1 -> pure background). Applied HERE, after the 4-row slice, so the
    soft-clamp select touches half the bytes of masking the full OUT_ROWS
    blocks (and so does its VJP).

    `bg` (3,), if given: the background composite happens in TILE-BLOCK
    space, so the block->image transpose moves 3 rows instead of 4, the
    image-space `color + T*bg` pass (and its VJP mirror) disappears, and
    final_T gets its own 1-row assembly that XLA dead-code-eliminates
    whenever the caller ignores it. Returns (image, final_T)."""
    ty, tx = settings.tiles_y, settings.tiles_x
    used = out_tiles[:, :4]

    def to_image(rows):  # (T, k, PIX) -> (k, H, W)
        k = rows.shape[1]
        blocks = rows.reshape(ty, tx, k, TILE_Y, TILE_X)
        full = jnp.transpose(blocks, (2, 0, 3, 1, 4)).reshape(
            k, ty * TILE_Y, tx * TILE_X
        )
        return full[:, : settings.height, : settings.width]

    if bg is None:
        if complete is not None:
            empty = jnp.zeros((4, used.shape[2]), used.dtype).at[3].set(1.0)
            used = jnp.where(complete[:, None, None], used, empty[None])
        full = to_image(used)
        return full[:3], full[3]
    composed = used[:, :3] + used[:, 3:4] * bg[:, None]
    ft_rows = used[:, 3:4]
    if complete is not None:
        # mask AFTER compositing: an empty tile composes to exactly bg
        # (color 0 + T 1 * bg), so the select runs on 3 rows with a
        # broadcast fill — no empty-block buffer, and the final_T row's
        # mask rides its own (DCE-able) assembly
        m = complete[:, None, None]
        composed = jnp.where(m, composed, bg[:, None])
        ft_rows = jnp.where(m, ft_rows, 1.0)
    image = to_image(composed)
    final_t = to_image(ft_rows)[0]
    return image, final_t


def render(
    means3d: jax.Array,
    cov3d: jax.Array,
    opacity: jax.Array,
    extrinsic_vector: jax.Array,
    settings: RasterSettings,
    bg: jax.Array,
    shs: Optional[jax.Array] = None,
    colors_precomp: Optional[jax.Array] = None,
    viewspace_offset: Optional[jax.Array] = None,
) -> dict:
    """Differentiable render. All-array inputs (call via models/api for the
    GaussianScene-level entry point).

    means3d (N,3), cov3d (N,6), opacity (N,), bg (3,), shs (N,K,3) or
    colors_precomp (N,3). `viewspace_offset` (N,2), if given, is an
    all-zeros tensor added to the projected means in NDC*[0.5W,0.5H] units —
    its gradient reproduces the reference's screenspace_points trick for
    densification stats (gaussian_model.py:782, backward.cu:460-461).
    """
    prep = preprocess(
        means3d, cov3d, opacity, extrinsic_vector, settings, shs, colors_precomp
    )
    if viewspace_offset is not None:
        scale = jnp.asarray(
            [0.5 * settings.width, 0.5 * settings.height], means3d.dtype
        )
        prep = prep._replace(mean2d=prep.mean2d + viewspace_offset * scale)

    binning = bin_gaussians(jax.lax.stop_gradient(prep), settings)
    table = per_gaussian_table(prep, binning.offset)
    n = means3d.shape[0]
    cap, _ = settings.resolve_caps(n)
    grad_cap = settings.resolve_grad_cap(n)
    if settings.packed:
        # execution capacity: the sorted content (kept instances +
        # sentinels) ends at chunks_exec*CHUNK << cap (the slot domain
        # carries cull/overflow slack). With a probed grad bucket, stage
        # gather + kernel grids + grad buffer + reduction all run at
        # exec_cap (~25% fewer rows on the 1080p bench); chunk clamping
        # beyond it is counted so the capacity policy re-renders.
        exec_cap = grad_cap  # == cap without a probed bucket
        nc_exec = exec_cap // CHUNK
        chunks_c = jnp.minimum(binning.chunks_exec, jnp.int32(nc_exec))
        grad_overflow = (
            jnp.maximum(binning.chunks_exec - nc_exec, 0) * CHUNK
        )
        meta = jnp.stack(
            [
                chunks_c,
                jnp.int32(0),
                jnp.int32(settings.num_tiles),
                jnp.int32(cap),
            ]
        )
        out_tiles = blend_gaussians_packed(
            settings.tiles_x,
            settings.num_tiles,
            settings.num_tiles,
            exec_cap,
            cap,
            settings.fast_grad,
            table,
            (
                binning.gid_sorted[:exec_cap],
                binning.tid_sorted[:exec_cap],
                binning.sent_sorted[:exec_cap],
                binning.j_sorted[:exec_cap],
                binning.tile_lo[: nc_exec + 1],
                meta,
                binning.perm,
                binning.emit_cum,
            ),
        )
        # SOFT clamp: tiles whose sentinel fell beyond the executed chunks
        # never flushed — their out blocks are uninitialized HBM. Replace
        # them with empty-tile blocks (T=1 -> background) so an
        # overflowing frame degrades deterministically instead of feeding
        # NaNs into the loss (one poisoned Adam step is unrecoverable; the
        # capacity policy re-renders/grows on the counted grad_overflow).
        # tile_lo[chunks_c] = first unflushed tile (== num_tiles when
        # nothing clamped, making this a no-op mask).
        first_unflushed = jnp.take(binning.tile_lo, chunks_c)
        complete = (
            jnp.arange(settings.num_tiles, dtype=jnp.int32) < first_unflushed
        )
        image, final_t = assemble_image(out_tiles, settings, complete, bg)
        return {
            "render": image,
            "final_T": final_t,
            "radii": prep.radius,
            "visibility_filter": prep.radius > 0,
            "num_instances": binning.num_instances,
            "overflow": binning.overflow,
            # report the TRUE need so the policy can size the bucket
            "grad_total": binning.chunks_exec * CHUNK,
            "grad_overflow": grad_overflow,
            "clipped": binning.clipped,
            "culled": binning.culled,
        }
    # legacy per-tile kernels: full coverage, but the reducer runs in
    # partial_coverage mode since round 5 — the kept-only boundary prefix
    # (boundary_cum) is gone from Binning (the packed default no longer
    # needs it), and the rank recovery inside the VJP is exact under any
    # coverage including full
    out_tiles = blend_gaussians(
        settings.tiles_x,
        settings.num_tiles,
        cap,
        grad_cap,
        True,
        settings.fast_grad,
        table,
        (
            binning.gid_sorted,
            binning.j_sorted,
            binning.starts,
            binning.ends,
            binning.nchunks,
            binning.grad_base,
            binning.emit_cum,
        ),
        jnp.arange(settings.num_tiles, dtype=jnp.int32),
        (jnp.int32(0), binning.grad_total),
    )
    image, final_t = assemble_image(out_tiles, settings, None, bg)
    return {
        "render": image,
        "final_T": final_t,
        "radii": prep.radius,
        "visibility_filter": prep.radius > 0,
        "num_instances": binning.num_instances,
        "overflow": binning.overflow,
        "grad_total": binning.grad_total,
        "grad_overflow": binning.grad_overflow,
        "clipped": binning.clipped,
        "culled": binning.culled,
    }
