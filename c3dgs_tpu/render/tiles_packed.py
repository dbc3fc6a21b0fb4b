"""Packed-chunk Pallas TPU kernels: forward + backward alpha compositing.

Round-2 redesign of tiles.py (kept during bring-up as the reference
implementation). The per-tile kernels there iterate ceil(count/CHUNK)
windows per tile, so every tile pays a remainder window — ~37% of kernel
iterations were partially-masked lanes on the 1080p/300k bench
(docs/PERF.md). Here the grid walks the ALIGNED 128-slot chunks of the
global sorted instance array directly: every iteration holds CHUNK real
instances, tile boundaries land *inside* chunks and are handled by
group-masked triangular matmuls + per-group output flushes.

Key mechanics (bookkeeping from binning.bin_gaussians):
- the sorted array is [tile segments..., one sentinel lane per tile at the
  segment end, invalid tail]; tiles therefore FLUSH (emit their output
  block) at their sentinel lane, in ascending tile order;
- `tile_lo[c]` = #tiles whose sentinel lies before chunk c, so chunk c
  flushes tiles [tile_lo[c], tile_lo[c+1]) and its lanes group as
  grp = tid - tile_lo[c] (a staged field row carries tid; sentinel /
  invalid / culled lanes carry tid = num_tiles and staged opacity 0);
- gaussian means are staged TILE-LOCAL (x - tile_origin_x), so one local
  pixel-coordinate set serves every lane regardless of which tile it
  belongs to — the reason one chunk can serve many tiles at once;
- in-chunk prefix/suffix transmittance sums use the triangular ones matrix
  masked by same-group (still exactly bf16, so the 2-pass hi/lo split of
  tiles._tri_dot stays exact); the cross-chunk carry applies to group 0
  only (only the first group can span backward — every other group's
  segment starts inside the chunk, because its predecessor's sentinel is
  in the same chunk);
- gradients are written one row per SORTED SLOT at chunk-aligned offsets
  (grad buffer == instance capacity, no per-tile chunk cover, no pre-sort
  tag row): the reduction to per-gaussian grads is a precomputed int32
  permutation (binning.perm) + cumsum — the f32 (key, pos) sort of the
  round-1 reduction disappears;
- saturation early-exit becomes a per-tile FREEZE: between chunks, if no
  flush is pending and every pixel's log-transmittance is below
  log(1e-6), the forward freezes the open tile (skips whole chunks,
  stops advancing lt) and exports the freeze START SLOT in output row 5;
  the backward dead-masks lanes with slot >= freeze[tile] — bit-identical
  skip sets, like round-1's per-tile stop index but at slot granularity.

Same numerics as tiles.py everywhere else: back-to-front backward with
suffix-carry, exact log-domain lt walk from the exported lt_final, alpha
cap/min semantics, fast_grad tolerance classes. Reference semantics:
forward.cu:270-383 / backward.cu:398-557 (see tiles.py's docstring for
the documented divergences).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import CHUNK, NUM_FIELDS, OFFSET_ROW as OFFSET_FIELD_ROW
from .tiles import (
    LOG_EXIT_T,
    LOG_STOP_T,
    MAX_ALPHA,
    MIN_ALPHA,
    OUT_ROWS,
    PIX,
    STOP_T,
    _tri_dot,
    _tri_dot_1pass,
    _row_sum,
)
from .types import TILE_X, TILE_Y

TID_ROW = 9  # staged field row carrying the lane's tile id (f32 exact)

# slim backward tile-block layout (rasterizer._blend_backward_call_packed
# packs only the 7 used totals/cotangent rows, padded to 8 sublanes):
TG_EXP_LT = 0  # exp(lt_final) == T_final
TG_LT = 1  # lt_final (the exact log-domain walk anchor)
TG_FRZ = 2  # freeze start slot
TG_GC = 3  # rows 3..5: dL/dC
TG_GT = 6  # dL/dT_final
TG_ROWS = 8

# grouped NATURAL tile-block layout (round 5, the (CHUNK, PIX) kernel):
# 16 row-major (TG_ROWS, PIX) blocks stack to a (128, PIX) group — a FREE
# XLA reshape of the (T, TG_ROWS, PIX) slim array (contiguous either way;
# round 4's PIX-major grouping needed a real transpose). In the
# (CHUNK, PIX) operand orientation a tile's data is consumed as (1, PIX)
# ROWS, so the per-tile read is one dynamic-SUBLANE slice of the resident
# group — dynamic sublane offsets are native to the TPU memory path,
# unlike round 4's per-tile dynamic lane-rolls, which serialized on the
# VPU permute unit (~4.4 ms/frame on the 1080p bench, nohead strip probe).
GROUP_TILES = 16  # tiles per (GROUP_TILES * TG_ROWS, PIX) group block
TG_NGROUPS = 12  # resident ring: must exceed the widest single-chunk tile
# span, ceil((CHUNK + 1) / GROUP_TILES) + 1 = 10 (a chunk flushes at most
# CHUNK tiles — one sentinel per lane)


def _local_pixel_coords():
    """Tile-local pixel x/y, (PIX, 1) f32 — lanes carry tile-local means, so
    these serve every lane of every tile."""
    pix = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    px = (pix % TILE_X).astype(jnp.float32)
    py = (pix // TILE_X).astype(jnp.float32)
    return px, py


def _group_ids(f, lo):
    """(1, CHUNK) f32 group index per lane: tid - tile_lo[c]. Sentinel /
    invalid lanes carry tid = num_tiles, putting them past every real
    group (they are dead anyway: staged opacity 0)."""
    return f[TID_ROW : TID_ROW + 1, :] - jnp.float32(1.0) * lo.astype(
        jnp.float32
    )


def _masked_tris(grp, probe: str = ""):
    """Group-masked (CHUNK, CHUNK) ones matrices: strict-lower prefix and
    strict-upper suffix restricted to same-group lanes. Entries are 0/1 —
    exactly bf16 — so _tri_dot's 2-pass split stays exact."""
    row = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    if probe == "tris":  # timing probe: skip the grp lane->sublane relayout
        strict = (row < col).astype(jnp.float32)
        upper = (row > col).astype(jnp.float32)
        return strict, upper
    same = grp.reshape(CHUNK, 1) == grp.reshape(1, CHUNK)
    strict = ((row < col) & same).astype(jnp.float32)
    upper = ((row > col) & same).astype(jnp.float32)
    return strict, upper


def _chunk_alpha_packed(f, px, py, op_eff):
    """Alpha evaluation for one aligned chunk (cf. tiles._chunk_alpha).
    op_eff is the lane opacity row with dead lanes (foreign / frozen /
    sentinel / invalid) already zeroed — deadness rides opacity, so alpha,
    tlog, and every gradient of a dead lane are exactly 0."""
    x = f[0:1, :]
    y = f[1:2, :]
    a2 = f[2:3, :]
    b2 = f[3:4, :]
    c2 = f[4:5, :]
    dx = x - px
    dy = y - py
    power = jnp.minimum((a2 * dx + b2 * dy) * dx + (c2 * dy) * dy, 0.0)
    raw = op_eff * jnp.exp(power)
    capped = raw > MAX_ALPHA
    alpha = jnp.minimum(MAX_ALPHA, raw)
    alpha = jnp.where(raw >= MIN_ALPHA, alpha, 0.0)
    return dx, dy, alpha, capped


def forward_kernel(
    tile_lo_ref,  # (NC+1,) int32 first unflushed tile per chunk boundary
    meta_ref,  # (4,) int32: [chunks_exec, tile_start, tile_end, cap]
    fields_hbm,  # (NUM_FIELDS, cap) staged sorted instance fields
    out_hbm,  # (T, OUT_ROWS, PIX) per-tile output blocks (manual DMA)
    fbuf,  # VMEM (2, NUM_FIELDS, CHUNK)
    obuf,  # VMEM (2, OUT_ROWS, PIX) flush staging ring
    carry_c,  # VMEM (3, PIX) open tile's color accumulator (row-major so
    # the flush's output block needs no (PIX, k) -> (k, PIX) relayout)
    carry_lt,  # VMEM (PIX, 1) open tile's log-transmittance
    frz,  # SMEM (1,) freeze start slot of the open tile, -1 = live
    sems,  # DMA (2,) fields
    osems,  # DMA (2,) out
):
    """Packed forward. Grid = cap//CHUNK; chunks >= chunks_exec no-op.

    `tile_start`/`tile_end` bound this device's tile ownership under tile
    sharding (parallel/sharded.py): lanes of foreign tiles are dead-masked
    and their flushes skipped; single-device rendering passes [0, T)."""
    c = pl.program_id(0)
    nchunks = meta_ref[0]
    tile_start = meta_ref[1]
    tile_end = meta_ref[2]
    cap = meta_ref[3]
    max_chunk = pl.num_programs(0) - 1

    def dma(slot, i):
        i = jnp.minimum(i, max_chunk)
        return pltpu.make_async_copy(
            fields_hbm.at[:, pl.ds(pl.multiple_of(i * CHUNK, CHUNK), CHUNK)],
            fbuf.at[slot],
            sems.at[slot],
        )

    def out_dma(slot, t):
        return pltpu.make_async_copy(obuf.at[slot], out_hbm.at[t], osems.at[slot])

    @pl.when(c == 0)
    def _():
        carry_c[...] = jnp.zeros((3, PIX), jnp.float32)
        carry_lt[...] = jnp.zeros((PIX, 1), jnp.float32)
        frz[0] = -1
        dma(0, 0).start()

        @pl.when(nchunks >= 2)
        def _():
            dma(1, 1).start()

    @pl.when(c < nchunks)
    def _body():
        @pl.when((c + 2 <= nchunks) & (c > 0))
        def _():
            dma((c + 1) % 2, c + 1).start()

        dma(c % 2, c).wait()
        f = fbuf[c % 2]

        lo = jnp.maximum(tile_lo_ref[c], tile_start)
        hi = jnp.minimum(tile_lo_ref[c + 1], tile_end)
        ng = jnp.maximum(hi - lo, 0)
        slot0 = c * CHUNK
        frz0 = frz[0]

        # freeze: open tile saturated everywhere and no flush pending —
        # skip the chunk entirely; lt stops advancing (exported below so
        # the backward skips the same lanes)
        frozen = (ng == 0) & (jnp.max(carry_lt[...]) < LOG_EXIT_T)

        @pl.when(frozen & (frz0 < 0))
        def _():
            frz[0] = slot0

        @pl.when(~frozen)
        def _compute():
            px, py = _local_pixel_coords()
            grp = _group_ids(f, lo)
            # dead lanes: frozen open tile's remainder + pad/invalid rows
            # (tid >= tile_end; grp < 0 is impossible — sorted order puts
            # every earlier tile's lanes in earlier chunks, and the routed
            # sharded arrays hold only owned tiles); sentinel lanes are
            # dead via staged opacity 0
            tid = f[TID_ROW : TID_ROW + 1, :]
            dead = tid >= jnp.float32(1.0) * tile_end
            dead = dead | ((frz0 >= 0) & (grp == 0.0))
            op_eff = jnp.where(dead, 0.0, f[5:6, :])
            dx, dy, alpha, _ = _chunk_alpha_packed(f, px, py, op_eff)
            del dx, dy
            tlog = jnp.log1p(-alpha)
            strictM, _ = _masked_tris(grp)
            s_excl = _tri_dot(tlog, strictM)
            lt_in = s_excl + carry_lt[...] * (grp == 0.0)
            t_in = jnp.exp(lt_in)
            live = t_in * (1.0 - alpha) >= STOP_T
            w = jnp.where(live, alpha * t_in, 0.0)
            colors = f[6:9, :]

            def group_color(mask):
                # (3, PIX) row-major output: M=3 on the MXU (vs M=PIX for
                # the (PIX, 3) orientation) and the flush block assembles
                # with no transpose
                return jax.lax.dot_general(
                    colors,
                    w * mask,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            def emit(t, col, lt, fz):
                # out blocks are indexed by LOCAL tile id (t - tile_start):
                # a tile-sharded device owns a (t_local, OUT_ROWS, PIX) out.
                # Ring/wait discipline is tile-indexed: tiles flush in
                # strictly ascending order across the whole grid.
                lt_row = lt.T  # the flush's ONE (PIX,1)->(1,PIX) relayout

                @pl.when(t >= 2)
                def _():
                    out_dma((t - 2) % 2, t - 2).wait()

                obuf[t % 2] = jnp.concatenate(
                    [
                        col,
                        jnp.exp(lt_row),
                        lt_row,
                        jnp.full((1, PIX), 1.0, jnp.float32)
                        * fz.astype(jnp.float32),
                        jnp.zeros((OUT_ROWS - 6, PIX), jnp.float32),
                    ],
                    axis=0,
                )
                out_dma(t % 2, t).start()

            # head flush (group 0) hoisted out of the loop: ~87% of
            # flushing chunks flush exactly one tile, so the fori_loop
            # below usually runs ZERO iterations (its scalar-loop
            # machinery was pure overhead); only group 0 takes the carry
            # and the freeze slot
            @pl.when(ng >= 1)
            def _():
                m0 = (grp == 0.0)
                emit(
                    lo - tile_start,
                    group_color(m0) + carry_c[...],
                    _row_sum(tlog * m0) + carry_lt[...],
                    jnp.where(frz0 >= 0, frz0, cap),
                )

            def flush(g, _):
                mg = (grp == g.astype(jnp.float32))
                emit(
                    lo + g - tile_start,
                    group_color(mg),
                    _row_sum(tlog * mg),
                    cap,
                )
                return 0

            jax.lax.fori_loop(1, ng, flush, 0)

            # trailing (still-open) group: carry for the next chunk
            mt = (grp == ng.astype(jnp.float32))
            selt = jnp.where(ng == 0, 1.0, 0.0)
            carry_c[...] = selt * carry_c[...] + group_color(mt)
            carry_lt[...] = selt * carry_lt[...] + _row_sum(tlog * mt)

            @pl.when(ng > 0)
            def _():
                frz[0] = -1

    # drain the flush ring at the very end: wait only for tiles that
    # actually FLUSHED (ADVICE r3 — keying on tile count alone deadlocks
    # when an exec-cap clamp leaves trailing tiles unflushed: fewer out-DMAs
    # were ever started than tiles exist). tile_lo[nchunks] = first
    # unflushed tile after the last executed chunk.
    @pl.when(c == pl.num_programs(0) - 1)
    def _():
        n_flushed = (
            jnp.clip(tile_lo_ref[nchunks], tile_start, tile_end) - tile_start
        )

        @pl.when(n_flushed >= 2)
        def _():
            out_dma((n_flushed - 2) % 2, n_flushed - 2).wait()

        @pl.when(n_flushed >= 1)
        def _():
            out_dma((n_flushed - 1) % 2, n_flushed - 1).wait()


def _tri_dot_left(tri, x):
    """tri @ x at ~f32 accuracy in 2 MXU passes — the left-multiplying
    sibling of tiles._tri_dot (same exactness argument: tri is 0/1 =
    exactly bf16, only x needs the hi/lo split)."""
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    lo = x - hi
    d = lambda a: jnp.dot(tri, a, preferred_element_type=jnp.float32)
    return d(hi) + d(lo)


def _tri_dot_left_1pass(tri, x):
    """Single-pass tri @ x (x truncated to bf16 by the MXU) — fast_grad's
    suffix matmul; see tiles._tri_dot_1pass for the error argument."""
    return jnp.dot(tri, x, preferred_element_type=jnp.float32)


def backward_kernel(
    tile_lo_ref,
    chunk_map_ref,  # (nc,) int32 ACTIVE chunk ids in descending order
    # (XLA precomputes which executed chunks are frozen whole-chunk skips —
    # ng == 0 and past the open tile's freeze slot — and compacts them out;
    # entries past meta[0] are the inactive chunks, kept in-bounds so
    # speculative reads stay safe). Grad rows of skipped chunks are never
    # written: the grads output is zero-initialized via input aliasing.
    meta_ref,  # (4,) int32: [n_active_chunks, tile_start, tile_end, cap]
    fields_hbm,  # (NUM_FIELDS, cap)
    tg_hbm,  # (ceil(T/GROUP_TILES), GROUP_TILES * TG_ROWS, PIX) SLIM tile
    # blocks in NATURAL row-major order, GROUP_TILES stacked per group (a
    # free reshape in the VJP wrapper); tile t's rows live in group
    # t // GROUP_TILES at sublanes (t % GROUP_TILES) * TG_ROWS
    zeros_hbm,  # (NUM_FIELDS, cap) zero buffer ALIASED to grads_hbm —
    # skipped chunks' grad rows stay zero; never read or written here
    grads_hbm,  # out (NUM_FIELDS, cap) per-slot grads
    fbuf,  # VMEM (2, NUM_FIELDS, CHUNK)
    gbuf,  # VMEM (TG_NGROUPS, GROUP_TILES * TG_ROWS, PIX) group ring
    tg_open,  # VMEM (TG_ROWS, PIX) open tile's block (natural layout)
    wbuf,  # VMEM (2, NUM_FIELDS, CHUNK) grad write ring
    s_carry,  # VMEM (1, PIX) suffix carry of the open tile
    lt_carry,  # VMEM (1, PIX) walked log-transmittance of the open tile
    gstate,  # SMEM (1,) lowest group started+waited so far
    sems,  # DMA (2,) fields
    gsems,  # DMA (TG_NGROUPS,) group ring
    wsems,  # DMA (2,) grad writes
    *,
    fast_grad: bool,
    probe: str = "",
):
    """Packed backward, (CHUNK, PIX)-oriented (round 5): chunks run in
    REVERSE (suffix-carry ordering, see tiles.backward_kernel); operands
    put the chunk's 128 lanes on SUBLANES and the tile's 512 pixels on
    LANES. That orientation makes every per-tile quantity a natural
    (1, PIX) ROW of the tile's slim block — broadcast along sublanes is
    free — so the per-tile read path is one dynamic-sublane slice of a
    resident group block instead of round 4's dynamic lane-roll (the roll
    class measured ~4.4 ms/frame via the nohead strip probe, ~1.1 us per
    tile read, VPU-permute-bound). The price is ONE (NUM_FIELDS, CHUNK) ->
    (CHUNK, NUM_FIELDS) in-kernel transpose per chunk for the per-lane
    field columns (~325 ns/chunk measured, tools/dma_probe.py) — per-lane
    EPILOGUE math (colsum outputs onward) stays in (1, CHUNK) rows straight
    off fbuf, so only the alpha-path operands need columns.

    Per chunk, the flushed tiles' cotangents / residuals are assembled into
    per-lane (CHUNK, PIX) operands via group-masked select chains; the
    trailing (open) group uses the carried walk state instead of lt_final.
    Grad rows are written at the chunk's own slot offset — the grad buffer
    is exactly slot-aligned."""
    r = pl.program_id(0)
    nchunks = meta_ref[0]  # = #active chunks (chunk-compacted walk)
    tile_start = meta_ref[1]
    tile_end = meta_ref[2]
    # the walk visits only ACTIVE chunks, in descending chunk order; the
    # carry handoff across a skipped (whole-chunk frozen) chunk is the
    # identity, so hopping over it is exact (the old in-kernel skip branch
    # passed carries through unchanged and wrote zero grad rows — those
    # rows now stay at their zero-initialized value instead)
    c = chunk_map_ref[r]
    max_chunk = pl.num_programs(0) - 1

    def dma(slot, i):
        i = jnp.clip(i, 0, max_chunk)
        return pltpu.make_async_copy(
            fields_hbm.at[:, pl.ds(pl.multiple_of(i * CHUNK, CHUNK), CHUNK)],
            fbuf.at[slot],
            sems.at[slot],
        )

    def g_dma(g):
        # group blocks are indexed by LOCAL tile id under tile sharding
        return pltpu.make_async_copy(
            tg_hbm.at[g], gbuf.at[g % TG_NGROUPS], gsems.at[g % TG_NGROUPS]
        )

    def ensure_resident(target):
        """Stream the group ring down so groups [target, target + 10] are
        resident. Combined start+wait slide (descending): n <= TG_NGROUPS
        distinct ring slots per slide, so no slot is double-started; a
        jump farther than the ring skips the groups that would be
        immediately overwritten (they are above the current chunk's read
        span by construction). gstate[1] tracks a group whose DMA was
        already PREFETCHED (started, not waited) at the end of the
        previous chunk — the slide skips its start but still waits it,
        so the common streaming step pays only a (hidden) wait."""
        gs = gstate[0]
        hstate = gstate[1]
        # fast path — the streaming step: exactly the next-lower group,
        # already prefetched. One semaphore wait, no scalar loops.
        fast = (gs - 1 == target) & (hstate == target)

        @pl.when(fast)
        def _():
            g_dma(target).wait()
            gstate[0] = target
            gstate[1] = -1

        @pl.when((gs > target) & ~fast)
        def _():
            n_eff = jnp.minimum(gs - target, TG_NGROUPS)
            base = target + n_eff

            def start(i, _):
                g = base - 1 - i

                @pl.when(g != hstate)
                def _():
                    g_dma(g).start()

                return 0

            def wait(i, _):
                g_dma(base - 1 - i).wait()
                return 0

            jax.lax.fori_loop(0, n_eff, start, 0)
            jax.lax.fori_loop(0, n_eff, wait, 0)
            gstate[0] = target
            # a prefetched group the slide did NOT cover (a jump past it)
            # still has a pending start: drain it so its semaphore never
            # carries into a later wait of the same ring slot
            @pl.when((hstate >= 0) & (hstate < target))
            def _():
                g_dma(hstate).wait()

            gstate[1] = -1

    def tile_rows(t):
        """(TG_ROWS, PIX) rows of tile t (global id) from the resident
        group ring: one dynamic-SUBLANE slice — native to the TPU memory
        path (round 4's PIX-major layout needed a lane-roll here, which
        serialized on the VPU permute unit)."""
        if probe == "nohead":
            return jnp.zeros((TG_ROWS, PIX), jnp.float32)
        lt = t - tile_start
        off = (lt % GROUP_TILES) * TG_ROWS
        return gbuf[(lt // GROUP_TILES) % TG_NGROUPS, pl.ds(off, TG_ROWS), :]

    def w_dma(slot, i):
        return pltpu.make_async_copy(
            wbuf.at[slot],
            grads_hbm.at[:, pl.ds(pl.multiple_of(i * CHUNK, CHUNK), CHUNK)],
            wsems.at[slot],
        )

    @pl.when(r == 0)
    def _():
        s_carry[...] = jnp.zeros((1, PIX), jnp.float32)
        lt_carry[...] = jnp.zeros((1, PIX), jnp.float32)
        # open-tile data: zeros (the tail "group" past the last sentinel is
        # invalid lanes only; their staged opacity is 0)
        tg_open[...] = jnp.zeros((TG_ROWS, PIX), jnp.float32)
        # zero the ring: the unconditional head read may touch a slot
        # before its first DMA (no-flush chunks at walk start) — zeros
        # keep the selected-away values finite
        gbuf[...] = jnp.zeros(gbuf.shape, jnp.float32)
        dma(0, c).start()
        gstate[0] = tg_hbm.shape[0]  # nothing resident yet
        gstate[1] = -1  # no prefetched group pending

        @pl.when(nchunks >= 2)
        def _():
            dma(1, chunk_map_ref[1]).start()

    @pl.when(r < nchunks)
    def _body():
        @pl.when((r + 2 <= nchunks) & (r > 0))
        def _():
            dma((r + 1) % 2, chunk_map_ref[r + 1]).start()

        lo = jnp.maximum(tile_lo_ref[c], tile_start)
        hi = jnp.minimum(tile_lo_ref[c + 1], tile_end)
        ng = jnp.maximum(hi - lo, 0)
        if probe == "noflush":
            ng = ng * 0
        slot0 = c * CHUNK
        # freeze state of the open tile rides its freeze row (whole-chunk
        # frozen skips never reach here — XLA compacted them out of
        # chunk_map; partial freezes inside a flushing chunk are still
        # dead-masked per lane via frz_l below)
        frz_open = tg_open[TG_FRZ, 0]

        dma(r % 2, c).wait()
        f = fbuf[r % 2]
        # the ONE per-chunk relayout: per-lane field COLUMNS for the
        # (CHUNK, PIX) alpha path (the epilogue keeps using f's rows)
        ft = f[...].T  # (CHUNK, NUM_FIELDS); an MXU 2-pass transpose
        # variant measured exactly neutral here (round 5) — the vector
        # .T is not on the critical path at this chunk shape

        # tile-local pixel coordinates as (1, PIX) rows
        pix = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)
        px = (pix % TILE_X).astype(jnp.float32)
        py = (pix // TILE_X).astype(jnp.float32)

        lof = jnp.float32(1.0) * lo.astype(jnp.float32)
        grp_c = ft[:, TID_ROW : TID_ROW + 1] - lof  # (CHUNK, 1)
        grp_r = f[TID_ROW : TID_ROW + 1, :] - lof  # (1, CHUNK)
        tid_c = ft[:, TID_ROW : TID_ROW + 1]
        lane_c = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
        slot_c = (slot0 + lane_c).astype(jnp.float32)

        # ---- per-lane tile data: disjoint-group SELECT chains. The
        # trailing/open tile's value is the chain's broadcast start (covers
        # grp == ng and dead lanes harmlessly — every consumer is gated by
        # alpha = 0 there), and each flushed group overwrites its own
        # sublanes. Bit-exact: the group masks are disjoint and complete,
        # so select == sum-of-masked. Chain starts are (1, PIX) rows /
        # scalars — the first where() broadcasts them against its
        # (CHUNK, 1) mask for free.
        gtt = (
            tg_open[TG_GT : TG_GT + 1, :]
            * tg_open[TG_EXP_LT : TG_EXP_LT + 1, :]
        )
        # trailing lanes use the WALKED carry, not lt_final
        lte = lt_carry[...]
        frz_l = frz_open
        # scar stays masked (it must be ZERO off the trailing group: it
        # adds into s_all rather than selecting a lane's source)
        scar = (grp_c == ng.astype(jnp.float32)) * s_carry[...]

        # ---- head (group 0): the ring read is UNCONDITIONAL (round 5 —
        # a lax.cond here returned a (TG_ROWS, PIX) value across a region
        # boundary on every chunk and serialized the vector pipeline); for
        # a no-flush chunk t0h is the still-open tile, whose ring slot may
        # hold stale data or (on clamped frames) NaNs from unflushed HBM —
        # SAFE because every consumer is a where() SELECT gated by
        # m0b = ng >= 1 (select, never multiply: 0 x NaN never happens),
        # and gbuf is zero-initialized at walk start so never-written
        # slots read as finite zeros. ensure_resident's slide for a
        # no-flush chunk targets the open tile's group — the same group a
        # later flush needs, so the slide stays monotone and no extra DMA
        # class appears.
        t0h = jnp.clip(lo, tile_start, tile_end - 1)
        if probe != "nohead":
            ensure_resident((t0h - tile_start) // GROUP_TILES)
        tgT0 = tile_rows(t0h)
        m0b = (grp_c == 0.0) & (ng >= 1)
        gtt = jnp.where(
            m0b,
            tgT0[TG_GT : TG_GT + 1, :] * tgT0[TG_EXP_LT : TG_EXP_LT + 1, :],
            gtt,
        )
        lte = jnp.where(m0b, tgT0[TG_LT : TG_LT + 1, :], lte)
        frz_l = jnp.where(m0b, tgT0[TG_FRZ : TG_FRZ + 1, 0:1], frz_l)

        # pre-ROTATION open-tile dL/dC rows: _gc_seeds / compute_fast run
        # inside the dispatch branches, i.e. AFTER the rotation below has
        # overwritten tg_open with the head tile's rows
        O3 = tg_open[TG_GC : TG_GC + 3, :]

        # rotate the open-tile state (chunk c-1's trailing tile is this
        # chunk's group 0) — only when group 0 actually flushed here
        @pl.when(ng >= 1)
        def _():
            tg_open[...] = tgT0

        def assemble(g, ops):
            gc0, gc1, gc2, gtt, lte, frz_l = ops
            tgT = tile_rows(lo + g)  # resident: span <= TG_NGROUPS - 2
            mg = (grp_c == g.astype(jnp.float32))
            gc0 = jnp.where(mg, tgT[TG_GC + 0 : TG_GC + 1, :], gc0)
            gc1 = jnp.where(mg, tgT[TG_GC + 1 : TG_GC + 2, :], gc1)
            gc2 = jnp.where(mg, tgT[TG_GC + 2 : TG_GC + 3, :], gc2)
            gtt = jnp.where(
                mg,
                tgT[TG_GT : TG_GT + 1, :] * tgT[TG_EXP_LT : TG_EXP_LT + 1, :],
                gtt,
            )
            lte = jnp.where(mg, tgT[TG_LT : TG_LT + 1, :], lte)
            frz_l = jnp.where(mg, tgT[TG_FRZ : TG_FRZ + 1, 0:1], frz_l)
            return gc0, gc1, gc2, gtt, lte, frz_l

        # ---- head-group PREFETCH for the next chunk (measured: the
        # on-demand start+wait in ensure_resident stalls ~1 us per flush
        # chunk — ~3.3 ms/frame on the 1080p bench via the noflush strip
        # probe). Issued after this chunk's ring reads; the new group's
        # ring slot cannot collide with any group still being read (slot
        # distance would need to be >= TG_NGROUPS > the 10-group max chunk
        # span). Only one prefetch may be outstanding (gstate[1]); a
        # pending one stays valid across no-flush chunks and is either
        # skipped-but-waited by the next slide or drained on a jump.
        if probe in ("", "colsum_hp", "colsum1", "oldfast", "hybrid", "oldmm"):

            @pl.when((r + 1 < nchunks) & (gstate[1] < 0))
            def _():
                c_n = chunk_map_ref[r + 1]
                lo_n = jnp.maximum(tile_lo_ref[c_n], tile_start)
                hi_n = jnp.minimum(tile_lo_ref[c_n + 1], tile_end)
                t0n = jnp.clip(lo_n, tile_start, tile_end - 1)
                g_n = (t0n - tile_start) // GROUP_TILES

                @pl.when((hi_n > lo_n) & (g_n < gstate[0]))
                def _():
                    g_dma(g_n).start()
                    gstate[1] = g_n

        def _gc_seeds():
            """Per-lane dL/dC operands for the general (loop) path: open
            tile's rows as the broadcast chain start, head rows on group
            0's sublanes (identical to the pre-round-5 unconditional
            assembly — the fast path below never materializes these)."""
            return tuple(
                jnp.where(
                    m0b,
                    tgT0[TG_GC + k : TG_GC + k + 1, :],
                    O3[k : k + 1, :],
                )
                for k in range(3)
            )

        def compute_fast(gtt, lte, frz_l):
            """FAST-mode single-flush path (~86% of chunks on the 1080p
            bench): per-lane tile rows are selects of exactly TWO row sets
            (head tgT0 / open tg_open), so every gc-derived contraction
            factors through shared-row matmuls instead of per-lane
            (CHUNK, PIX) operand assembly:

              gc_dot = select(m0, C @ H, C @ O)          2 small matmuls
              g_rgb  = select(m0, H @ wgt^T, O @ wgt^T)  2 matmuls

            and the six g_power moments against dx = x - px collapse into
            ONE shared-basis matmul B(6, PIX) @ g_power^T plus a per-lane
            polynomial reconstruction (powers of dx expand in px powers
            with per-lane coefficients; x is the lane's tile-local mean, a
            (1, CHUNK) row straight off fbuf). Net: the gc assembly
            selects, gdx/gdy products, the six moment-input products and
            all nine M=1 colsum matmuls disappear (~12 full-size VPU
            ops/pair). Error class: matmul inputs are bf16-truncated (the
            documented fast_grad relative-perturbation class). The moments
            matmul keeps a 2-pass hi/lo split on g_power because the
            reconstruction amplifies its error by ~((|x|+32)^2 / <dx^2>)
            on small splats with far means; at 2-pass (~2^-17) the result
            stays below the 1-pass truncation class for amplifications up
            to ~256 (docs/SCALING.md error classes)."""
            dead_c = tid_c >= jnp.float32(1.0) * tile_end
            dead_c = dead_c | (slot_c >= frz_l)
            op_eff_c = jnp.where(dead_c, 0.0, ft[:, 5:6])
            x_c = ft[:, 0:1]
            y_c = ft[:, 1:2]
            a2_c = ft[:, 2:3]
            b2_c = ft[:, 3:4]
            c2_c = ft[:, 4:5]
            dx = x_c - px
            dy = y_c - py
            power = jnp.minimum(
                (a2_c * dx + b2_c * dy) * dx + (c2_c * dy) * dy, 0.0
            )
            raw = op_eff_c * jnp.exp(power)
            capped = raw > MAX_ALPHA
            alpha = jnp.minimum(MAX_ALPHA, raw)
            alpha = jnp.where(raw >= MIN_ALPHA, alpha, 0.0)

            tlog = jnp.log1p(-alpha)
            row_i = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
            col_j = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
            same = grp_c == grp_r
            sufM = ((col_j > row_i) & same).astype(jnp.float32)
            suf_in = _tri_dot_left(sufM, tlog) + tlog
            pre = lte - suf_in
            live = pre + tlog >= LOG_STOP_T
            t_in = jnp.exp(pre)
            one_m = 1.0 - alpha
            wgt = jnp.where(live, alpha * t_in, 0.0)

            H3 = tgT0[TG_GC : TG_GC + 3, :]  # (3, PIX) head dL/dC rows
            # O3 (pre-rotation open-tile rows) from the enclosing scope
            C3 = ft[:, 6:9]  # (CHUNK, 3) lane colors
            dot_p = lambda a, b: jax.lax.dot_general(
                a,
                b,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dot_r = lambda a, b: jax.lax.dot_general(
                a,
                b,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # SELECT (never multiply) against the head matmul: on clamped
            # frames tgT0 may hold NaNs from unflushed HBM, and select
            # semantics keep them out exactly like the old per-row chains
            if probe == "hybrid":  # A/B: per-row gc assembly, basis moments
                gc0, gc1, gc2 = _gc_seeds()
                gc_dot_c = (
                    gc0 * ft[:, 6:7] + gc1 * ft[:, 7:8] + gc2 * ft[:, 8:9]
                )
            else:
                gc_dot_c = jnp.where(m0b, dot_p(C3, H3), dot_p(C3, O3))
            gwc = wgt * gc_dot_c
            suf = _tri_dot_left_1pass(sufM, gwc)
            s_all = suf + scar + gtt

            g_power = gwc - s_all * (alpha / one_m)
            g_power = jnp.where(capped, 0.0, g_power)

            if probe == "oldmm":  # A/B: factored gc, colsum-based moments
                ones_row = jnp.ones((1, PIX), jnp.float32)
                colsum1 = lambda v: jax.lax.dot_general(
                    ones_row,
                    v,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                gdx = g_power * dx
                gdy = g_power * dy
                s0 = colsum1(g_power)
                mx = colsum1(gdx)
                my = colsum1(gdy)
                mxx = colsum1(gdx * dx)
                mxy = colsum1(gdx * dy)
                myy = colsum1(gdy * dy)
            else:
                # ---- (6, CHUNK) moments against the shared pixel basis.
                # Basis rows are small integers (< 2^10): the hi/lo split
                # is EXACT in two bf16 pieces, so both passes lose only
                # g_power's sub-2^-17 residual.
                basis = jnp.concatenate(
                    [jnp.ones((1, PIX), jnp.float32), px, py, px * px,
                     px * py, py * py],
                    axis=0,
                )
                b_hi = basis.astype(jnp.bfloat16).astype(jnp.float32)
                b12 = jnp.concatenate([b_hi, basis - b_hi], axis=0)
                g_hi = g_power.astype(jnp.bfloat16).astype(jnp.float32)
                mm = dot_r(b12, g_hi) + dot_r(b12, g_power - g_hi)
                m6 = mm[:6] + mm[6:]
                x = f[0:1, :]
                y = f[1:2, :]
                s0 = m6[0:1]
                spx = m6[1:2]
                spy = m6[2:3]
                mx = x * s0 - spx
                my = y * s0 - spy
                mxx = (x * x) * s0 - 2.0 * (x * spx) + m6[3:4]
                mxy = (x * y) * s0 - x * spy - y * spx + m6[4:5]
                myy = (y * y) * s0 - 2.0 * (y * spy) + m6[5:6]

            m0r = (grp_r == 0.0) & (ng >= 1)  # (1, CHUNK) row mask
            if probe == "hybrid":
                ones_row = jnp.ones((1, PIX), jnp.float32)
                colsum1 = lambda v: jax.lax.dot_general(
                    ones_row,
                    v,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                g_rgb = jnp.concatenate(
                    [colsum1(gc0 * wgt), colsum1(gc1 * wgt),
                     colsum1(gc2 * wgt)],
                    axis=0,
                )
            else:
                g_rgb = jnp.where(m0r, dot_r(H3, wgt), dot_r(O3, wgt))

            a2 = f[2:3, :]
            b2 = f[3:4, :]
            c2 = f[4:5, :]
            op = jnp.maximum(
                jnp.where(
                    (f[TID_ROW : TID_ROW + 1, :] >= jnp.float32(1.0) * tile_end),
                    0.0,
                    f[5:6, :],
                ),
                1e-12,
            )
            g_x = 2.0 * a2 * mx + b2 * my
            g_y = 2.0 * c2 * my + b2 * mx
            g_op = s0 / op

            dbg = [
                f[OFFSET_FIELD_ROW : OFFSET_FIELD_ROW + 1, :],
                jnp.zeros((NUM_FIELDS - 10, CHUNK), jnp.float32),
            ]
            gout_rows = jnp.concatenate(
                [g_x, g_y, mxx, mxy, myy, g_op, g_rgb] + dbg, axis=0
            )

            m0 = (grp_c == 0.0)
            sel0 = jnp.where(ng == 0, 1.0, 0.0)
            new_s = (
                jnp.sum(gwc * m0, axis=0, keepdims=True)
                + sel0 * s_carry[...]
            )
            new_lt = pre[0:1, :]

            s_carry[...] = new_s
            lt_carry[...] = new_lt

            @pl.when(r >= 2)
            def _():
                w_dma(r % 2, chunk_map_ref[r - 2]).wait()

            wbuf[r % 2] = gout_rows
            w_dma(r % 2, c).start()

        def compute(gc0, gc1, gc2, gtt, lte, frz_l):
            # ---- alpha with deadness folded into opacity (matches fwd;
            # grp < 0 impossible — see the forward kernel's dead comment).
            # Column orientation: instances on sublanes, pixels on lanes.
            dead_c = tid_c >= jnp.float32(1.0) * tile_end
            dead_c = dead_c | (slot_c >= frz_l)
            op_eff_c = jnp.where(dead_c, 0.0, ft[:, 5:6])
            x_c = ft[:, 0:1]
            y_c = ft[:, 1:2]
            a2_c = ft[:, 2:3]
            b2_c = ft[:, 3:4]
            c2_c = ft[:, 4:5]
            dx = x_c - px  # (CHUNK, PIX)
            dy = y_c - py
            power = jnp.minimum(
                (a2_c * dx + b2_c * dy) * dx + (c2_c * dy) * dy, 0.0
            )
            raw = op_eff_c * jnp.exp(power)
            capped = raw > MAX_ALPHA
            alpha = jnp.minimum(MAX_ALPHA, raw)
            alpha = jnp.where(raw >= MIN_ALPHA, alpha, 0.0)

            tlog = jnp.log1p(-alpha)
            # group-masked triangular matrices for LEFT-multiplication:
            # out[i, p] = sum_j M[i, j] * x[j, p]; the strict suffix mask is
            # M[i, j] = (j > i) & same-group. Entries 0/1 = exactly bf16,
            # so the 2-pass hi/lo split stays exact (tiles._tri_dot).
            row_i = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
            col_j = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
            same = grp_c == grp_r  # (CHUNK, 1) vs (1, CHUNK) — no relayout
            sufM = ((col_j > row_i) & same).astype(jnp.float32)
            # entering log-transmittance: walk back from each lane's group
            # end (lt_final for flushed groups, the carried walk for the
            # trailing group) through the group-masked inclusive suffix
            suf_in = _tri_dot_left(sufM, tlog) + tlog
            pre = lte - suf_in
            live = pre + tlog >= LOG_STOP_T
            t_in = jnp.exp(pre)
            one_m = 1.0 - alpha
            wgt = jnp.where(live, alpha * t_in, 0.0)

            c0_c = ft[:, 6:7]
            c1_c = ft[:, 7:8]
            c2c_c = ft[:, 8:9]
            gc_dot_c = gc0 * c0_c + gc1 * c1_c + gc2 * c2c_c
            gwc = wgt * gc_dot_c
            suffix_dot = _tri_dot_left_1pass if fast_grad else _tri_dot_left
            suf = suffix_dot(sufM, gwc)
            s_all = suf + scar + gtt

            g_power = gwc - s_all * (alpha / one_m)
            g_power = jnp.where(capped, 0.0, g_power)

            ones_row = jnp.ones((1, PIX), jnp.float32)

            def colsum(x):
                # (CHUNK, PIX) -> (1, CHUNK): contract the pixel lanes of
                # both operands (Mosaic-native transposed-RHS matmul) so
                # the per-lane epilogue lands in ROW orientation — the
                # grad output block assembles with no relayout at all
                return jax.lax.dot_general(
                    ones_row,
                    x,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            if not fast_grad:
                colsum_1 = colsum
                if probe == "colsum_hp":
                    # probe: one precision-HIGHEST matmul instead of the
                    # manual 2-pass split (same f32-accuracy class; measures
                    # whether Mosaic's multi-pass beats 2x VPU split ops)
                    def colsum(x):
                        return jax.lax.dot_general(
                            ones_row,
                            x,
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST,
                        )

                elif probe == "colsum1":
                    pass  # ceiling probe: keep the 1-pass colsum in exact
                    # mode (INEXACT — bounds the split-op cost only)
                else:

                    def colsum(x):
                        hi_ = x.astype(jnp.bfloat16).astype(jnp.float32)
                        return colsum_1(hi_) + colsum_1(x - hi_)

            # per-lane color grads: g_rgb[ch, i] = sum_p GC_ch[i,p] wgt[i,p]
            g_rgb = jnp.concatenate(
                [colsum(gc0 * wgt), colsum(gc1 * wgt), colsum(gc2 * wgt)],
                axis=0,
            )

            gdx = g_power * dx
            gdy = g_power * dy
            s0 = colsum(g_power)
            mx = colsum(gdx)
            my = colsum(gdy)
            mxx = colsum(gdx * dx)
            mxy = colsum(gdx * dy)
            myy = colsum(gdy * dy)
            # epilogue in (1, CHUNK) rows straight off fbuf — no transpose
            a2 = f[2:3, :]
            b2 = f[3:4, :]
            c2 = f[4:5, :]
            op = jnp.maximum(
                jnp.where(
                    (f[TID_ROW : TID_ROW + 1, :] >= jnp.float32(1.0) * tile_end),
                    0.0,
                    f[5:6, :],
                ),
                1e-12,
            )
            g_x = 2.0 * a2 * mx + b2 * my
            g_y = 2.0 * c2 * my + b2 * mx
            g_op = s0 / op

            # row PRESORT_ROW: the lane's pre-sort slot (staged in fields
            # row OFFSET_ROW; cap_total on dead lanes) — lets a
            # tile-sharded device reduce its LOCAL grad slice with the
            # partial_coverage reducer instead of the global perm
            dbg = [
                f[OFFSET_FIELD_ROW : OFFSET_FIELD_ROW + 1, :],
                jnp.zeros((NUM_FIELDS - 10, CHUNK), jnp.float32),
            ]
            gout_rows = jnp.concatenate(
                [g_x, g_y, mxx, mxy, myy, g_op, g_rgb] + dbg, axis=0
            )

            # ---- carries for chunk c-1 (chunk c-1's trailing tile is this
            # chunk's group 0). Sublane 0 belongs to group 0 for EVERY
            # possible layout — including a tile segment ending exactly at
            # the chunk boundary, whose sentinel then lands on lane 0 —
            # because sentinels carry their REAL tile id
            # (Binning.tid_sorted). With num_tiles-tagged sentinels,
            # pre[lane 0] read a dead lane's 0 there and silently corrupted
            # the previous chunk's trailing gradients (found by
            # tools/verify_tpu.py on hardware).
            m0 = (grp_c == 0.0)
            sel0 = jnp.where(ng == 0, 1.0, 0.0)
            # exact f32 sublane reduction (the lane-reduction _row_sum of
            # the old orientation becomes a cheaper sublane sum here)
            new_s = (
                jnp.sum(gwc * m0, axis=0, keepdims=True)
                + sel0 * s_carry[...]
            )
            new_lt = pre[0:1, :]

            # side-effect tail (runs INSIDE the dispatch branch — values
            # never cross a region boundary)
            s_carry[...] = new_s
            lt_carry[...] = new_lt

            @pl.when(r >= 2)
            def _():
                # waits the copy started two iterations ago (same parity
                # slot; all w_dma copies are byte-identical, the index only
                # rebuilds the descriptor)
                w_dma(r % 2, chunk_map_ref[r - 2]).wait()

            wbuf[r % 2] = gout_rows
            w_dma(r % 2, c).start()

        # no skip branch: whole-chunk frozen skips were compacted out of
        # chunk_map by the caller, and their grad rows stay at the
        # zero-initialized output value. (Zero rows carry presort key 0 —
        # harmless in BOTH reducers: the perm reducer selects rows by
        # position and masks, and in the partial reducer zero-VALUE rows
        # sorting to the front shift every rank boundary uniformly without
        # changing any prefix difference.)
        #
        # ---- dispatch on the chunk's group depth (measured: carrying the
        # five (CHUNK, PIX) assembled operands through the fori_loop spills
        # them to VMEM around EVERY chunk's loop — ~3.3 ms/frame via the
        # noflush strip probe — even though the loop body runs for only
        # ~14% of chunks). Chunks flushing <= 1 tile take a loop-free
        # branch; the deep branch keeps the fori_loop. Both branches end in
        # the same side-effect tail, so no vector value crosses a region
        # boundary on the common path. Exactness: for ng <= 1 the loop is
        # 0-trip, so the two paths are the same computation.
        @pl.when(ng <= 1)
        def _():
            # probe "oldfast": route the single-flush chunks through the
            # general path (A/B harness for the factored fast path)
            if fast_grad and probe != "oldfast":
                compute_fast(gtt, lte, frz_l)
            else:
                compute(*_gc_seeds(), gtt, lte, frz_l)

        @pl.when(ng >= 2)
        def _():
            ops = jax.lax.fori_loop(
                1, ng, assemble, (*_gc_seeds(), gtt, lte, frz_l)
            )
            compute(*ops)

    @pl.when(r == pl.num_programs(0) - 1)
    def _():
        @pl.when(nchunks >= 2)
        def _():
            w_dma((nchunks - 2) % 2, 1).wait()

        @pl.when(nchunks >= 1)
        def _():
            w_dma((nchunks - 1) % 2, 0).wait()
