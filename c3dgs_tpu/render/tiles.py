"""Pallas TPU tile kernels: forward + backward alpha compositing.

The TPU re-design of renderCUDA (forward.cu:270-383) and the backward
re-rasterization (backward.cu:398-557). The CUDA kernels map one thread to
one pixel and loop gaussians in shared-memory batches; here one grid program
owns one TILE_X x TILE_Y tile (PIX pixels in the lane dimension) and the
gaussian loop is chunked by CHUNK=128, with the key trick that *compositing
itself runs on the MXU*:

  transmittance  T_i = exp( cumsum_{j<i} log(1-alpha_j) )
                     -> (PIX,128) @ strictly-triangular ones (128,128) matmul
  color          C  += (alpha * T * live) (PIX,128) @ colors (128,3)

Instance data is staged (NUM_FIELDS, cap) lane-major in HBM in sorted
UNPADDED order. Each loop iteration assembles a SHIFTED WINDOW of CHUNK
real instances from the two aligned chunks that cover it (one dynamic lane
roll — see _window), so per-instance kernel cost never pays for tile
boundaries; the window tail past the segment count is masked to alpha=0.

The backward runs BACK-TO-FRONT like the reference (backward.cu:472), but
for a sharper reason than warp scheduling: the per-instance gradient
needs the suffix sum S_i = sum_{j>i} gC.(w_j c_j), amplified by
alpha/(1-alpha) (up to 99x at the alpha cap). Accumulating S from the back
keeps its error proportional to S itself; the front-to-back alternative
(C_total - prefix) turns rounding of the LARGE prefix into garbage on
near-opaque instances. Per-instance transmittance does not ride a
division out of final_T (backward.cu:503, the ill-conditioned step):
the backward walks lt = log T BACKWARD from the forward's exported
lt_final residual — log-domain sums are finite (alpha <= 0.99) and the
walk is f32-accurate: the forward advances lt with the _row_sum lane
reduction (exact, independent of the tri matmuls), the backward with the
last column of its 2-pass prefix matmul (exact to ~1 ulp/window;
measured, each kernel's form is the faster one for ITS op mix —
docs/PERF.md). The forward's saturation early-exit index is exported
too, so both kernels skip exactly the same windows.

A bf16 backward elementwise chain was tried and reverted: Mosaic has no
bf16 compare/exp/log1p lowerings and the remaining bf16 ops measured
within 0.2 ms of f32 — the VPU does not pack bf16 2x on this target.

No atomics anywhere: per-window grads are written to a 128-aligned grad
buffer at grad_base[t] + ci*CHUNK (each (tile, window) owns its slot —
race-free), tagged in row PRESORT_ROW with the instance's pre-sort slot.
rasterizer.blend_gaussians reduces them to per-gaussian grads with one
(key, position) sort + row gather + prefix-sum differences —
deterministic, unlike the reference's atomicAdd accumulation
(backward.cu:523-554).

Divergences from CUDA, documented in oracle.py: (1) after a pixel
saturates (T < 1e-4) we keep updating T instead of freezing it — identical
contributions, final_T differs below 8-bit significance; (2) the opacity
gradient respects the 0.99 alpha cap (the reference backward ignores it);
(3) the defensive power > 0 skip (forward.cu:349) is a clamp to 0 instead —
identical for every positive-definite conic (all of them, given the +0.3
low-pass) and robust to a rounding-flipped sign at the center ridge.

On CPU (tests) the kernels run in Pallas interpret mode.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import CHUNK, NUM_FIELDS, PRESORT_ROW
from .types import TILE_X, TILE_Y

PIX = TILE_X * TILE_Y  # 256 pixels per tile
STOP_T = 1e-4
MIN_ALPHA = 1.0 / 255.0
MAX_ALPHA = 0.99
OUT_ROWS = 8  # rows 0..2 color, 3 final_T, rest zero
# chunk-level early exit once every pixel's transmittance is below EXIT_T;
# stricter than STOP_T so skipped work is provably invisible (contributions
# need T*(1-a) >= STOP_T, and the background term changes by < EXIT_T)
EXIT_T = 1e-6
LOG_EXIT_T = math.log(EXIT_T)  # forward carry lives in log domain
LOG_STOP_T = math.log(STOP_T)  # backward live check in log domain


def _tri_dot(x, tri):
    """x @ tri at ~f32 accuracy in 2 MXU passes.

    The MXU truncates f32 inputs to bf16 per pass; HIGHEST costs 6 passes
    (3-term splits of BOTH operands) and DEFAULT (1 pass) was measured at
    ~4e-3 image error. But `tri` is a 0/1 matrix — exactly bf16 — so only
    x needs splitting: x = hi + lo with hi = bf16(x) gives
    x @ tri = hi @ tri + lo @ tri exactly up to the bf16 rounding of lo
    (~2^-16 relative), 3x fewer passes than HIGHEST at 256x less error
    than DEFAULT.
    """
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    lo = x - hi
    d = lambda a: jnp.dot(a, tri, preferred_element_type=jnp.float32)
    return d(hi) + d(lo)


def _tri_dot_1pass(x, tri):
    """Single-pass x @ tri (operand truncated to bf16 by the MXU).

    Used for the BACKWARD kernel's in-window SUFFIX matmul when fast_grad
    is on: with the back-to-front accumulation order its input truncation
    is a <= 2^-9 relative perturbation of each term, never amplified —
    pure gradient noise under Adam, smaller than the CUDA reference's
    nondeterministic atomicAdd ordering noise. (A 1-pass FORWARD prefix
    was also tried: zero speedup — the forward is VPU-bound on the alpha
    evaluation, not MXU-bound — so the image keeps the exact 2-pass.)"""
    return jnp.dot(x, tri, preferred_element_type=jnp.float32)


def _row_sum(x):
    """Exact f32 per-pixel lane reduction: (PIX, CHUNK) -> (PIX, 1).

    The FORWARD kernel advances the log-transmittance carry with this —
    exact independent of the tri matmuls' bf16 truncation. The BACKWARD
    walks lt with the last column of its 2-pass prefix matmul instead:
    measured (docs/PERF.md), the lane reduction costs ~3.5 ms of VPU time
    in the backward while the prefix slice there is free (the 2-pass
    prefix is needed anyway); in the forward the preference flips
    (slice 11.1 ms vs lane reduction 9.5 ms — the lane-127 slice
    broadcast is the costly form for ITS op mix). The two rowsum forms
    agree to ~1 ulp, so the walk reconstruction stays f32-accurate."""
    return jnp.sum(x, axis=1, keepdims=True)


def interpret_mode() -> bool:
    return jax.default_backend() == "cpu"


def _pixel_coords(tile_idx, tiles_x: int):
    """Pixel x/y (1, PIX) f32 for this tile program."""
    ty = tile_idx // tiles_x
    tx = tile_idx % tiles_x
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)
    px = (tx * TILE_X + lane % TILE_X).astype(jnp.float32)
    py = (ty * TILE_Y + lane // TILE_X).astype(jnp.float32)
    return px, py


# NOTE: an earlier design computed the backward's positional-gradient pixel
# sums from 6 tile-centered MOMENTS of g_power (one (8, PIX) @ (PIX, CHUNK)
# matmul, no elementwise products). It was abandoned: expanding
# sum g*(xc - pxc)^2 around the tile center cancels catastrophically for
# small splats away from the center ((xc/dx)^2 reaches ~10^3), amplifying
# the matmul's bf16 input rounding into >100% gradient error. The direct
# products sum (g*dx)*dx keep every rounding proportional to its term.


def _tri_matrices():
    """(CHUNK, CHUNK) ones matrices: A @ strict = exclusive prefix over the
    gaussian axis, A @ upper_strict = exclusive SUFFIX (sum over later
    instances — the backward's better-conditioned accumulation order)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    strict = (row < col).astype(jnp.float32)
    upper_strict = (row > col).astype(jnp.float32)
    return strict, upper_strict


def _count_mask(ci, count):
    """(1, CHUNK) bool: lanes of window ci holding real instances (the
    window is shift-aligned to the segment start, so validity is simply
    ci*CHUNK + lane < count)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    return ci * CHUNK + lane < count


def _window(fbuf, ci, shift):
    """Assemble the CHUNK-instance window [start + ci*CHUNK, +CHUNK) of the
    tile's UNALIGNED segment from the two aligned chunks buffered at slots
    ci%3 and (ci+1)%3: one dynamic lane roll of the (NUM_FIELDS, 2*CHUNK)
    concat. This lets every loop iteration process CHUNK *real* instances —
    without it, shared tile-boundary chunks made ~53% of iterations
    half-empty (docs/PERF.md)."""
    f2 = jnp.concatenate([fbuf[ci % 3], fbuf[(ci + 1) % 3]], axis=1)
    rolled = pltpu.roll(f2, (2 * CHUNK - shift) % (2 * CHUNK), axis=1)
    return rolled[:, :CHUNK]


def _chunk_alpha(f, px, py, seg_mask):
    """Alpha evaluation for one staged chunk f: (NUM_FIELDS, CHUNK).

    Rows 2..4 hold the PRE-SCALED conic a' = -0.5a, b' = -b, c' = -0.5c
    (binning.per_gaussian_table), so power = a'dx² + b'dxdy + c'dy²
    directly. Returns (PIX, CHUNK) arrays: dx, dy, alpha (masked), mask,
    capped. Masking = renderCUDA's alpha < 1/255 skip AND the lane
    belonging to this tile's segment (seg_mask, (1, CHUNK)); the
    reference's defensive power > 0 skip is a clamp here — true power <= 0
    always (the +0.3 low-pass makes the conic positive definite), and the
    clamp cannot drop a full-strength contribution when rounding flips the
    sign near the center ridge (see oracle.py)."""
    x = f[0:1, :]
    y = f[1:2, :]
    a2 = f[2:3, :]
    b2 = f[3:4, :]
    c2 = f[4:5, :]
    op = f[5:6, :]
    dx = x - px.reshape(PIX, 1)
    dy = y - py.reshape(PIX, 1)
    power = jnp.minimum((a2 * dx + b2 * dy) * dx + (c2 * dy) * dy, 0.0)
    raw = op * jnp.exp(power)
    capped = raw > MAX_ALPHA
    alpha = jnp.minimum(MAX_ALPHA, raw)
    mask = (raw >= MIN_ALPHA) & seg_mask
    alpha = jnp.where(mask, alpha, 0.0)
    return dx, dy, alpha, mask, capped


def forward_kernel(
    tile_ids_ref,
    starts_ref,
    ends_ref,
    nchunks_ref,
    fields_hbm,
    out_ref,
    fbuf,
    sems,
    *,
    tiles_x: int,
):
    """Tile alpha-compositing. The transmittance carry lives in LOG domain
    (lt = log T, always finite: alpha <= 0.99 keeps every log1p term
    >= log(0.01)); besides the image rows the kernel exports
      row 4: final log-transmittance lt_final
      row 5: stop = index of the first window skipped by saturation
             early-exit (= nchunks when no exit)
    — the residuals from which the backward kernel reconstructs every
    window's entering transmittance EXACTLY by walking lt backward in f32,
    instead of dividing T back out of final_T (backward.cu:503, the
    ill-conditioned step)."""
    t = pl.program_id(0)
    start = starts_ref[t]
    count = ends_ref[t] - start
    niter = nchunks_ref[t]
    c0 = start // CHUNK
    shift = start % CHUNK
    max_chunk = fields_hbm.shape[1] // CHUNK - 1
    px, py = _pixel_coords(tile_ids_ref[t], tiles_x)
    strict, _ = _tri_matrices()

    def dma(slot, i):
        c = jnp.minimum(c0 + i, max_chunk)
        return pltpu.make_async_copy(
            fields_hbm.at[:, pl.ds(pl.multiple_of(c * CHUNK, CHUNK), CHUNK)],
            fbuf.at[slot],
            sems.at[slot],
        )

    @pl.when(niter > 0)
    def _():
        dma(0, 0).start()
        dma(1, 1).start()

    def body(ci, carry):
        color, lt, stop = carry  # (PIX, 3), (PIX, 1), int32

        @pl.when(ci + 2 <= niter)
        def _():
            dma((ci + 2) % 3, ci + 2).start()

        @pl.when(ci == 0)
        def _():
            dma(0, 0).wait()

        dma((ci + 1) % 3, ci + 1).wait()

        done = stop <= ci

        def compute(args):
            color, lt = args
            f = _window(fbuf, ci, shift)
            seg = _count_mask(ci, count)
            _, _, alpha, _, _ = _chunk_alpha(f, px, py, seg)
            tlog = jnp.log1p(-alpha)
            s_excl = _tri_dot(tlog, strict)
            t_in = jnp.exp(s_excl + lt)  # (PIX, CHUNK)
            live = t_in * (1.0 - alpha) >= STOP_T
            w = jnp.where(live, alpha * t_in, 0.0)
            colors = f[6:9, :]  # (3, CHUNK)
            color = color + jax.lax.dot_general(
                w,
                colors,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            lt = lt + _row_sum(tlog)
            return color, lt

        color, lt = jax.lax.cond(done, lambda a: a, compute, (color, lt))
        # saturation early-exit: windows >= stop are never blended; the
        # backward skips the SAME set, so lt_final + per-window sums
        # reconstruct every processed window's entering transmittance
        exited = jnp.max(lt) < LOG_EXIT_T
        stop = jnp.where((stop == niter) & exited, ci + 1, stop)
        return color, lt, stop

    init = (
        jnp.zeros((PIX, 3), jnp.float32),
        jnp.zeros((PIX, 1), jnp.float32),
        niter,
    )
    color, lt_final, stop = jax.lax.fori_loop(0, niter, body, init)

    # ONE (PIX, OUT_ROWS) -> (OUT_ROWS, PIX) transpose for all rows
    out_ref[0] = jnp.concatenate(
        [
            color,
            jnp.exp(lt_final),
            lt_final,
            jnp.zeros((PIX, 1), jnp.float32) + stop.astype(jnp.float32),
            jnp.zeros((PIX, OUT_ROWS - 6), jnp.float32),
        ],
        axis=1,
    ).T


def backward_kernel(
    tile_ids_ref,
    starts_ref,
    ends_ref,
    nchunks_ref,
    grad_base_ref,
    fields_hbm,
    totals_hbm,  # (T, OUT_ROWS, PIX): rows 3 final_T, 4 lt_final, 5 stop
    gout_hbm,  # (T, OUT_ROWS, PIX): rows 0..2 dL/dC, 3 dL/dT_final
    grads_hbm,  # output (NUM_FIELDS, grad_cap) per-instance grads
    fbuf,
    gbuf,
    tot_vmem,
    g_vmem,
    sems,
    gsems,
    *,
    tiles_x: int,
    cap: int,
    grad_cap: int,
    fast_grad: bool,
):
    """Back-to-front re-rasterization (module docstring): windows run in
    REVERSE order so the suffix sum S_i = sum_{j>i} gC.(w_j c_j) — amplified
    by alpha/(1-alpha) in the opacity/power gradient — accumulates from
    small to large with error proportional to S itself. Entering
    transmittance is reconstructed by walking lt = log T backward from the
    forward's lt_final residual: the in-window prefix sums (s_excl) use the
    exact 2-pass tri matmul in BOTH modes — this kernel is VPU-bound, so
    the extra MXU pass is essentially free while the VPU lane-reduction
    alternative costs ~4 ms (docs/PERF.md) — and the walk steps by the
    prefix's last column (f32-exact to ~1 ulp vs the forward's _row_sum).
    The remaining contractions (suffix, colsums, g_rgb, gc_dot_c) run
    1-pass in fast mode (truncation error proportional to each term);
    fast_grad=False upgrades every one to an f32-exact split, so the exact
    mode is a true on-hardware oracle for the fast path. Windows past the
    forward's saturation stop index are skipped outright."""
    t = pl.program_id(0)
    start = starts_ref[t]
    count = ends_ref[t] - start
    niter = nchunks_ref[t]
    c0 = start // CHUNK
    shift = start % CHUNK
    max_chunk = fields_hbm.shape[1] // CHUNK - 1
    gbase = pl.multiple_of(grad_base_ref[t], CHUNK)
    px, py = _pixel_coords(tile_ids_ref[t], tiles_x)
    strict, upper = _tri_matrices()
    ones_row = jnp.ones((1, PIX), jnp.float32)  # colsum-as-matmul operand

    tot_dma = pltpu.make_async_copy(totals_hbm.at[t], tot_vmem, sems.at[3])
    g_dma = pltpu.make_async_copy(gout_hbm.at[t], g_vmem, sems.at[4])
    tot_dma.start()
    g_dma.start()

    def dma(slot, i):
        c = jnp.minimum(c0 + i, max_chunk)
        return pltpu.make_async_copy(
            fields_hbm.at[:, pl.ds(pl.multiple_of(c * CHUNK, CHUNK), CHUNK)],
            fbuf.at[slot],
            sems.at[slot],
        )

    w0 = niter - 1

    @pl.when(niter > 0)
    def _():
        dma(w0 % 3, w0).start()
        dma((w0 + 1) % 3, w0 + 1).start()

    tot_dma.wait()
    g_dma.wait()

    t_final = tot_vmem[3:4, :]  # (1, PIX)
    lt_final = tot_vmem[4:5, :].T  # (PIX, 1) log T after the last window
    stop = tot_vmem[5, 0].astype(jnp.int32)  # first fwd-skipped window
    g_color = g_vmem[0:3, :]  # (3, PIX)
    g_tfin = g_vmem[3:4, :]  # (1, PIX)
    # per-pixel constant folded once:
    g_tfin_term = (g_tfin * t_final).T  # (PIX, 1) f32

    suffix_dot = _tri_dot_1pass if fast_grad else _tri_dot

    def grad_write(slot, w):
        # clamp into the last chunk when the adaptive grad capacity is
        # undersized (grad_overflow is reported; the policy re-renders) —
        # never write out of bounds. Both operands are CHUNK-multiples.
        off = pl.multiple_of(
            jnp.minimum(gbase + w * CHUNK, grad_cap - CHUNK), CHUNK
        )
        return pltpu.make_async_copy(
            gbuf.at[slot],
            grads_hbm.at[:, pl.ds(off, CHUNK)],
            gsems.at[slot],
        )

    def body(ci, carry):
        # s_carry[p] = sum over all LATER windows of gC.(w_j c_j)[p]
        # lt_exit[p] = log T after this window's instances (walked backward)
        s_carry, lt_exit = carry  # (PIX, 1) f32 each
        w = niter - 1 - ci  # window index, back to front

        @pl.when(w >= 1)
        def _():
            dma((w - 1) % 3, w - 1).start()

        @pl.when(ci == 0)
        def _():
            dma((w + 1) % 3, w + 1).wait()

        dma(w % 3, w).wait()

        f = _window(fbuf, w, shift)
        seg = _count_mask(w, count)
        # pre-sort slot tag row: this window's real lanes keep their slot,
        # tail lanes get the >= cap sentinel so the reduction sort drops them
        presort_row = jnp.where(seg, f[PRESORT_ROW : PRESORT_ROW + 1, :],
                                jnp.float32(cap))
        # the forward never blended windows >= stop: tags only, and the
        # lt walk must not cross them (their sums were never added)
        skipped = w >= stop

        def compute(args):
            s_carry, lt_exit = args
            dx, dy, alpha, mask, capped = _chunk_alpha(f, px, py, seg)
            a2 = f[2:3, :]  # pre-scaled conic rows (see per_gaussian_table)
            b2 = f[3:4, :]
            c2 = f[4:5, :]
            op = f[5:6, :]
            colors = f[6:9, :]  # (3, CHUNK)

            tlog = jnp.log1p(-alpha)
            s_excl = _tri_dot(tlog, strict)  # exact: feeds the lt walk
            rowsum = s_excl[:, CHUNK - 1 :] + tlog[:, CHUNK - 1 :]
            lt_in = lt_exit - rowsum  # entering log-transmittance, f32
            # live check in LOG domain (before the exp): t_in*(1-alpha)
            # >= STOP_T  <=>  s_excl + lt_in + tlog >= log(STOP_T)
            pre = s_excl + lt_in
            live = pre + tlog >= LOG_STOP_T
            t_in = jnp.exp(pre)
            one_m = 1.0 - alpha
            wgt = jnp.where(live, alpha * t_in, 0.0)  # (PIX, CHUNK)

            # grad color: dL/dc_i[ch] = sum_p gC[ch,p] wgt[p,i]
            # gc_dot_c[p,i] = sum_ch gC[ch,p] c_i[ch]
            if fast_grad:
                g_rgb = jnp.dot(g_color, wgt, preferred_element_type=jnp.float32)
                gc_dot_c = jax.lax.dot_general(
                    g_color,  # (3, PIX)
                    colors,  # (3, CHUNK)
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (PIX, CHUNK)
            else:
                # exact mode: neither operand of g_rgb is bf16-exact, so
                # split both (the lo@lo term is < 2^-18 relative, dropped);
                # the K=3 contraction runs elementwise on the VPU.
                ghi = g_color.astype(jnp.bfloat16).astype(jnp.float32)
                glo = g_color - ghi
                whi = wgt.astype(jnp.bfloat16).astype(jnp.float32)
                wlo = wgt - whi
                d = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
                g_rgb = d(ghi, whi) + d(ghi, wlo) + d(glo, whi)
                gc_dot_c = (
                    g_color[0:1, :].T * colors[0:1, :]
                    + g_color[1:2, :].T * colors[1:2, :]
                    + g_color[2:3, :].T * colors[2:3, :]
                )  # (PIX, CHUNK)

            # exclusive in-window suffix of gC.(w c), plus later windows and
            # the final-T gradient term (dT_final/dalpha_i has the same
            # -T/(1-alpha_i) shape, so it rides the same ratio below)
            gwc = wgt * gc_dot_c  # (PIX, CHUNK)
            suf = suffix_dot(gwc, upper)
            s_all = suf + (s_carry + g_tfin_term)

            # g_power = alpha * dL/dalpha, folded: alpha * direct == gwc
            # (direct = gc_dot_c * t_in * live), so only the suffix term
            # needs the alpha/(1-alpha) ratio. Masked lanes already have
            # alpha == 0 (so gwc == ratio == 0); only the 0.99 alpha cap
            # needs an explicit gradient block.
            g_power = gwc - s_all * (alpha / one_m)
            g_power = jnp.where(capped, 0.0, g_power)

            # positional/shape grads as DIRECT per-gaussian-centered pixel
            # sums: every product stays proportional to its term, so the
            # one-pass rounding is a relative perturbation (see the
            # abandoned-moments note above _tri_matrices). Colsums run as
            # M=1 MXU matmuls; exact mode splits the operand hi/lo like
            # _tri_dot (ones_row is exactly bf16, so only x needs it).
            def colsum(x):
                return jnp.dot(ones_row, x, preferred_element_type=jnp.float32)

            if not fast_grad:
                colsum_1pass = colsum

                def colsum(x):
                    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
                    return colsum_1pass(hi) + colsum_1pass(x - hi)

            gdx = g_power * dx
            gdy = g_power * dy
            s0 = colsum(g_power)
            mx = colsum(gdx)  # sum_p g_power * dx
            my = colsum(gdy)
            mxx = colsum(gdx * dx)  # sum_p g_power * dx^2
            mxy = colsum(gdx * dy)
            myy = colsum(gdy * dy)
            # grads are w.r.t. the STAGED pre-scaled conic (a', b', c'):
            # power = a'dx^2 + b'dxdy + c'dy^2, dpower/dmean = (2a'dx + b'dy,
            # 2c'dy + b'dx); the -0.5/-1 chain back to the true conic is
            # applied by autodiff through per_gaussian_table.
            g_x = 2.0 * a2 * mx + b2 * my
            g_y = 2.0 * c2 * my + b2 * mx
            # g_op_pix = g_power / op pixelwise, so its sum is s0 / op
            g_op = s0 / jnp.maximum(op, 1e-12)

            gout = jnp.concatenate(
                [
                    g_x,
                    g_y,
                    mxx,
                    mxy,
                    myy,
                    g_op,
                    g_rgb,
                    presort_row,
                    jnp.zeros((NUM_FIELDS - PRESORT_ROW - 1, CHUNK), jnp.float32),
                ],
                axis=0,
            )
            s_carry = s_carry + suf[:, 0:1] + gwc[:, 0:1]
            return s_carry, lt_in, gout

        def skipfn(args):
            s_carry, lt_exit = args
            # tags only: fwd-skipped or saturated-dead instances were never
            # blended, so they add nothing to earlier windows' suffixes and
            # the lt walk passes through unchanged
            gout = jnp.concatenate(
                [
                    jnp.zeros((PRESORT_ROW, CHUNK), jnp.float32),
                    presort_row,
                    jnp.zeros((NUM_FIELDS - PRESORT_ROW - 1, CHUNK), jnp.float32),
                ],
                axis=0,
            )
            return s_carry, lt_exit, gout

        s_carry, lt_exit, gout = jax.lax.cond(
            skipped, skipfn, compute, (s_carry, lt_exit)
        )

        slot = ci % 2

        @pl.when(ci >= 2)
        def _():
            grad_write(slot, niter - 1 - (ci - 2)).wait()

        gbuf[slot] = gout
        grad_write(slot, w).start()

        return s_carry, lt_exit

    init = (
        jnp.zeros((PIX, 1), jnp.float32),
        lt_final,
    )
    jax.lax.fori_loop(0, niter, body, init)

    @pl.when(niter >= 2)
    def _():
        grad_write((niter - 2) % 2, 1).wait()

    @pl.when(niter >= 1)
    def _():
        grad_write((niter - 1) % 2, 0).wait()
