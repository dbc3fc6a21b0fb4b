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

Instance data is staged (NUM_FIELDS=16, cap) lane-major in HBM in sorted
UNPADDED order. Each loop iteration assembles a SHIFTED WINDOW of CHUNK
real instances from the two aligned chunks that cover it (one dynamic lane
roll — see _window), so per-instance kernel cost never pays for tile
boundaries; the window tail past the segment count is masked to alpha=0.

The backward needs suffix sums S_i = C_total - prefix_{<=i}; the prefix is
the *inclusive* triangular matmul — same machinery, so the whole backward
runs front-to-back (no back-to-front pass like backward.cu:472, and no
atomics): per-window grads are written to a 128-aligned grad buffer at
grad_base[t] + ci*CHUNK (each (tile, window) owns its slot — race-free),
tagged in row PRESORT_ROW with the instance's pre-sort slot.
rasterizer.blend_gaussians reduces them to per-gaussian grads with one
(key, position) sort + row gather + prefix-sum differences —
deterministic, unlike the reference's atomicAdd accumulation
(backward.cu:523-554).

Divergence from CUDA, both documented in oracle.py: (1) after a pixel
saturates (T < 1e-4) we keep updating T instead of freezing it — identical
contributions, final_T differs below 8-bit significance; (2) the opacity
gradient respects the 0.99 alpha cap (the reference backward ignores it).

On CPU (tests) the kernels run in Pallas interpret mode.
"""
from __future__ import annotations

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

    Used only for the BACKWARD kernel's prefix sums when fast_grad is on:
    the resulting transmittance/suffix carry <= 2^-9 * |log T| relative
    error (~0.2% mid-blend, ~2% at the saturation tail) — pure gradient
    noise under Adam, and no worse a perturbation class than the CUDA
    reference's nondeterministic atomicAdd ordering + T-by-division
    (backward.cu:503). The forward image path always uses the exact
    2-pass split."""
    return jnp.dot(x, tri, preferred_element_type=jnp.float32)


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


NUM_MOMENTS = 8  # 1, px, py, px^2, px*py, py^2 (+2 zero rows, MXU tiling)


def _moment_basis(pxc, pyc):
    """(NUM_MOMENTS, PIX) polynomial basis in TILE-CENTERED pixel coords.

    The backward's positional gradients are polynomials in (dx, dy) =
    (xc - pxc, yc - pyc), so their pixel sums reduce to 6 moments of
    g_power: one (8, PIX) @ (PIX, CHUNK) matmul replaces six colsum
    matmuls AND their (PIX, CHUNK) elementwise products. Centered coords
    keep the quadratic rows small (|pxc| <= TILE/2), so the expansion
    x^2*S0 - 2x*Sx + Sxx has no catastrophic cancellation: xc ~ dx always
    (they differ by at most half a tile)."""
    one = jnp.ones_like(pxc)
    zero = jnp.zeros_like(pxc)
    return jnp.concatenate(
        [one, pxc, pyc, pxc * pxc, pxc * pyc, pyc * pyc, zero, zero], axis=0
    )


def _moments(basis2, gp):
    """basis @ gp at ~f32 accuracy: the basis operand is split hi/lo (its
    quadratic rows are not bf16-exact) and both halves are stacked into ONE
    (2*NUM_MOMENTS, PIX) matmul (K-bound on the MXU, so doubling M is
    free); gp carries the one-pass bf16 truncation, same error class as
    the colsum matmuls this replaces."""
    m = jnp.dot(basis2, gp, preferred_element_type=jnp.float32)
    return m[:NUM_MOMENTS] + m[NUM_MOMENTS:]


def _tri_matrices():
    """(CHUNK, CHUNK) ones matrices: A @ strict = exclusive prefix over the
    gaussian axis, A @ incl = inclusive prefix."""
    row = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    strict = (row < col).astype(jnp.float32)
    incl = (row <= col).astype(jnp.float32)
    return strict, incl


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

    Returns (PIX, CHUNK) arrays: dx, dy, alpha (masked), mask, capped.
    Masking = the renderCUDA skip rules (power>0, alpha<1/255) AND the
    lane belonging to this tile's segment (seg_mask, (1, CHUNK))."""
    x = f[0:1, :]
    y = f[1:2, :]
    ca = f[2:3, :]
    cb = f[3:4, :]
    cc = f[4:5, :]
    op = f[5:6, :]
    dx = x - px.reshape(PIX, 1)
    dy = y - py.reshape(PIX, 1)
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    raw = op * jnp.exp(power)
    capped = raw > MAX_ALPHA
    alpha = jnp.minimum(MAX_ALPHA, raw)
    mask = (power <= 0.0) & (raw >= MIN_ALPHA) & seg_mask
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
        color, t_carry, done = carry  # (PIX, 3), (PIX, 1), bool

        @pl.when(ci + 2 <= niter)
        def _():
            dma((ci + 2) % 3, ci + 2).start()

        @pl.when(ci == 0)
        def _():
            dma(0, 0).wait()

        dma((ci + 1) % 3, ci + 1).wait()

        def compute(args):
            color, t_carry = args
            f = _window(fbuf, ci, shift)
            seg = _count_mask(ci, count)
            _, _, alpha, _, _ = _chunk_alpha(f, px, py, seg)
            tlog = jnp.log1p(-alpha)
            s_excl = _tri_dot(tlog, strict)
            t_in = t_carry * jnp.exp(s_excl)  # (PIX, CHUNK)
            live = t_in * (1.0 - alpha) >= STOP_T
            w = jnp.where(live, alpha * t_in, 0.0)
            colors = f[6:9, :]  # (3, CHUNK)
            color = color + jax.lax.dot_general(
                w,
                colors,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            t_carry = t_carry * jnp.exp(
                s_excl[:, CHUNK - 1 :] + tlog[:, CHUNK - 1 :]
            )
            return color, t_carry

        color, t_carry = jax.lax.cond(done, lambda a: a, compute, (color, t_carry))
        done = jnp.max(t_carry) < EXIT_T
        return color, t_carry, done

    init = (
        jnp.zeros((PIX, 3), jnp.float32),
        jnp.ones((PIX, 1), jnp.float32),
        jnp.zeros((), jnp.bool_),
    )
    color, t_final, _ = jax.lax.fori_loop(0, niter, body, init)

    out_ref[0] = jnp.concatenate(
        [color.T, t_final.T, jnp.zeros((OUT_ROWS - 4, PIX), jnp.float32)], axis=0
    )


def backward_kernel(
    tile_ids_ref,
    starts_ref,
    ends_ref,
    nchunks_ref,
    grad_base_ref,
    fields_hbm,
    totals_hbm,  # (T, OUT_ROWS, PIX): fwd output (rows 0..2 C, 3 final_T)
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
    t = pl.program_id(0)
    start = starts_ref[t]
    count = ends_ref[t] - start
    niter = nchunks_ref[t]
    c0 = start // CHUNK
    shift = start % CHUNK
    max_chunk = fields_hbm.shape[1] // CHUNK - 1
    gbase = pl.multiple_of(grad_base_ref[t], CHUNK)
    px, py = _pixel_coords(tile_ids_ref[t], tiles_x)
    strict, incl = _tri_matrices()
    # tile-centered pixel coords + split moment basis (constant per tile)
    tid = tile_ids_ref[t]
    cx = ((tid % tiles_x) * TILE_X).astype(jnp.float32) + (TILE_X - 1) * 0.5
    cy = ((tid // tiles_x) * TILE_Y).astype(jnp.float32) + (TILE_Y - 1) * 0.5
    basis = _moment_basis(px - cx, py - cy)
    basis_hi = basis.astype(jnp.bfloat16).astype(jnp.float32)
    basis2 = jnp.concatenate([basis_hi, basis - basis_hi], axis=0)

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

    @pl.when(niter > 0)
    def _():
        dma(0, 0).start()
        dma(1, 1).start()

    tot_dma.wait()
    g_dma.wait()

    c_total = tot_vmem[0:3, :]  # (3, PIX)
    t_final = tot_vmem[3:4, :]  # (1, PIX)
    g_color = g_vmem[0:3, :]  # (3, PIX)
    g_tfin = g_vmem[3:4, :]  # (1, PIX)
    # per-pixel constants folded once:
    g_dot_ctotal = jnp.sum(g_color * c_total, axis=0).reshape(PIX, 1)
    g_tfin_term = (g_tfin * t_final).T  # (PIX, 1)

    def grad_write(slot, ci):
        # clamp into the last chunk when the adaptive grad capacity is
        # undersized (grad_overflow is reported; the policy re-renders) —
        # never write out of bounds. Both operands are CHUNK-multiples.
        off = pl.multiple_of(
            jnp.minimum(gbase + ci * CHUNK, grad_cap - CHUNK), CHUNK
        )
        return pltpu.make_async_copy(
            gbuf.at[slot],
            grads_hbm.at[:, pl.ds(off, CHUNK)],
            gsems.at[slot],
        )

    def body(ci, carry):
        # gpref[p] = sum_ch gC[ch,p] * (contributions of earlier chunks)[ch,p]
        gpref, t_carry, done = carry  # (PIX, 1), (PIX, 1), bool

        @pl.when(ci + 2 <= niter)
        def _():
            dma((ci + 2) % 3, ci + 2).start()

        @pl.when(ci == 0)
        def _():
            dma(0, 0).wait()

        dma((ci + 1) % 3, ci + 1).wait()

        f = _window(fbuf, ci, shift)
        seg = _count_mask(ci, count)
        # pre-sort slot tag row: this window's real lanes keep their slot,
        # tail lanes get the >= cap sentinel so the reduction sort drops them
        presort_row = jnp.where(seg, f[PRESORT_ROW : PRESORT_ROW + 1, :],
                                jnp.float32(cap))

        def compute(args):
            gpref, t_carry = args
            _, _, alpha, mask, capped = _chunk_alpha(f, px, py, seg)
            ca = f[2:3, :]
            cb = f[3:4, :]
            cc = f[4:5, :]
            op = f[5:6, :]
            colors = f[6:9, :]  # (3, CHUNK)

            prefix = _tri_dot_1pass if fast_grad else _tri_dot
            tlog = jnp.log1p(-alpha)
            s_excl = prefix(tlog, strict)
            t_in = t_carry * jnp.exp(s_excl)
            live = t_in * (1.0 - alpha) >= STOP_T
            w = jnp.where(live, alpha * t_in, 0.0)  # (PIX, CHUNK)

            # grad color: dL/dc_i[ch] = sum_p gC[ch,p] w[p,i]
            g_rgb = jnp.dot(g_color, w, preferred_element_type=jnp.float32)

            # gc_dot_c[p,i] = sum_ch gC[ch,p] c_i[ch]
            gc_dot_c = jax.lax.dot_general(
                g_color,  # (3, PIX)
                colors,  # (3, CHUNK)
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (PIX, CHUNK)

            # inclusive prefix of per-instance contribution dotted with gC
            gwc = w * gc_dot_c  # (PIX, CHUNK)
            gwc_prefix = prefix(gwc, incl)
            g_suffix = g_dot_ctotal - gpref - gwc_prefix  # (PIX, CHUNK)

            # g_power = alpha * dL/dalpha, folded: alpha * direct == gwc
            # (direct = gc_dot_c * t_in * live), so only the suffix term
            # needs the alpha/(1-alpha) ratio
            g_power = gwc - (g_suffix + g_tfin_term) * (alpha / (1.0 - alpha))
            g_power = jnp.where(mask & ~capped, g_power, 0.0)

            # positional grads via pixel moments of g_power (see
            # _moment_basis): with dx = xc - pxc, every pixel sum below is
            # a polynomial in the 6 moments and per-instance (1, CHUNK)
            # rows — one matmul replaces six colsums + their products.
            m = _moments(basis2, g_power)  # (NUM_MOMENTS, CHUNK)
            s0, sx, sy = m[0:1], m[1:2], m[2:3]
            sxx, sxy, syy = m[3:4], m[4:5], m[5:6]
            xc = f[0:1, :] - cx
            yc = f[1:2, :] - cy
            mx = xc * s0 - sx  # sum_p g_power * dx
            my = yc * s0 - sy
            mxx = xc * xc * s0 - 2.0 * xc * sx + sxx  # sum g_power * dx^2
            mxy = xc * yc * s0 - xc * sy - yc * sx + sxy
            myy = yc * yc * s0 - 2.0 * yc * sy + syy
            g_x = -(ca * mx + cb * my)
            g_y = -(cc * my + cb * mx)
            g_ca = -0.5 * mxx
            g_cb = -mxy
            g_cc = -0.5 * myy
            # g_op_pix = g_power / op pixelwise, so its sum is s0 / op
            g_op = s0 / jnp.maximum(op, 1e-12)

            gout = jnp.concatenate(
                [
                    g_x,
                    g_y,
                    g_ca,
                    g_cb,
                    g_cc,
                    g_op,
                    g_rgb,
                    presort_row,
                    jnp.zeros((NUM_FIELDS - PRESORT_ROW - 1, CHUNK), jnp.float32),
                ],
                axis=0,
            )
            gpref = gpref + gwc_prefix[:, CHUNK - 1 :]
            t_carry = t_carry * jnp.exp(
                s_excl[:, CHUNK - 1 :] + tlog[:, CHUNK - 1 :]
            )
            return gpref, t_carry, gout

        def skip(args):
            gpref, t_carry = args
            # saturated: all remaining instances are dead; zero grads, but
            # the presort tags must still be written for the reduction sort
            gout = jnp.concatenate(
                [
                    jnp.zeros((PRESORT_ROW, CHUNK), jnp.float32),
                    presort_row,
                    jnp.zeros((NUM_FIELDS - PRESORT_ROW - 1, CHUNK), jnp.float32),
                ],
                axis=0,
            )
            return gpref, t_carry, gout

        gpref, t_carry, gout = jax.lax.cond(done, skip, compute, (gpref, t_carry))
        done = jnp.max(t_carry) < EXIT_T

        slot = ci % 2

        @pl.when(ci >= 2)
        def _():
            grad_write(slot, ci - 2).wait()

        gbuf[slot] = gout
        grad_write(slot, ci).start()

        return gpref, t_carry, done

    init = (
        jnp.zeros((PIX, 1), jnp.float32),
        jnp.ones((PIX, 1), jnp.float32),
        jnp.zeros((), jnp.bool_),
    )
    jax.lax.fori_loop(0, niter, body, init)

    @pl.when(niter >= 2)
    def _():
        grad_write((niter - 2) % 2, niter - 2).wait()

    @pl.when(niter >= 1)
    def _():
        grad_write((niter - 1) % 2, niter - 1).wait()
