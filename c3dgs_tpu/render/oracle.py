"""Reference renderer: pure-jnp per-pixel alpha compositing.

Slow but fully `jax.grad`-differentiable — the oracle for the Pallas tile
renderer (SURVEY.md §4 test strategy). Semantics replicate
forward.cu renderCUDA (:270-383) exactly, including:
- per-gaussian tile-rect confinement (a gaussian only composites into
  pixels whose 16x16 tile lies inside its getRect rectangle);
- alpha = min(0.99, opacity * exp(min(power, 0))), skipped when
  alpha < 1/255;
- a contribution lands only while entering transmittance stays above the
  1e-4 stop threshold (test_T >= 1e-4);
- front-to-back order: depth-sorted, stable w.r.t. gaussian index.

Deliberate divergences (documented in render/tiles.py too): (1) after a
pixel saturates, the reference freezes T; we keep multiplying by (1-alpha).
Contributions are identical; only final_T on saturated pixels differs by
<1e-4, i.e. below half an 8-bit LSB of background blending. (2) the
reference SKIPS power > 0 pixels; we clamp power to 0 — identical for
every positive-definite conic (see the inline note in blend_oracle).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .preprocess import Preprocessed, preprocess
from .types import TILE_X, TILE_Y, RasterSettings

STOP_T = 1e-4
MIN_ALPHA = 1.0 / 255.0
MAX_ALPHA = 0.99


def blend_oracle(
    prep: Preprocessed, settings: RasterSettings
) -> tuple[jax.Array, jax.Array]:
    """Composite all gaussians over the full image with a depth-ordered scan.

    Returns (color (3,H,W) without background, final_T (H,W)).
    """
    h, w = settings.height, settings.width
    n = prep.depth.shape[0]

    # order by the SAME quantized depth key the tile binning sorts with
    # (binning.quantize_depth), so compositing order matches bit-for-bit
    from .binning import quantize_depth

    depth_q = quantize_depth(prep.depth, prep.radius > 0, settings.num_tiles)
    order = jnp.argsort(
        jnp.where(prep.radius > 0, depth_q, jnp.uint32(0xFFFFFFFF)),
        stable=True,
    )

    px = jnp.arange(w, dtype=jnp.float32)[None, :]  # (1,W)
    py = jnp.arange(h, dtype=jnp.float32)[:, None]  # (H,1)
    tile_px = (jnp.arange(w, dtype=jnp.int32) // TILE_X)[None, :]
    tile_py = (jnp.arange(h, dtype=jnp.int32) // TILE_Y)[:, None]

    def step(carry, idx):
        color_acc, t_acc = carry
        alive = prep.radius[idx] > 0
        xy = prep.mean2d[idx]
        con = prep.conic[idx]
        dx = xy[0] - px
        dy = xy[1] - py
        power = -0.5 * (con[0] * dx * dx + con[2] * dy * dy) - con[1] * dx * dy
        # The reference SKIPS power > 0 pixels (forward.cu:349) — purely
        # defensive: after the +0.3 low-pass the 2D conic is provably
        # positive definite, so true power <= 0 everywhere and only
        # rounding can flip its sign (in bf16 kernels, catastrophically —
        # the flip region is the gaussian's own center ridge, where alpha
        # is LARGEST). Clamping is identical for every PD conic and
        # rounding-robust; divergence documented in tiles.py.
        power = jnp.minimum(power, 0.0)
        alpha = jnp.minimum(MAX_ALPHA, prep.opacity[idx] * jnp.exp(power))
        in_rect = (
            (tile_px >= prep.rect_min[idx, 0])
            & (tile_px < prep.rect_max[idx, 0])
            & (tile_py >= prep.rect_min[idx, 1])
            & (tile_py < prep.rect_max[idx, 1])
        )
        mask = (alpha >= MIN_ALPHA) & in_rect & alive
        alpha = jnp.where(mask, alpha, 0.0)
        test_t = t_acc * (1.0 - alpha)
        contrib = jnp.where(test_t >= STOP_T, alpha * t_acc, 0.0)
        color_acc = color_acc + prep.color[idx][:, None, None] * contrib[None]
        return (color_acc, test_t), None

    init = (jnp.zeros((3, h, w)), jnp.ones((h, w)))
    (color, final_t), _ = jax.lax.scan(step, init, order)
    return color, final_t


def render_oracle(
    means3d: jax.Array,
    cov3d: jax.Array,
    opacity: jax.Array,
    extrinsic_vector: jax.Array,
    settings: RasterSettings,
    bg: jax.Array,
    shs: Optional[jax.Array] = None,
    colors_precomp: Optional[jax.Array] = None,
) -> dict:
    """End-to-end oracle render (preprocess + blend + background)."""
    prep = preprocess(
        means3d, cov3d, opacity, extrinsic_vector, settings, shs, colors_precomp
    )
    color, final_t = blend_oracle(prep, settings)
    image = color + final_t[None] * bg[:, None, None]
    return {"render": image, "final_T": final_t, "radii": prep.radius}
