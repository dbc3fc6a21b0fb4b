"""Public differentiable rasterizer API.

`render(...)` is the functional analog of GaussianModel.render
(scene/gaussian_model.py:766-886) + GaussianRasterizer
(…no_camera/__init__.py:881-1046), fused into one jittable pipeline:

  preprocess (jnp, autodiff)  ->  bin+sort (non-diff bookkeeping)
  -> stage gather (autodiff: VJP = deterministic segment-sum)
  -> tile_blend (Pallas fwd/bwd via custom_vjp) -> image assembly (jnp)

Camera-pose gradients: `extrinsic_vector` is a differentiated input of
preprocess, so jax.grad provides the pose Jacobian the reference computes
with ~110 lines of sympy output (…no_camera/__init__.py:679-788).

Dense vs indexed rendering: index gathers happen in the model accessors
(models/gaussians.py), so one rasterizer serves both modes (the reference
maintains two kernel families, forward.cu vs forward_indexed.cu).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import tiles
from .binning import CHUNK, NUM_FIELDS, bin_gaussians, stage_fields
from .preprocess import preprocess
from .types import TILE_X, TILE_Y, RasterSettings


def _blend_forward_call(
    tiles_x: int, num_tiles: int, fields, starts, counts, tile_ids
):
    kernel = functools.partial(tiles.forward_kernel, tiles_x=tiles_x)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, tiles.OUT_ROWS, tiles.PIX),
            lambda t, *_: (t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, NUM_FIELDS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (num_tiles, tiles.OUT_ROWS, tiles.PIX), jnp.float32
        ),
        interpret=tiles.interpret_mode(),
    )(tile_ids, starts, counts, fields)


def _blend_backward_call(
    tiles_x: int, num_tiles: int, fields, starts, counts, tile_ids, totals, gout
):
    kernel = functools.partial(tiles.backward_kernel, tiles_x=tiles_x)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # fields
            pl.BlockSpec(memory_space=pltpu.ANY),  # totals
            pl.BlockSpec(memory_space=pltpu.ANY),  # gout
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, NUM_FIELDS, CHUNK), jnp.float32),  # fbuf
            pltpu.VMEM((2, NUM_FIELDS, CHUNK), jnp.float32),  # gbuf
            pltpu.VMEM((tiles.OUT_ROWS, tiles.PIX), jnp.float32),  # totals
            pltpu.VMEM((tiles.OUT_ROWS, tiles.PIX), jnp.float32),  # gout
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    grads = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(fields.shape, jnp.float32),
        interpret=tiles.interpret_mode(),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_ids, starts, counts, fields, totals, gout)
    # only this call's own tile segments were DMA'd; everything outside
    # [starts[0], last end) is uninitialized memory (crucial when the tile
    # grid is sharded: other devices' segments live there)
    pos = jnp.arange(fields.shape[1])
    covered = (pos >= starts[0]) & (pos < starts[-1] + counts[-1])
    return jnp.where(covered[None, :], grads, 0.0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def tile_blend(tiles_x: int, num_tiles: int, fields, starts, counts, tile_ids):
    """Alpha-composite staged instances. Returns (T, OUT_ROWS, PIX):
    rows 0..2 color (no background), row 3 final transmittance. `tile_ids`
    maps grid index -> global tile id (identity when unsharded)."""
    return _blend_forward_call(tiles_x, num_tiles, fields, starts, counts, tile_ids)


def _tile_blend_fwd(tiles_x, num_tiles, fields, starts, counts, tile_ids):
    out = _blend_forward_call(tiles_x, num_tiles, fields, starts, counts, tile_ids)
    return out, (fields, starts, counts, tile_ids, out)


def _tile_blend_bwd(tiles_x, num_tiles, res, g):
    fields, starts, counts, tile_ids, out = res
    d_fields = _blend_backward_call(
        tiles_x, num_tiles, fields, starts, counts, tile_ids, out, g
    )
    return d_fields, None, None, None


tile_blend.defvjp(_tile_blend_fwd, _tile_blend_bwd)


def assemble_image(out_tiles: jax.Array, settings: RasterSettings):
    """(T, OUT_ROWS, PIX) tile blocks -> (color (3,H,W), final_T (H,W))."""
    ty, tx = settings.tiles_y, settings.tiles_x
    blocks = out_tiles.reshape(ty, tx, tiles.OUT_ROWS, TILE_Y, TILE_X)
    full = jnp.transpose(blocks, (2, 0, 3, 1, 4)).reshape(
        tiles.OUT_ROWS, ty * TILE_Y, tx * TILE_X
    )
    color = full[:3, : settings.height, : settings.width]
    final_t = full[3, : settings.height, : settings.width]
    return color, final_t


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

    binning = bin_gaussians(prep, settings)
    fields = stage_fields(prep, binning)
    out_tiles = tile_blend(
        settings.tiles_x,
        settings.num_tiles,
        fields,
        binning.tile_starts,
        binning.tile_counts,
        jnp.arange(settings.num_tiles, dtype=jnp.int32),
    )
    color, final_t = assemble_image(out_tiles, settings)
    image = color + final_t[None] * bg[:, None, None]
    return {
        "render": image,
        "final_T": final_t,
        "radii": prep.radius,
        "visibility_filter": prep.radius > 0,
        "num_instances": binning.num_instances,
        "overflow": binning.overflow,
        "clipped": binning.clipped,
    }
