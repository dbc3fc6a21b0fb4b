"""Rasterization settings.

Functional analog of GaussianRasterizationSettings
(…no_camera/__init__.py:868-879), split into static geometry (python ints —
they determine compiled shapes) and traced camera arrays, so one jitted
render function serves every frame of a given resolution.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax

TILE_X = 16  # pixels per tile, x (reference config.h:16)
TILE_Y = 16  # pixels per tile, y (reference config.h:17)


@dataclasses.dataclass(frozen=True)
class RasterSettings:
    """Static render configuration (hashable; safe as a jit static arg)."""

    width: int
    height: int
    tanfovx: float
    tanfovy: float
    sh_degree: int = 3
    scale_modifier: float = 1.0
    clamp_color: bool = True
    # capacity of the (gaussian, tile) instance list; overflow is counted and
    # reported, mirroring the dynamic num_rendered of the reference
    # (rasterizer_impl.cu:279) with a static budget.
    instance_capacity: int = 0  # 0 => auto: 8 * num_gaussians
    # cap on tiles a single gaussian may occupy (static scatter width)
    max_tiles_per_gaussian: int = 0  # 0 => auto: full tile grid, capped at 256

    @property
    def focal_x(self) -> float:
        return self.width / (2.0 * self.tanfovx)

    @property
    def focal_y(self) -> float:
        return self.height / (2.0 * self.tanfovy)

    @property
    def tiles_x(self) -> int:
        return (self.width + TILE_X - 1) // TILE_X

    @property
    def tiles_y(self) -> int:
        return (self.height + TILE_Y - 1) // TILE_Y

    @property
    def num_tiles(self) -> int:
        return self.tiles_x * self.tiles_y

    def resolve_caps(self, num_gaussians: int) -> Tuple[int, int]:
        inst = self.instance_capacity or max(1024, 8 * num_gaussians)
        # gather-based binning makes large per-gaussian fanouts free; the
        # cap only exists as an explicit user knob
        mtpg = self.max_tiles_per_gaussian or self.num_tiles
        return inst, mtpg


def settings_from_intrinsic(intrinsic, **kw) -> RasterSettings:
    """Build RasterSettings from the fork's 3x3 FoV-radian intrinsic."""
    from ..ops.camera_math import intrinsic_geometry

    w, h, tx, ty, _, _ = intrinsic_geometry(intrinsic)
    return RasterSettings(width=w, height=h, tanfovx=tx, tanfovy=ty, **kw)
