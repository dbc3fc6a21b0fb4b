"""Rasterization settings.

Functional analog of GaussianRasterizationSettings
(…no_camera/__init__.py:868-879), split into static geometry (python ints —
they determine compiled shapes) and traced camera arrays, so one jitted
render function serves every frame of a given resolution.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import os as _os

# Tile shape (reference config.h:16-17 uses 16x16; 32x16 won on TPU for
# the round-1 per-tile kernels). Env-overridable for tile-shape
# experiments (C3DGS_TILE_X/Y, read once at import — every consumer
# derives from these two constants).
TILE_X = int(_os.environ.get("C3DGS_TILE_X", 32))  # pixels per tile, x
TILE_Y = int(_os.environ.get("C3DGS_TILE_Y", 16))  # pixels per tile, y
# binning slot-domain ceiling: presort slots ride f32 staged-field rows
# and must be exactly representable (2^24; render/binning.py). 16.7M
# instances — enough for ~5M-gaussian scenes at trained tile fanouts.
# (The former second constraint — bit-24 packing in the sentinel
# compaction sort — disappeared when that sort folded into the perm sort.)
MAX_BINNING_CAP = (1 << 24) - (1 << 20)


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
    # cap on tiles a single gaussian may occupy; 0 => the full tile grid.
    # binning additionally caps it to fit the packed (gid, j) sort payload
    # (>= 4096 whenever gaussians + tiles <= 2^19; excess is counted in
    # the `clipped` diagnostic)
    max_tiles_per_gaussian: int = 0
    # capacity of the per-instance gradient buffer (128-aligned chunk cover
    # of every tile's unpadded segment); 0 => the always-sufficient bound
    # cap + 2*CHUNK*num_tiles. The adaptive policy tightens it (the backward
    # reduction sort scales with it); grad_overflow is counted when exceeded.
    grad_capacity: int = 0
    # single-pass contractions (suffix, colsums, g_rgb, gc_dot_c) in the
    # BACKWARD kernel: their bf16 input truncation is a RELATIVE
    # perturbation of each term (the backward's suffix ordering and exact
    # lt walk keep it un-amplified — see tiles.py). False upgrades every
    # one to an f32-exact hi/lo split: the backward becomes an on-hardware
    # oracle. The transmittance walk is always exact.
    fast_grad: bool = True
    # packed-chunk kernels (render/tiles_packed.py): the blend grid walks
    # aligned CHUNK windows of the global sorted instance array (per-tile
    # grouping inside chunks) instead of per-tile windows — no remainder
    # lanes, grad buffer == instance capacity. False falls back to the
    # round-1 per-tile window kernels (render/tiles.py).
    packed: bool = True
    # forward-only rendering (no VJP will be taken): binning keeps the
    # tile ranges on a dedicated sentinel-position sort so the gaussian-
    # major perm sort (backward-only bookkeeping) dead-code-eliminates.
    # False (training): ranges are read out of the perm sort instead —
    # one fewer cap-row sort per training frame. Pure graph-shape knob:
    # ends/starts values are identical either way.
    inference: bool = False

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
        inst = self.instance_capacity
        if not inst:
            # auto-cap: 8x gaussians, clamped to the binning slot domain
            # (sentinel-position packing + exact-in-f32 presort slots both
            # need cap < 2^24 — render/binning.py); multi-frame pipelines
            # should probe the true instance count instead
            # (render/capacity.py)
            inst = min(max(1024, 8 * num_gaussians), MAX_BINNING_CAP)
        # round to the 128-chunk grain: the staged fields array is read by
        # the kernels in aligned 128-lane chunks
        inst = (inst + 127) // 128 * 128
        assert inst + self.num_tiles < (1 << 24), (
            "instance_capacity + num_tiles must stay below 2^24 "
            "(binning packs slot positions into 24 bits and presort slots "
            f"into exact f32); got {inst}"
        )
        # gather-based binning makes large per-gaussian fanouts free; the
        # cap only exists as an explicit user knob
        mtpg = self.max_tiles_per_gaussian or self.num_tiles
        return inst, mtpg

    def resolve_grad_cap(self, num_gaussians: int) -> int:
        if self.packed:
            # packed kernels write one grad row per sorted slot, and this
            # doubles as the EXECUTION capacity: the sorted array's content
            # (kept instances + sentinels) ends well before the slot-domain
            # cap (the enumeration domain includes culled/overflow slack),
            # so staging, both kernel grids, the grad buffer, and the
            # reduction all run at this tighter bound when the capacity
            # policy has probed the frame's true grad_total. Overshoot
            # clamps the executed chunks and is counted in grad_overflow
            # (the policy grows the bucket and re-renders).
            cap, _ = self.resolve_caps(num_gaussians)
            if self.grad_capacity:
                return min((self.grad_capacity + 127) // 128 * 128, cap)
            return cap
        if self.grad_capacity:
            return (self.grad_capacity + 127) // 128 * 128
        cap, _ = self.resolve_caps(num_gaussians)
        # safe bound: each tile's chunk cover wastes < 2*CHUNK lanes
        return cap + 2 * 128 * self.num_tiles


def settings_from_intrinsic(intrinsic, **kw) -> RasterSettings:
    """Build RasterSettings from the fork's 3x3 FoV-radian intrinsic."""
    from ..ops.camera_math import intrinsic_geometry

    w, h, tx, ty, _, _ = intrinsic_geometry(intrinsic)
    return RasterSettings(width=w, height=h, tanfovx=tx, tanfovy=ty, **kw)
