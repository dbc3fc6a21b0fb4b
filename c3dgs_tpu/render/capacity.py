"""Adaptive instance-capacity policy.

XLA needs static shapes, but num_rendered varies per frame (the reference
reads it back and allocates dynamically, rasterizer_impl.cu:279). Binning
cost scales with the static capacity, so over-provisioning is pure waste.
This policy keeps capacity in power-of-2 buckets: grow when a frame
overflows (and re-render it), shrink when sustained usage falls below a
quarter of the bucket. At most log2(range) distinct compilations per run.
"""
from __future__ import annotations

import dataclasses

from .types import RasterSettings

MIN_CAPACITY = 1 << 16


class CapacityPolicy:
    def __init__(
        self,
        initial: int = 1 << 21,
        headroom: float = 1.3,
        shrink_patience: int = 50,
    ):
        self.capacity = max(_bucket(initial), MIN_CAPACITY)
        self.headroom = headroom
        self.shrink_patience = shrink_patience
        self._low_count = 0

    def apply(self, settings: RasterSettings) -> RasterSettings:
        return dataclasses.replace(settings, instance_capacity=self.capacity)

    def update(self, num_instances: int, overflow: int) -> bool:
        """Feed one frame's stats. Returns True if the frame overflowed and
        should be re-rendered at the new (grown) capacity."""
        need = int(num_instances * self.headroom)
        if overflow > 0 or need > self.capacity:
            self.capacity = max(_bucket(max(need, self.capacity + 1)), MIN_CAPACITY)
            self._low_count = 0
            return overflow > 0
        if need < self.capacity // 4 and self.capacity > MIN_CAPACITY:
            self._low_count += 1
            if self._low_count >= self.shrink_patience:
                self.capacity //= 2
                self._low_count = 0
        else:
            self._low_count = 0
        return False


def _bucket(x: int) -> int:
    return 1 << max(int(x - 1).bit_length(), 0)
