"""Adaptive instance-capacity policy.

XLA needs static shapes, but num_rendered varies per frame (the reference
reads it back and allocates dynamically, rasterizer_impl.cu:279). Binning
cost scales with the static capacity, so over-provisioning is pure waste.
This policy keeps capacity in geometric buckets of the form m * 2^e with a
4-bit mantissa (m in 8..15): at most 14.3% overshoot (power-of-2 buckets
waste up to 2x, and every binning gather/sort scales with capacity), while
still bounding distinct compiled shapes to ~4 per octave. Grow when a frame
overflows (and re-render it), shrink one mantissa step when sustained usage
falls well below the bucket.
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
        if need < self.capacity * 3 // 4 and self.capacity > MIN_CAPACITY:
            self._low_count += 1
            if self._low_count >= self.shrink_patience:
                e = max(int(self.capacity).bit_length() - 4, 0)
                self.capacity = max(self.capacity - (1 << e), MIN_CAPACITY)
                self._low_count = 0
        else:
            self._low_count = 0
        return False


def _bucket(x: int) -> int:
    """Smallest m * 2^e >= x with mantissa m in 8..15 (4 bucket steps per
    octave, <=14.3% overshoot)."""
    if x <= 1:
        return 1
    e = max(int(x - 1).bit_length() - 4, 0)
    return -(-x // (1 << e)) << e
