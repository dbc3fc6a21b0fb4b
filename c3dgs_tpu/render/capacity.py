"""Adaptive instance-capacity policy.

XLA needs static shapes, but num_rendered varies per frame (the reference
reads it back and allocates dynamically, rasterizer_impl.cu:279). Binning
cost scales with the static capacity, so over-provisioning is pure waste.
This policy keeps capacity in geometric buckets of the form m * 2^e with a
5-bit mantissa (m in 16..31): at most 6.7% overshoot (power-of-2 buckets
waste up to 2x, and every binning gather/sort scales with capacity), while
still bounding distinct compiled shapes to ~8 per octave. Grow when a frame
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
        grad_initial: int = 0,
    ):
        self.capacity = max(_bucket(initial), MIN_CAPACITY)
        self.headroom = headroom
        self.shrink_patience = shrink_patience
        self._low_count = 0
        # per-instance GRADIENT buffer capacity. 0 = the always-sufficient
        # static bound (cap + 2*CHUNK*num_tiles, types.resolve_grad_cap),
        # which at 1080p is ~2x larger than any real frame needs — and the
        # backward reduction sort scales with it. Once a frame reports its
        # true grad_total, the bucketed tight value takes over.
        self.grad_capacity = max(_bucket(grad_initial), MIN_CAPACITY) if grad_initial else 0
        self._grad_low = 0

    def apply(self, settings: RasterSettings) -> RasterSettings:
        return dataclasses.replace(
            settings,
            instance_capacity=self.capacity,
            grad_capacity=self.grad_capacity,
        )

    def update(
        self,
        num_instances: int,
        overflow: int,
        grad_total: int | None = None,
        grad_overflow: int = 0,
    ) -> bool:
        """Feed one frame's stats. Returns True if the frame overflowed
        (instances dropped, or grad writes clamped into the last chunk) and
        should be re-rendered at the new (grown) capacity."""
        rerender = False
        need = int(num_instances * self.headroom)
        if overflow > 0 or need > self.capacity:
            self.capacity = max(_bucket(max(need, self.capacity + 1)), MIN_CAPACITY)
            self._low_count = 0
            rerender = overflow > 0
        elif need < self.capacity * 3 // 4 and self.capacity > MIN_CAPACITY:
            self._low_count += 1
            if self._low_count >= self.shrink_patience:
                e = max(int(self.capacity).bit_length() - 5, 0)
                self.capacity = max(self.capacity - (1 << e), MIN_CAPACITY)
                self._low_count = 0
        else:
            self._low_count = 0

        if grad_total is not None:
            need_g = max(int(grad_total * self.headroom), MIN_CAPACITY)
            if grad_overflow > 0 or (
                self.grad_capacity and need_g > self.grad_capacity
            ):
                self.grad_capacity = _bucket(max(need_g, self.grad_capacity + 1))
                self._grad_low = 0
                rerender = rerender or grad_overflow > 0
            elif self.grad_capacity == 0:
                self.grad_capacity = _bucket(need_g)
            elif need_g < self.grad_capacity * 3 // 4:
                self._grad_low += 1
                if self._grad_low >= self.shrink_patience:
                    e = max(int(self.grad_capacity).bit_length() - 5, 0)
                    self.grad_capacity = max(
                        self.grad_capacity - (1 << e), MIN_CAPACITY
                    )
                    self._grad_low = 0
            else:
                self._grad_low = 0
        return rerender


def _bucket(x: int) -> int:
    """Smallest m * 2^e >= x with a 5-bit mantissa m in 16..31 (8 bucket
    steps per octave, <=6.7% overshoot — round 5: every binning gather,
    sort, and kernel grid scales with the bucket, and the 4-bit mantissa's
    up-to-14.3% slack measured ~1 ms/frame on the 1080p bench; the extra
    compiled shapes stay bounded by shrink_patience)."""
    if x <= 1:
        return 1
    e = max(int(x - 1).bit_length() - 5, 0)
    return -(-x // (1 << e)) << e
