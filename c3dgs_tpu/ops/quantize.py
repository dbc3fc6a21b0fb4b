"""Quantization-aware training ops: int8 affine fake-quant + fp16 round-trip.

Replaces torch.ao.quantization.FakeQuantize(dtype=qint8) as used by the
reference model (scene/gaussian_model.py:109-118) and the straight-through
FakeQuantizationHalf (:1405-1414), in functional JAX style: observer state
(EMA min/max) is an explicit pytree leaf carried by the caller, and the
rounding ops are `jax.custom_vjp` straight-through estimators.

torch.ao semantics reproduced:
- MovingAverageMinMaxObserver (averaging_constant 0.01): first batch sets
  min/max directly, later batches EMA them; range always includes 0.
- per_tensor_affine qint8: quant_min=-128, quant_max=127,
  scale = (max-min)/(qmax-qmin), zero_point = clamp(round(qmin - min/scale)).
- fake_quantize gradient: identity inside the clamp range, 0 outside.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

QMIN = -128
QMAX = 127
AVERAGING_CONSTANT = 0.01


class ObserverState(NamedTuple):
    """EMA min/max observer. `initialized` is 0.0 before the first batch."""

    min_val: jax.Array  # f32 scalar
    max_val: jax.Array  # f32 scalar
    initialized: jax.Array  # f32 scalar flag (0/1); float so pytree is uniform


def init_observer(dtype=jnp.float32) -> ObserverState:
    # distinct buffers: aliased leaves break jit donation
    return ObserverState(
        jnp.zeros((), dtype), jnp.zeros((), dtype), jnp.zeros((), dtype)
    )


def observe(state: ObserverState, x: jax.Array) -> ObserverState:
    """One observer update (MovingAverageMinMaxObserver.forward)."""
    new_min = jnp.minimum(x.min(), 0.0).astype(state.min_val.dtype)
    new_max = jnp.maximum(x.max(), 0.0).astype(state.max_val.dtype)
    c = AVERAGING_CONSTANT
    ema_min = state.min_val + c * (new_min - state.min_val)
    ema_max = state.max_val + c * (new_max - state.max_val)
    init = state.initialized > 0.5
    return ObserverState(
        jnp.where(init, ema_min, new_min),
        jnp.where(init, ema_max, new_max),
        jnp.ones_like(state.initialized),
    )


def set_range(min_val, max_val) -> ObserverState:
    """Build an observer pinned to a known range (npz load path,
    gaussian_model.py:648-719)."""
    return ObserverState(
        jnp.minimum(jnp.float32(min_val), 0.0),
        jnp.maximum(jnp.float32(max_val), 0.0),
        jnp.ones(()),
    )


def qparams(state: ObserverState) -> tuple[jax.Array, jax.Array]:
    """(scale, zero_point) from observer range, torch affine convention."""
    scale = (state.max_val - state.min_val) / float(QMAX - QMIN)
    scale = jnp.maximum(scale, 1e-12)
    zero_point = jnp.clip(jnp.round(QMIN - state.min_val / scale), QMIN, QMAX)
    return scale, zero_point


@jax.custom_vjp
def fake_quant_affine(x: jax.Array, scale: jax.Array, zero_point: jax.Array):
    q = jnp.clip(jnp.round(x / scale + zero_point), QMIN, QMAX)
    return (q - zero_point) * scale


def _fq_fwd(x, scale, zero_point):
    q_unclamped = jnp.round(x / scale + zero_point)
    in_range = (q_unclamped >= QMIN) & (q_unclamped <= QMAX)
    q = jnp.clip(q_unclamped, QMIN, QMAX)
    return (q - zero_point) * scale, in_range


def _fq_bwd(in_range, g):
    return (jnp.where(in_range, g, 0.0), None, None)


fake_quant_affine.defvjp(_fq_fwd, _fq_bwd)


def fake_quant(x: jax.Array, state: ObserverState, enabled: bool = True) -> jax.Array:
    """Quantize-dequantize with the observer's current range (no update).

    Identity while the observer is uninitialized — torch's FakeQuantize
    behaves this way (scale=1/zp=0 defaults). Without this, a freshly
    loaded .ply model (observers reset, like the reference's) would
    collapse every attribute to ~1e-10 via the degenerate min=max=0
    range before its first training step."""
    if not enabled:
        return x
    scale, zp = qparams(state)
    return jnp.where(
        state.initialized > 0.5, fake_quant_affine(x, scale, zp), x
    )


def quantize_int8(x: jax.Array, state: ObserverState) -> jax.Array:
    """Real int8 representation for serialization (torch int_repr)."""
    scale, zp = qparams(state)
    return jnp.clip(jnp.round(x / scale + zp), QMIN, QMAX).astype(jnp.int8)


def dequantize_int8(q: jax.Array, scale, zero_point) -> jax.Array:
    return (q.astype(jnp.float32) - jnp.float32(zero_point)) * jnp.float32(scale)


@jax.custom_vjp
def fake_quant_half(x: jax.Array) -> jax.Array:
    """fp16 round-trip with straight-through gradient
    (FakeQuantizationHalf, gaussian_model.py:1405-1414)."""
    return x.astype(jnp.float16).astype(x.dtype)


def _fqh_fwd(x):
    return fake_quant_half(x), None


def _fqh_bwd(_, g):
    return (g,)


fake_quant_half.defvjp(_fqh_fwd, _fqh_bwd)
