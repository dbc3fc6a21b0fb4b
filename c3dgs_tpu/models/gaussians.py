"""GaussianScene — the fixed-shape, functional replacement for the
reference's mutable `GaussianModel` (scene/gaussian_model.py:53).

Design (TPU-first, see SURVEY.md §7):
- one immutable pytree (flax.struct) holding pre-activation parameters,
  optional codebooks + int32 indices, QAT observer states, and an `active`
  mask over a capacity-padded row budget;
- all shapes static: densify/prune write within capacity instead of
  reallocating (the reference's cat/mask surgery, gaussian_model.py:1027,
  1161-1185, is impossible under XLA);
- accessors are pure functions applying fake-quant + activation + index
  gather exactly like the reference properties (gaussian_model.py:213-278);
- an inactive row renders as opacity 0, so padded rows are invisible to the
  rasterizer and to every loss.

Attribute conventions match the reference exactly (activation order, the
factor-scaling decomposition gaussian_model.py:54-77, quaternions real-first).
"""
from __future__ import annotations

from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import misc, quantize, quat
from ..ops.quantize import ObserverState


class QuantState(flax.struct.PyTreeNode):
    """Observer states for every fake-quantized attribute
    (gaussian_model.py:109-118)."""

    features_dc: ObserverState
    features_rest: ObserverState
    opacity: ObserverState
    scaling: ObserverState
    scaling_factor: ObserverState
    rotation: ObserverState

    @classmethod
    def create(cls) -> "QuantState":
        return cls(*[quantize.init_observer() for _ in range(6)])


class GaussianScene(flax.struct.PyTreeNode):
    """Capacity-padded Gaussian scene parameters (pre-activation)."""

    # per-splat rows, capacity P
    xyz: jax.Array  # (P, 3) f32
    opacity: jax.Array  # (P, 1) f32 (logit)
    scaling_factor: Optional[jax.Array]  # (P, 1) f32 (log) or None
    active: jax.Array  # (P,) bool
    # shape/color tables: row count == P when dense, codebook size when indexed
    features_dc: jax.Array  # (F, 1, 3)
    features_rest: jax.Array  # (F, K-1, 3)
    scaling: jax.Array  # (G, 3)
    rotation: jax.Array  # (G, 4)
    # index arrays (None => dense)
    feature_indices: Optional[jax.Array]  # (P,) int32
    gaussian_indices: Optional[jax.Array]  # (P,) int32
    # QAT observers
    quant: QuantState
    # static config
    max_sh_degree: int = flax.struct.field(pytree_node=False, default=3)
    active_sh_degree: int = flax.struct.field(pytree_node=False, default=0)
    quantization: bool = flax.struct.field(pytree_node=False, default=True)
    use_factor_scaling: bool = flax.struct.field(pytree_node=False, default=True)

    # ---------------------------------------------------------------- basics
    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def num_active(self) -> jax.Array:
        return self.active.sum()

    @property
    def is_color_indexed(self) -> bool:
        return self.feature_indices is not None

    @property
    def is_gaussian_indexed(self) -> bool:
        return self.gaussian_indices is not None

    @property
    def num_sh_coeffs(self) -> int:
        return (self.max_sh_degree + 1) ** 2

    def check_state(self) -> None:
        """Invariant asserts (gaussian_model.py:138-154); host-side."""
        p = self.xyz.shape[0]
        assert self.opacity.shape[0] == p
        assert self.active.shape[0] == p
        if self.is_gaussian_indexed:
            assert self.gaussian_indices.shape[0] == p
            assert int(self.gaussian_indices.max()) < self.scaling.shape[0]
        else:
            assert self.rotation.shape[0] == p and self.scaling.shape[0] == p
        if self.is_color_indexed:
            assert self.feature_indices.shape[0] == p
            assert int(self.feature_indices.max()) < self.features_dc.shape[0]
        else:
            assert self.features_dc.shape[0] == p
            assert self.features_rest.shape[0] == p

    # ----------------------------------------------------------- activations
    def _fq(self, x: jax.Array, obs: ObserverState) -> jax.Array:
        return quantize.fake_quant(x, obs) if self.quantization else x

    def get_xyz(self) -> jax.Array:
        """(P,3); fp16 fake-quant when QAT is on (gaussian_model.py:248)."""
        return quantize.fake_quant_half(self.xyz) if self.quantization else self.xyz

    def get_opacity(self) -> jax.Array:
        """(P,1) in [0,1]; 0 for inactive rows (gaussian_model.py:265)."""
        op = self._fq(jax.nn.sigmoid(self.opacity), self.quant.opacity)
        return jnp.where(self.active[:, None], op, 0.0)

    def get_scaling_normalized(self) -> jax.Array:
        """(G,3) unit-norm non-negative direction (gaussian_model.py:224)."""
        s = jax.nn.relu(self.scaling)
        s = quat.normalize(s)
        return self._fq(s, self.quant.scaling)

    def get_scaling_factor(self) -> jax.Array:
        """(P,1) positive scalar (gaussian_model.py:228)."""
        if self.scaling_factor is None:
            return jnp.ones((self.capacity, 1), self.xyz.dtype)
        return jnp.exp(self._fq(self.scaling_factor, self.quant.scaling_factor))

    def get_scaling(self) -> jax.Array:
        """(P,3) actual per-splat scale (gaussian_model.py:213-222)."""
        s = self.get_scaling_normalized()
        if self.is_gaussian_indexed:
            s = s[self.gaussian_indices]
        if self.scaling_factor is None:
            return s
        return self.get_scaling_factor() * s

    def get_rotation_raw(self) -> jax.Array:
        """(G,4) normalized quats, un-gathered (gaussian_model.py:244)."""
        return quat.normalize(self._fq(self.rotation, self.quant.rotation))

    def get_rotation(self) -> jax.Array:
        """(P,4) per-splat quats (gaussian_model.py:236)."""
        r = self.get_rotation_raw()
        return r[self.gaussian_indices] if self.is_gaussian_indexed else r

    def get_features_raw(self) -> jax.Array:
        """(F,K,3) fake-quantized SH table (gaussian_model.py:259)."""
        dc = self._fq(self.features_dc, self.quant.features_dc)
        rest = self._fq(self.features_rest, self.quant.features_rest)
        return jnp.concatenate([dc, rest], axis=1)

    def get_features(self) -> jax.Array:
        """(P,K,3) per-splat SH coefficients (gaussian_model.py:252)."""
        f = self.get_features_raw()
        return f[self.feature_indices] if self.is_color_indexed else f

    def _gathered_shape(self):
        """(P,3) normalized scale + (P,4) quat for an indexed scene via ONE
        packed (G,7) row gather — row gathers cost per ROW, not per width,
        so separate scaling/rotation gathers paid twice
        (docs/PERF.md TPU lowering lesson #4)."""
        packed = jnp.concatenate(
            [self.get_scaling_normalized(), self.get_rotation_raw()], axis=1
        )
        rows = jax.lax.optimization_barrier(packed[self.gaussian_indices])
        return rows[:, :3], rows[:, 3:]

    def get_covariance(self, scaling_modifier: float = 1.0) -> jax.Array:
        """(P,6) upper-triangle world covariance (gaussian_model.py:269)."""
        if self.is_gaussian_indexed:
            s, r = self._gathered_shape()
            if self.scaling_factor is not None:
                s = self.get_scaling_factor() * s
            return quat.cov6_from_scaling_rotation(scaling_modifier * s, r)
        return quat.cov6_from_scaling_rotation(
            scaling_modifier * self.get_scaling(), self.get_rotation()
        )

    def get_normalized_covariance(self, scaling_modifier: float = 1.0) -> jax.Array:
        """(P,6) covariance of the *normalized* scale (gaussian_model.py:274)
        — the well-posed input for covariance VQ."""
        if self.is_gaussian_indexed:
            s, r = self._gathered_shape()
            return quat.cov6_from_scaling_rotation(scaling_modifier * s, r)
        s = self.get_scaling_normalized()
        return quat.cov6_from_scaling_rotation(
            scaling_modifier * s, self.get_rotation()
        )

    # ------------------------------------------------------------- observers
    def update_observers(self) -> "GaussianScene":
        """One observer EMA step over every quantized attribute.

        The torch FakeQuantize modules observe on every forward
        (gaussian_model.py:109-117); functionally we fold all observations
        into one explicit update per training step.
        """
        if not self.quantization:
            return self
        q = self.quant
        new = QuantState(
            features_dc=quantize.observe(q.features_dc, self.features_dc),
            features_rest=quantize.observe(q.features_rest, self.features_rest),
            opacity=quantize.observe(q.opacity, jax.nn.sigmoid(self.opacity)),
            scaling=quantize.observe(
                q.scaling, quat.normalize(jax.nn.relu(self.scaling))
            ),
            scaling_factor=(
                quantize.observe(q.scaling_factor, self.scaling_factor)
                if self.scaling_factor is not None
                else q.scaling_factor
            ),
            rotation=quantize.observe(q.rotation, self.rotation),
        )
        return self.replace(quant=new)

    # -------------------------------------------------------- reorg / modes
    def oneup_sh_degree(self) -> "GaussianScene":
        if self.active_sh_degree < self.max_sh_degree:
            return self.replace(active_sh_degree=self.active_sh_degree + 1)
        return self

    def to_indexed(self) -> "GaussianScene":
        """Identity indices (gaussian_model.py:902)."""
        if self.is_color_indexed and self.is_gaussian_indexed:
            return self
        n = self.capacity
        # two distinct buffers: aliased pytree leaves break donation in the
        # jitted train/finetune steps (XLA: "donate the same buffer twice")
        fidx = jnp.arange(n, dtype=jnp.int32)
        gidx = jnp.arange(n, dtype=jnp.int32)
        if self.is_color_indexed:
            fidx = self.feature_indices
        if self.is_gaussian_indexed:
            gidx = self.gaussian_indices
        return self.replace(feature_indices=fidx, gaussian_indices=gidx)

    def to_unindexed(self) -> "GaussianScene":
        """Gather codebooks to dense rows (gaussian_model.py:889)."""
        if not self.is_color_indexed and not self.is_gaussian_indexed:
            return self
        out = self
        if self.is_color_indexed:
            out = out.replace(
                features_dc=self.features_dc[self.feature_indices],
                features_rest=self.features_rest[self.feature_indices],
                feature_indices=None,
            )
        if self.is_gaussian_indexed:
            out = out.replace(
                scaling=self.scaling[self.gaussian_indices],
                rotation=self.rotation[self.gaussian_indices],
                gaussian_indices=None,
            )
        return out

    def set_color_indexed(
        self, features: jax.Array, indices: jax.Array
    ) -> "GaussianScene":
        """(gaussian_model.py:1048) features: (C,K,3), indices: (P,)."""
        return self.replace(
            features_dc=features[:, :1],
            features_rest=features[:, 1:],
            feature_indices=indices.astype(jnp.int32),
        )

    def set_gaussian_indexed(
        self, rotation: jax.Array, scaling: jax.Array, indices: jax.Array
    ) -> "GaussianScene":
        """(gaussian_model.py:1054)."""
        return self.replace(
            rotation=rotation,
            scaling=scaling,
            gaussian_indices=indices.astype(jnp.int32),
        )

    def mask_splats(self, keep: jax.Array) -> "GaussianScene":
        """Deactivate rows (gaussian_model.py:1027 masked instead of sliced)."""
        return self.replace(active=self.active & keep)

    def permute(self, order) -> "GaussianScene":
        """Reorder per-splat rows (host-side; used by Morton sort at save
        time, gaussian_model.py:997-1023)."""
        out = self.replace(
            xyz=self.xyz[order],
            opacity=self.opacity[order],
            active=self.active[order],
        )
        if self.scaling_factor is not None:
            out = out.replace(scaling_factor=self.scaling_factor[order])
        if self.is_color_indexed:
            out = out.replace(feature_indices=self.feature_indices[order])
        else:
            out = out.replace(
                features_dc=self.features_dc[order],
                features_rest=self.features_rest[order],
            )
        if self.is_gaussian_indexed:
            out = out.replace(gaussian_indices=self.gaussian_indices[order])
        else:
            out = out.replace(
                scaling=self.scaling[order], rotation=self.rotation[order]
            )
        return out

    def compact(self) -> "GaussianScene":
        """Host-side: drop inactive rows and shrink capacity to num_active.

        Also compacts codebooks to referenced entries only, rebuilding the
        index arrays (the reference's calc_valid, gaussian_model.py:1104).
        """
        keep = np.asarray(self.active)
        out = self.permute(np.nonzero(keep)[0])
        out = out.replace(active=jnp.ones(int(keep.sum()), bool))
        if out.is_color_indexed:
            f_idx = np.asarray(out.feature_indices)
            used, inv = np.unique(f_idx, return_inverse=True)
            out = out.replace(
                features_dc=out.features_dc[used],
                features_rest=out.features_rest[used],
                feature_indices=jnp.asarray(inv, jnp.int32),
            )
        if out.is_gaussian_indexed:
            g_idx = np.asarray(out.gaussian_indices)
            used, inv = np.unique(g_idx, return_inverse=True)
            out = out.replace(
                scaling=out.scaling[used],
                rotation=out.rotation[used],
                gaussian_indices=jnp.asarray(inv, jnp.int32),
            )
        return out

    def pad_to_capacity(self, capacity: int) -> "GaussianScene":
        """Host-side: grow row budget; new rows are inactive."""
        assert not self.is_color_indexed and not self.is_gaussian_indexed, (
            "grow dense scenes only"
        )
        cur = self.capacity
        assert capacity >= cur
        extra = capacity - cur
        if extra == 0:
            return self

        def pad(x, fill=0.0):
            widths = [(0, extra)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, widths, constant_values=fill)

        out = self.replace(
            xyz=pad(self.xyz),
            opacity=pad(self.opacity, misc.inverse_sigmoid(1e-4)),
            active=jnp.pad(self.active, (0, extra), constant_values=False),
            features_dc=pad(self.features_dc),
            features_rest=pad(self.features_rest),
            scaling=pad(self.scaling, 1.0),
            rotation=jnp.pad(
                self.rotation, ((0, extra), (0, 0)), constant_values=0.0
            ).at[cur:, 0].set(1.0),
        )
        if self.scaling_factor is not None:
            out = out.replace(scaling_factor=pad(self.scaling_factor, -10.0))
        return out

    def morton_sorted(self) -> "GaussianScene":
        """Host-side Morton reorder of active rows (inactive rows go last)."""
        from .. import native

        xyz = np.asarray(self.xyz)
        active = np.asarray(self.active)
        order = native.morton_order(xyz)
        order = np.concatenate([order[active[order]], order[~active[order]]])
        return self.permute(order)


# --------------------------------------------------------------- constructors
def from_point_cloud(
    points: np.ndarray,
    colors: Optional[np.ndarray] = None,
    max_sh_degree: int = 3,
    capacity: Optional[int] = None,
    quantization: bool = True,
    use_factor_scaling: bool = True,
    initial_opacity: float = 0.1,
    knn_scale_init: bool = True,
) -> GaussianScene:
    """Initialize from a sparse point cloud (the create-from-pcd path the
    reference reaches through load_ply on an RGB ply,
    gaussian_model.py:398-502: SH-DC from RGB, opacity logit(0.1), scale from
    sqrt(mean 3-NN squared distance), identity rotations)."""
    from ..ops import sh as sh_ops

    n = points.shape[0]
    cap = capacity or n
    assert cap >= n
    k = (max_sh_degree + 1) ** 2

    xyz = np.zeros((cap, 3), np.float32)
    xyz[:n] = points
    features_dc = np.zeros((cap, 1, 3), np.float32)
    if colors is not None:
        features_dc[:n, 0] = np.asarray(sh_ops.rgb_to_sh_dc(colors.astype(np.float32)))
    features_rest = np.zeros((cap, k - 1, 3), np.float32)
    opacity = np.full(
        (cap, 1), float(misc.inverse_sigmoid(initial_opacity)), np.float32
    )

    if knn_scale_init and n > 3:
        knn = (
            misc.mean_knn_sq_dist
            if n <= misc.EXACT_KNN_MAX_POINTS
            else misc.mean_knn_sq_dist_large  # Morton-window approximation
        )
        dist2 = np.asarray(knn(jnp.asarray(points, jnp.float32)))
        dist2 = np.maximum(dist2, 1e-7)
        log_scale = 0.5 * np.log(dist2)  # log(sqrt(d2))
    else:
        log_scale = np.zeros(n, np.float32)
    scales = np.zeros((cap, 3), np.float32)
    scales[:n] = log_scale[:, None]

    rotation = np.zeros((cap, 4), np.float32)
    rotation[:, 0] = 1.0
    active = np.zeros(cap, bool)
    active[:n] = True

    if use_factor_scaling:
        # split exp(scale) into unit direction * norm (gaussian_model.py:489-497)
        lin = np.exp(scales)
        norm = np.linalg.norm(lin, axis=1, keepdims=True)
        norm = np.maximum(norm, 1e-12)
        scaling = (lin / norm).astype(np.float32)  # inverse activation = identity
        scaling_factor = np.log(norm).astype(np.float32)
    else:
        scaling = scales
        scaling_factor = None

    return GaussianScene(
        xyz=jnp.asarray(xyz),
        opacity=jnp.asarray(opacity),
        scaling_factor=None if scaling_factor is None else jnp.asarray(scaling_factor),
        active=jnp.asarray(active),
        features_dc=jnp.asarray(features_dc),
        features_rest=jnp.asarray(features_rest),
        scaling=jnp.asarray(scaling),
        rotation=jnp.asarray(rotation),
        feature_indices=None,
        gaussian_indices=None,
        quant=QuantState.create(),
        max_sh_degree=max_sh_degree,
        active_sh_degree=0,
        quantization=quantization,
        use_factor_scaling=use_factor_scaling,
    )
