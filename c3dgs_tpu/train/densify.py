"""Adaptive density control under fixed capacity.

The reference grows/shrinks tensors and performs Adam-state surgery
(gaussian_model.py:1161-1350). Under XLA all shapes are static, so this is
re-designed as masked writes into a capacity-padded buffer:

- `prune` deactivates rows (mask, no reallocation);
- `clone` / `split` copy selected rows into free (inactive) slots found with
  fixed-size `nonzero`; requests beyond free capacity are dropped and
  counted (the caller grows capacity host-side via pad_to_capacity);
- Adam moments of written slots are zeroed — exactly what
  cat_tensors_to_optimizer does for appended rows (gaussian_model.py:1169).

Selection criteria match densify_and_clone (:1279), densify_and_split
(:1213), densify_and_prune (:1336) and reset_opacity (:1391).

Divergence (documented): in factor-scaling mode the reference's split
stores `stds/(0.8N)` as the scale *direction*, which the normalize
activation cancels — children keep the parent's size
(gaussian_model.py:1247 + the identity scaling_inverse_activation :67).
Here split shrinks the scaling_factor by log(0.8*N), the upstream-3DGS
behavior the code clearly intends.

Densification currently operates on dense (un-indexed) scenes — the
training path. Indexed-mode densification (in-training compression,
train.py:50-56, disabled by default there) composes via
to_unindexed -> densify -> re-compress.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..models.gaussians import GaussianScene
from ..ops import misc, quat


class DensifyStats(NamedTuple):
    """Running screen-space gradient statistics
    (gaussian_model.py:95-97,1399-1402)."""

    xyz_gradient_accum: jax.Array  # (P,)
    denom: jax.Array  # (P,)
    max_radii2d: jax.Array  # (P,)

    @classmethod
    def zeros(cls, capacity: int) -> "DensifyStats":
        # three distinct buffers: aliased leaves break jit donation
        return cls(
            jnp.zeros(capacity, jnp.float32),
            jnp.zeros(capacity, jnp.float32),
            jnp.zeros(capacity, jnp.float32),
        )


def add_densification_stats(
    stats: DensifyStats,
    viewspace_grad: jax.Array,  # (P,2) grad of the NDC-scaled offset
    radii: jax.Array,  # (P,) int32
) -> DensifyStats:
    """gaussian_model.py:1399 + the train-loop radii max (train.py:101-106)."""
    update = radii > 0
    gnorm = jnp.linalg.norm(viewspace_grad, axis=-1)
    return DensifyStats(
        xyz_gradient_accum=stats.xyz_gradient_accum + jnp.where(update, gnorm, 0.0),
        denom=stats.denom + update.astype(jnp.float32),
        max_radii2d=jnp.maximum(
            stats.max_radii2d, jnp.where(update, radii.astype(jnp.float32), 0.0)
        ),
    )


def _free_slots(active: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Indices of inactive rows (fixed size; fill=capacity => invalid)."""
    cap = active.shape[0]
    free = jnp.nonzero(~active, size=cap, fill_value=cap)[0].astype(jnp.int32)
    return free, (~active).sum()


def _scatter_rows(scene: GaussianScene, src_idx, dst_idx, write_mask, overrides=None):
    """Copy per-splat rows src->dst where write_mask (dst==cap drops)."""
    overrides = overrides or {}
    dst = jnp.where(write_mask, dst_idx, scene.capacity)

    def copy(field_name, arr):
        src_rows = overrides.get(field_name, arr[src_idx])
        return arr.at[dst].set(src_rows, mode="drop")

    new = {
        "xyz": copy("xyz", scene.xyz),
        "opacity": copy("opacity", scene.opacity),
        "features_dc": copy("features_dc", scene.features_dc),
        "features_rest": copy("features_rest", scene.features_rest),
        "scaling": copy("scaling", scene.scaling),
        "rotation": copy("rotation", scene.rotation),
        "active": scene.active.at[dst].set(True, mode="drop"),
    }
    if scene.scaling_factor is not None:
        new["scaling_factor"] = copy("scaling_factor", scene.scaling_factor)
    return scene.replace(**new), dst


def densify_and_clone(
    scene: GaussianScene,
    grads: jax.Array,  # (P,) mean screen-space grad
    grad_threshold: float,
    scene_extent: float,
    percent_dense: float,
):
    """gaussian_model.py:1279-1334 under fixed capacity. Returns
    (scene, written_mask (P,), dropped count)."""
    assert not scene.is_color_indexed and not scene.is_gaussian_indexed
    scaling_max = scene.get_scaling().max(axis=1)
    selected = (
        (grads >= grad_threshold)
        & (scaling_max <= percent_dense * scene_extent)
        & scene.active
    )
    cap = scene.capacity
    sel_idx = jnp.nonzero(selected, size=cap, fill_value=cap)[0].astype(jnp.int32)
    n_sel = selected.sum()
    free, n_free = _free_slots(scene.active)
    rank = jnp.arange(cap, dtype=jnp.int32)
    write = (rank < n_sel) & (rank < n_free)
    dropped = jnp.maximum(n_sel - n_free, 0)
    sel_safe = jnp.minimum(sel_idx, cap - 1)
    scene, dst = _scatter_rows(scene, sel_safe, free, write)
    written = jnp.zeros(cap, bool).at[dst].set(True, mode="drop")
    return scene, written, dropped


def densify_and_split(
    scene: GaussianScene,
    grads: jax.Array,
    grad_threshold: float,
    scene_extent: float,
    percent_dense: float,
    key: jax.Array,
    n_children: int = 2,
):
    """gaussian_model.py:1213-1277: sample N=2 children from each selected
    gaussian, shrink, deactivate the parent."""
    assert not scene.is_color_indexed and not scene.is_gaussian_indexed
    cap = scene.capacity
    scaling = scene.get_scaling()
    rotation = scene.get_rotation()
    selected = (
        (grads >= grad_threshold)
        & (scaling.max(axis=1) > percent_dense * scene_extent)
        & scene.active
    )
    sel_idx = jnp.nonzero(selected, size=cap, fill_value=cap)[0].astype(jnp.int32)
    sel_safe = jnp.minimum(sel_idx, cap - 1)
    n_sel = selected.sum()
    free, n_free = _free_slots(scene.active)

    written_all = jnp.zeros(cap, bool)
    dropped = jnp.maximum(n_sel * n_children - n_free, 0)
    shrink = math.log(0.8 * n_children)

    for child in range(n_children):
        key, sub = jax.random.split(key)
        stds = scaling[sel_safe]  # (cap, 3)
        samples = jax.random.normal(sub, (cap, 3)) * stds
        rots = quat.quat_to_rotmat(quat.normalize(rotation[sel_safe]))
        new_xyz = (
            jnp.einsum("nij,nj->ni", rots, samples) + scene.xyz[sel_safe]
        )
        overrides = {"xyz": new_xyz}
        if scene.scaling_factor is not None:
            overrides["scaling_factor"] = scene.scaling_factor[sel_safe] - shrink
        else:
            overrides["scaling"] = scene.scaling[sel_safe] - shrink

        rank = jnp.arange(cap, dtype=jnp.int32)
        dst_slots = jnp.where(
            (rank < n_sel) & (child * 1 + rank * n_children < n_free),
            free[jnp.minimum(rank * n_children + child, cap - 1)],
            cap,
        )
        write = dst_slots < cap
        scene, dst = _scatter_rows(
            scene, sel_safe, dst_slots, write, overrides=overrides
        )
        written_all = written_all.at[dst].set(True, mode="drop")

    # prune the split parents (gaussian_model.py:1276-1277)
    scene = scene.replace(active=scene.active & ~selected)
    return scene, written_all, dropped, key


def prune(
    scene: GaussianScene,
    stats: DensifyStats,
    min_opacity: float,
    extent: float,
    max_screen_size: float | None,
):
    """Opacity/size pruning (gaussian_model.py:1344-1349)."""
    prune_mask = scene.get_opacity()[:, 0] < min_opacity
    if max_screen_size:
        big_vs = stats.max_radii2d > max_screen_size
        big_ws = scene.get_scaling().max(axis=1) > 0.1 * extent
        prune_mask = prune_mask | big_vs | big_ws
    return scene.replace(active=scene.active & ~prune_mask)


def densify_and_prune(
    scene: GaussianScene,
    stats: DensifyStats,
    key: jax.Array,
    max_grad: float,
    min_opacity: float,
    extent: float,
    max_screen_size: float | None,
    percent_dense: float,
):
    """Full ADC step (gaussian_model.py:1336-1350). Returns
    (scene, written_mask for Adam-moment reset, stats reset, dropped, key).
    """
    grads = stats.xyz_gradient_accum / jnp.maximum(stats.denom, 1.0)
    grads = jnp.nan_to_num(grads)
    scene, w1, d1 = densify_and_clone(
        scene, grads, max_grad, extent, percent_dense
    )
    scene, w2, d2, key = densify_and_split(
        scene, grads, max_grad, extent, percent_dense, key
    )
    scene = prune(scene, stats, min_opacity, extent, max_screen_size)
    return scene, w1 | w2, DensifyStats.zeros(scene.capacity), d1 + d2, key


def reset_opacity(scene: GaussianScene) -> GaussianScene:
    """Clamp opacity to <= 0.01 (gaussian_model.py:1391-1396); the caller
    zeroes the opacity Adam moments like replace_tensor_to_optimizer."""
    new_op = misc.inverse_sigmoid(
        jnp.minimum(scene.get_opacity(), 0.01).clip(1e-7, 1 - 1e-7)
    )
    return scene.replace(opacity=new_op)
