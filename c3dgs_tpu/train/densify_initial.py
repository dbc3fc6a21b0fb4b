"""Initial cloud thickening: interpolate new splats along rays to each
point's k nearest neighbors.

Parity: GaussianModel.densify_initial (gaussian_model.py:1352-1389), the
fork's sparse-cloud bootstrap used by the camera trainers
(train_camera.py:26): for every point, find its 3 nearest neighbors; for
neighbor rays longer than the average inter-point step, insert clones at
integer multiples of that step along the ray.

TPU re-design: neighbor search uses the chunked exact-kNN matmul
(ops/misc.py) instead of sklearn ball trees; clone placement is the masked
free-slot write of train/densify.py instead of tensor concatenation.
Host-orchestrated (the number of insertions is data-dependent).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..models.gaussians import GaussianScene
from . import densify as D


def _knn_indices(xyz: np.ndarray, k: int, chunk: int = 4096) -> np.ndarray:
    """Exact k-NN indices (excluding self) via chunked pairwise distances."""
    n = xyz.shape[0]
    x = jnp.asarray(xyz)
    sq = jnp.sum(x * x, axis=1)
    out = np.empty((n, k), np.int64)
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        rows = x[s:e]
        d = (
            sq[s:e, None]
            + sq[None, :]
            - 2.0 * jnp.dot(rows, x.T, preferred_element_type=jnp.float32)
        )
        col = jnp.arange(n)[None, :]
        row = jnp.arange(s, e)[:, None]
        d = jnp.where(col == row, jnp.inf, d)
        _, idx = jax.lax.top_k(-d, k)
        out[s:e] = np.asarray(idx)
    return out


def densify_initial(
    scene: GaussianScene, dist_thr_coeff: float = 1.0, k: int = 3
) -> GaussianScene:
    """Insert interpolated clones along rays to the k nearest neighbors.

    Follows the reference's slotting rule (gaussian_model.py:1374-1387):
    for each neighbor at relative distance d (in average-step units), for
    every integer step `dist` with d >= dist+1, clone the point at fraction
    dist/d along the ray. Capacity is grown host-side as needed.
    """
    assert not scene.is_color_indexed and not scene.is_gaussian_indexed
    active = np.asarray(scene.active)
    xyz = np.asarray(scene.xyz)[active]
    n = xyz.shape[0]
    if n < k + 1:
        return scene
    volume = float(np.prod(xyz.max(0) - xyz.min(0))) / n
    average_step = dist_thr_coeff * volume ** (1.0 / 3)
    if average_step <= 0:
        return scene

    nbrs = _knn_indices(xyz, k)
    active_idx = np.nonzero(active)[0]

    src_list, new_xyz_list = [], []
    for nb in range(k):
        delta = xyz[nbrs[:, nb]] - xyz
        rel = np.sqrt((delta**2).sum(1)) / average_step
        max_rel = rel.max()
        for dist in range(1, int(max_rel)):
            slot = rel >= dist + 1
            if slot.sum() > 1:
                alpha = (dist / rel[slot])[:, None]
                src = active_idx[slot]
                tgt = active_idx[nbrs[slot, nb]]
                coords = np.asarray(scene.xyz)[src] * (1 - alpha) + np.asarray(
                    scene.xyz
                )[tgt] * alpha
                src_list.append(src)
                new_xyz_list.append(coords)

    if not src_list:
        print("Densification completed (nothing to add)")
        return scene

    src = np.concatenate(src_list)
    new_xyz = np.concatenate(new_xyz_list).astype(np.float32)
    n_new = len(src)

    free = int((~active).sum())
    if free < n_new:
        scene = scene.pad_to_capacity(
            1 << int(np.ceil(np.log2(scene.capacity + n_new - free)))
        )

    # masked clone write (host-driven indices; one device scatter)
    free_slots = np.nonzero(~np.asarray(scene.active))[0][:n_new]
    dst = jnp.asarray(free_slots)
    src_j = jnp.asarray(src)

    def put(arr, values=None):
        vals = values if values is not None else arr[src_j]
        return arr.at[dst].set(vals)

    scene = scene.replace(
        xyz=put(scene.xyz, jnp.asarray(new_xyz)),
        opacity=put(scene.opacity),
        features_dc=put(scene.features_dc),
        features_rest=put(scene.features_rest),
        scaling=put(scene.scaling),
        rotation=put(scene.rotation),
        scaling_factor=(
            put(scene.scaling_factor) if scene.scaling_factor is not None else None
        ),
        active=scene.active.at[dst].set(True),
    )
    print(f"Densification completed (+{n_new} splats)")
    return scene
