"""Compression pipeline: prune -> VQ colors -> VQ covariance -> indexed scene.

Parity: compression/vq.py compress_color (:117), compress_covariance (:149),
compress_gaussians (:194) and GaussianModel.to_compressed
(gaussian_model.py:954-991): importance-quantile keep thresholds (0.9 color
/ 0.75 covariance), high-importance rows stored dense after the codebook,
trace-normalized covariance VQ followed by eigh extraction back to
quaternion+scale.

Host-orchestrated (shapes change); each stage's compute is jitted JAX.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.gaussians import GaussianScene
from ..ops import quat
from .vq import CompressionSettings, join_features, vq_features


def compress_color(
    scene: GaussianScene,
    color_importance: jnp.ndarray,
    color_comp: CompressionSettings,
    color_compress_non_dir: bool,
    silent: bool = False,
) -> GaussianScene:
    """compression/vq.py:117-147."""
    keep_mask = np.asarray(color_importance) > color_comp.importance_include
    if not silent:
        print(f"color keep: {keep_mask.mean() * 100:.2f}%")
    vq_mask = ~keep_mask

    features = scene.get_features()  # (P, K, 3) quantized view
    n, k, _ = features.shape
    if color_compress_non_dir:
        # default path (arguments/__init__.py:97): the full (K*3)-dim SH
        # vector including DC is clustered
        color_features = features.reshape(n, -1)
    else:
        # DC excluded from the clustering distance. NOTE: the reference's
        # False branch reshapes the rest-only table to (n, K-1, 3) and
        # set_color_indexed then treats band 1 as DC — dropping the real DC
        # and shifting every SH band (compression/vq.py:134-147). Here the
        # codebook rows get an importance-weighted mean DC instead, so the
        # table keeps the full K bands.
        color_features = features[:, 1:].reshape(n, -1)

    if vq_mask.any():
        if not silent:
            print("compressing color...")
        codebook, vq_indices = vq_features(
            color_features[jnp.asarray(vq_mask)],
            jnp.asarray(np.asarray(color_importance)[vq_mask]),
            color_comp.codebook_size,
            color_comp.batch_size,
            color_comp.steps,
            decay=color_comp.decay,
        )
    else:
        codebook = jnp.zeros((0, color_features.shape[-1]))
        vq_indices = jnp.zeros((0,), jnp.int32)

    if not color_compress_non_dir and int(codebook.shape[0]) > 0:
        import jax

        imp = jnp.asarray(np.asarray(color_importance)[vq_mask])[:, None]
        dc_vq = features[jnp.asarray(vq_mask), 0].reshape(-1, 3)
        sums = jax.ops.segment_sum(
            dc_vq * imp, vq_indices, num_segments=codebook.shape[0]
        )
        wsum = jax.ops.segment_sum(
            imp[:, 0], vq_indices, num_segments=codebook.shape[0]
        )
        dc_codebook = sums / jnp.maximum(wsum[:, None], 1e-12)
        codebook = jnp.concatenate([dc_codebook, codebook], axis=1)
        color_features = features.reshape(n, -1)

    compressed, indices = join_features(
        color_features, keep_mask, codebook, vq_indices
    )
    compressed = compressed.reshape(-1, k, 3)
    return scene.set_color_indexed(compressed, indices)


def compress_covariance(
    scene: GaussianScene,
    gaussian_importance: jnp.ndarray,
    gaussian_comp: CompressionSettings,
    silent: bool = False,
) -> GaussianScene:
    """compression/vq.py:149-191."""
    keep_mask = np.asarray(gaussian_importance) > gaussian_comp.importance_include
    if not silent:
        print(f"gaussians keep: {keep_mask.mean() * 100:.2f}%")
    vq_mask = ~keep_mask
    covariance = scene.get_normalized_covariance()  # (P, 6)

    if vq_mask.any():
        if not silent:
            print("compressing gaussian splats...")
        codebook, vq_indices = vq_features(
            covariance[jnp.asarray(vq_mask)],
            jnp.asarray(np.asarray(gaussian_importance)[vq_mask]),
            gaussian_comp.codebook_size,
            gaussian_comp.batch_size,
            gaussian_comp.steps,
            decay=gaussian_comp.decay,
            scale_normalize=True,
        )
    else:
        codebook = jnp.zeros((0, 6))
        vq_indices = jnp.zeros((0,), jnp.int32)

    compressed_cov, cov_indices = join_features(
        covariance, keep_mask, codebook, vq_indices
    )
    rot_vq, scale_vq = quat.extract_rot_scale(quat.to_full_cov(compressed_cov))
    # stored scaling uses the identity inverse activation (direction);
    # normalization happens in the accessor
    return scene.set_gaussian_indexed(rot_vq, scale_vq, cov_indices)


def compress_gaussians(
    scene: GaussianScene,
    color_importance: jnp.ndarray,  # (P,) max over coeffs
    gaussian_importance: jnp.ndarray,  # (P,) max over cov dims
    color_comp: Optional[CompressionSettings],
    gaussian_comp: Optional[CompressionSettings],
    color_compress_non_dir: bool = False,
    prune_threshold: float = 0.0,
    silent: bool = False,
) -> GaussianScene:
    """compression/vq.py:194-223. Importance prune (>= threshold kept),
    quantile-autoset keep thresholds, then the two VQ stages."""
    color_importance = np.asarray(color_importance)
    gaussian_importance = np.asarray(gaussian_importance)

    if prune_threshold >= 0:
        non_prune = color_importance > prune_threshold
        # never prune padded rows' stats into the quantiles
        active = np.asarray(scene.active)
        if not silent:
            frac = 1 - non_prune[active].mean()
            print(f"prune: {frac * 100:.2f}%")
        scene = scene.mask_splats(jnp.asarray(non_prune)).compact()
        keep = non_prune & active
        color_importance = color_importance[keep]
        gaussian_importance = gaussian_importance[keep]
    else:
        scene = scene.compact()
        active = np.ones(scene.capacity, bool)

    if color_comp is not None and color_comp.importance_include is None:
        color_comp.importance_include = float(
            np.quantile(color_importance, color_comp.importance_include_relative)
        )
        if not silent:
            print(f"Setting color threshold to {color_comp.importance_include}")
    if gaussian_comp is not None and gaussian_comp.importance_include is None:
        gaussian_comp.importance_include = float(
            np.quantile(gaussian_importance, gaussian_comp.importance_include_relative)
        )
        if not silent:
            print(
                f"Setting gaussian threshold to {gaussian_comp.importance_include}"
            )

    if color_comp is not None:
        scene = compress_color(
            scene, color_importance, color_comp, color_compress_non_dir, silent
        )
    if gaussian_comp is not None:
        scene = compress_covariance(scene, gaussian_importance, gaussian_comp, silent)
    return scene


def to_compressed(
    scene, cameras, comp_params, silent: bool = False, timings: dict = None
):
    """GaussianModel.to_compressed (gaussian_model.py:954-991): importance ->
    settings -> compress. comp_params: config.CompressionParams.

    `timings`, if given, receives the reference's times.json stage split:
    sensitivity_calculation vs clustering (compress.py:218-292)."""
    import time

    from .importance import calc_importance

    t0 = time.time()
    scene = scene.to_unindexed().compact()
    color_imp, gaussian_sens = calc_importance(scene, cameras, use_gt=True)
    jax.block_until_ready(gaussian_sens)
    if timings is not None:
        timings["sensitivity_calculation"] = time.time() - t0
    color_importance_n = np.asarray(color_imp).max(-1)
    gaussian_importance_n = np.asarray(gaussian_sens).max(-1)

    color_settings = CompressionSettings(
        codebook_size=comp_params.color_codebook_size,
        importance_include=None,
        importance_include_relative=comp_params.color_keep_quantile,
        steps=int(comp_params.color_cluster_iterations),
        decay=comp_params.color_decay,
        batch_size=comp_params.color_batch_size,
    )
    gaussian_settings = CompressionSettings(
        codebook_size=comp_params.gaussian_codebook_size,
        importance_include=None,
        importance_include_relative=comp_params.gaussian_keep_quantile,
        steps=int(comp_params.gaussian_cluster_iterations),
        decay=comp_params.gaussian_decay,
        batch_size=comp_params.gaussian_batch_size,
    )
    return compress_gaussians(
        scene,
        jnp.asarray(color_importance_n),
        jnp.asarray(gaussian_importance_n),
        None if comp_params.not_compress_color else color_settings,
        None if comp_params.not_compress_gaussians else gaussian_settings,
        comp_params.color_compress_non_dir,
        prune_threshold=comp_params.prune_threshold,
        silent=silent,
    )
