"""Compression stack tests: weighted k-means quality, join semantics,
importance pipeline, end-to-end compress with PSNR retention."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from c3dgs_tpu.compress import importance as imp_mod
from c3dgs_tpu.compress import pipeline, vq
from c3dgs_tpu.models import gaussians as gmod
from c3dgs_tpu.ops import losses as L
from c3dgs_tpu.render.types import RasterSettings
from c3dgs_tpu.train import trainer

SET = RasterSettings(
    width=32, height=32, tanfovx=math.tan(0.5), tanfovy=math.tan(0.5), sh_degree=0
)
EV = jnp.asarray([0, 0, 0, 1, 0, 0, 0], jnp.float32)
BG = jnp.zeros(3)


def test_nearest_codebook_exact(rng):
    x = rng.normal(size=(100, 8)).astype(np.float32)
    cb = rng.normal(size=(16, 8)).astype(np.float32)
    d, idx = vq.nearest_codebook(jnp.asarray(x), jnp.asarray(cb))
    dist = ((x[:, None] - cb[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(idx), dist.argmin(1))
    np.testing.assert_allclose(np.asarray(d), dist.min(1), rtol=1e-4, atol=1e-4)


def test_kmeans_converges_on_clusters(rng):
    # 4 well-separated clusters -> codebook should recover them
    centers = np.array([[0, 0], [10, 0], [0, 10], [10, 10]], np.float32)
    pts = np.concatenate(
        [c + rng.normal(size=(200, 2)).astype(np.float32) * 0.1 for c in centers]
    )
    imp = np.ones(len(pts), np.float32)
    # 8 entries for 4 clusters: EMA k-means with random init (same as the
    # reference) can merge entries at exact parity, so give it slack
    cb, idx = vq.vq_features(
        jnp.asarray(pts), jnp.asarray(imp), codebook_size=8, vq_chunk=256, steps=200
    )
    cb = np.asarray(cb)
    # each center has a codebook entry within 0.2
    for c in centers:
        assert np.min(np.linalg.norm(cb - c, axis=1)) < 0.2
    # quantization error small
    err = np.linalg.norm(pts - cb[np.asarray(idx)], axis=1).mean()
    assert err < 0.25


def test_importance_weighting_biases_codebook(rng):
    # two clusters; one has 100x importance -> wins the finer representation
    pts = np.concatenate(
        [
            rng.normal(size=(500, 2)).astype(np.float32) * 1.0,
            rng.normal(size=(500, 2)).astype(np.float32) * 1.0 + 20.0,
        ]
    )
    imp = np.concatenate([np.full(500, 100.0), np.full(500, 1.0)]).astype(np.float32)
    cb, _ = vq.vq_features(
        jnp.asarray(pts), jnp.asarray(imp), codebook_size=8, vq_chunk=512, steps=300
    )
    cb = np.asarray(cb)
    near_hi = (np.linalg.norm(cb - 0.0, axis=1) < 10).sum()
    assert near_hi >= 5  # most entries serve the high-importance cluster


def test_join_features():
    feats = jnp.arange(20, dtype=jnp.float32).reshape(10, 2)
    keep = jnp.asarray([True, False] * 5)
    cb = jnp.asarray([[100.0, 100.0], [200.0, 200.0]])
    cb_idx = jnp.asarray([0, 1, 0, 1, 0])  # for the 5 non-keep rows
    table, idx = vq.join_features(feats, keep, cb, cb_idx)
    assert table.shape == (7, 2)
    out = np.asarray(table)[np.asarray(idx)]
    # kept rows roundtrip exactly
    np.testing.assert_allclose(out[::2], np.asarray(feats)[::2])
    # vq rows point at codebook entries
    np.testing.assert_allclose(out[1::2][:, 0], [100, 200, 100, 200, 100])


def toy_scene(n=120, cap=120, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 0.5
    pts[:, 2] += 3.0
    cols = rng.random(size=(n, 3)).astype(np.float32)
    scene = gmod.from_point_cloud(pts, cols, capacity=cap, quantization=True)
    return scene.update_observers()


class FakeCam:
    def __init__(self, ev, intrinsic, img):
        self.extrinsic_vector = ev
        self.intrinsic = intrinsic
        self.original_image = img


def make_cam(scene):
    intr = np.zeros((3, 3), np.float32)
    intr[0, 0] = 1.0
    intr[1, 1] = 1.0
    intr[0, 2] = 32
    intr[1, 2] = 32
    gt = np.asarray(
        trainer.render_scene(scene, EV, SET, BG)["render"]
    )
    return FakeCam(np.asarray(EV), intr, gt)


def test_calc_importance_shapes():
    scene = toy_scene()
    cam = make_cam(scene)
    color_imp, cov_imp = imp_mod.calc_importance(scene, [cam], use_gt=True)
    assert color_imp.shape == (120, 16 * 3)
    assert cov_imp.shape == (120, 6)
    assert np.isfinite(np.asarray(color_imp)).all()
    assert float(jnp.abs(color_imp).max()) > 0


def test_compress_end_to_end_preserves_quality():
    scene = toy_scene(n=150, cap=150)
    cam = make_cam(scene)
    gt = jnp.asarray(cam.original_image)

    from c3dgs_tpu.config import CompressionParams
    import dataclasses

    comp = dataclasses.replace(
        CompressionParams(),
        color_codebook_size=64,
        gaussian_codebook_size=64,
        color_cluster_iterations=60,
        gaussian_cluster_iterations=120,
        color_batch_size=256,
        gaussian_batch_size=256,
        prune_threshold=-1.0,  # no pruning on the toy scene
    )
    compressed = pipeline.to_compressed(scene, [cam], comp, silent=True)
    compressed.check_state()
    assert compressed.is_color_indexed and compressed.is_gaussian_indexed
    img = trainer.render_scene(compressed, EV, SET, BG)["render"]
    psnr = float(L.psnr(img, gt)[0, 0])
    # toy scene with 64-entry codebooks: lossy but recognizable
    assert psnr > 25.0, psnr


def test_compressed_scene_is_differentiable():
    scene = toy_scene(n=80, cap=80).to_indexed()

    def loss(fdc):
        s = scene.replace(features_dc=fdc)
        return trainer.render_scene(s, EV, SET, BG)["render"].sum()

    g = jax.grad(loss)(scene.features_dc)
    assert np.abs(np.asarray(g)).max() > 0


def test_finetune_does_not_delete_callers_scene():
    """Regression: the jitted finetune step donates its state buffers; a
    compressed scene aliases leaves of the caller's uncompressed scene, so
    without a defensive copy finetune DELETED the caller's arrays (the
    trained-scene baseline eval in compress.py crashed with 'Array has
    been deleted' after a 30-minute pipeline)."""
    from c3dgs_tpu.config import OptimizationParams
    from c3dgs_tpu.train.finetune import finetune

    scene = toy_scene(n=80, cap=80)
    cam = make_cam(scene)
    compressed = scene.to_indexed()  # aliases every leaf of `scene`
    out = finetune(
        compressed, [cam], OptimizationParams(), iterations=2, log_every=0
    )
    assert out is not None
    # every leaf of the ORIGINAL scene must still be alive and readable
    for leaf in jax.tree_util.tree_leaves(scene):
        np.asarray(leaf)
