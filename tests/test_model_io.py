"""GaussianScene model + PLY/NPZ container tests (ports the reference's
check_equal_fields round-trip validation, compress.py:166-200)."""
import numpy as np
import jax.numpy as jnp
import pytest

from c3dgs_tpu.models import gaussians as gmod
from c3dgs_tpu.models import io_npz, io_ply


def make_scene(n=100, cap=128, quantization=True, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    cols = rng.random(size=(n, 3)).astype(np.float32)
    scene = gmod.from_point_cloud(
        pts, cols, capacity=cap, quantization=quantization
    )
    # randomize attributes a bit
    scene = scene.replace(
        features_rest=jnp.asarray(
            rng.normal(size=(cap, 15, 3)).astype(np.float32) * 0.1
        ),
        rotation=jnp.asarray(rng.normal(size=(cap, 4)).astype(np.float32)),
        opacity=jnp.asarray(rng.normal(size=(cap, 1)).astype(np.float32)),
    )
    return scene.update_observers()


def assert_scenes_equal(a, b, atol=1e-5):
    """check_equal_fields analog (compress.py:166-200)."""
    a, b = a.compact(), b.compact()
    np.testing.assert_allclose(np.asarray(a.xyz), np.asarray(b.xyz), atol=atol)
    np.testing.assert_allclose(
        np.asarray(a.get_opacity()), np.asarray(b.get_opacity()), atol=atol
    )
    np.testing.assert_allclose(
        np.asarray(a.get_features()), np.asarray(b.get_features()), atol=atol
    )
    np.testing.assert_allclose(
        np.asarray(a.get_scaling()), np.asarray(b.get_scaling()), atol=atol
    )
    ra, rb = np.asarray(a.get_rotation()), np.asarray(b.get_rotation())
    # quaternion sign is gauge
    flip = np.sign((ra * rb).sum(-1, keepdims=True))
    np.testing.assert_allclose(ra, rb * flip, atol=atol)


def test_accessor_shapes_and_masking():
    scene = make_scene(100, 128)
    assert scene.capacity == 128
    assert int(scene.num_active) == 100
    op = np.asarray(scene.get_opacity())
    assert op.shape == (128, 1)
    assert (op[100:] == 0).all()  # inactive rows invisible
    assert np.asarray(scene.get_features()).shape == (128, 16, 3)
    cov = np.asarray(scene.get_covariance())
    assert cov.shape == (128, 6)
    # normalized scaling is unit norm
    sn = np.asarray(scene.get_scaling_normalized())
    np.testing.assert_allclose(
        np.linalg.norm(sn[:100], axis=1), 1.0, atol=1e-2
    )  # int8 quantized


def test_indexed_roundtrip():
    scene = make_scene(64, 64)
    idx = scene.to_indexed()
    assert idx.is_color_indexed and idx.is_gaussian_indexed
    back = idx.to_unindexed()
    assert_scenes_equal(scene, back)
    np.testing.assert_allclose(
        np.asarray(idx.get_features()), np.asarray(scene.get_features()), atol=1e-6
    )
    # the two index leaves must be distinct buffers: aliased leaves break
    # buffer donation in jitted train/finetune steps on TPU
    assert idx.feature_indices is not idx.gaussian_indices
    assert (
        idx.feature_indices.unsafe_buffer_pointer()
        != idx.gaussian_indices.unsafe_buffer_pointer()
    )


def test_mask_splats_and_compact():
    scene = make_scene(100, 128)
    keep = jnp.asarray(np.arange(128) % 2 == 0)
    masked = scene.mask_splats(keep)
    assert int(masked.num_active) == 50
    compacted = masked.compact()
    assert compacted.capacity == 50
    assert bool(compacted.active.all())


def test_pad_to_capacity():
    scene = make_scene(50, 64)
    big = scene.pad_to_capacity(256)
    assert big.capacity == 256
    assert int(big.num_active) == 50
    np.testing.assert_allclose(
        np.asarray(big.get_opacity()[64:]), 0.0
    )


def test_ply_roundtrip(tmp_path):
    scene = make_scene(80, 80, quantization=False)
    scene = scene.replace(active_sh_degree=3)
    p = str(tmp_path / "model.ply")
    io_ply.save_gaussians_ply(scene, p)
    loaded = io_ply.load_gaussians_ply(p, quantization=False)
    assert loaded.capacity == 80
    assert loaded.active_sh_degree == 3
    assert_scenes_equal(scene, loaded, atol=1e-4)


def test_ply_rgb_pointcloud_init(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    cols = (rng.random(size=(50, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "cloud.ply")
    io_ply.write_vertices(
        p,
        {
            "x": pts[:, 0],
            "y": pts[:, 1],
            "z": pts[:, 2],
            "red": cols[:, 0],
            "green": cols[:, 1],
            "blue": cols[:, 2],
        },
    )
    scene = io_ply.load_gaussians_ply(p)
    assert scene.capacity == 50
    assert scene.active_sh_degree == 0
    # scale initialized from knn distances: positive factors
    assert np.isfinite(np.asarray(scene.get_scaling())).all()


@pytest.mark.parametrize("quantization", [True, False])
def test_npz_roundtrip(tmp_path, quantization):
    scene = make_scene(80, 100, quantization=quantization)
    p = str(tmp_path / "model.npz")
    saved = io_npz.save_npz(scene, p)
    loaded = io_npz.load_npz(p, override_quantization=True)
    assert loaded.capacity == 80
    tol = 0.05 if quantization else 1e-4  # int8 quantization error
    assert_scenes_equal(saved, loaded, atol=tol)
    if quantization:
        import numpy as _np

        d = _np.load(p)
        assert d["features_dc"].dtype == _np.int8
        assert d["xyz"].dtype == _np.float16


def test_npz_indexed_roundtrip(tmp_path):
    scene = make_scene(60, 60).to_indexed()
    p = str(tmp_path / "idx.npz")
    saved = io_npz.save_npz(scene, p, sort_morton=True)
    loaded = io_npz.load_npz(p, override_quantization=True)
    assert loaded.is_color_indexed and loaded.is_gaussian_indexed
    assert_scenes_equal(saved, loaded, atol=0.05)


def test_morton_sorted_scene():
    scene = make_scene(100, 128)
    s2 = scene.morton_sorted()
    assert int(s2.num_active) == 100
    # same point set
    a = np.sort(np.asarray(scene.xyz)[np.asarray(scene.active)], axis=0)
    b = np.sort(np.asarray(s2.xyz)[np.asarray(s2.active)], axis=0)
    np.testing.assert_allclose(a, b, atol=0)


def test_fresh_observers_are_identity(tmp_path):
    """A freshly loaded .ply model (observers reset, matching the
    reference) must fake-quant as identity until the first observer
    update — regression: degenerate min=max=0 ranges collapsed every
    attribute to ~1e-10 and made loaded models render black."""
    scene = make_scene(quantization=True)
    path = str(tmp_path / "pc.ply")
    io_ply.save_gaussians_ply(scene, path)
    loaded = io_ply.load_gaussians_ply(path, quantization=True)
    op = np.asarray(loaded.get_opacity())[np.asarray(loaded.active)]
    ref = np.asarray(
        jnp.asarray(1.0) / (1.0 + jnp.exp(-loaded.opacity))
    )[np.asarray(loaded.active)]
    np.testing.assert_allclose(op, ref, atol=1e-6)
    assert op.max() > 0.01
    # after one observer pass the fake-quant engages (int8 grid error)
    observed = loaded.update_observers()
    op_q = np.asarray(observed.get_opacity())[np.asarray(observed.active)]
    assert np.abs(op_q - ref).max() < (ref.max() - min(ref.min(), 0)) / 128
