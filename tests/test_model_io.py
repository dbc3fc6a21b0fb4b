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


def test_npz_xyz_u16_roundtrip(tmp_path):
    """Fixed-point uint16 xyz container extension: the stored values are
    the fp16-fake-quant accessor outputs, and the u16 step (extent/65535)
    is far below the fp16 half-ulp except near zero — so the accessor
    round-trips to within one u16 step; load dispatches on dtype."""
    scene = make_scene(80, 100, quantization=True)
    p = str(tmp_path / "u16.npz")
    saved = io_npz.save_npz(scene, p, xyz_u16=True)
    d = np.load(p)
    assert d["xyz"].dtype == np.uint16
    assert d["xyz_min"].shape == (3,) and d["xyz_step"].shape == (3,)
    loaded = io_npz.load_npz(p, override_quantization=True)
    sx = np.asarray(saved.get_xyz())
    lx = np.asarray(loaded.get_xyz())
    step = np.asarray(d["xyz_step"])
    assert np.abs(sx - lx).max() <= step.max() + 1e-7


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


def test_npz_reference_semantics_golden(tmp_path):
    """Interop golden: a hand-constructed npz with the reference's EXACT
    torch conventions (scene/gaussian_model.py:505-623 — int8 `int_repr`
    with per-tensor affine (scale, zero_point), fp16 xyz, opacity stored
    POST-sigmoid, scaling post relu+L2-normalize, rotation post normalize,
    scaling_factor raw log-domain, (1,)-shaped scale / int zero_point
    arrays, int32 codebook indices) must load into the documented attribute
    semantics, and save_npz must round-trip it."""
    rng = np.random.default_rng(11)
    n, n_codes = 60, 16

    def torch_quantize(x, scale, zp):
        # torch.quantize_per_tensor(...).int_repr(): nearbyint (half-even,
        # np.round matches) then clamp to qint8
        q = np.clip(np.round(x / scale + zp), -128, 127)
        return q.astype(np.int8)

    # raw attributes in the reference's STORED domains
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    f_dc = (rng.normal(size=(n_codes, 1, 3)) * 0.5).astype(np.float32)
    f_rest = (rng.normal(size=(n_codes, 15, 3)) * 0.1).astype(np.float32)
    opacity_act = rng.uniform(0.02, 0.98, size=(n, 1)).astype(np.float32)
    scaling_dir = np.abs(rng.normal(size=(n_codes, 3))).astype(np.float32)
    scaling_dir /= np.linalg.norm(scaling_dir, axis=1, keepdims=True)
    sfac = rng.normal(size=(n, 1)).astype(np.float32) - 3.0
    rot = rng.normal(size=(n_codes, 4)).astype(np.float32)
    rot /= np.linalg.norm(rot, axis=1, keepdims=True)
    # every codebook entry used at least once (save-side compaction drops
    # unreferenced rows, which would legitimately change shapes)
    fid = np.concatenate(
        [np.arange(n_codes), rng.integers(0, n_codes, size=n - n_codes)]
    ).astype(np.int32)
    gid = np.concatenate(
        [np.arange(n_codes), rng.integers(0, n_codes, size=n - n_codes)]
    ).astype(np.int32)

    qp = {  # (scale, zero_point) per attribute, torch-style values
        "features_dc": (0.01, 3),
        "features_rest": (0.002, -5),
        "opacity": (1 / 255.0, -128),
        "scaling": (1 / 254.0, -127),
        "scaling_factor": (0.05, 10),
        "rotation": (1 / 127.0, 0),
    }
    d = {"quantization": np.bool_(True), "xyz": xyz.astype(np.float16)}
    for name, arr in [
        ("features_dc", f_dc),
        ("features_rest", f_rest),
        ("opacity", opacity_act),
        ("scaling", scaling_dir),
        ("scaling_factor", sfac),
        ("rotation", rot),
    ]:
        s, z = qp[name]
        d[name] = torch_quantize(arr, s, z)
        d[f"{name}_scale"] = np.asarray([s], np.float32)
        d[f"{name}_zero_point"] = np.asarray([z], np.int64)
    d["feature_indices"] = fid
    d["gaussian_indices"] = gid
    path = tmp_path / "ref_golden.npz"
    np.savez_compressed(path, **d)

    scene = io_npz.load_npz(str(path))
    deq = lambda name: (
        d[name].astype(np.float32) - qp[name][1]
    ) * qp[name][0]

    # loaded attributes: documented domains, exact dequantized values
    np.testing.assert_allclose(
        np.asarray(scene.xyz), xyz.astype(np.float16).astype(np.float32)
    )
    np.testing.assert_allclose(
        np.asarray(scene.features_dc), deq("features_dc"), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(scene.features_rest), deq("features_rest"), atol=1e-7
    )
    # opacity attr stores the PRE-sigmoid logit of the dequantized value
    import scipy.special as sp

    expect_op = sp.logit(np.clip(deq("opacity"), 1e-6, 1 - 1e-6))
    np.testing.assert_allclose(
        np.asarray(scene.opacity), expect_op, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(scene.scaling), deq("scaling"), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(scene.scaling_factor), deq("scaling_factor"), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(scene.rotation), deq("rotation"), atol=1e-7
    )
    np.testing.assert_array_equal(np.asarray(scene.feature_indices), fid)
    np.testing.assert_array_equal(np.asarray(scene.gaussian_indices), gid)
    assert scene.quantization and scene.use_factor_scaling
    assert scene.is_color_indexed and scene.is_gaussian_indexed

    # round-trip: re-saving must preserve attribute VALUES to within one
    # quant step (observer ranges re-derive from the dequantized data, so
    # scale/zp may shift by <= 1 code — the reference behaves identically,
    # gaussian_model.py:648-719)
    path2 = tmp_path / "resaved.npz"
    io_npz.save_npz(scene, str(path2))
    scene2 = io_npz.load_npz(str(path2))
    for name, get in [
        ("features_dc", lambda s: s.features_dc),
        ("features_rest", lambda s: s.features_rest),
        ("scaling", lambda s: s.scaling),
        ("scaling_factor", lambda s: s.scaling_factor),
        ("rotation", lambda s: s.rotation),
    ]:
        a, b = np.asarray(get(scene)), np.asarray(get(scene2))
        np.testing.assert_allclose(
            a, b, atol=1.5 * qp[name][0], err_msg=name
        )
    np.testing.assert_array_equal(
        np.asarray(scene2.feature_indices), fid
    )
    d2 = np.load(path2)
    assert set(d2.files) == set(d.keys()), (
        sorted(d2.files), sorted(d.keys())
    )
