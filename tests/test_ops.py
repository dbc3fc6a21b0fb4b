"""Unit tests for core math ops, cross-checked against torch (CPU) where the
reference formulas are easy to replicate independently."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from c3dgs_tpu.ops import camera_math, losses, misc, morton, quantize, quat, sh


def test_quat_rotmat_roundtrip(rng):
    q = rng.normal(size=(64, 4)).astype(np.float32)
    q = q / np.linalg.norm(q, axis=1, keepdims=True)
    # canonicalize sign (w>=0) since q and -q map to the same rotation
    q = np.where(q[:, :1] >= 0, q, -q)
    m = quat.quat_to_rotmat(jnp.asarray(q))
    # proper rotations
    dets = np.linalg.det(np.asarray(m))
    np.testing.assert_allclose(dets, 1.0, atol=1e-5)
    q2 = np.asarray(quat.rotmat_to_quat(m))
    q2 = np.where(q2[:, :1] >= 0, q2, -q2)
    np.testing.assert_allclose(q, q2, atol=1e-5)


def test_covariance_psd_and_eigh_extract(rng):
    n = 128
    s = np.exp(rng.normal(size=(n, 3)).astype(np.float32) * 0.3)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    cov = np.asarray(quat.build_covariance(jnp.asarray(s), jnp.asarray(q)))
    # symmetric PSD
    np.testing.assert_allclose(cov, np.swapaxes(cov, 1, 2), atol=1e-5)
    eig = np.linalg.eigvalsh(cov)
    assert (eig > -1e-5).all()
    # strip/expand roundtrip
    cov6 = quat.strip_symmetric(jnp.asarray(cov))
    full = np.asarray(quat.to_full_cov(cov6))
    np.testing.assert_allclose(full, cov, atol=1e-6)
    # extract_rot_scale reconstructs the covariance
    rq, rs = quat.extract_rot_scale(jnp.asarray(cov))
    cov_rec = np.asarray(quat.build_covariance(rs, rq))
    # f32 eigh: ~1e-3 reconstruction error is expected (reference uses f32 too)
    np.testing.assert_allclose(cov_rec, cov, atol=5e-3, rtol=1e-2)


def test_sh_dc_only_matches_constant():
    shc = jnp.zeros((5, 16, 3)).at[:, 0, :].set(1.0)
    dirs = jnp.asarray(np.random.default_rng(1).normal(size=(5, 3)), jnp.float32)
    dirs = dirs / jnp.linalg.norm(dirs, axis=1, keepdims=True)
    out = sh.eval_sh(3, shc, dirs)
    np.testing.assert_allclose(np.asarray(out), sh.C0, atol=1e-6)
    rgb = sh.sh_to_rgb(3, shc, dirs)
    np.testing.assert_allclose(np.asarray(rgb), sh.C0 + 0.5, atol=1e-6)


def test_sh_matches_torch_reference(rng):
    """Replicate the reference eval_sh polynomials independently in numpy."""
    n = 32
    coeffs = rng.normal(size=(n, 16, 3)).astype(np.float32)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    x, y, z = dirs[:, 0:1], dirs[:, 1:2], dirs[:, 2:3]
    C0, C1, C2, C3 = sh.C0, sh.C1, sh.C2, sh.C3
    expected = C0 * coeffs[:, 0]
    expected = expected - C1 * y * coeffs[:, 1] + C1 * z * coeffs[:, 2] - C1 * x * coeffs[:, 3]
    xx, yy, zz, xy, yz, xz = x * x, y * y, z * z, x * y, y * z, x * z
    expected = (
        expected
        + C2[0] * xy * coeffs[:, 4]
        + C2[1] * yz * coeffs[:, 5]
        + C2[2] * (2 * zz - xx - yy) * coeffs[:, 6]
        + C2[3] * xz * coeffs[:, 7]
        + C2[4] * (xx - yy) * coeffs[:, 8]
    )
    expected = (
        expected
        + C3[0] * y * (3 * xx - yy) * coeffs[:, 9]
        + C3[1] * xy * z * coeffs[:, 10]
        + C3[2] * y * (4 * zz - xx - yy) * coeffs[:, 11]
        + C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * coeffs[:, 12]
        + C3[4] * x * (4 * zz - xx - yy) * coeffs[:, 13]
        + C3[5] * z * (xx - yy) * coeffs[:, 14]
        + C3[6] * x * (xx - 3 * yy) * coeffs[:, 15]
    )
    got = np.asarray(sh.eval_sh(3, jnp.asarray(coeffs), jnp.asarray(dirs)))
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_extrinsic_roundtrip(rng):
    # random proper rotation via quat
    q = rng.normal(size=4).astype(np.float64)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    R = np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )
    t = rng.normal(size=3)
    m = np.eye(4)
    m[:3, :3] = R
    m[:3, 3] = t
    ev = camera_math.mat_to_extrinsic(m)
    m2 = np.asarray(camera_math.extrinsic_to_mat(jnp.asarray(ev, jnp.float32)))
    np.testing.assert_allclose(m2, m, atol=1e-5)
    # camera center = -R^T t
    c = np.asarray(camera_math.camera_center_from_extrinsic(jnp.asarray(ev, jnp.float32)))
    np.testing.assert_allclose(c, -R.T @ t, atol=1e-5)


def test_projection_matrix_properties():
    import math

    fov = math.radians(60.0)
    P = np.asarray(camera_math.projection_matrix(jnp.float32(fov), jnp.float32(fov)))
    # a point on the near plane maps to z_ndc ~ 0, far plane to ~1
    near = np.array([0, 0, camera_math.ZNEAR, 1.0])
    far = np.array([0, 0, camera_math.ZFAR, 1.0])
    for p, expect in [(near, 0.0), (far, 1.0)]:
        clip = P @ p
        assert abs(clip[2] / clip[3] - expect) < 1e-5
    # x at the fov edge maps to ndc x = +-1
    edge = np.array([math.tan(fov / 2) * 2.0, 0, 2.0, 1.0])
    clip = P @ edge
    assert abs(clip[0] / clip[3] - 1.0) < 1e-5


def test_ssim_matches_torch(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    a = rng.random(size=(1, 3, 32, 32)).astype(np.float32)
    b = rng.random(size=(1, 3, 32, 32)).astype(np.float32)

    # reference torch ssim (utils/loss_utils.py)
    def torch_ssim(img1, img2, window_size=11):
        import math as _m

        gauss = torch.tensor(
            [
                _m.exp(-((i - window_size // 2) ** 2) / (2 * 1.5**2))
                for i in range(window_size)
            ]
        )
        gauss = (gauss / gauss.sum()).unsqueeze(1)
        w2 = gauss.mm(gauss.t()).float().unsqueeze(0).unsqueeze(0)
        window = w2.expand(3, 1, window_size, window_size).contiguous()
        mu1 = F.conv2d(img1, window, padding=window_size // 2, groups=3)
        mu2 = F.conv2d(img2, window, padding=window_size // 2, groups=3)
        mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
        s1 = F.conv2d(img1 * img1, window, padding=window_size // 2, groups=3) - mu1_sq
        s2 = F.conv2d(img2 * img2, window, padding=window_size // 2, groups=3) - mu2_sq
        s12 = F.conv2d(img1 * img2, window, padding=window_size // 2, groups=3) - mu1_mu2
        C1, C2 = 0.01**2, 0.03**2
        return (
            ((2 * mu1_mu2 + C1) * (2 * s12 + C2))
            / ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
        ).mean()

    expected = float(torch_ssim(torch.from_numpy(a), torch.from_numpy(b)))
    got = float(losses.ssim(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got - expected) < 1e-5


def test_psnr_basic():
    a = jnp.zeros((3, 8, 8))
    b = jnp.full((3, 8, 8), 0.1)
    got = float(losses.psnr(a, b)[0, 0])
    assert abs(got - 20.0) < 1e-4  # 20 log10(1/0.1)


def test_morton_locality(rng):
    xyz = rng.random(size=(512, 3)).astype(np.float32)
    order = morton.morton_order(xyz)
    assert sorted(order.tolist()) == list(range(512))
    sorted_xyz = xyz[order]
    # morton ordering should reduce mean consecutive distance vs random order
    def mean_step(a):
        return np.linalg.norm(np.diff(a, axis=0), axis=1).mean()

    assert mean_step(sorted_xyz) < 0.5 * mean_step(xyz)


def test_fake_quant_affine_roundtrip_and_ste(rng):
    x = rng.normal(size=(1000,)).astype(np.float32)
    state = quantize.observe(quantize.init_observer(), jnp.asarray(x))
    y = quantize.fake_quant(jnp.asarray(x), state)
    scale, _ = quantize.qparams(state)
    assert float(jnp.abs(y - x).max()) <= float(scale) * 0.5 + 1e-6
    # int8 roundtrip
    q = quantize.quantize_int8(jnp.asarray(x), state)
    assert q.dtype == jnp.int8
    s, zp = quantize.qparams(state)
    deq = quantize.dequantize_int8(q, s, zp)
    np.testing.assert_allclose(np.asarray(deq), np.asarray(y), atol=1e-6)
    # STE gradient: 1 in range, 0 out of range
    g = jax.grad(lambda v: quantize.fake_quant(v, state).sum())(jnp.asarray(x))
    assert float(g.mean()) > 0.95
    far = jnp.full((4,), 1e6)
    g2 = jax.grad(lambda v: quantize.fake_quant(v, state).sum())(far)
    np.testing.assert_allclose(np.asarray(g2), 0.0)


def test_fake_quant_matches_torch(rng):
    torch = pytest.importorskip("torch")
    x = rng.normal(size=(4096,)).astype(np.float32) * 2.5 + 0.7
    fq = torch.ao.quantization.FakeQuantize(dtype=torch.qint8)
    xt = torch.from_numpy(x)
    yt = fq(xt).detach().numpy()

    state = quantize.observe(quantize.init_observer(), jnp.asarray(x))
    y = np.asarray(quantize.fake_quant(jnp.asarray(x), state))
    np.testing.assert_allclose(y, yt, atol=1e-5)
    # scale/zero-point match
    s, zp = quantize.qparams(state)
    np.testing.assert_allclose(float(s), float(fq.scale), rtol=1e-5)
    assert int(zp) == int(fq.zero_point)


def test_fake_quant_half():
    x = jnp.asarray([1.0000001, -2.5, 3.14159], jnp.float32)
    y = quantize.fake_quant_half(x)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(x, np.float16).astype(np.float32)
    )
    g = jax.grad(lambda v: (quantize.fake_quant_half(v) * 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g), 2.0)


def test_expon_lr():
    fn = misc.get_expon_lr_func(1e-2, 1e-4, max_steps=100)
    assert abs(float(fn(0)) - 1e-2) < 1e-9
    assert abs(float(fn(100)) - 1e-4) < 1e-9
    mid = float(fn(50))
    assert abs(mid - 1e-3) < 1e-5  # geometric midpoint
    assert float(fn(-1)) == 0.0


def test_mean_knn_sq_dist_matches_bruteforce(rng):
    xyz = rng.normal(size=(300, 3)).astype(np.float32)
    got = np.asarray(misc.mean_knn_sq_dist(jnp.asarray(xyz), k=3, chunk=128))
    d = ((xyz[:, None] - xyz[None]) ** 2).sum(-1)
    np.fill_diagonal(d, np.inf)
    expected = np.sort(d, axis=1)[:, :3].mean(1)
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-5)


def test_inverse_sigmoid():
    x = jnp.asarray([0.1, 0.5, 0.9])
    y = misc.inverse_sigmoid(x)
    np.testing.assert_allclose(np.asarray(jax.nn.sigmoid(y)), np.asarray(x), atol=1e-6)
