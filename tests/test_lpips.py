"""LPIPS math parity: the jnp VGG16+linear-heads implementation
(c3dgs_tpu/eval/lpips.py) vs an independent torch oracle built from the
reference's lpipsPyTorch math (modules/lpips.py:8-36,
modules/networks.py:12-20), on SHARED RANDOM weights.

Pretrained weights cannot be downloaded here (zero egress), so this
verifies the network math — conv stack, taps, scaling layer, unit
normalization, linear heads, spatial mean — weight-for-weight; with a real
weights file the same code path reproduces the reference metric
(eval/lpips.py::convert_torch_weights)."""
import numpy as np
import pytest

from c3dgs_tpu.eval import lpips as L


def _random_weights(rng):
    state = {}
    conv_idx = 0
    cin = 3
    for cout, n_convs in L.VGG_BLOCKS:
        for _ in range(n_convs):
            state[f"conv{conv_idx}/kernel"] = (
                rng.normal(size=(cout, cin, 3, 3)).astype(np.float32) * 0.05
            )
            state[f"conv{conv_idx}/bias"] = (
                rng.normal(size=(cout,)).astype(np.float32) * 0.01
            )
            conv_idx += 1
            cin = cout
    for i, (cout, _) in enumerate(L.VGG_BLOCKS):
        state[f"lin{i}/kernel"] = np.abs(
            rng.normal(size=(1, cout, 1, 1)).astype(np.float32)
        )
    return state


def _torch_lpips(state, x_np, y_np):
    """Independent oracle: the reference's LPIPS forward in torch ops."""
    import torch
    import torch.nn.functional as F

    shift = torch.tensor(L.SHIFT).view(1, 3, 1, 1)
    scale = torch.tensor(L.SCALE).view(1, 3, 1, 1)

    def features(x):
        x = x * 2.0 - 1.0  # reference feeds [-1, 1]
        h = (x - shift) / scale
        feats = []
        conv_idx = 0
        for block, (_, n_convs) in enumerate(L.VGG_BLOCKS):
            for _ in range(n_convs):
                w = torch.from_numpy(state[f"conv{conv_idx}/kernel"])
                b = torch.from_numpy(state[f"conv{conv_idx}/bias"])
                h = F.relu(F.conv2d(h, w, b, padding=1))
                conv_idx += 1
            feats.append(h)
            if block < len(L.VGG_BLOCKS) - 1:
                h = F.max_pool2d(h, 2, 2)
        return feats

    def unit(f):
        return f / torch.sqrt((f * f).sum(1, keepdim=True) + 1e-10)

    fx = features(torch.from_numpy(x_np))
    fy = features(torch.from_numpy(y_np))
    total = 0.0
    for i, (a, b) in enumerate(zip(fx, fy)):
        d = (unit(a) - unit(b)) ** 2
        w = torch.from_numpy(state[f"lin{i}/kernel"])
        total = total + F.conv2d(d, w).mean(dim=(1, 2, 3))
    return float(total.mean())


def test_lpips_matches_torch_oracle(tmp_path):
    rng = np.random.default_rng(0)
    state = _random_weights(rng)
    path = tmp_path / "lpips_random.npz"
    np.savez(path, **state)

    x = rng.random(size=(1, 3, 64, 96)).astype(np.float32)
    y = np.clip(
        x + rng.normal(size=x.shape).astype(np.float32) * 0.1, 0, 1
    )

    model = L.LPIPS(weights_npz=str(path))
    ours = float(model(x[0], y[0]))
    ref = _torch_lpips(state, x, y)
    assert ref > 1e-6  # non-degenerate fixture
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=1e-7)

    # identical images -> exactly zero distance
    assert float(model(x[0], x[0])) == pytest.approx(0.0, abs=1e-9)


def _random_alex_weights(rng):
    state = {}
    cin = 3
    for i, (cout, k, _, _, _) in enumerate(L.ALEX_CONVS):
        state[f"conv{i}/kernel"] = (
            rng.normal(size=(cout, cin, k, k)).astype(np.float32) * 0.05
        )
        state[f"conv{i}/bias"] = (
            rng.normal(size=(cout,)).astype(np.float32) * 0.01
        )
        cin = cout
    for i, (cout, *_rest) in enumerate(L.ALEX_CONVS):
        state[f"lin{i}/kernel"] = np.abs(
            rng.normal(size=(1, cout, 1, 1)).astype(np.float32)
        )
    return state


def _torch_lpips_alex(state, x_np, y_np):
    """Independent AlexNet-backbone oracle (networks.py AlexNet slices:
    ReLU taps, maxpool(3, 2) after taps 1 and 2)."""
    import torch
    import torch.nn.functional as F

    shift = torch.tensor(L.SHIFT).view(1, 3, 1, 1)
    scale = torch.tensor(L.SCALE).view(1, 3, 1, 1)

    def features(x):
        h = (x * 2.0 - 1.0 - shift) / scale
        feats = []
        for i, (_, k, stride, pad, pool_after) in enumerate(L.ALEX_CONVS):
            w = torch.from_numpy(state[f"conv{i}/kernel"])
            b = torch.from_numpy(state[f"conv{i}/bias"])
            h = F.relu(F.conv2d(h, w, b, stride=stride, padding=pad))
            feats.append(h)
            if pool_after:
                h = F.max_pool2d(h, 3, 2)
        return feats

    def unit(f):
        return f / torch.sqrt((f * f).sum(1, keepdim=True) + 1e-10)

    fx = features(torch.from_numpy(x_np))
    fy = features(torch.from_numpy(y_np))
    total = 0.0
    for i, (a, b) in enumerate(zip(fx, fy)):
        d = (unit(a) - unit(b)) ** 2
        w = torch.from_numpy(state[f"lin{i}/kernel"])
        total = total + F.conv2d(d, w).mean(dim=(1, 2, 3))
    return float(total.mean())


def test_lpips_alex_matches_torch_oracle(tmp_path):
    rng = np.random.default_rng(1)
    state = _random_alex_weights(rng)
    path = tmp_path / "lpips_alex_random.npz"
    np.savez(path, **state)

    # AlexNet's stride-4 k11 stem + two pool(3,2) need a bigger input
    x = rng.random(size=(1, 3, 96, 128)).astype(np.float32)
    y = np.clip(
        x + rng.normal(size=x.shape).astype(np.float32) * 0.1, 0, 1
    )

    model = L.LPIPS(weights_npz=str(path), net_type="alex")
    ours = float(model(x[0], y[0]))
    ref = _torch_lpips_alex(state, x, y)
    assert ref > 1e-6
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=1e-7)
    assert float(model(x[0], x[0])) == pytest.approx(0.0, abs=1e-9)


def test_lpips_unavailable_without_weights(tmp_path):
    assert not L.available(str(tmp_path / "missing.npz"))
    with pytest.raises(FileNotFoundError):
        L.LPIPS(weights_npz=str(tmp_path / "missing.npz"))
    assert not L.available(net_type="alex") or True  # path helper resolves
