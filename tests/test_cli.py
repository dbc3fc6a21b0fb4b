"""Smoke tests for the argparse entry points (train/render/metrics/
npz2ply/train_no_splatting), wiring-level: tiny scenes, 1-2 epochs, CPU
interpret mode. The numerical behavior of the underlying functions is
covered by test_e2e/test_compress; these catch flag plumbing breaks."""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from tests import synth


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("cli_scene"))
    synth.write_blender_dataset(out, res=32, num_train=3, num_test=1)
    return out


@pytest.fixture(scope="module")
def trained(dataset, tmp_path_factory):
    import train as train_cli

    model = str(tmp_path_factory.mktemp("cli_model"))
    train_cli.main(["-s", dataset, "-m", model, "--epochs", "2"])
    assert os.path.isdir(os.path.join(model, "point_cloud"))
    assert os.path.exists(os.path.join(model, "cfg_args.json"))
    assert os.path.exists(os.path.join(model, "cfg_args"))
    return model


def test_render_and_metrics_cli(dataset, trained):
    import metrics as metrics_cli
    import render as render_cli

    render_cli.main(["-s", dataset, "-m", trained])
    dirs = [d for d in os.listdir(trained) if d in ("train", "test")]
    assert dirs, os.listdir(trained)
    metrics_cli.main(["-m", trained])
    with open(os.path.join(trained, "results.json")) as f:
        res = json.load(f)
    vals = [v for v in res.values() if isinstance(v, dict) and "PSNR" in v]
    assert vals and all(np.isfinite(v["PSNR"]) for v in vals)


def test_npz2ply_cli(tmp_path):
    import npz2ply

    from c3dgs_tpu.models import gaussians as gmod, io_npz

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    cols = rng.random(size=(50, 3)).astype(np.float32)
    scene = gmod.from_point_cloud(pts, cols, capacity=50, quantization=True)
    scene = scene.replace(quant=scene.update_observers().quant)
    npz = str(tmp_path / "pc.npz")
    io_npz.save_npz(scene, npz)
    out = str(tmp_path / "pc.ply")
    npz2ply.main([npz, out])
    assert os.path.getsize(out) > 0


def test_train_intraining_compression_cli(dataset, tmp_path, capsys):
    """--compress_every N: the reference's in-training VQ pass
    (train.py:50-56,111-146, disabled by default there too). Wiring-level:
    the pass runs at the right epochs and training continues to completion
    on the re-unified scene."""
    import train as train_cli

    model = str(tmp_path / "itc_model")
    train_cli.main(
        [
            "-s",
            dataset,
            "-m",
            model,
            "--epochs",
            "4",
            "--compress_every",
            "2",
            "--color_codebook_size",
            "16",
            "--gaussian_codebook_size",
            "16",
            "--color_cluster_iterations",
            "2",
            "--gaussian_cluster_iterations",
            "2",
        ]
    )
    out = capsys.readouterr().out
    assert "[compress@2]" in out
    assert os.path.isdir(os.path.join(model, "point_cloud"))
    log = [
        json.loads(l)
        for l in open(os.path.join(model, "train_log.jsonl"))
    ]
    assert len(log) == 4 and all(np.isfinite(e["ema_loss"]) for e in log)


def test_train_no_splatting_cli(dataset, tmp_path):
    import train_no_splatting as tns

    model = str(tmp_path / "joint_model")
    tns.main(
        [
            "-s",
            dataset,
            "-m",
            model,
            "--epochs",
            "1",
            "--perturb_poses",
            "0.005",
            "--anchor_weight",
            "0.5",
        ]
    )
    poses = os.path.join(model, "optimized_poses.npy")
    assert os.path.exists(poses)
    evs = np.load(poses)
    assert evs.shape[1] == 7 and np.isfinite(evs).all()
