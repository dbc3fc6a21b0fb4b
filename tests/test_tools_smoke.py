"""Smoke tests for the evidence tooling (VERDICT r3 #8): the committed
RESULTS/PERF claims are produced by tools/ probes whose outputs are
committed but which pytest never ran — these invocations keep their main
paths from rotting. Tiny configs, artifacts in tmp (never the committed
output/ files), CPU interpret-mode Pallas.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd, timeout=600):
    env = dict(os.environ)
    # JAX_PLATFORMS=cpu does not survive the sitecustomize axon
    # registration; C3DGS_FORCE_CPU is honored by setup_jax_cache in
    # every CLI/tool and inherited by their subprocesses
    env["C3DGS_FORCE_CPU"] = "1"
    r = subprocess.run(
        cmd,
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    assert r.returncode == 0, r.stdout[-3000:] + "\n" + r.stderr[-3000:]
    return r


def test_scale_train_probe_smoke(tmp_path):
    out = str(tmp_path / "probe")
    _run(
        [
            sys.executable,
            "tools/scale_train_probe.py",
            "--steps", "6",
            "--n_init", "1500",
            "--n_gt", "1200",
            "--n_views", "2",
            "--res", "256x128",
            "--out_dir", out,
        ]
    )
    data = json.load(open(os.path.join(out, "SCALE_TRAIN.json")))
    assert data["steps"] == 6 or data.get("final_ema_psnr") is not None
    assert data["final_ema_psnr"] == data["final_ema_psnr"]  # finite
    assert len(data["clamp_experiment"]) == 4
    assert os.path.exists(os.path.join(out, "scale_train_log.jsonl"))


def test_scale_compress_probe_smoke(tmp_path):
    out = str(tmp_path / "scale_compress")
    _run(
        [
            sys.executable,
            "tools/scale_compress_probe.py",
            "--n", "3000",
            "--n_views", "2",
            "--res", "256x128",
            "--finetune_iters", "3",
            "--out_dir", out,
        ],
        timeout=900,
    )
    data = json.load(open(os.path.join(out, "SCALE_COMPRESS.json")))
    assert data["psnr"] is not None and data["psnr"] == data["psnr"]
    assert data["size_bytes"] > 0
    assert data["compression_ratio_vs_ply"] > 1.0
    assert os.path.exists(data["npz"])


def test_convergence_run_smoke(tmp_path):
    out = str(tmp_path / "conv")
    _run(
        [
            sys.executable,
            "tools/convergence_run.py",
            "--fast",
            "--epochs", "2",
            "--res", "64",
            "--n_gt", "1000",
            "--views", "6",
            "--out_root", out,
        ],
        timeout=900,
    )
    results = json.load(
        open(os.path.join(out, "model", "vq", "results.json"))
    )
    assert results.get("psnr") is not None
    assert results.get("size_bytes", 0) > 0
    log = [
        json.loads(l)
        for l in open(os.path.join(out, "model", "train_log.jsonl"))
    ]
    assert log and log[-1]["epoch"] == 1
