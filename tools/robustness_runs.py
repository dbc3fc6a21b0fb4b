#!/usr/bin/env python
"""Convergence robustness: 3 seeds x 2 scene configs (VERDICT r4 #5).

Runs tools/convergence_run.py --no_compress through the real CLIs on six
small-budget (seed, scene) configs, then collects each run's held-out eval
curve and final test PSNR into output/ROBUSTNESS.json and a markdown table
(appended to RESULTS.md by the headline run's writer or committed
standalone). A run counts as DIVERGED if its final test PSNR is NaN or
below the background-only floor (~8 dB on these scenes).

Scene A = the headline generator (ground slab + blobs + arch, 60k splats)
at reduced budget; scene B = a sparser 20k-splat variant of the same
generator (different structure statistics: fewer, larger splats dominate).
Budgets are deliberately small (res 256, 64 views, 60 epochs) — the claim
under test is "the ADC schedule converges from a noisy sparse init for
every seed", not peak quality.
"""
import argparse
import json
import os
import subprocess
import sys

REPO = "/root/repo"
OUT = os.path.join(REPO, "output", "robust")

CONFIGS = [
    {"scene": "A", "n_gt": 60_000, "seed": s} for s in (7, 21, 99)
] + [
    {"scene": "B", "n_gt": 20_000, "seed": s} for s in (7, 21, 99)
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--views", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--only", type=str, default="", help="e.g. A7,B21")
    args = ap.parse_args()

    rows = []
    for cfg in CONFIGS:
        tag = f"{cfg['scene']}{cfg['seed']}"
        if args.only and tag not in args.only.split(","):
            continue
        root = os.path.join(OUT, tag)
        cmd = [
            sys.executable,
            os.path.join(REPO, "tools", "convergence_run.py"),
            "--no_compress",
            "--seed", str(cfg["seed"]),
            "--out_root", root,
            "--res", str(args.res),
            "--views", str(args.views),
            "--epochs", str(args.epochs),
            "--n_gt", str(cfg["n_gt"]),
        ]
        print(f"=== {tag}: {' '.join(cmd)}", flush=True)
        subprocess.run(cmd, check=True, cwd=REPO)
        log_path = os.path.join(root, "model", "train_log.jsonl")
        log = [json.loads(l) for l in open(log_path)]
        evals = [e for e in log if "test_psnr" in e]
        final = evals[-1] if evals else {}
        fp = float(final.get("test_psnr", float("nan")))
        rows.append(
            {
                "scene": cfg["scene"],
                "seed": cfg["seed"],
                "n_gt": cfg["n_gt"],
                "final_test_psnr": fp,
                "final_train_ema": float(final.get("ema_psnr", float("nan"))),
                "eval_curve": [
                    {"epoch": e["epoch"], "test_psnr": e["test_psnr"]}
                    for e in evals
                ],
                "diverged": not (fp == fp and fp > 8.0),
            }
        )
        print(
            f"=== {tag}: final test {fp:.2f} dB "
            f"({'DIVERGED' if rows[-1]['diverged'] else 'ok'})",
            flush=True,
        )

    res = {
        "protocol": {
            "res": args.res,
            "views": args.views,
            "epochs": args.epochs,
            "harness": "tools/convergence_run.py --no_compress (real CLIs)",
        },
        "runs": rows,
        "any_diverged": any(r["diverged"] for r in rows),
    }
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "ROBUSTNESS.json"), "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps({k: v for k, v in res.items() if k != "runs"}))
    print("| scene | seed | final test PSNR | train EMA |")
    print("|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['scene']} ({r['n_gt']//1000}k) | {r['seed']} | "
            f"{r['final_test_psnr']:.2f} | {r['final_train_ema']:.2f} |"
        )


if __name__ == "__main__":
    main()
