#!/usr/bin/env python
"""Render CLI: dump renders/ + gt/ PNG pairs for train/test splits.

Parity: render.py render_sets (:29-64), incl. loading compressed models
with override_quantization=True (:38).
"""
import argparse
import os


def render_sets(model_p, iteration, skip_train, skip_test):
    import jax.numpy as jnp

    from c3dgs_tpu.data import Scene
    from c3dgs_tpu.eval.metrics import render_and_eval

    scene = Scene(
        source_path=model_p.source_path,
        model_path=model_p.model_path,
        load_iteration=iteration,
        resolution=model_p.resolution,
        eval_split=model_p.eval,
        white_background=model_p.white_background,
        max_sh_degree=model_p.sh_degree,
        shuffle=False,
    )
    bg = [1.0] * 3 if model_p.white_background else [0.0] * 3
    import numpy as np

    for split, cams, skip in (
        ("train", scene.get_train_cameras(), skip_train),
        ("test", scene.get_test_cameras(), skip_test),
    ):
        if skip or not cams:
            continue
        dump = os.path.join(
            model_p.model_path, split, f"ours_{scene.loaded_iter}"
        )
        results = render_and_eval(
            scene.gaussians, cams, bg=np.asarray(bg), dump_dir=dump
        )
        print(split, {k: v for k, v in results.items() if k != "per_view"})


def main(argv=None):
    from c3dgs_tpu.config import (
        ModelParams,
        load_combined_args,
        setup_jax_cache,
    )

    setup_jax_cache()

    parser = argparse.ArgumentParser(description="c3dgs_tpu render")
    ModelParams.add_to_parser(parser, "model", fill_none=True)
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    args = load_combined_args(parser, argv)
    render_sets(
        ModelParams.extract(args).post_extract(),
        args.iteration,
        args.skip_train,
        args.skip_test,
    )


if __name__ == "__main__":
    main()
