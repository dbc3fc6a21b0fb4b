#!/usr/bin/env python
"""Compressed-pipeline smoke script: load -> to_compressed -> finetune ->
render one view (parity: run_indexed.py:1-46, without its hard-coded paths).
"""
import argparse


def main(argv=None):
    import jax.numpy as jnp
    import numpy as np

    from c3dgs_tpu.compress.pipeline import to_compressed
    from c3dgs_tpu.config import CompressionParams, OptimizationParams
    from c3dgs_tpu.data import Scene
    from c3dgs_tpu.render.types import settings_from_intrinsic
    from c3dgs_tpu.train import trainer
    from c3dgs_tpu.train.finetune import finetune

    parser = argparse.ArgumentParser()
    parser.add_argument("--source_path", "-s", required=True)
    parser.add_argument("--model_path", "-m", required=True)
    parser.add_argument("--load_iteration", type=int, default=-1)
    parser.add_argument("--finetune_iterations", type=int, default=500)
    parser.add_argument("--out", default="indexed_preview.png")
    args = parser.parse_args(argv)

    scene = Scene(
        source_path=args.source_path,
        model_path=args.model_path,
        load_iteration=args.load_iteration,
        shuffle=False,
    )
    comp = CompressionParams()
    cams, _ = scene.get_some_cameras()
    compressed = to_compressed(scene.gaussians, cams[:8], comp)
    if args.finetune_iterations > 0:
        compressed = finetune(
            compressed,
            scene.get_train_cameras(),
            OptimizationParams(),
            args.finetune_iterations,
            spatial_lr_scale=scene.cameras_extent,
        )
    cam = cams[0]
    settings = settings_from_intrinsic(cam.intrinsic, inference=True)
    import jax

    out = jax.jit(trainer.render_scene, static_argnums=(2,))(
        compressed, jnp.asarray(cam.extrinsic_vector), settings, jnp.zeros(3)
    )
    from PIL import Image

    img = (np.clip(np.asarray(out["render"]), 0, 1).transpose(1, 2, 0) * 255).astype(
        np.uint8
    )
    Image.fromarray(img).save(args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
