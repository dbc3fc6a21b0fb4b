#!/usr/bin/env python
"""Camera-pose trainer CLI: optimize camera extrinsics against a frozen
(compressed) scene.

Parity: train_camera.py (:1-197) — load compressed model, perturb each
camera's extrinsic 7-vector, recover it by Adam through the renderer.
The live-matplotlib display is replaced by optional PNG dumps.
"""
import argparse
import os


def main(argv=None):
    import jax.numpy as jnp
    import numpy as np

    from c3dgs_tpu.data import Scene
    from c3dgs_tpu.render.types import settings_from_intrinsic
    from c3dgs_tpu.train import camera_opt, trainer

    parser = argparse.ArgumentParser()
    parser.add_argument("--source_path", "-s", required=True)
    parser.add_argument("--model_path", "-m", required=True)
    parser.add_argument("--load_iteration", type=int, default=-1)
    parser.add_argument("--iterations", type=int, default=300)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--perturb", type=float, default=0.02)
    parser.add_argument("--num_cameras", type=int, default=4)
    parser.add_argument("--dump_dir", default="")
    args = parser.parse_args(argv)

    scene = Scene(
        source_path=args.source_path,
        model_path=args.model_path,
        load_iteration=args.load_iteration,
        shuffle=False,
    )
    rng = np.random.default_rng(0)
    for cam in scene.get_train_cameras()[: args.num_cameras]:
        settings = settings_from_intrinsic(cam.intrinsic)
        gt = jnp.asarray(cam.original_image)
        ev_true = np.asarray(cam.extrinsic_vector)
        ev0 = ev_true + rng.normal(size=7).astype(np.float32) * args.perturb
        ev_opt, loss = camera_opt.optimize_camera(
            scene.gaussians,
            ev0,
            gt,
            settings,
            iterations=args.iterations,
            lr=args.lr,
            log_every=50,
        )
        err0 = float(np.abs(ev0 - ev_true).max())
        err1 = float(np.abs(np.asarray(ev_opt) - ev_true).max())
        print(
            f"[{cam.image_name}] pose error {err0:.4f} -> {err1:.4f} "
            f"(loss {loss:.5f})"
        )
        if args.dump_dir:
            os.makedirs(args.dump_dir, exist_ok=True)
            import jax

            out = jax.jit(trainer.render_scene, static_argnums=(2,))(
                scene.gaussians, jnp.asarray(ev_opt), settings, jnp.zeros(3)
            )
            from PIL import Image

            img = (
                np.clip(np.asarray(out["render"]), 0, 1).transpose(1, 2, 0) * 255
            ).astype(np.uint8)
            Image.fromarray(img).save(
                os.path.join(args.dump_dir, f"{cam.image_name}_opt.png")
            )


if __name__ == "__main__":
    main()
