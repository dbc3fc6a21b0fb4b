#!/usr/bin/env python
"""Training CLI — the fork's epoch-based trainer on TPU.

Parity: train.py:15-246 (epoch loop over every-10th train camera :58,
L1+0.2(1-SSIM) loss :76-79, per-epoch densify/prune + opacity reset
:161-170, SH degree warmup :172-173, checkpoint saves). Flags mirror
arguments/__init__.py.
"""
import argparse
import os
import time


def training(model_p, opt_p, pipe_p, save_epochs=(), quantization=True):
    import jax
    import jax.numpy as jnp

    from c3dgs_tpu.config import save_config
    from c3dgs_tpu.data import Scene
    from c3dgs_tpu.render.types import settings_from_intrinsic
    from c3dgs_tpu.train import trainer

    scene = Scene(
        source_path=model_p.source_path,
        model_path=model_p.model_path,
        resolution=model_p.resolution,
        eval_split=model_p.eval,
        white_background=model_p.white_background,
        max_sh_degree=model_p.sh_degree,
        quantization=quantization,
        shuffle=True,
    )
    gaussians = scene.gaussians
    assert gaussians is not None, "no initial point cloud found"
    spatial_lr_scale = scene.cameras_extent

    state = trainer.create_train_state(gaussians, opt_p, spatial_lr_scale)
    bg = jnp.asarray(
        [1.0, 1.0, 1.0] if model_p.white_background else [0.0, 0.0, 0.0]
    )
    from c3dgs_tpu.render.capacity import CapacityPolicy

    capacity = CapacityPolicy(initial=1 << 20)

    cams = scene.get_train_cameras()
    ema = None
    ema_psnr = None
    t0 = time.time()
    it = 0
    log_path = os.path.join(model_p.model_path, "train_log.jsonl")
    log_f = open(log_path, "w")
    for epoch in range(opt_p.epochs):
        # every-10th camera per epoch (train.py:58)
        epoch_cams = cams[epoch % 10 :: 10] or cams
        for cam in epoch_cams:
            settings = capacity.apply(settings_from_intrinsic(cam.intrinsic))
            gt = jnp.asarray(cam.original_image)
            state, metrics = trainer.train_step(
                state,
                jnp.asarray(cam.extrinsic_vector),
                gt,
                settings,
                bg,
                opt_p,
                spatial_lr_scale,
            )
            if capacity.update(
                int(metrics["num_instances"]),
                int(metrics["overflow"]),
                int(metrics["grad_total"]),
                int(metrics["grad_overflow"]),
            ):
                # this frame trained with clipped instances (overflow is a
                # soft degradation, not an error); subsequent frames render
                # at the grown capacity bucket
                print(
                    f"[capacity] overflow -> bucket {capacity.capacity}"
                )
            it += 1
            loss = float(metrics["loss"])
            psnr = float(metrics["psnr"])
            ema = loss if ema is None else 0.6 * ema + 0.4 * loss
            ema_psnr = (
                psnr if ema_psnr is None else 0.9 * ema_psnr + 0.1 * psnr
            )
        # epoch boundary: densify / prune / reset / SH warmup (train.py:153-173)
        n_active = int(state.scene.num_active)
        if epoch % 3 == 0 and epoch > 0 and epoch < 0.75 * opt_p.epochs:
            free = state.scene.capacity - n_active
            if free < max(1024, n_active // 4):
                # grow WITHOUT nuking Adam moments of existing splats
                # (gaussian_model.py:1161-1185 preserves them; so do we)
                state = trainer.grow_capacity(
                    state, state.scene.capacity * 2
                )
            state, dropped = trainer.densify_step(
                state, scene.cameras_extent, opt_p
            )
            if int(dropped) > 0:
                print(f"[densify] dropped {int(dropped)} writes (capacity)")
        if epoch % 9 == 0 and epoch > 0 and epoch < 0.75 * opt_p.epochs:
            state = trainer.reset_opacity_step(state)
        if epoch % 5 == 0:
            state = state._replace(scene=state.scene.oneup_sh_degree())
        print(
            f"[epoch {epoch}] it={it} ema_loss={ema:.4f} "
            f"ema_psnr={ema_psnr:.2f} "
            f"active={int(state.scene.num_active)} ({time.time() - t0:.0f}s)"
        )
        import json as _json

        log_f.write(
            _json.dumps(
                {
                    "epoch": epoch,
                    "it": it,
                    "ema_loss": round(ema, 5),
                    "ema_psnr": round(ema_psnr, 3),
                    "active": int(state.scene.num_active),
                    "seconds": round(time.time() - t0, 1),
                }
            )
            + "\n"
        )
        log_f.flush()
        if epoch in save_epochs or epoch == opt_p.epochs - 1:
            scene.gaussians = state.scene
            scene.save(it)
    log_f.close()
    return state


def main(argv=None):
    from c3dgs_tpu.config import (
        ModelParams,
        OptimizationParams,
        PipelineParams,
        save_config,
    )

    parser = argparse.ArgumentParser(description="c3dgs_tpu training")
    ModelParams.add_to_parser(parser, "model")
    OptimizationParams.add_to_parser(parser, "optimization")
    PipelineParams.add_to_parser(parser, "pipeline")
    parser.add_argument("--save_epochs", nargs="+", type=int, default=[])
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    model_p = ModelParams.extract(args).post_extract()
    opt_p = OptimizationParams.extract(args)
    pipe_p = PipelineParams.extract(args)
    if not model_p.model_path:
        model_p = type(model_p)(**{**model_p.to_dict(), "model_path": "./output/run"})
    os.makedirs(model_p.model_path, exist_ok=True)
    save_config(
        model_p.model_path,
        {"model": model_p, "optimization": opt_p, "pipeline": pipe_p},
    )
    training(
        model_p,
        opt_p,
        pipe_p,
        save_epochs=set(args.save_epochs),
        quantization=not opt_p.not_quantization_aware,
    )


if __name__ == "__main__":
    main()
