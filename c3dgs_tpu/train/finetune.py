"""QAT finetuning of a compressed (indexed) scene through the renderer.

Parity: finetune.py:10-66 — random-camera SGD for comp.finetune_iterations
(default 5000) through the indexed render path; fake-quant observers keep
EMA-ing so the int8 ranges adapt; no densification; Adam with the training
LRs (xyz schedule continues from iteration 0).
"""
from __future__ import annotations

import random
import time
from typing import List, Optional

import jax

import jax.numpy as jnp
import numpy as np

from ..config import OptimizationParams
from ..models.gaussians import GaussianScene
from ..render.capacity import CapacityPolicy
from ..render.types import settings_from_intrinsic
from . import trainer


def finetune(
    scene: GaussianScene,
    cameras: List,
    opt: OptimizationParams,
    iterations: int,
    bg: Optional[np.ndarray] = None,
    spatial_lr_scale: float = 1.0,
    log_every: int = 500,
    seed: int = 0,
) -> GaussianScene:
    assert scene.is_color_indexed and scene.is_gaussian_indexed, (
        "finetune expects a compressed (indexed) scene"
    )
    bg = jnp.zeros(3) if bg is None else jnp.asarray(bg)
    # defensive copy: the jitted train step DONATES its state buffers, and
    # a compressed scene typically still aliases leaves of the caller's
    # uncompressed scene (to_compressed rewrites only some attributes).
    # Donation then deletes the caller's arrays — compress.py's
    # uncompressed-baseline eval crashed on exactly this ("Array has been
    # deleted"; surfaced as an opaque backend InvalidArgument in eager
    # mode). One copy of the scene is noise next to 5000 finetune steps.
    scene = jax.tree_util.tree_map(jnp.array, scene)
    state = trainer.create_train_state(scene, opt, spatial_lr_scale)
    rng = random.Random(seed)
    # adaptive instance/grad capacity: splats drift and inflate during QAT
    # finetuning, and at a fixed auto capacity an overflowing frame drops
    # instances, which corrupts training into a runaway (measured: PSNR
    # 45 -> 24 dB once instances crossed the static 8x-gaussians bound).
    # Seed the buckets from one probe render so the first steps don't ramp
    # through undersized buckets (each ramp step trains one clipped frame).
    probe_cam = cameras[0]
    # jitted: an eager render dispatches thousands of ops one-by-one
    # through the tunneled backend
    probe = jax.jit(trainer.render_scene, static_argnums=(2,))(
        scene,
        jnp.asarray(probe_cam.extrinsic_vector),
        settings_from_intrinsic(probe_cam.intrinsic),
        bg,
    )
    capacity = CapacityPolicy(
        initial=max(int(probe["num_instances"]) * 2, 1 << 18),
        grad_initial=int(probe["grad_total"]) * 2,
    )

    # group cameras by resolution so each bucket reuses one compiled step
    ema_loss = None
    t0 = time.time()
    for it in range(iterations):
        cam = rng.choice(cameras)
        settings = capacity.apply(settings_from_intrinsic(cam.intrinsic))
        gt = jnp.asarray(cam.original_image)
        state, metrics = trainer.train_step(
            state,
            jnp.asarray(cam.extrinsic_vector),
            gt,
            settings,
            bg,
            opt,
            spatial_lr_scale,
        )
        capacity.update(
            int(metrics["num_instances"]),
            int(metrics["overflow"]),
            int(metrics["grad_total"]),
            int(metrics["grad_overflow"]),
        )
        loss = float(metrics["loss"])
        ema_loss = loss if ema_loss is None else 0.6 * ema_loss + 0.4 * loss
        if log_every and (it % log_every == 0 or it == iterations - 1):
            print(
                f"[finetune {it}/{iterations}] loss={loss:.4f} "
                f"ema={ema_loss:.4f} psnr={float(metrics['psnr']):.2f} "
                f"inst={int(metrics['num_instances'])} "
                f"ovf={int(metrics['overflow'])} "
                f"({time.time() - t0:.1f}s)"
            )
    return state.scene
