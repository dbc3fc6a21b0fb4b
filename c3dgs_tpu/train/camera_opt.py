"""Camera-pose optimization against a frozen scene.

Parity: train_camera.py (:1-197) — perturb a camera's 7-vector extrinsic,
then Adam on the extrinsic alone until the photometric loss against the
reference view recovers the pose. The reference needed a dedicated
"indexed-camera" rasterizer with sympy-generated pose Jacobians
(…no_camera/__init__.py:537-866); here the pose is just a differentiated
input of the render function, so this module is ~60 lines.

Also covers train_no_splatting.py's joint camera+scene mode (:120-122):
optional anchor penalty exp(|orig - cur|)*weight keeping poses near their
initialization.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.gaussians import GaussianScene
from ..ops import losses as L
from ..render.types import RasterSettings
from . import trainer


@functools.partial(jax.jit, static_argnums=(4, 6, 8), donate_argnums=(1, 2))
def camera_step(
    scene: GaussianScene,
    extrinsic_vector: jax.Array,
    opt_state,
    gt_image: jax.Array,
    settings: RasterSettings,
    bg: jax.Array,
    lr: float = 1e-3,
    anchor: Optional[jax.Array] = None,
    anchor_weight: float = 0.0,  # static
) -> Tuple[jax.Array, object, jax.Array]:
    """One Adam step on the camera extrinsic. Returns (new_ev, opt_state,
    loss)."""

    def loss_fn(ev):
        out = trainer.render_scene(scene, ev, settings, bg)
        loss = L.photometric_loss(out["render"], gt_image)
        if anchor is not None and anchor_weight > 0:
            # anchor penalty (train_no_splatting.py:120-122)
            loss = loss + anchor_weight * jnp.mean(
                jnp.exp(jnp.abs(anchor - ev)) - 1.0
            )
        return loss

    loss, grad = jax.value_and_grad(loss_fn)(extrinsic_vector)
    tx = optax.adam(lr)
    updates, opt_state = tx.update(grad, opt_state, extrinsic_vector)
    ev = optax.apply_updates(extrinsic_vector, updates)
    # re-normalize the quaternion part
    q = ev[:4] / jnp.maximum(jnp.linalg.norm(ev[:4]), 1e-12)
    ev = jnp.concatenate([q, ev[4:]])
    return ev, opt_state, loss


def optimize_camera(
    scene: GaussianScene,
    initial_ev,
    gt_image,
    settings: RasterSettings,
    bg=None,
    iterations: int = 200,
    lr: float = 1e-3,
    anchor=None,
    anchor_weight: float = 0.0,
    log_every: int = 0,
):
    """Optimize a single camera pose (train_camera.py's inner loop)."""
    # force a copy: the step donates ev, and the caller's initial pose may
    # also be passed as the anchor
    ev = jnp.array(initial_ev, jnp.float32, copy=True)
    bg = jnp.zeros(3) if bg is None else jnp.asarray(bg)
    gt = jnp.asarray(gt_image)
    opt_state = optax.adam(lr).init(ev)
    anchor = None if anchor is None else jnp.asarray(anchor, jnp.float32)
    for it in range(iterations):
        ev, opt_state, loss = camera_step(
            scene, ev, opt_state, gt, settings, bg, lr, anchor, anchor_weight
        )
        if log_every and it % log_every == 0:
            print(f"[camera {it}] loss={float(loss):.5f}")
    return ev, float(loss)
