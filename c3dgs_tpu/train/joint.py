"""Joint scene + camera-pose training — the reference's train_no_splatting.py.

The reference's "no splatting" trainer (train_no_splatting.py:1-283) is an
epoch trainer that (a) optimizes every camera's 7-vector quaternion
extrinsic jointly with the scene, an anchor penalty exp(|orig-cur|)*w
keeping poses near their initialization (train_no_splatting.py:120-122),
and (b) renders through the Python markVisible path (is_splitted=False,
train_no_splatting.py:21). In the TPU build, visibility masking is inherent
to preprocess (radius 0 culls a splat), so the distinguishing capability is
the JOINT optimization; pose gradients come from jax.grad through
ops/camera_math.extrinsic_to_mat instead of the reference's sympy-generated
Jacobians (…no_camera/__init__.py:679-788).

Per-camera Adam state is carried as (C, 7) moment arrays and only the
stepped camera's row advances — equivalent to the reference's one optimizer
per camera extrinsic (train_no_splatting.py:56-66 analog).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import OptimizationParams
from ..models.gaussians import GaussianScene
from ..ops import losses as L
from . import trainer


class JointTrainState(NamedTuple):
    train: trainer.TrainState
    evs: jax.Array  # (C, 7) current extrinsics
    anchors: jax.Array  # (C, 7) initial extrinsics (anchor penalty target)
    ev_m: jax.Array  # (C, 7) Adam first moments
    ev_v: jax.Array  # (C, 7) Adam second moments
    ev_t: jax.Array  # (C,) f32 per-camera step counts


def create_joint_state(
    scene: GaussianScene,
    opt: OptimizationParams,
    spatial_lr_scale: float,
    extrinsics,
    seed: int = 0,
) -> JointTrainState:
    evs = jnp.asarray(extrinsics, jnp.float32)
    return JointTrainState(
        train=trainer.create_train_state(scene, opt, spatial_lr_scale, seed),
        evs=evs,
        anchors=jnp.array(evs, copy=True),
        ev_m=jnp.zeros_like(evs),
        ev_v=jnp.zeros_like(evs),
        ev_t=jnp.zeros(evs.shape[0], jnp.float32),
    )


@functools.partial(
    jax.jit, static_argnums=(3, 5, 6, 7, 8), donate_argnums=(0,)
)
def joint_step(
    js: JointTrainState,
    cam_idx: jax.Array,
    gt_image: jax.Array,
    settings,
    bg: jax.Array,
    opt: OptimizationParams = OptimizationParams(),
    spatial_lr_scale: float = 1.0,
    pose_lr: float = 1e-4,
    anchor_weight: float = 0.0,
):
    """One joint step on (scene params, camera cam_idx's extrinsic)."""
    state = js.train
    scene0 = state.scene.update_observers()
    params = trainer.scene_params(scene0)
    ev = js.evs[cam_idx]
    anchor = js.anchors[cam_idx]
    vs = jnp.zeros((scene0.capacity, 2), jnp.float32)

    def loss_fn(params, ev, vs):
        scene = trainer.with_params(scene0, params)
        out = trainer.render_scene(
            scene, ev, settings, bg, viewspace_offset=vs
        )
        loss = L.photometric_loss(out["render"], gt_image, opt.lambda_dssim)
        if anchor_weight > 0:
            # anchor penalty (train_no_splatting.py:120-122)
            loss = loss + anchor_weight * jnp.mean(
                jnp.exp(jnp.abs(anchor - ev)) - 1.0
            )
        return loss, out

    (loss, out), (grads, g_ev, vs_grad) = jax.value_and_grad(
        loss_fn, argnums=(0, 1, 2), has_aux=True
    )(params, ev, vs)

    tx = trainer.make_optimizer(opt, spatial_lr_scale)
    updates, opt_state = tx.update(grads, state.opt_state, params)
    params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)

    # per-camera Adam on the stepped extrinsic only
    t = js.ev_t[cam_idx] + 1.0
    m = 0.9 * js.ev_m[cam_idx] + 0.1 * g_ev
    v = 0.999 * js.ev_v[cam_idx] + 0.001 * g_ev * g_ev
    m_hat = m / (1.0 - 0.9**t)
    v_hat = v / (1.0 - 0.999**t)
    ev = ev - pose_lr * m_hat / (jnp.sqrt(v_hat) + 1e-8)
    q = ev[:4] / jnp.maximum(jnp.linalg.norm(ev[:4]), 1e-12)
    ev = jnp.concatenate([q, ev[4:]])

    from . import densify as D

    stats = D.add_densification_stats(state.stats, vs_grad, out["radii"])
    new_train = trainer.TrainState(
        scene=trainer.with_params(scene0, params),
        opt_state=opt_state,
        stats=stats,
        key=state.key,
        step=state.step + 1,
    )
    new_js = JointTrainState(
        train=new_train,
        evs=js.evs.at[cam_idx].set(ev),
        anchors=js.anchors,
        ev_m=js.ev_m.at[cam_idx].set(m),
        ev_v=js.ev_v.at[cam_idx].set(v),
        ev_t=js.ev_t.at[cam_idx].set(t),
    )
    metrics = {
        "loss": loss,
        "psnr": L.psnr(out["render"], gt_image)[0, 0],
        "num_instances": out["num_instances"],
        "overflow": out["overflow"],
        "grad_total": out["grad_total"],
        "grad_overflow": out["grad_overflow"],
        "pose_delta": jnp.max(jnp.abs(ev - anchor)),
    }
    return new_js, metrics
