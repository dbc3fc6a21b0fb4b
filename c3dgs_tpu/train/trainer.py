"""Training: optax-based Adam with per-attribute LRs, jitted train step,
densify scheduling, epoch loop.

Parity: GaussianModel.training_setup (gaussian_model.py:292-314: per-group
LRs, Adam eps 1e-15, expon xyz schedule :316-322) and the fork's epoch
trainer train.py:15-173 (L1+λ(1−SSIM) loss :76-79, cov3d de-scale trick for
sensitivity :62-67, per-epoch densify schedule :161-170, SH warmup :172).

TPU re-design:
- parameters are a flat dict pytree; Adam state lives in optax
  ScaleByAdamState whose moments we mask directly where the reference does
  optimizer-dict surgery (gaussian_model.py:1061-1185);
- one jitted `train_step` per (capacity, resolution) bucket: forward,
  loss, backward, Adam update, observer update, densify-stats update;
- densification runs jitted at fixed capacity; the host grows capacity
  (pad_to_capacity) when the dropped-write counter reports starvation.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import OptimizationParams
from ..models.gaussians import GaussianScene
from ..ops import losses as L
from ..ops import misc
from ..render.rasterizer import render
from ..render.types import RasterSettings
from . import densify as D

PARAM_FIELDS = (
    "xyz",
    "features_dc",
    "features_rest",
    "opacity",
    "scaling",
    "scaling_factor",
    "rotation",
)


def scene_params(scene: GaussianScene) -> dict:
    p = {k: getattr(scene, k) for k in PARAM_FIELDS}
    if scene.scaling_factor is None:
        p.pop("scaling_factor")
    return p


def with_params(scene: GaussianScene, params: dict) -> GaussianScene:
    return scene.replace(**params)


def make_lr_schedules(opt: OptimizationParams, spatial_lr_scale: float) -> dict:
    """Per-attribute LR schedules (gaussian_model.py:297-314)."""
    xyz_sched = misc.get_expon_lr_func(
        lr_init=opt.position_lr_init * spatial_lr_scale,
        lr_final=opt.position_lr_final * spatial_lr_scale,
        lr_delay_mult=opt.position_lr_delay_mult,
        max_steps=opt.position_lr_max_steps,
    )
    const = lambda v: (lambda step: jnp.float32(v))
    return {
        "xyz": xyz_sched,
        "features_dc": const(opt.feature_lr),
        "features_rest": const(opt.feature_lr / 20.0),
        "opacity": const(opt.opacity_lr),
        "scaling": const(opt.scaling_lr),
        "scaling_factor": const(opt.scaling_lr),
        "rotation": const(opt.rotation_lr),
    }


def make_optimizer(opt: OptimizationParams, spatial_lr_scale: float):
    """Adam(eps=1e-15) + per-leaf LR scaling (a GradientTransformation)."""
    schedules = make_lr_schedules(opt, spatial_lr_scale)
    adam = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-15)

    def init_fn(params):
        return (adam.init(params), jnp.zeros((), jnp.int32))

    def update_fn(updates, state, params=None):
        adam_state, step = state
        updates, adam_state = adam.update(updates, adam_state, params)
        scaled = {
            k: -schedules[k](step) * u for k, u in updates.items()
        }
        return scaled, (adam_state, step + 1)

    return optax.GradientTransformation(init_fn, update_fn)


class TrainState(NamedTuple):
    scene: GaussianScene
    opt_state: Any
    stats: D.DensifyStats
    key: jax.Array
    step: jax.Array


def create_train_state(
    scene: GaussianScene,
    opt: OptimizationParams,
    spatial_lr_scale: float,
    seed: int = 0,
) -> TrainState:
    tx = make_optimizer(opt, spatial_lr_scale)
    return TrainState(
        scene=scene,
        opt_state=tx.init(scene_params(scene)),
        stats=D.DensifyStats.zeros(scene.capacity),
        key=jax.random.PRNGKey(seed),
        step=jnp.zeros((), jnp.int32),
    )


# indexed scenes at/above this capacity evaluate SH colors block-wise from
# the codebook instead of materializing dense (P, K, 3) SH (~960 MB at 5M
# splats; ops/sh.py sh_to_rgb_indexed_blocked)
BLOCKED_COLORS_MIN = 1 << 20


def render_scene(
    scene: GaussianScene,
    extrinsic_vector: jax.Array,
    settings: RasterSettings,
    bg: jax.Array,
    viewspace_offset: Optional[jax.Array] = None,
    cov3d: Optional[jax.Array] = None,
    scaling_modifier: float = 1.0,
    blocked_colors: Optional[bool] = None,
):
    """GaussianModel.render equivalent on a GaussianScene
    (gaussian_model.py:766-886): accessors -> rasterize.

    blocked_colors: for codebook-indexed scenes, compute per-splat RGB
    block-wise from the (C, K, 3) codebook instead of de-indexing to dense
    SH first (the reference's in-kernel indexed gather re-designed for XLA,
    forward_indexed.cu:226). None = auto (on at >= BLOCKED_COLORS_MIN)."""
    settings = settings_with_degree(settings, scene.active_sh_degree)
    cov = scene.get_covariance(scaling_modifier) if cov3d is None else cov3d
    use_blocked = scene.is_color_indexed and (
        blocked_colors
        or (blocked_colors is None and scene.capacity >= BLOCKED_COLORS_MIN)
    )
    shs = colors = None
    if use_blocked:
        from ..ops import camera_math, sh as sh_ops

        xyz = scene.get_xyz()
        cam_pos = camera_math.camera_center_from_extrinsic(extrinsic_vector)
        dirs = xyz - cam_pos
        # same guarded normalization as preprocess (NaN-free padded rows)
        dirs = dirs * jax.lax.rsqrt(
            jnp.sum(dirs * dirs, axis=-1, keepdims=True) + 1e-20
        )
        colors = sh_ops.sh_to_rgb_indexed_blocked(
            settings.sh_degree,
            scene.get_features_raw(),
            scene.feature_indices,
            dirs,
            clamp_color=settings.clamp_color,
        )
    else:
        shs = scene.get_features()
    return render(
        scene.get_xyz(),
        cov,
        scene.get_opacity()[:, 0],
        extrinsic_vector,
        settings,
        bg,
        shs=shs,
        colors_precomp=colors,
        viewspace_offset=viewspace_offset,
    )


def settings_with_degree(settings: RasterSettings, degree: int) -> RasterSettings:
    import dataclasses

    if settings.sh_degree == degree:
        return settings
    return dataclasses.replace(settings, sh_degree=degree)


@functools.partial(
    jax.jit, static_argnums=(3, 5, 6), donate_argnums=(0,)
)
def train_step(
    state: TrainState,
    extrinsic_vector: jax.Array,
    gt_image: jax.Array,
    settings: RasterSettings,
    bg: jax.Array,
    opt: OptimizationParams = OptimizationParams(),
    spatial_lr_scale: float = 1.0,
) -> Tuple[TrainState, dict]:
    """One optimization step (train.py:58-106): render -> photometric loss
    -> grads -> Adam -> observer EMA -> densify stats."""
    scene0 = state.scene.update_observers()
    params = scene_params(scene0)
    vs = jnp.zeros((scene0.capacity, 2), jnp.float32)

    def loss_fn(params, vs):
        scene = with_params(scene0, params)
        out = render_scene(scene, extrinsic_vector, settings, bg, viewspace_offset=vs)
        loss = L.photometric_loss(out["render"], gt_image, opt.lambda_dssim)
        return loss, out

    (loss, out), (grads, vs_grad) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True
    )(params, vs)

    tx = make_optimizer(opt, spatial_lr_scale)  # pure fns, safe to rebuild
    updates, opt_state = tx.update(grads, state.opt_state, params)
    params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    scene = with_params(scene0, params)

    stats = D.add_densification_stats(state.stats, vs_grad, out["radii"])
    new_state = TrainState(
        scene=scene,
        opt_state=opt_state,
        stats=stats,
        key=state.key,
        step=state.step + 1,
    )
    metrics = {
        "loss": loss,
        "psnr": L.psnr(out["render"], gt_image)[0, 0],
        "num_instances": out["num_instances"],
        "overflow": out["overflow"],
        "grad_total": out["grad_total"],
        "grad_overflow": out["grad_overflow"],
    }
    return new_state, metrics


def grow_capacity(state: TrainState, new_capacity: int) -> TrainState:
    """Grow the row budget WITHOUT resetting optimizer state.

    The reference zero-pads exp_avg/exp_avg_sq alongside the new parameter
    rows (cat_tensors_to_optimizer, gaussian_model.py:1161-1185) so existing
    splats keep their Adam moments; this is the functional equivalent:
    pad scene rows (inactive), zero-pad mu/nu leaves, zero-pad densify
    stats, preserve Adam count/step."""
    cur = state.scene.capacity
    extra = new_capacity - cur
    if extra <= 0:
        return state
    scene = state.scene.pad_to_capacity(new_capacity)

    def pad_leaf(v):
        widths = [(0, extra)] + [(0, 0)] * (v.ndim - 1)
        return jnp.pad(v, widths)

    adam_state, step = state.opt_state
    adam_state = adam_state._replace(
        mu={k: pad_leaf(v) for k, v in adam_state.mu.items()},
        nu={k: pad_leaf(v) for k, v in adam_state.nu.items()},
    )
    stats = D.DensifyStats(
        xyz_gradient_accum=pad_leaf(state.stats.xyz_gradient_accum),
        denom=pad_leaf(state.stats.denom),
        max_radii2d=pad_leaf(state.stats.max_radii2d),
    )
    return state._replace(scene=scene, opt_state=(adam_state, step), stats=stats)


def zero_moments_at(opt_state, written: jax.Array, fields=None):
    """Zero Adam moments for rewritten slots (the functional analog of the
    reference's optimizer surgery, gaussian_model.py:1061-1185)."""
    adam_state, step = opt_state

    def mask_tree(tree):
        out = {}
        for k, v in tree.items():
            if fields is not None and k not in fields:
                out[k] = v
            else:
                mask = written.reshape((-1,) + (1,) * (v.ndim - 1))
                out[k] = jnp.where(mask, 0.0, v)
        return out

    adam_state = adam_state._replace(
        mu=mask_tree(adam_state.mu), nu=mask_tree(adam_state.nu)
    )
    return (adam_state, step)


@functools.partial(
    jax.jit,
    static_argnums=(2,),
    # max_screen_size is None until the first opacity reset, then a fixed
    # 20.0 (train.py:164): TWO compilations, and prune's `if
    # max_screen_size` stays a python branch (tracing it was a
    # TracerBoolConversionError the test scenes never reached — the
    # screen-size arm only fires deep into real training)
    static_argnames=("max_screen_size", "min_opacity"),
    donate_argnums=(0,),
)
def densify_step(
    state: TrainState,
    extent: float | jax.Array,
    opt: OptimizationParams,
    max_screen_size: Optional[float] = None,
    min_opacity: float = 0.005,
):
    """Jitted ADC step + Adam-moment reset for rewritten slots."""
    scene, written, stats, dropped, key = D.densify_and_prune(
        state.scene,
        state.stats,
        state.key,
        max_grad=opt.densify_grad_threshold,
        min_opacity=min_opacity,
        extent=extent,
        max_screen_size=max_screen_size,
        percent_dense=opt.percent_dense,
    )
    opt_state = zero_moments_at(state.opt_state, written)
    return (
        TrainState(scene, opt_state, stats, key, state.step),
        dropped,
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def reset_opacity_step(state: TrainState) -> TrainState:
    """reset_opacity + zero its Adam moments
    (gaussian_model.py:1391 + replace_tensor_to_optimizer :1061)."""
    scene = D.reset_opacity(state.scene)
    opt_state = zero_moments_at(
        state.opt_state, jnp.ones(scene.capacity, bool), fields={"opacity"}
    )
    return state._replace(scene=scene, opt_state=opt_state)
