"""Training loop tests: loss decreases on a toy scene; densify/prune and
opacity reset behave; Adam moment surgery works."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from c3dgs_tpu.config import OptimizationParams
from c3dgs_tpu.models import gaussians as gmod
from c3dgs_tpu.render.types import RasterSettings
from c3dgs_tpu.train import densify as D
from c3dgs_tpu.train import trainer


def toy_scene(n=60, cap=96, seed=0, quantization=False):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 0.5
    pts[:, 2] += 3.0
    cols = rng.random(size=(n, 3)).astype(np.float32)
    return gmod.from_point_cloud(
        pts, cols, capacity=cap, quantization=quantization
    )


SET = RasterSettings(
    width=32, height=32, tanfovx=math.tan(0.5), tanfovy=math.tan(0.5), sh_degree=0
)
EV = jnp.asarray([0, 0, 0, 1, 0, 0, 0], jnp.float32)
BG = jnp.zeros(3)


def test_train_step_reduces_loss():
    scene = toy_scene()
    opt = OptimizationParams(lambda_dssim=0.2)
    state = trainer.create_train_state(scene, opt, spatial_lr_scale=1.0)
    # target: render of a perturbed copy
    target = trainer.render_scene(
        scene.replace(opacity=scene.opacity + 1.0), EV, SET, BG
    )["render"]
    losses = []
    for _ in range(25):
        state, metrics = trainer.train_step(state, EV, target, SET, BG, opt, 1.0)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < 0.7 * losses[0], losses[:3] + losses[-3:]
    assert np.isfinite(losses).all()


def test_densify_stats_and_step():
    scene = toy_scene()
    opt = OptimizationParams(percent_dense=0.01, densify_grad_threshold=1e-9)
    state = trainer.create_train_state(scene, opt, spatial_lr_scale=1.0)
    target = jnp.zeros((3, 32, 32))
    for _ in range(3):
        state, _ = trainer.train_step(state, EV, target, SET, BG, opt, 1.0)
    assert float(state.stats.denom.max()) > 0
    n_before = int(state.scene.num_active)
    state2, dropped = trainer.densify_step(state, 10.0, opt)
    n_after = int(state2.scene.num_active)
    # with a tiny threshold everything clones/splits until capacity is full
    assert n_after != n_before
    assert np.isfinite(np.asarray(state2.scene.xyz)).all()
    state2.scene.check_state()
    # the ARMED screen-size branch (train.py passes 20.0 after the first
    # opacity reset): regression for the TracerBoolConversionError that
    # only real >30-epoch runs reached (max_screen_size must be static)
    state3, _ = trainer.densify_step(state2, 10.0, opt, max_screen_size=20.0)
    assert np.isfinite(np.asarray(state3.scene.xyz)).all()
    state3.scene.check_state()


def test_prune_removes_transparent():
    scene = toy_scene()
    low_op = scene.opacity.at[:30].set(-12.0)  # sigmoid ~ 6e-6
    scene = scene.replace(opacity=low_op)
    stats = D.DensifyStats.zeros(scene.capacity)
    pruned = D.prune(scene, stats, min_opacity=0.005, extent=10.0, max_screen_size=None)
    assert int(pruned.num_active) == int(scene.num_active) - 30


def test_reset_opacity():
    scene = toy_scene()
    opt = OptimizationParams()
    state = trainer.create_train_state(scene, opt, spatial_lr_scale=1.0)
    state = trainer.reset_opacity_step(state)
    op = np.asarray(state.scene.get_opacity())
    active = np.asarray(state.scene.active)
    assert (op[active] <= 0.011).all()


def test_split_shrinks_children():
    scene = toy_scene()
    grads = jnp.full(scene.capacity, 1.0)
    key = jax.random.PRNGKey(0)
    before_sizes = np.asarray(scene.get_scaling())
    out, written, dropped, _ = D.densify_and_split(
        scene, grads, 0.5, scene_extent=1e-6, percent_dense=1.0, key=key
    )
    w = np.asarray(written)
    assert w.any()
    after = np.asarray(out.get_scaling())
    # children are 1/1.6x the parent scale
    med_before = np.median(np.linalg.norm(before_sizes[:60], axis=1))
    med_after = np.median(np.linalg.norm(after[w], axis=1))
    assert med_after < 0.8 * med_before


def test_capacity_growth_roundtrip():
    scene = toy_scene(n=60, cap=64)
    opt = OptimizationParams()
    state = trainer.create_train_state(scene, opt, 1.0)
    state = trainer.grow_capacity(state, 128)
    assert state.scene.capacity == 128
    target = jnp.zeros((3, 32, 32))
    state, metrics = trainer.train_step(state, EV, target, SET, BG, opt, 1.0)
    assert np.isfinite(float(metrics["loss"]))


def test_capacity_growth_preserves_adam_moments():
    """Growth must NOT reset existing splats' optimizer state — the
    reference zero-pads only the new rows (gaussian_model.py:1161-1185)."""
    scene = toy_scene(n=60, cap=64)
    opt = OptimizationParams()
    state = trainer.create_train_state(scene, opt, 1.0)
    target = jnp.zeros((3, 32, 32))
    for _ in range(3):
        state, _ = trainer.train_step(state, EV, target, SET, BG, opt, 1.0)
    adam_before, step_before = state.opt_state
    state = trainer.grow_capacity(state, 128)
    adam_after, step_after = state.opt_state
    assert int(step_after) == int(step_before)
    assert int(adam_after.count) == int(adam_before.count)
    for k in adam_before.mu:
        mu_b, mu_a = adam_before.mu[k], adam_after.mu[k]
        nu_b, nu_a = adam_before.nu[k], adam_after.nu[k]
        assert mu_a.shape[0] == 128 and nu_a.shape[0] == 128
        # existing rows preserved bit-exactly, new rows zero
        np.testing.assert_array_equal(np.asarray(mu_a[:64]), np.asarray(mu_b))
        np.testing.assert_array_equal(np.asarray(nu_a[:64]), np.asarray(nu_b))
        assert not np.any(np.asarray(mu_a[64:]))
        assert not np.any(np.asarray(nu_a[64:]))
    # moments after warm steps are actually nonzero for a field that gets
    # gradient at sh_degree=0 (the test would pass vacuously otherwise)
    assert np.any(np.asarray(adam_before.mu["xyz"]) != 0)
    # densify stats padded, not reset
    assert state.stats.denom.shape == (128,)
    # training continues finitely at the new capacity
    state, metrics = trainer.train_step(state, EV, target, SET, BG, opt, 1.0)
    assert np.isfinite(float(metrics["loss"]))


def test_epoch_schedule_matches_reference_recast():
    """train.py:30-43 of the reference converts iteration knobs to epochs
    with calc_epoch(i) = max(1, i * epoch_count // iterations). Check the
    standard config (30k iterations; e.g. 300-camera scene -> 100 epochs)
    and the max(1, .) floor on tiny runs."""
    import train as train_cli
    from c3dgs_tpu.config import OptimizationParams

    opt = OptimizationParams(epochs=100)
    s = train_cli.epoch_schedule(opt)
    assert s == {
        "densify_until_epoch": 50,  # 15000/30000 of the run
        "densify_from_epoch": 1,  # 500 iters, floored
        "densification_interval": 1,  # 100 iters, floored
        "opacity_reset_interval": 10,  # 3000/30000
        "degree_up": 3,  # 1000/30000
    }
    tiny = train_cli.epoch_schedule(OptimizationParams(epochs=2))
    assert all(v >= 1 for v in tiny.values())
