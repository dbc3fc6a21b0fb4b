"""Checkpoint round-trip: TrainState -> npz -> TrainState, training resumes
bit-compatibly."""
import math

import jax.numpy as jnp
import numpy as np

from c3dgs_tpu.config import OptimizationParams
from c3dgs_tpu.models import gaussians as gmod
from c3dgs_tpu.render.types import RasterSettings
from c3dgs_tpu.train import checkpoint, trainer

SET = RasterSettings(
    width=32, height=32, tanfovx=math.tan(0.5), tanfovy=math.tan(0.5), sh_degree=0
)
EV = jnp.asarray([0, 0, 0, 1, 0, 0, 0], jnp.float32)
BG = jnp.zeros(3)


def toy_state(quantization=True):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(50, 3)).astype(np.float32) * 0.5
    pts[:, 2] += 3.0
    cols = rng.random(size=(50, 3)).astype(np.float32)
    scene = gmod.from_point_cloud(pts, cols, capacity=64, quantization=quantization)
    opt = OptimizationParams()
    return trainer.create_train_state(scene, opt, 1.0), opt


def test_checkpoint_roundtrip_resumes_identically(tmp_path):
    state, opt = toy_state()
    target = jnp.full((3, 32, 32), 0.3)
    for _ in range(3):
        state, _ = trainer.train_step(state, EV, target, SET, BG, opt, 1.0)

    p = str(tmp_path / "ckpt.npz")
    checkpoint.save_checkpoint(p, state)
    restored = checkpoint.load_checkpoint(p, opt, 1.0)

    assert int(restored.step) == int(state.step)
    np.testing.assert_allclose(
        np.asarray(restored.scene.xyz), np.asarray(state.scene.xyz)
    )
    # one more step from each must agree exactly
    s1, m1 = trainer.train_step(state, EV, target, SET, BG, opt, 1.0)
    s2, m2 = trainer.train_step(restored, EV, target, SET, BG, opt, 1.0)
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-7
    np.testing.assert_allclose(
        np.asarray(s1.scene.xyz), np.asarray(s2.scene.xyz), atol=1e-7
    )
    # adam moments survived
    np.testing.assert_allclose(
        np.asarray(s1.opt_state[0].mu["xyz"]),
        np.asarray(s2.opt_state[0].mu["xyz"]),
        atol=1e-7,
    )


def test_checkpoint_indexed_scene(tmp_path):
    state, opt = toy_state()
    state = state._replace(scene=state.scene.to_indexed())
    state = trainer.create_train_state(state.scene, opt, 1.0)
    p = str(tmp_path / "ckpt_idx.npz")
    checkpoint.save_checkpoint(p, state)
    restored = checkpoint.load_checkpoint(p, opt, 1.0)
    assert restored.scene.is_color_indexed
    np.testing.assert_array_equal(
        np.asarray(restored.scene.feature_indices),
        np.asarray(state.scene.feature_indices),
    )
