"""Camera pose recovery: perturb a pose, optimize it back against the
rendered reference view (train_camera.py's experiment)."""
import math

import jax.numpy as jnp
import numpy as np

from c3dgs_tpu.models import gaussians as gmod
from c3dgs_tpu.render.types import RasterSettings
from c3dgs_tpu.train import camera_opt, trainer

SET = RasterSettings(
    width=48, height=48, tanfovx=math.tan(0.5), tanfovy=math.tan(0.5), sh_degree=0
)
BG = jnp.zeros(3)


def test_pose_recovery():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(150, 3)).astype(np.float32) * 0.6
    pts[:, 2] += 3.0
    cols = rng.random(size=(150, 3)).astype(np.float32)
    scene = gmod.from_point_cloud(pts, cols, capacity=150, quantization=False)

    ev_true = jnp.asarray([0, 0, 0, 1, 0, 0, 0], jnp.float32)
    gt = trainer.render_scene(scene, ev_true, SET, BG)["render"]

    ev0 = ev_true + jnp.asarray([0.01, -0.01, 0.005, 0, 0.05, -0.04, 0.02])

    def err(ev):
        img = trainer.render_scene(scene, ev, SET, BG)["render"]
        return float(jnp.abs(img - gt).mean())

    e_before = err(ev0)
    ev_opt, loss = camera_opt.optimize_camera(
        scene, ev0, gt, SET, iterations=150, lr=3e-3
    )
    e_after = err(ev_opt)
    assert e_after < 0.35 * e_before, (e_before, e_after)
    # translation recovered to ~1e-2
    assert float(jnp.abs(ev_opt[4:] - ev_true[4:]).max()) < 0.03


def test_anchor_penalty_keeps_pose_close():
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(80, 3)).astype(np.float32) * 0.5
    pts[:, 2] += 3.0
    cols = rng.random(size=(80, 3)).astype(np.float32)
    scene = gmod.from_point_cloud(pts, cols, capacity=80, quantization=False)
    ev0 = jnp.asarray([0, 0, 0, 1, 0, 0, 0], jnp.float32)
    gt = jnp.zeros((3, 48, 48))  # pulls pose away (black target)
    ev_free, _ = camera_opt.optimize_camera(
        scene, ev0, gt, SET, iterations=60, lr=1e-2
    )
    ev_anchored, _ = camera_opt.optimize_camera(
        scene, ev0, gt, SET, iterations=60, lr=1e-2, anchor=ev0, anchor_weight=100.0
    )
    drift_free = float(jnp.abs(ev_free - ev0).max())
    drift_anch = float(jnp.abs(ev_anchored - ev0).max())
    assert drift_anch < drift_free


def test_joint_step_updates_scene_and_pose():
    """Joint scene+pose training (train_no_splatting.py parity): one step
    moves both the stepped camera's extrinsic and the scene params; other
    cameras' extrinsics and Adam moments stay untouched."""
    from c3dgs_tpu.config import OptimizationParams
    from c3dgs_tpu.train import joint as J

    rng = np.random.default_rng(2)
    pts = rng.normal(size=(120, 3)).astype(np.float32) * 0.6
    pts[:, 2] += 3.0
    cols = rng.random(size=(120, 3)).astype(np.float32)
    scene = gmod.from_point_cloud(pts, cols, capacity=128, quantization=False)

    evs = np.stack(
        [np.asarray([0, 0, 0, 1, 0, 0, 0], np.float32) for _ in range(3)]
    )
    evs[1, 4] += 0.05  # perturb camera 1
    opt = OptimizationParams()
    xyz_before = np.array(np.asarray(scene.xyz), copy=True)
    js = J.create_joint_state(scene, opt, 1.0, evs)
    gt = trainer.render_scene(
        scene, jnp.asarray([0, 0, 0, 1, 0, 0, 0], jnp.float32), SET, BG
    )["render"]

    js2, metrics = J.joint_step(
        js, jnp.int32(1), gt, SET, BG, opt, 1.0, 1e-3, 0.5
    )
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["pose_delta"]) > 0
    # stepped camera moved, others untouched
    assert not np.allclose(np.asarray(js2.evs[1]), evs[1])
    np.testing.assert_array_equal(np.asarray(js2.evs[0]), evs[0])
    np.testing.assert_array_equal(np.asarray(js2.ev_m[2]), 0.0)
    assert float(js2.ev_t[1]) == 1.0 and float(js2.ev_t[0]) == 0.0
    # scene parameters advanced too
    assert not np.allclose(np.asarray(js2.train.scene.xyz), xyz_before)
    # quaternion stays normalized
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(js2.evs[1][:4])), 1.0, atol=1e-6
    )
