"""Procedural synthetic dataset generator (no external datasets in the
zero-egress environment): a ground-truth Gaussian scene rendered from a ring
of cameras with the oracle renderer, written as a Blender-format dataset
(transforms_train.json + PNGs) so the full data->train->compress->eval stack
can run end-to-end."""
from __future__ import annotations

import json
import math
import os

import jax.numpy as jnp
import numpy as np

from c3dgs_tpu.models import gaussians as gmod
from c3dgs_tpu.ops import camera_math
from c3dgs_tpu.render.oracle import render_oracle
from c3dgs_tpu.render.types import RasterSettings


def gt_scene(n=400, seed=3):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 0.7
    cols = rng.random(size=(n, 3)).astype(np.float32)
    scene = gmod.from_point_cloud(pts, cols, capacity=n, quantization=False)
    scene = scene.replace(
        scaling_factor=scene.scaling_factor + math.log(1.6),
        opacity=jnp.asarray(
            rng.normal(size=(n, 1)).astype(np.float32) * 1.5 + 1.0
        ),
    )
    return scene


def ring_cameras(num=12, radius=4.0, height=1.2):
    """W2C extrinsic 7-vectors + c2w matrices looking at the origin."""
    cams = []
    for i in range(num):
        theta = 2 * math.pi * i / num
        eye = np.array(
            [radius * math.cos(theta), height, radius * math.sin(theta)]
        )
        fwd = -eye / np.linalg.norm(eye)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        true_up = np.cross(fwd, right)
        c2w = np.eye(4)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, true_up, fwd, eye
        w2c = np.linalg.inv(c2w)
        cams.append((np.asarray(camera_math.mat_to_extrinsic(w2c), np.float32), c2w))
    return cams


def write_blender_dataset(
    out_dir: str,
    res: int = 64,
    num_train: int = 12,
    num_test: int = 4,
    fov=0.9,
    scene=None,
    use_pallas: bool = False,
    radius: float = 4.0,
    init_noise: float = 0.05,
    init_subsample: int = 1,
):
    """Render GT views and write transforms_{train,test}.json + PNGs.
    Returns (gt_scene, settings). `use_pallas` renders GT with the tile
    rasterizer (needed for big scenes — the oracle's N-step scan is slow
    past a few thousand splats; they match to <5e-3, below PNG's 1/255
    quantization)."""
    from PIL import Image

    if scene is None:
        scene = gt_scene()
    settings = RasterSettings(
        width=res,
        height=res,
        tanfovx=math.tan(fov / 2),
        tanfovy=math.tan(fov / 2),
        sh_degree=scene.active_sh_degree,
    )
    bg = jnp.zeros(3)
    cov = scene.get_covariance()

    # ONE jitted render reused across views (ev is the only argument):
    # eager dispatch pays hundreds of tunneled round-trips per view —
    # measured ~2.5 min/view at 512p/60k on the remote backend, ~1 s jitted
    import jax as _jax

    if use_pallas:
        from c3dgs_tpu.render import rasterizer as _rast

        _render_fn = _rast.render
    else:
        _render_fn = render_oracle

    @_jax.jit
    def _render_jit(ev, xyz, cov_a, op, shs):
        # scene tensors ride as ARGUMENTS: closure constants at this size
        # can blow the tunneled remote-compile body limit (docs/PERF.md)
        return _render_fn(xyz, cov_a, op, ev, settings, bg, shs=shs)

    _args = (
        scene.get_xyz(),
        cov,
        scene.get_opacity()[:, 0],
        scene.get_features(),
    )

    def render(ev):
        return _render_jit(jnp.asarray(ev), *_args)

    for split, num, r in (
        ("train", num_train, radius),
        ("test", num_test, radius * 1.075),
    ):
        frames = []
        os.makedirs(os.path.join(out_dir, split), exist_ok=True)
        for i, (ev, c2w) in enumerate(ring_cameras(num, radius=r)):
            out = render(ev)
            img = np.clip(np.asarray(out["render"]), 0, 1)
            path = f"{split}/r_{i}.png"
            Image.fromarray(
                (img.transpose(1, 2, 0) * 255).astype(np.uint8)
            ).save(os.path.join(out_dir, path))
            # Blender json stores OpenGL-convention c2w (y,z flipped vs ours)
            c2w_gl = c2w.copy()
            c2w_gl[:3, 1:3] *= -1
            frames.append(
                {"file_path": path, "transform_matrix": c2w_gl.tolist()}
            )
        with open(os.path.join(out_dir, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": fov, "frames": frames}, f)
    # initial point cloud: noisy GT points
    from c3dgs_tpu.models import io_ply

    rng = np.random.default_rng(0)
    pts = np.asarray(scene.xyz) + rng.normal(size=(scene.capacity, 3)).astype(
        np.float32
    ) * init_noise
    cols = (np.clip(np.asarray(scene.features_dc)[:, 0] * 0.28 + 0.5, 0, 1) * 255).astype(
        np.uint8
    )
    if init_subsample > 1:  # SfM-like sparse init
        pts = pts[::init_subsample]
        cols = cols[::init_subsample]
    io_ply.write_vertices(
        os.path.join(out_dir, "points3d.ply"),
        {
            "x": pts[:, 0],
            "y": pts[:, 1],
            "z": pts[:, 2],
            "red": cols[:, 0],
            "green": cols[:, 1],
            "blue": cols[:, 2],
        },
    )
    return scene, settings
