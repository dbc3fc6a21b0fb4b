"""End-to-end pipeline test (the minimum end-to-end slice, SURVEY.md §7.3):
synthetic Blender-format dataset on disk -> Scene loader -> training ->
compression -> npz -> reload -> eval. Exercises every layer through the real
file formats."""
import math
import os

import jax.numpy as jnp
import numpy as np
import pytest

from tests import synth


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("synth_scene"))
    scene, settings = synth.write_blender_dataset(out, res=48, num_train=8, num_test=2)
    return out, scene, settings


def test_scene_loader_reads_blender(dataset):
    out_dir, gt, settings = dataset
    from c3dgs_tpu.data import Scene

    scene = Scene(
        source_path=out_dir,
        model_path=os.path.join(out_dir, "model"),
        shuffle=False,
        max_sh_degree=3,
        quantization=False,
    )
    assert len(scene.get_train_cameras()) == 8
    assert len(scene.get_test_cameras()) == 2
    assert scene.gaussians is not None
    cam = scene.get_train_cameras()[0]
    img = cam.original_image
    assert img.shape == (3, 48, 48)
    assert scene.cameras_extent > 0


def test_training_improves_on_disk_dataset(dataset):
    out_dir, gt, _ = dataset
    from c3dgs_tpu.config import OptimizationParams
    from c3dgs_tpu.data import Scene
    from c3dgs_tpu.ops import losses as L
    from c3dgs_tpu.render.types import settings_from_intrinsic
    from c3dgs_tpu.train import trainer

    scene = Scene(
        source_path=out_dir,
        model_path=os.path.join(out_dir, "model2"),
        shuffle=False,
        max_sh_degree=3,
        quantization=False,
        capacity_multiplier=1.0,
    )
    opt = OptimizationParams()
    state = trainer.create_train_state(
        scene.gaussians, opt, scene.cameras_extent
    )
    bg = jnp.zeros(3)
    cams = scene.get_train_cameras()

    def mean_psnr(s):
        vals = []
        for cam in cams[:4]:
            st = settings_from_intrinsic(cam.intrinsic)
            out = trainer.render_scene(s, jnp.asarray(cam.extrinsic_vector), st, bg)
            vals.append(float(L.psnr(out["render"], jnp.asarray(cam.original_image))[0, 0]))
        return np.mean(vals)

    before = mean_psnr(state.scene)
    for step in range(30):
        cam = cams[step % len(cams)]
        st = settings_from_intrinsic(cam.intrinsic)
        state, m = trainer.train_step(
            state,
            jnp.asarray(cam.extrinsic_vector),
            jnp.asarray(cam.original_image),
            st,
            bg,
            opt,
            scene.cameras_extent,
        )
    after = mean_psnr(state.scene)
    assert after > before + 1.0, (before, after)


def test_compress_cli_roundtrip(dataset, tmp_path):
    """The full compress path against GT scene weights loaded from ply."""
    out_dir, gt, settings = dataset
    import dataclasses

    from c3dgs_tpu.compress.pipeline import to_compressed
    from c3dgs_tpu.config import CompressionParams
    from c3dgs_tpu.data.cameras import Camera, make_intrinsic
    from c3dgs_tpu.models import io_npz
    from c3dgs_tpu.ops import losses as L
    from c3dgs_tpu.train import trainer
    from tests.synth import ring_cameras

    # cameras wrapping the GT views
    cams = []
    import math as _m

    fov = 0.9
    for i, (ev, _) in enumerate(ring_cameras(4, radius=4.0)):
        intr = make_intrinsic(fov, fov, 48, 48)
        cam = Camera(
            uid=i,
            colmap_id=i,
            extrinsic_vector=ev,
            intrinsic=intr,
            image_name=f"r_{i}",
            image_path=os.path.join(out_dir, "train", f"r_{i}.png"),
        )
        cams.append(cam)

    # GT scene with quantization observers
    gtq = gt.replace(quantization=True).update_observers()
    comp = dataclasses.replace(
        CompressionParams(),
        color_codebook_size=32,
        gaussian_codebook_size=32,
        color_cluster_iterations=40,
        gaussian_cluster_iterations=60,
        color_batch_size=256,
        gaussian_batch_size=256,
        prune_threshold=0.0,
    )
    compressed = to_compressed(gtq, cams, comp, silent=True)
    compressed.check_state()

    npz = str(tmp_path / "pc.npz")
    saved = io_npz.save_npz(compressed, npz, sort_morton=True)
    loaded = io_npz.load_npz(npz, override_quantization=True)
    assert loaded.is_color_indexed and loaded.is_gaussian_indexed

    # quality sanity: compressed render still resembles GT render
    bg = jnp.zeros(3)
    img_gt = trainer.render_scene(gt, jnp.asarray(cams[0].extrinsic_vector), settings, bg)["render"]
    img_c = trainer.render_scene(loaded, jnp.asarray(cams[0].extrinsic_vector), settings, bg)["render"]
    psnr = float(L.psnr(img_c, img_gt)[0, 0])
    assert psnr > 18.0, psnr
    # compression actually happened: codebook smaller than splat count
    assert loaded.scaling.shape[0] < loaded.capacity
