"""densify_initial: sparse clouds get thickened along neighbor rays."""
import numpy as np
import jax.numpy as jnp

from c3dgs_tpu.models import gaussians as gmod
from c3dgs_tpu.train.densify_initial import densify_initial


def test_densify_initial_adds_points(rng):
    # widely spaced cluster pairs -> long neighbor rays -> insertions
    base = rng.normal(size=(40, 3)).astype(np.float32) * 5.0
    scene = gmod.from_point_cloud(base, None, capacity=64, quantization=False)
    out = densify_initial(scene, dist_thr_coeff=0.5)
    assert int(out.num_active) > 40
    out.check_state()
    # new points lie within the original bbox (interpolations)
    xyz = np.asarray(out.xyz)[np.asarray(out.active)]
    assert xyz.min() >= base.min() - 1e-4
    assert xyz.max() <= base.max() + 1e-4


def test_densify_initial_dense_cloud_noop(rng):
    # densely packed points: no neighbor exceeds the average step
    base = rng.normal(size=(100, 3)).astype(np.float32) * 0.01
    scene = gmod.from_point_cloud(base, None, capacity=128, quantization=False)
    out = densify_initial(scene, dist_thr_coeff=10.0)
    assert int(out.num_active) == 100
