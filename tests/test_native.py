"""Native codec tests: C++ results must match the numpy reference paths."""
import struct

import numpy as np
import pytest

from c3dgs_tpu import native
from c3dgs_tpu.data import colmap
from c3dgs_tpu.ops import morton


def write_points3d_bin(path, xyz, rgb, err, track_lens):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(xyz)))
        for i in range(len(xyz)):
            f.write(struct.pack("<Q", i + 1))
            f.write(struct.pack("<ddd", *xyz[i]))
            f.write(struct.pack("<BBB", *rgb[i]))
            f.write(struct.pack("<d", err[i]))
            f.write(struct.pack("<Q", track_lens[i]))
            for t in range(track_lens[i]):
                f.write(struct.pack("<ii", t, t * 2))


@pytest.fixture
def points_file(tmp_path, rng):
    n = 500
    xyz = rng.normal(size=(n, 3))
    rgb = rng.integers(0, 256, (n, 3)).astype(np.uint8)
    err = rng.random(n)
    tracks = rng.integers(0, 6, n)
    p = str(tmp_path / "points3D.bin")
    write_points3d_bin(p, xyz, rgb, err, tracks)
    return p, xyz, rgb, err


def test_numpy_colmap_parser(points_file):
    p, xyz, rgb, err = points_file
    x2, r2, e2 = colmap.read_points3D_binary(p)
    np.testing.assert_allclose(x2, xyz)
    np.testing.assert_array_equal(r2, rgb)
    np.testing.assert_allclose(e2, err)


def test_native_colmap_parser_matches(points_file):
    if native.get_lib() is None:
        pytest.skip("no native toolchain")
    p, xyz, rgb, err = points_file
    x2, r2, e2 = native.read_points3d_binary(p)
    np.testing.assert_allclose(x2, xyz)
    np.testing.assert_array_equal(r2, rgb)
    np.testing.assert_allclose(e2, err)


def test_native_morton_matches_numpy(rng):
    if native.get_lib() is None:
        pytest.skip("no native toolchain")
    xyz = rng.random(size=(2000, 3)).astype(np.float32) * 10 - 5
    a = native.morton_order(xyz)
    b = morton.morton_order(xyz)
    np.testing.assert_array_equal(a, b)
