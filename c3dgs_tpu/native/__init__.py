"""Native codec bindings (ctypes) with lazy compilation + numpy fallback.

The shared library is built on first use with g++ (-O3). Everything here
has a pure-numpy fallback, so the framework works without a toolchain; the
native paths matter for 5M+-point COLMAP scenes and big Morton sorts.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "codec.cpp")
_LIB_PATH = os.path.join(_HERE, "libc3dgs_codec.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB_PATH],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception as e:  # no compiler / sandboxed build failure
        print(f"[c3dgs_tpu.native] build failed, using numpy fallbacks: {e}")
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(
        _SRC
    ):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.colmap_points3d_parse.restype = ctypes.c_longlong
        lib.colmap_points3d_parse.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_longlong,
            ctypes.c_int,
        ]
        lib.morton_order_f32.restype = None
        lib.morton_order_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_int),
        ]
        _lib = lib
    except OSError as e:
        print(f"[c3dgs_tpu.native] load failed, using numpy fallbacks: {e}")
    return _lib


def _cptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def read_points3d_binary(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fast COLMAP points3D.bin parser. Falls back to the numpy/struct
    parser in data/colmap.py."""
    lib = get_lib()
    if lib is None:
        from ..data import colmap

        return colmap.read_points3D_binary(path)
    n = lib.colmap_points3d_parse(path.encode(), None, None, None, 0, 1)
    if n < 0:
        raise FileNotFoundError(path)
    xyz = np.empty((n, 3), np.float64)
    rgb = np.empty((n, 3), np.uint8)
    err = np.empty(n, np.float64)
    got = lib.colmap_points3d_parse(
        path.encode(),
        _cptr(xyz, ctypes.c_double),
        _cptr(rgb, ctypes.c_uint8),
        _cptr(err, ctypes.c_double),
        n,
        0,
    )
    assert got == n, f"parsed {got}/{n} points"
    return xyz, rgb, err


def morton_order(xyz: np.ndarray) -> np.ndarray:
    """Native Morton-order permutation; numpy fallback in ops/morton.py."""
    lib = get_lib()
    if lib is None:
        from ..ops import morton

        return morton.morton_order(xyz)
    xyz32 = np.ascontiguousarray(xyz, np.float32)
    perm = np.empty(len(xyz32), np.int32)
    lib.morton_order_f32(
        _cptr(xyz32, ctypes.c_float), len(xyz32), _cptr(perm, ctypes.c_int)
    )
    return perm.astype(np.int64)
