"""ctypes binding for the native terrain toolkit (native/terrain_gen.cpp).

Builds the shared library on first use (``make`` in native/) and falls back
to the NumPy implementations in :mod:`terrain` when unavailable. The native
path matters for large grids (the default mini-cheetah map is 1800x2600
cells with a 50 m border) and provides the heightfield->trimesh conversion
(terrain_utils.convert_heightfield_to_trimesh parity, SURVEY.md N9).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libterrain_gen.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False

c_i16p = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
c_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
c_u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception as e:  # noqa: BLE001
            print(f"[terrain_native] build failed, using NumPy fallback: {e}")
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        print(f"[terrain_native] load failed, using NumPy fallback: {e}")
        return None

    lib.random_uniform_terrain.argtypes = [
        c_i16p, ctypes.c_int64, ctypes.c_int64, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_uint64]
    lib.pyramid_sloped_terrain.argtypes = [
        c_i16p, ctypes.c_int64, ctypes.c_int64, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, ctypes.c_double]
    lib.pyramid_stairs_terrain.argtypes = [
        c_i16p, ctypes.c_int64, ctypes.c_int64, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double]
    lib.discrete_obstacles_terrain.argtypes = [
        c_i16p, ctypes.c_int64, ctypes.c_int64, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, ctypes.c_int64, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, ctypes.c_uint64]
    lib.stepping_stones_terrain.argtypes = [
        c_i16p, ctypes.c_int64, ctypes.c_int64, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, ctypes.c_uint64]
    lib.heightfield_to_trimesh.argtypes = [
        c_i16p, ctypes.c_int64, ctypes.c_int64, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, c_f32p, c_u32p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def convert_heightfield_to_trimesh(
    height_field_raw: np.ndarray, horizontal_scale: float,
    vertical_scale: float, slope_threshold: float = 0.75,
) -> Tuple[np.ndarray, np.ndarray]:
    """Heightfield -> (vertices [V,3] f32, triangles [T,3] u32) with
    vertical-wall correction at steep slopes."""
    hf = np.ascontiguousarray(height_field_raw, np.int16)
    rows, cols = hf.shape
    vertices = np.empty((rows * cols, 3), np.float32)
    triangles = np.empty((2 * (rows - 1) * (cols - 1), 3), np.uint32)
    lib = _load()
    if lib is not None:
        lib.heightfield_to_trimesh(hf, rows, cols, horizontal_scale,
                                   vertical_scale, slope_threshold,
                                   vertices, triangles)
        return vertices, triangles
    # NumPy fallback
    x = np.arange(rows) * horizontal_scale
    y = np.arange(cols) * horizontal_scale
    xx, yy = np.meshgrid(x, y, indexing="ij")
    corr = slope_threshold * horizontal_scale / vertical_scale
    move_x = np.zeros_like(hf, np.float32)
    move_y = np.zeros_like(hf, np.float32)
    move_x[:-1][hf[1:] - hf[:-1] > corr] += horizontal_scale
    move_x[1:][hf[:-1] - hf[1:] > corr] -= horizontal_scale
    move_y[:, :-1][hf[:, 1:] - hf[:, :-1] > corr] += horizontal_scale
    move_y[:, 1:][hf[:, :-1] - hf[:, 1:] > corr] -= horizontal_scale
    vertices[:, 0] = (xx + move_x).ravel()
    vertices[:, 1] = (yy + move_y).ravel()
    vertices[:, 2] = (hf * vertical_scale).ravel()
    idx = np.arange(rows * cols, dtype=np.uint32).reshape(rows, cols)
    a = idx[:-1, :-1].ravel()
    b = idx[:-1, 1:].ravel()
    c = idx[1:, :-1].ravel()
    d = idx[1:, 1:].ravel()
    tri = np.empty((2 * a.size, 3), np.uint32)
    tri[0::2] = np.stack([a, c, b], -1)
    tri[1::2] = np.stack([b, c, d], -1)
    return vertices, tri
