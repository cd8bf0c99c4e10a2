"""Native C++ geometry runtime (ctypes bindings).

Builds `libslamgeom.so` from src/geometry.cpp on first use (g++ -O3) and
exposes:
  - delaunay(points_xy) -> (T, 3) int32 triangles
  - knn(points_xyz, queries_xyz, k) -> (M, k) int32 neighbor indices
  - distribute_quadtree(uv, response, bounds, n_target) -> kept indices

These are the host-side native replacements for the reference's PCL
(meshing/KD-tree) and quadtree keypoint distribution; ops/fem.py uses
`delaunay` when available and falls back to scipy otherwise.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "src" / "geometry.cpp"
_LIB = _HERE / "libslamgeom.so"

_lib = None
_tried = False


def _build():
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           str(_SRC), "-o", str(_LIB)]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            _build()
        lib = ctypes.CDLL(str(_LIB))
        lib.delaunay_triangulate.restype = ctypes.c_int
        lib.delaunay_triangulate.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int]
        lib.knn_query.restype = None
        lib.knn_query.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.POINTER(ctypes.c_int)]
        lib.distribute_quadtree.restype = ctypes.c_int
        lib.distribute_quadtree.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def delaunay(points_xy: np.ndarray) -> "np.ndarray | None":
    """2D Delaunay triangulation -> (T, 3) int32, or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points_xy, np.float32)
    n = len(pts)
    max_tris = 4 * n + 16
    out = np.empty((max_tris, 3), np.int32)
    cnt = lib.delaunay_triangulate(_fptr(pts), n, _iptr(out), max_tris)
    if cnt < 0:
        return None
    return out[:cnt].copy()


def knn(points: np.ndarray, queries: np.ndarray, k: int,
        cell: float = 0.5) -> "np.ndarray | None":
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    q = np.ascontiguousarray(queries, np.float32)
    out = np.empty((len(q), k), np.int32)
    lib.knn_query(_fptr(pts), len(pts), _fptr(q), len(q), k,
                  ctypes.c_float(cell), _iptr(out))
    return out


def distribute_quadtree(uv: np.ndarray, response: np.ndarray,
                        bounds, n_target: int) -> "np.ndarray | None":
    lib = get_lib()
    if lib is None:
        return None
    uvf = np.ascontiguousarray(uv, np.float32)
    rf = np.ascontiguousarray(response, np.float32)
    keep = np.empty((n_target,), np.int32)
    x0, y0, x1, y1 = bounds
    cnt = lib.distribute_quadtree(_fptr(uvf), _fptr(rf), len(uvf),
                                  x0, y0, x1, y1, n_target, _iptr(keep))
    return keep[:cnt].copy()
