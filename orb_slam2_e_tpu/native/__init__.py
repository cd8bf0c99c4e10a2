"""Native C++ host runtime (ctypes bindings).

Builds `libslamgeom.so` from src/geometry.cpp and `libslamio.so` from
src/imageio.cpp on first use (g++ -O3) and exposes:
  - delaunay(points_xy) -> (T, 3) int32 triangles
  - knn(points_xyz, queries_xyz, k) -> (M, k) int32 neighbor indices
  - read_gray8/read_u16(path) -> np arrays (libpng decode)
  - ImagePrefetcher(paths, ...) -> ordered multi-threaded frame loader

These are the host-side native replacements for the reference's PCL
(meshing/KD-tree — `delaunay` feeds the FEM mesh, `knn` selects the
untracked landmarks for mode-2 deformation propagation) and cv::imread
dataset IO; ops/fem.py falls back to scipy when the lib is unavailable,
utils/datasets falls back to cv2/PIL.
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


# ---------------------------------------------------------------------------
# Native image IO (libpng) + prefetching dataset loader
# ---------------------------------------------------------------------------

_IO_SRC = _HERE / "src" / "imageio.cpp"
_IO_LIB = _HERE / "libslamio.so"
_io_lib = None
_io_tried = False


def get_io_lib():
    global _io_lib, _io_tried
    if _io_lib is not None or _io_tried:
        return _io_lib
    _io_tried = True
    try:
        if not _IO_LIB.exists() or \
                _IO_LIB.stat().st_mtime < _IO_SRC.stat().st_mtime:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-std=c++17", str(_IO_SRC), "-o", str(_IO_LIB),
                 "-lpng", "-lz", "-lpthread"],
                check=True, capture_output=True)
        lib = ctypes.CDLL(str(_IO_LIB))
        lib.png_read_gray8.restype = ctypes.c_int
        lib.png_read_gray8.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_long]
        lib.png_read_u16.restype = ctypes.c_int
        lib.png_read_u16.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint16),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_long]
        lib.prefetch_create.restype = ctypes.c_void_p
        lib.prefetch_create.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        lib.prefetch_next.restype = ctypes.c_int
        lib.prefetch_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_long]
        lib.prefetch_destroy.restype = None
        lib.prefetch_destroy.argtypes = [ctypes.c_void_p]
        _io_lib = lib
    except Exception:
        _io_lib = None
    return _io_lib


_MAX_WH = 4096 * 3072


def read_gray8(path) -> "np.ndarray | None":
    """Decode a PNG to (H, W) uint8 grayscale with the native decoder."""
    lib = get_io_lib()
    if lib is None:
        return None
    buf = np.empty((_MAX_WH,), np.uint8)
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.png_read_gray8(
        str(path).encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.byref(w), ctypes.byref(h), _MAX_WH)
    if rc != 0:
        return None
    return buf[:w.value * h.value].reshape(h.value, w.value).copy()


def read_u16(path) -> "np.ndarray | None":
    """Decode a 16-bit PNG (TUM depth) to (H, W) uint16."""
    lib = get_io_lib()
    if lib is None:
        return None
    buf = np.empty((_MAX_WH,), np.uint16)
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.png_read_u16(
        str(path).encode(),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        ctypes.byref(w), ctypes.byref(h), _MAX_WH)
    if rc != 0:
        return None
    return buf[:w.value * h.value].reshape(h.value, w.value).copy()


class ImagePrefetcher:
    """Ordered multi-threaded PNG prefetcher (iterator over (H, W) arrays).

    Decoding runs `n_threads` native workers up to `ahead` frames in front
    of the consumer — the SLAM loop never blocks on disk/decode."""

    def __init__(self, paths, n_threads: int = 4, want16: bool = False,
                 ahead: int = 8):
        self._lib = get_io_lib()
        if self._lib is None:
            raise RuntimeError("native io library unavailable")
        self.paths = [str(p) for p in paths]
        blob = b"".join(p.encode() + b"\0" for p in self.paths)
        self.want16 = want16
        self._h = self._lib.prefetch_create(blob, len(self.paths),
                                            n_threads, int(want16), ahead)
        self._i = 0

    def __iter__(self):
        return self

    def __len__(self):
        return len(self.paths)

    def __next__(self):
        if self._i >= len(self.paths):
            raise StopIteration
        dt = np.uint16 if self.want16 else np.uint8
        buf = np.empty((_MAX_WH,), dt)
        w = ctypes.c_int()
        h = ctypes.c_int()
        rc = self._lib.prefetch_next(
            self._h, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.byref(w), ctypes.byref(h), _MAX_WH * buf.itemsize)
        self._i += 1
        if rc != 0:
            raise IOError(f"decode failed ({rc}): {self.paths[self._i - 1]}")
        return buf[:w.value * h.value].reshape(h.value, w.value).copy()

    def close(self):
        if getattr(self, "_h", None):
            self._lib.prefetch_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
