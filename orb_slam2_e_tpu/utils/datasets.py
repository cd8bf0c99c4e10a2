"""Dataset loaders: TUM RGB-D, KITTI odometry, EuRoC MAV.

Mirrors the reference's example loaders (reference
Examples/Monocular/mono_tum.cc LoadImages :129-155, mono_kitti.cc,
mono_euroc.cc, Examples/RGB-D/rgbd_tum.cc with association files) so the
same on-disk dataset layouts work unchanged.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def load_tum_rgb(seq_dir):
    """TUM: parse rgb.txt -> (timestamps, image paths)
    (reference mono_tum.cc:129)."""
    seq = Path(seq_dir)
    ts, paths = [], []
    for line in (seq / "rgb.txt").read_text().splitlines():
        line = line.strip()
        if not line or line.startswith('#'):
            continue
        t, p = line.split()[:2]
        ts.append(float(t))
        paths.append(str(seq / p))
    return np.asarray(ts), paths


def load_tum_associations(seq_dir, assoc_file):
    """TUM RGB-D with association file: (ts, rgb paths, depth paths)
    (reference rgbd_tum.cc LoadImages)."""
    seq = Path(seq_dir)
    ts, rgb, depth = [], [], []
    for line in Path(assoc_file).read_text().splitlines():
        line = line.strip()
        if not line or line.startswith('#'):
            continue
        f = line.split()
        ts.append(float(f[0]))
        rgb.append(str(seq / f[1]))
        depth.append(str(seq / f[3]))
    return np.asarray(ts), rgb, depth


def load_kitti(seq_dir, stereo=False):
    """KITTI odometry: image_0 (+image_1), times.txt
    (reference mono_kitti.cc / stereo_kitti.cc LoadImages)."""
    seq = Path(seq_dir)
    ts = np.asarray([float(x) for x in
                     (seq / "times.txt").read_text().split()])
    left = sorted((seq / "image_0").glob("*.png"))
    if stereo:
        right = sorted((seq / "image_1").glob("*.png"))
        return ts, [str(p) for p in left], [str(p) for p in right]
    return ts, [str(p) for p in left]


def load_euroc(seq_dir, ts_file=None):
    """EuRoC MAV: mav0/cam0/data + data.csv timestamps
    (reference mono_euroc.cc LoadImages)."""
    seq = Path(seq_dir)
    cam0 = seq / "mav0" / "cam0"
    ts, paths = [], []
    if ts_file is not None:
        for line in Path(ts_file).read_text().splitlines():
            line = line.strip()
            if not line:
                continue
            ts.append(float(line) / 1e9)
            paths.append(str(cam0 / "data" / (line + ".png")))
    else:
        for line in (cam0 / "data.csv").read_text().splitlines():
            if line.startswith('#'):
                continue
            t, name = line.strip().split(',')[:2]
            ts.append(float(t) / 1e9)
            paths.append(str(cam0 / "data" / name))
    return np.asarray(ts), paths


def read_gray(path):
    """Grayscale frame; native libpng decoder preferred, cv2 fallback."""
    if str(path).lower().endswith(".png"):
        from .. import native
        img = native.read_gray8(path)
        if img is not None:
            return img
    import cv2
    img = cv2.imread(str(path), cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise FileNotFoundError(path)
    return img


def read_depth(path, factor=5000.0):
    """TUM depth PNGs are uint16 with 5000 = 1m (DepthMapFactor)."""
    if str(path).lower().endswith(".png"):
        from .. import native
        d16 = native.read_u16(path)
        if d16 is not None:
            return d16.astype(np.float32) / factor
    import cv2
    d = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
    if d is None:
        raise FileNotFoundError(path)
    return d.astype(np.float32) / factor


def iter_gray(paths, n_threads: int = 4, ahead: int = 8):
    """Prefetching iterator over grayscale frames (native worker threads;
    replaces the reference drivers' synchronous per-frame cv::imread).

    The native prefetcher decodes PNG only; for mixed/JPEG sequences
    (e.g. examples/mono_deformable.py Hamlyn *.jpg) fall back to the
    cv2-backed read_gray generator."""
    if all(str(p).lower().endswith(".png") for p in paths):
        try:
            from .. import native
            return native.ImagePrefetcher(paths, n_threads=n_threads,
                                          ahead=ahead)
        except Exception:
            pass
    return (read_gray(p) for p in paths)
