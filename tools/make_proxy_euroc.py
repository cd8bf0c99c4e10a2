#!/usr/bin/env python3
"""Generate a REAL-TEXTURE proxy dataset in EuRoC MAV format, with RAW
(distorted) stereo frames + LEFT./RIGHT. rectification blocks, so the
UNMODIFIED examples/stereo_euroc.py exercises the full StereoRectifier
path and examples/mono_euroc.py the cam0 loader (reference
Examples/Stereo/stereo_euroc.cc:59-115, Examples/Monocular/mono_euroc.cc).

Layout:
    <out>/mav0/cam0/data/<ns>.png     raw distorted left frames
    <out>/mav0/cam0/data.csv          "#timestamp [ns],filename"
    <out>/mav0/cam1/data/<ns>.png     raw distorted right frames
    <out>/mav0/cam1/data.csv
    <out>/timestamps.txt              EuRoC-tools style ns list
    <out>/settings.yaml               rectified Camera.* + LEFT./RIGHT. blocks
    <out>/groundtruth_tum.txt         GT in TUM format (for ATE eval)

Distortion: radtan (k1, k2) applied to the RENDERED rays — each raw pixel's
ray direction is the inverse-distorted normalized coordinate, so
rectification with the written LEFT./RIGHT. maps recovers an exact pinhole.

Usage:
    python tools/make_proxy_euroc.py <out_dir> [--frames N] [--seed S]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from make_proxy_dataset import build_room, render, trajectory  # noqa: E402

W, H = 512, 384
FX = FY = 320.0          # raw intrinsics
CX, CY = 256.0, 192.0
K1, K2 = -0.22, 0.05     # EuRoC-like radial distortion
BASELINE = 0.11          # m
# rectified projection: same focal, same principal point (proxy cameras are
# already row-aligned -> R = I and rectification is pure undistortion)
BF = FX * BASELINE
FPS = 20.0


def _inverse_distort_dirs():
    """(H, W, 3) ray directions for the RAW image: invert the radial
    distortion per pixel (fixed-point, converges in a few iterations for
    moderate k1/k2)."""
    us, vs = np.meshgrid(np.arange(W, dtype=np.float64),
                         np.arange(H, dtype=np.float64))
    xd = (us - CX) / FX
    yd = (vs - CY) / FY
    x, y = xd.copy(), yd.copy()
    for _ in range(10):
        r2 = x * x + y * y
        rad = 1.0 + r2 * (K1 + r2 * K2)
        x = xd / rad
        y = yd / rad
    return np.stack([x, y, np.ones_like(x)], -1)


def _mat_yaml(name, arr, rows, cols):
    flat = ", ".join(f"{v:.10f}" for v in np.asarray(arr).ravel())
    return (f"{name}: !!opencv-matrix\n   rows: {rows}\n   cols: {cols}\n"
            f"   dt: d\n   data: [{flat}]\n")


def settings_yaml():
    K = [FX, 0, CX, 0, FY, CY, 0, 0, 1]
    D = [K1, K2, 0.0, 0.0, 0.0]
    R = np.eye(3)
    P_l = [FX, 0, CX, 0, 0, FY, CY, 0, 0, 0, 1, 0]
    P_r = [FX, 0, CX, -BF, 0, FY, CY, 0, 0, 0, 1, 0]
    s = f"""%YAML:1.0
Camera.fx: {FX}
Camera.fy: {FY}
Camera.cx: {CX}
Camera.cy: {CY}
Camera.k1: 0.0
Camera.k2: 0.0
Camera.p1: 0.0
Camera.p2: 0.0
Camera.width: {W}
Camera.height: {H}
Camera.fps: {FPS}
Camera.RGB: 1
Camera.bf: {BF}
ThDepth: 40.0
ORBextractor.nFeatures: 1000
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
LEFT.width: {W}
LEFT.height: {H}
RIGHT.width: {W}
RIGHT.height: {H}
"""
    s += _mat_yaml("LEFT.K", K, 3, 3)
    s += _mat_yaml("LEFT.D", D, 1, 5)
    s += _mat_yaml("LEFT.R", R, 3, 3)
    s += _mat_yaml("LEFT.P", P_l, 3, 4)
    s += _mat_yaml("RIGHT.K", K, 3, 3)
    s += _mat_yaml("RIGHT.D", D, 1, 5)
    s += _mat_yaml("RIGHT.R", R, 3, 3)
    s += _mat_yaml("RIGHT.P", P_r, 3, 4)
    return s


def settings_mono_yaml():
    """Monocular settings: RAW intrinsics + distortion coefficients (the
    reference ships separate Monocular/EuRoC.yaml with k1/k2 set and
    Stereo/EuRoC.yaml with a rectified pinhole; keypoint undistortion
    handles the raw frames on the mono path)."""
    return f"""%YAML:1.0
Camera.fx: {FX}
Camera.fy: {FY}
Camera.cx: {CX}
Camera.cy: {CY}
Camera.k1: {K1}
Camera.k2: {K2}
Camera.p1: 0.0
Camera.p2: 0.0
Camera.width: {W}
Camera.height: {H}
Camera.fps: {FPS}
Camera.RGB: 1
ORBextractor.nFeatures: 1000
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--seed", type=int, default=2)
    args = ap.parse_args()

    import cv2
    from orb_slam2_e_tpu.ops import lie
    import jax.numpy as jnp
    out = Path(args.out)
    cam0 = out / "mav0" / "cam0" / "data"
    cam1 = out / "mav0" / "cam1" / "data"
    cam0.mkdir(parents=True, exist_ok=True)
    cam1.mkdir(parents=True, exist_ok=True)

    planes = build_room(seed=args.seed)
    poses, centers = trajectory("xyz", args.frames)
    dirs = _inverse_distort_dirs()

    csv0, csv1, ts_lines, gt = (["#timestamp [ns],filename"],
                                ["#timestamp [ns],filename"], [], [])
    for k, (R, t) in enumerate(poses):
        ns = int(round(k / FPS * 1e9))
        img_l, _ = render(planes, R, t, dirs=dirs)
        img_r, _ = render(planes, R, t - np.array([BASELINE, 0, 0]),
                          dirs=dirs)
        name = f"{ns}.png"
        cv2.imwrite(str(cam0 / name), img_l)
        cv2.imwrite(str(cam1 / name), img_r)
        csv0.append(f"{ns},{name}")
        csv1.append(f"{ns},{name}")
        ts_lines.append(str(ns))
        Rwc = R.T
        q = np.asarray(lie.quat_from_mat(jnp.asarray(Rwc[None])))[0]
        c = centers[k]
        gt.append(f"{k / FPS:.6f} {c[0]:.7f} {c[1]:.7f} {c[2]:.7f} "
                  f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}")
        if k % 40 == 0:
            print(f"  frame {k}/{args.frames}")

    (out / "mav0" / "cam0" / "data.csv").write_text("\n".join(csv0) + "\n")
    (out / "mav0" / "cam1" / "data.csv").write_text("\n".join(csv1) + "\n")
    (out / "timestamps.txt").write_text("\n".join(ts_lines) + "\n")
    (out / "groundtruth_tum.txt").write_text("\n".join(gt) + "\n")
    (out / "settings.yaml").write_text(settings_yaml())
    (out / "settings_mono.yaml").write_text(settings_mono_yaml())
    print(f"wrote {args.frames} raw stereo frames to {out}")


if __name__ == "__main__":
    main()
