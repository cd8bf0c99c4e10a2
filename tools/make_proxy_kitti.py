#!/usr/bin/env python3
"""Generate a REAL-TEXTURE proxy dataset in KITTI odometry format.

Same honest-proxy rationale as tools/make_proxy_dataset.py (zero network
egress -> the actual KITTI sequences cannot be fetched): frames rendered by
the exact textured-plane raycaster over real photographic imagery, along a
forward-arc trajectory, written in the KITTI odometry layout the UNMODIFIED
example drivers consume (reference Examples/Stereo/stereo_kitti.cc:1-150 /
Examples/Monocular/mono_kitti.cc LoadImages):

    <out>/image_0/000000.png ...     left grayscale frames
    <out>/image_1/000000.png ...     right grayscale frames (stereo baseline)
    <out>/times.txt                  one timestamp per line
    <out>/settings.yaml              KITTI-style settings
    <out>/groundtruth_tum.txt        GT in TUM format (for ATE eval)

Usage:
    python tools/make_proxy_kitti.py <out_dir> [--frames N] [--seed S]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from make_proxy_dataset import Plane, build_room, render  # noqa: E402

# proxy-KITTI camera: wide aspect like KITTI, sized for fast smoke tests
W, H = 640, 256
FX = FY = 350.0
CX, CY = 320.0, 128.0
BASELINE = 0.12          # m -> bf = 42.0
BF = FX * BASELINE
FPS = 10.0               # KITTI camera rate


def forward_trajectory(n: int):
    """Forward-dominant arc inside the proxy room (KITTI style: forward
    motion + gentle yaw), world-to-camera poses + centers."""
    from orb_slam2_e_tpu.ops import lie
    import jax.numpy as jnp
    poses, centers = [], []
    for k in range(n):
        s = k / FPS
        c = np.array([0.35 * np.sin(0.25 * s),
                      0.05 * np.sin(0.9 * s),
                      min(0.28 * s, 3.2)])
        rot = np.array([0.02 * np.sin(0.7 * s),
                        0.10 * np.sin(0.25 * s + 0.4),
                        0.02 * np.sin(0.5 * s)])
        Rwc = np.asarray(lie.so3_exp(jnp.asarray(rot)), dtype=np.float64)
        R = Rwc.T
        t = -R @ c
        poses.append((R, t))
        centers.append(c)
    return poses, np.stack(centers)


SETTINGS_YAML = f"""%YAML:1.0
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
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--seed", type=int, default=1)
    args = ap.parse_args()

    import cv2
    from orb_slam2_e_tpu.ops import lie
    import jax.numpy as jnp
    out = Path(args.out)
    (out / "image_0").mkdir(parents=True, exist_ok=True)
    (out / "image_1").mkdir(parents=True, exist_ok=True)

    planes = build_room(seed=args.seed)
    poses, centers = forward_trajectory(args.frames)

    times, gt = [], []
    size, intr = (W, H), (FX, FY, CX, CY)
    for k, (R, t) in enumerate(poses):
        ts = k / FPS
        img_l, _ = render(planes, R, t, size=size, intrinsics=intr)
        # right camera: optical center shifted by the baseline along the
        # camera x-axis (x_r = R X + t - [b, 0, 0])
        img_r, _ = render(planes, R, t - np.array([BASELINE, 0, 0]),
                          size=size, intrinsics=intr)
        cv2.imwrite(str(out / "image_0" / f"{k:06d}.png"), img_l)
        cv2.imwrite(str(out / "image_1" / f"{k:06d}.png"), img_r)
        times.append(f"{ts:.6e}")
        Rwc = R.T
        q = np.asarray(lie.quat_from_mat(jnp.asarray(Rwc[None])))[0]
        c = centers[k]
        gt.append(f"{ts:.6f} {c[0]:.7f} {c[1]:.7f} {c[2]:.7f} "
                  f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}")
        if k % 40 == 0:
            print(f"  frame {k}/{args.frames}")

    (out / "times.txt").write_text("\n".join(times) + "\n")
    (out / "groundtruth_tum.txt").write_text("\n".join(gt) + "\n")
    (out / "settings.yaml").write_text(SETTINGS_YAML)
    print(f"wrote {args.frames} stereo frames to {out}")


if __name__ == "__main__":
    main()
