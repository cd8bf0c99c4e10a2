#!/usr/bin/env python3
"""Deformable-surface proxy sequence (Hamlyn endoscopy stand-in).

The reference's E-extension is evaluated on endoscope sequences over
DEFORMING tissue (Hamlyn/HCULB/IRCAD — reference roslaunch/sHamlyn01.yaml,
output/evaluation/*.txt) with the bTestAllFrames relocalization KPI
protocol (Tracking.cc:488-525). Those datasets cannot be fetched here
(zero egress), so this renders the closest honest substitute:

  * a smooth heightmap surface tessellated into textured quads, textured
    with the REAL MRI slice + photographic imagery from matplotlib's
    sample data (the tissue-like textures available in this environment);
  * phase "map": the surface at rest, camera sweeping — for map building;
  * phase "reloc": the surface breathing (time-varying smooth deformation
    of the control grid, amplitude --amp in surface units), a similar
    sweep — for localization-mode relocalization KPI runs against the
    phase-"map" map.

Writes TUM-format rgb/ + rgb.txt + groundtruth.txt + settings.yaml with
RelocParam keys preset for the KPI protocol.

Usage:
  python tools/make_proxy_endo.py <out_dir> --phase map   [--frames 240]
  python tools/make_proxy_endo.py <out_dir> --phase reloc [--frames 240]
      [--amp 0.12]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import importlib.util as _ilu

_spec = _ilu.spec_from_file_location(
    "make_proxy_dataset", Path(__file__).parent / "make_proxy_dataset.py")
_mpd = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_mpd)

W, H = 480, 360
FX = FY = 420.0
CX, CY = 240.0, 180.0
FPS = 30.0

GRID_X, GRID_Y = 14, 10        # control grid (quads = (GX-1)*(GY-1))
EXTENT_X, EXTENT_Y = 5.4, 4.0  # surface span (units ~ cm-scale scene)
BASE_Z = 3.2


def _surface_points(amp: float, t: float, seed: int):
    """Control-grid 3D points: DEM-derived static relief + breathing."""
    rng = np.random.RandomState(seed)
    xs = np.linspace(-EXTENT_X / 2, EXTENT_X / 2, GRID_X)
    ys = np.linspace(-EXTENT_Y / 2, EXTENT_Y / 2, GRID_Y)
    gx, gy = np.meshgrid(xs, ys)                       # (GY, GX)
    # static relief: smooth random bumps (fixed per sequence)
    relief = np.zeros_like(gx)
    for _ in range(6):
        cx_ = rng.uniform(-1.5, 1.5)
        cy_ = rng.uniform(-1.0, 1.0)
        s = rng.uniform(0.5, 1.2)
        a = rng.uniform(-0.25, 0.35)
        relief += a * np.exp(-(((gx - cx_) ** 2 + (gy - cy_) ** 2)
                               / (2 * s * s)))
    # breathing: two smooth traveling modes (amplitude `amp`)
    breathe = amp * (np.sin(2 * np.pi * 0.45 * t + gx * 1.2)
                     * np.exp(-(gx ** 2 + gy ** 2) / 3.0)
                     + 0.6 * np.sin(2 * np.pi * 0.27 * t + gy * 1.7))
    gz = BASE_Z + relief + breathe
    return np.stack([gx, gy, gz], -1)                  # (GY, GX, 3)


def _make_patches(pts, textures):
    """Quad patches between grid points; each quad is a Plane whose ex/ey
    follow the deformed grid (texture rides the surface)."""
    planes = []
    k = 0
    for j in range(GRID_Y - 1):
        for i in range(GRID_X - 1):
            p00 = pts[j, i]
            p10 = pts[j, i + 1]
            p01 = pts[j + 1, i]
            planes.append(_mpd.Plane(p00, p10 - p00, p01 - p00,
                                     textures[k]))
            k += 1
    return planes


def _patch_textures(seed: int):
    rng = np.random.RandomState(seed)
    texs = _mpd._load_real_textures()
    out = []
    for _ in range((GRID_X - 1) * (GRID_Y - 1)):
        out.append(_mpd._make_plane_texture(rng, texs, (96, 96)))
    return out


def _trajectory(n: int, phase: str):
    # scipy rotations (NOT jax/lie): the generator must run without
    # touching the (possibly busy) TPU client
    from scipy.spatial.transform import Rotation
    poses, centers = [], []
    for k in range(n):
        t = k / FPS
        # sweeping arc over the surface, slight pitch to keep it in view;
        # reloc phase starts mid-arc (different offset) to test reloc from
        # novel viewpoints
        ph = 0.0 if phase == "map" else 0.9
        c = np.array([1.1 * np.sin(0.30 * t + ph),
                      0.6 * np.sin(0.21 * t + 0.7 + ph),
                      0.45 * np.sin(0.17 * t + ph) - 0.1])
        rot = np.array([0.10 * np.sin(0.23 * t + ph),
                        0.12 * np.sin(0.31 * t + 0.4 + ph),
                        0.05 * np.sin(0.40 * t)])
        Rwc = Rotation.from_rotvec(rot).as_matrix()
        R = Rwc.T
        tt = -R @ c
        poses.append((R, tt))
        centers.append(c)
    return poses, np.stack(centers)


SETTINGS = f"""%YAML:1.0
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
ORBextractor.nFeatures: 1200
ORBextractor.scaleFactor: 1.1
ORBextractor.nLevels: 6
ORBextractor.iniThFAST: 24
ORBextractor.minThFAST: 7
RelocParam.bTestAllFrames: 1
RelocParam.nPrecisionFrames: 2
RelocParam.nElType: 1
"""
# ORB params mirror the reference's endoscopy tuning
# (roslaunch/sHamlyn01.yaml:71-84: 1200 feats, scale 1.1, 6 levels,
# iniThFAST 24)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--phase", choices=["map", "reloc"], required=True)
    ap.add_argument("--frames", type=int, default=240)
    ap.add_argument("--amp", type=float, default=0.12,
                    help="breathing amplitude (reloc phase)")
    ap.add_argument("--seed", type=int, default=5)
    args = ap.parse_args()

    import cv2
    from scipy.spatial.transform import Rotation

    out = Path(args.out)
    (out / "rgb").mkdir(parents=True, exist_ok=True)
    textures = _patch_textures(args.seed)
    poses, centers = _trajectory(args.frames, args.phase)
    amp = 0.0 if args.phase == "map" else args.amp

    # narrow-FOV render settings (reuse the plane raycaster's globals)
    _mpd.W, _mpd.H = W, H
    _mpd.FX, _mpd.FY, _mpd.CX, _mpd.CY = FX, FY, CX, CY

    rgb_lines, gt = [], []
    for k, (R, t) in enumerate(poses):
        ts = k / FPS
        pts = _surface_points(amp, ts, args.seed)
        planes = _make_patches(pts, textures)
        img, _ = _mpd.render(planes, R, t, near=0.05, far=30.0)
        name = f"{ts:.6f}.png"
        cv2.imwrite(str(out / "rgb" / name), img)
        rgb_lines.append(f"{ts:.6f} rgb/{name}")
        Rwc = R.T
        qx, qy, qz, qw = Rotation.from_matrix(Rwc).as_quat()
        c = centers[k]
        gt.append(f"{ts:.6f} {c[0]:.7f} {c[1]:.7f} {c[2]:.7f} "
                  f"{qx:.7f} {qy:.7f} {qz:.7f} {qw:.7f}")
        if k % 40 == 0:
            print(f"  frame {k}/{args.frames} (amp={amp})")

    hdr = "# deformable real-texture proxy (tools/make_proxy_endo.py)\n"
    (out / "rgb.txt").write_text(hdr + "\n".join(rgb_lines) + "\n")
    (out / "groundtruth.txt").write_text(hdr + "\n".join(gt) + "\n")
    (out / "settings.yaml").write_text(SETTINGS)
    print(f"wrote {args.frames} frames ({args.phase}) to {out}")


if __name__ == "__main__":
    main()
