#!/usr/bin/env python3
"""Generate a REAL-TEXTURE proxy dataset in TUM RGB-D format.

Why this exists: the driver metric is ATE RMSE on TUM/KITTI/Hamlyn
(BASELINE.md), but this environment has zero network egress, so the actual
benchmark sequences cannot be fetched. This tool builds the closest
substitute that is honest about what it is: frames rendered by an *exact*
textured-plane raycaster over REAL photographic/medical imagery (the only
real images shipped in this environment — matplotlib's sample data:
`grace_hopper.jpg` photograph, `s1045.ima.gz` MRI slice, `topobathy.npz` and
`jacksboro_fault_dem.npz` measured elevation rasters), along a handheld-like
trajectory with exact ground truth and exact depth maps.

What this validates that the synthetic square-field scenes could not:
  * natural image statistics (gradient distributions, texture self-similarity,
    repeated structure) driving FAST/BRIEF and the vocabulary,
  * a TUM-format on-disk dataset consumed by the UNMODIFIED example drivers
    (examples/mono_tum.py, examples/rgbd_tum.py — same loaders as reference
    Examples/Monocular/mono_tum.cc:129-155, Examples/RGB-D/rgbd_tum.cc),
  * metric ATE evaluation against groundtruth.txt with the TUM protocol.

What it cannot validate (stated loudly, per VERDICT r3 #1): real sensor
noise, rolling shutter, lighting change, motion blur, and the actual TUM/
KITTI trajectories. The ATE numbers published in PERF.md from these proxy
sequences are NOT comparable 1:1 against the fr1_xyz/fr1_desk anchors; they
are the strongest real-texture end-to-end evidence this environment allows.

Layout written (TUM RGB-D convention):
    <out>/rgb/<t>.png          8-bit grayscale-replicated RGB frames
    <out>/depth/<t>.png        16-bit depth, 5000 units = 1 m
    <out>/rgb.txt, depth.txt, associations.txt, groundtruth.txt
    <out>/settings.yaml        cv::FileStorage-style settings (TUM1-like)

Usage:
    python tools/make_proxy_dataset.py <out_dir> [--seq xyz|desk] [--frames N]
"""

from __future__ import annotations

import argparse
import gzip
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

W, H = 640, 480
FX, FY, CX, CY = 517.3, 516.5, 318.6, 255.3   # TUM1 intrinsics (undistorted)
FPS = 30.0
DEPTH_FACTOR = 5000.0


# ---------------------------------------------------------------------------
# Real source imagery (matplotlib sample data — actual photo / MRI / DEMs)
# ---------------------------------------------------------------------------

def _load_real_textures() -> list[np.ndarray]:
    import matplotlib
    import cv2
    d = Path(matplotlib.get_data_path()) / "sample_data"
    texs = []
    hopper = cv2.imread(str(d / "grace_hopper.jpg"), cv2.IMREAD_GRAYSCALE)
    if hopper is not None:
        texs.append(hopper.astype(np.float32))
    # MRI slice (raw 256x256 uint16 big-endian)
    try:
        raw = gzip.decompress((d / "s1045.ima.gz").read_bytes())
        mri = np.frombuffer(raw, dtype=">u2").reshape(256, 256).astype(np.float32)
        mri = 255.0 * (mri - mri.min()) / max(float(mri.ptp()), 1.0)
        texs.append(mri)
    except Exception:
        pass
    # measured elevation rasters -> hillshaded texture (natural fractal detail)
    for name, key in [("topobathy.npz", "topo"), ("jacksboro_fault_dem.npz", "elevation")]:
        try:
            z = np.load(d / name)[key].astype(np.float32)
            gy, gx = np.gradient(z)
            shade = gx * 0.7 + gy * 0.7
            shade = 255.0 * (shade - shade.min()) / max(float(shade.ptp()), 1.0)
            texs.append(shade)
        except Exception:
            pass
    if not texs:
        raise RuntimeError("no real sample imagery found in matplotlib data")
    return texs


def _make_plane_texture(rng: np.random.RandomState, texs: list[np.ndarray],
                        size: tuple[int, int]) -> np.ndarray:
    """Tile random crops/transforms of the real images into a (h, w) texture.

    Every output pixel comes from a real image; only crop / flip / rotate /
    brightness-scale transforms are applied (no synthetic pattern)."""
    import cv2
    h, w = size
    out = np.zeros((h, w), np.float32)
    tile = 160
    for y0 in range(0, h, tile):
        for x0 in range(0, w, tile):
            t = texs[rng.randint(len(texs))]
            th, tw = t.shape
            ch = rng.randint(tile, min(2 * tile, th))
            cw = rng.randint(tile, min(2 * tile, tw))
            ys = rng.randint(0, th - ch + 1)
            xs = rng.randint(0, tw - cw + 1)
            crop = t[ys:ys + ch, xs:xs + cw]
            if rng.rand() < 0.5:
                crop = crop[:, ::-1]
            crop = np.rot90(crop, rng.randint(4))
            crop = cv2.resize(crop, (tile, tile), interpolation=cv2.INTER_AREA)
            gain = rng.uniform(0.6, 1.1)
            bias = rng.uniform(0, 40)
            y1, x1 = min(y0 + tile, h), min(x0 + tile, w)
            out[y0:y1, x0:x1] = np.clip(crop[:y1 - y0, :x1 - x0] * gain + bias,
                                        0, 255)
    return out


# ---------------------------------------------------------------------------
# Exact textured-plane raycaster
# ---------------------------------------------------------------------------

class Plane:
    """Finite textured rectangle: X(a,b) = origin + a*ex + b*ey, a,b in [0,1]."""

    def __init__(self, origin, ex, ey, texture):
        self.origin = np.asarray(origin, np.float64)
        self.ex = np.asarray(ex, np.float64)
        self.ey = np.asarray(ey, np.float64)
        self.tex = np.asarray(texture, np.float32)


def render(planes: list[Plane], R: np.ndarray, t: np.ndarray,
           near=0.05, far=60.0, size=None, intrinsics=None, dirs=None):
    """Render (image, depth) from world-to-camera pose (R, t); exact
    per-pixel ray/plane intersection + bilinear texture sampling.

    size=(W, H) / intrinsics=(fx, fy, cx, cy) override the TUM defaults
    (the KITTI / EuRoC proxy generators pass their own); `dirs` overrides
    the per-pixel ray directions entirely (used to render DISTORTED EuRoC
    frames: each raw pixel's ray is the inverse-distorted normalized
    coordinate)."""
    import cv2
    Wl, Hl = size if size is not None else (W, H)
    fx, fy, cx, cy = intrinsics if intrinsics is not None \
        else (FX, FY, CX, CY)
    if dirs is None:
        us, vs = np.meshgrid(np.arange(Wl, dtype=np.float64),
                             np.arange(Hl, dtype=np.float64))
        dirs = np.stack([(us - cx) / fx, (vs - cy) / fy,
                         np.ones_like(us)], -1)
    img = np.zeros((Hl, Wl), np.float32)
    zbuf = np.full((Hl, Wl), np.inf, np.float64)
    for pl in planes:
        p0 = R @ pl.origin + t
        e1 = R @ pl.ex
        e2 = R @ pl.ey
        n = np.cross(e1, e2)
        denom = dirs @ n                         # (H, W)
        num = float(n @ p0)
        with np.errstate(divide="ignore", invalid="ignore"):
            tr = num / denom                     # ray parameter
        z = tr                                    # dirs_z == 1 -> depth = tr
        X = dirs * tr[..., None] - p0            # (H, W, 3) offset in plane
        # plane coords via 2x2 Gram solve
        g11, g12, g22 = e1 @ e1, e1 @ e2, e2 @ e2
        det = g11 * g22 - g12 * g12
        r1 = X @ e1
        r2 = X @ e2
        a = (g22 * r1 - g12 * r2) / det
        b = (g11 * r2 - g12 * r1) / det
        valid = (np.isfinite(z) & (z > near) & (z < far)
                 & (a >= 0) & (a <= 1) & (b >= 0) & (b <= 1) & (z < zbuf))
        if not valid.any():
            continue
        th, tw = pl.tex.shape
        mx = np.clip(a * (tw - 1), 0, tw - 1).astype(np.float32)
        my = np.clip(b * (th - 1), 0, th - 1).astype(np.float32)
        shaded = cv2.remap(pl.tex, mx, my, cv2.INTER_LINEAR)
        img[valid] = shaded[valid]
        zbuf[valid] = z[valid]
    depth = np.where(np.isfinite(zbuf), zbuf, 0.0).astype(np.float32)
    return img.astype(np.uint8), depth


def build_room(seed=0) -> list[Plane]:
    """A 6 x 5 x 7 m room + interior slabs, every surface real-textured."""
    rng = np.random.RandomState(seed)
    texs = _load_real_textures()
    T = lambda h, w: _make_plane_texture(rng, texs, (h, w))
    planes = [
        # back wall  z=5, x in [-3,3], y in [-2.5, 2.5]
        Plane([-3, -2.5, 5], [6, 0, 0], [0, 5, 0], T(800, 960)),
        # floor y=+1.6
        Plane([-3, 1.6, -2], [6, 0, 0], [0, 0, 7], T(1120, 960)),
        # ceiling y=-1.9
        Plane([-3, -1.9, -2], [6, 0, 0], [0, 0, 7], T(1120, 960)),
        # left wall x=-3
        Plane([-3, -2.5, -2], [0, 0, 7], [0, 5, 0], T(800, 1120)),
        # right wall x=+3
        Plane([3, -2.5, -2], [0, 0, 7], [0, 5, 0], T(800, 1120)),
    ]
    # interior poster boards / slabs at varying depth for parallax
    for i in range(6):
        cx_ = rng.uniform(-2.2, 2.2)
        cy_ = rng.uniform(-1.2, 1.2)
        cz = rng.uniform(2.0, 4.5)
        w = rng.uniform(0.6, 1.4)
        h = rng.uniform(0.5, 1.1)
        yaw = rng.uniform(-0.5, 0.5)
        ex = np.array([np.cos(yaw), 0, np.sin(yaw)]) * w
        ey = np.array([0, 1, 0]) * h
        planes.append(Plane([cx_ - ex[0] / 2, cy_ - h / 2, cz - ex[2] / 2],
                            ex, ey, T(320, 480)))
    return planes


# ---------------------------------------------------------------------------
# Handheld-like trajectories (fr1_xyz / fr1_desk styles)
# ---------------------------------------------------------------------------

def trajectory(kind: str, n: int):
    """Returns (R_cw list, t list) world-to-camera + camera centers."""
    from orb_slam2_e_tpu.ops import lie
    import jax.numpy as jnp
    poses, centers = [], []
    for k in range(n):
        s = k / FPS
        if kind == "xyz":
            # fr1_xyz style: translation-dominant, per-axis sinusoids
            c = np.array([0.45 * np.sin(0.9 * s),
                          0.25 * np.sin(1.4 * s + 1.0),
                          0.35 * np.sin(0.6 * s + 2.0)])
            rot = np.array([0.04 * np.sin(0.8 * s + 0.3),
                            0.08 * np.sin(0.5 * s),
                            0.03 * np.sin(1.1 * s)])
        else:
            # fr1_desk style: sweeping yaw + translation arc
            c = np.array([1.1 * np.sin(0.35 * s),
                          0.15 * np.sin(1.1 * s),
                          0.5 - 0.5 * np.cos(0.35 * s)])
            rot = np.array([0.05 * np.sin(0.7 * s),
                            0.45 * np.sin(0.35 * s + 0.5),
                            0.04 * np.sin(0.9 * s)])
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
Camera.k3: 0.0
Camera.width: {W}
Camera.height: {H}
Camera.fps: {FPS}
Camera.RGB: 1
Camera.bf: 40.0
ThDepth: 40.0
DepthMapFactor: {DEPTH_FACTOR}
ORBextractor.nFeatures: 1000
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--seq", default="xyz", choices=["xyz", "desk"])
    ap.add_argument("--frames", type=int, default=400)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import cv2
    out = Path(args.out)
    (out / "rgb").mkdir(parents=True, exist_ok=True)
    (out / "depth").mkdir(parents=True, exist_ok=True)

    planes = build_room(seed=args.seed)
    poses, centers = trajectory(args.seq, args.frames)

    rgb_lines, depth_lines, assoc, gt = [], [], [], []
    from orb_slam2_e_tpu.ops import lie
    import jax.numpy as jnp
    for k, (R, t) in enumerate(poses):
        ts = k / FPS
        img, depth = render(planes, R, t)
        name = f"{ts:.6f}.png"
        cv2.imwrite(str(out / "rgb" / name), img)
        d16 = np.clip(depth * DEPTH_FACTOR, 0, 65535).astype(np.uint16)
        cv2.imwrite(str(out / "depth" / name), d16)
        rgb_lines.append(f"{ts:.6f} rgb/{name}")
        depth_lines.append(f"{ts:.6f} depth/{name}")
        assoc.append(f"{ts:.6f} rgb/{name} {ts:.6f} depth/{name}")
        Rwc = R.T
        q = np.asarray(lie.quat_from_mat(jnp.asarray(Rwc[None])))[0]  # wxyz
        c = centers[k]
        gt.append(f"{ts:.6f} {c[0]:.7f} {c[1]:.7f} {c[2]:.7f} "
                  f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}")
        if k % 50 == 0:
            print(f"  frame {k}/{args.frames}")

    hdr = "# real-texture proxy sequence (tools/make_proxy_dataset.py)\n"
    (out / "rgb.txt").write_text(hdr + "\n".join(rgb_lines) + "\n")
    (out / "depth.txt").write_text(hdr + "\n".join(depth_lines) + "\n")
    (out / "associations.txt").write_text("\n".join(assoc) + "\n")
    (out / "groundtruth.txt").write_text(hdr + "\n".join(gt) + "\n")
    (out / "settings.yaml").write_text(SETTINGS_YAML)
    print(f"wrote {args.frames} frames to {out}")


if __name__ == "__main__":
    main()
