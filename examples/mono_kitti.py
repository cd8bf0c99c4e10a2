#!/usr/bin/env python3
"""Monocular KITTI driver (reference Examples/Monocular/mono_kitti.cc).

Usage: python examples/mono_kitti.py <settings.yaml> <sequence_dir> [out.txt]

<sequence_dir> is a KITTI odometry sequence directory (image_0/ + times.txt).
Saves the keyframe trajectory in TUM format (the reference mono_kitti also
uses SaveKeyFrameTrajectoryTUM — scale is unobservable in mono, so the
KITTI 3x4 format's metric poses don't apply).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    settings_path, seq_dir = sys.argv[1], sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else "KeyFrameTrajectory.txt"
    from orb_slam2_e_tpu.utils.config import load_settings, camera_from_settings
    from orb_slam2_e_tpu.utils.datasets import load_kitti, iter_gray
    from orb_slam2_e_tpu.models.system import SlamSystem, SystemConfig, Sensor

    s = load_settings(settings_path)
    cam = camera_from_settings(s)
    sysm = SlamSystem(cam, SystemConfig.from_settings(s), Sensor.MONOCULAR)
    ts, paths = load_kitti(seq_dir)
    print(f"Images in the sequence: {len(paths)}")

    track_times = []
    for t, im in zip(ts, iter_gray(paths)):
        t0 = time.perf_counter()
        sysm.track_monocular(im, t)
        track_times.append(time.perf_counter() - t0)
    sysm.shutdown()

    tt = sorted(track_times)
    print(f"median tracking time: {tt[len(tt) // 2]:.4f}")
    print(f"mean tracking time: {sum(tt) / len(tt):.4f}")
    sysm.save_keyframe_trajectory_tum(out)
    print(f"trajectory saved to {out}")


if __name__ == "__main__":
    main()
