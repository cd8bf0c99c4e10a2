#!/usr/bin/env python3
"""Stereo KITTI driver (reference Examples/Stereo/stereo_kitti.cc).

Usage: python examples/stereo_kitti.py <settings.yaml> <sequence_dir>
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    settings_path, seq_dir = sys.argv[1], sys.argv[2]
    from orb_slam2_e_tpu.utils.config import load_settings, camera_from_settings
    from orb_slam2_e_tpu.utils.datasets import load_kitti, read_gray
    from orb_slam2_e_tpu.models.system import SlamSystem, SystemConfig, Sensor

    s = load_settings(settings_path)
    cam = camera_from_settings(s)
    sysm = SlamSystem(cam, SystemConfig.from_settings(s), Sensor.STEREO)
    ts, lefts, rights = load_kitti(seq_dir, stereo=True)
    print(f"Images in the sequence: {len(lefts)}")

    track_times = []
    for t, lp, rp in zip(ts, lefts, rights):
        t0 = time.perf_counter()
        sysm.track_stereo(read_gray(lp), read_gray(rp), t)
        track_times.append(time.perf_counter() - t0)
    sysm.shutdown()
    tt = sorted(track_times)
    print(f"median tracking time: {tt[len(tt) // 2]:.4f}")
    sysm.save_trajectory_kitti("CameraTrajectory.txt")


if __name__ == "__main__":
    main()
