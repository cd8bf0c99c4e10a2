#!/usr/bin/env python3
"""RGB-D TUM driver (reference Examples/RGB-D/rgbd_tum.cc).

Usage: python examples/rgbd_tum.py <settings.yaml> <sequence_dir> <assoc.txt>
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    settings_path, seq_dir, assoc = sys.argv[1], sys.argv[2], sys.argv[3]
    from orb_slam2_e_tpu.utils.config import load_settings, camera_from_settings
    from orb_slam2_e_tpu.utils.datasets import (load_tum_associations,
                                                read_gray, read_depth)
    from orb_slam2_e_tpu.models.system import SlamSystem, SystemConfig, Sensor

    s = load_settings(settings_path)
    cam = camera_from_settings(s)
    cfg = SystemConfig.from_settings(s)
    sysm = SlamSystem(cam, cfg, Sensor.RGBD)
    ts, rgbs, depths = load_tum_associations(seq_dir, assoc)
    print(f"Images in the sequence: {len(rgbs)}")

    track_times = []
    for t, rp, dp in zip(ts, rgbs, depths):
        im = read_gray(rp)
        # RAW depth values — the system applies DepthMapFactor itself
        # (reference Tracking::GrabImageRGBD convertTo semantics)
        depth = read_depth(dp, 1.0)
        t0 = time.perf_counter()
        sysm.track_rgbd(im, depth, t)
        track_times.append(time.perf_counter() - t0)
    sysm.shutdown()
    tt = sorted(track_times)
    print(f"median tracking time: {tt[len(tt) // 2]:.4f}")
    sysm.save_trajectory_tum("CameraTrajectory.txt")
    sysm.save_keyframe_trajectory_tum("KeyFrameTrajectory.txt")


if __name__ == "__main__":
    main()
