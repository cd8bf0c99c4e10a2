#!/usr/bin/env python3
"""Stereo EuRoC driver (reference Examples/Stereo/stereo_euroc.cc): raw
stereo pairs are rectified with the LEFT.*/RIGHT.* calibration from the
settings YAML before tracking.

Usage: python examples/stereo_euroc.py <settings.yaml> <sequence_dir>
           [timestamps.txt]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    settings_path, seq_dir = sys.argv[1], sys.argv[2]
    ts_file = sys.argv[3] if len(sys.argv) > 3 else None
    from orb_slam2_e_tpu.utils.config import (
        load_settings, camera_from_settings, stereo_rectifier_from_settings)
    from orb_slam2_e_tpu.utils.datasets import load_euroc, read_gray
    from orb_slam2_e_tpu.models.system import SlamSystem, SystemConfig, Sensor

    s = load_settings(settings_path)
    cam = camera_from_settings(s)
    rect = stereo_rectifier_from_settings(settings_path)
    if rect is None:
        print("WARNING: no LEFT.*/RIGHT.* rectification blocks in settings; "
              "assuming pre-rectified input")
    sysm = SlamSystem(cam, SystemConfig.from_settings(s), Sensor.STEREO)

    ts, lefts = load_euroc(seq_dir, ts_file)
    # swap only the camera path component, never other 'cam0' substrings
    rights = [p.replace("/cam0/data/", "/cam1/data/") for p in lefts]
    print(f"Images in the sequence: {len(lefts)}")

    track_times = []
    for t, lp, rp in zip(ts, lefts, rights):
        im_l, im_r = read_gray(lp), read_gray(rp)
        if rect is not None:
            im_l, im_r = rect(im_l, im_r)
        t0 = time.perf_counter()
        sysm.track_stereo(im_l, im_r, t)
        track_times.append(time.perf_counter() - t0)
    sysm.shutdown()
    tt = sorted(track_times)
    print(f"median tracking time: {tt[len(tt) // 2]:.4f}")
    print(f"mean tracking time: {sum(tt) / len(tt):.4f}")
    sysm.save_trajectory_tum("CameraTrajectory.txt")


if __name__ == "__main__":
    main()
