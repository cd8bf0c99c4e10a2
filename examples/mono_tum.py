#!/usr/bin/env python3
"""Monocular TUM driver (reference Examples/Monocular/mono_tum.cc).

Usage: python examples/mono_tum.py <settings.yaml> <sequence_dir> [out.txt]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    settings_path, seq_dir = sys.argv[1], sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else "KeyFrameTrajectory.txt"
    from orb_slam2_e_tpu.utils.config import load_settings, camera_from_settings
    from orb_slam2_e_tpu.utils.datasets import load_tum_rgb, read_gray
    from orb_slam2_e_tpu.models.system import SlamSystem, SystemConfig, Sensor

    s = load_settings(settings_path)
    cam = camera_from_settings(s)
    sysm = SlamSystem(cam, SystemConfig.from_settings(s), Sensor.MONOCULAR)
    ts, paths = load_tum_rgb(seq_dir)
    print(f"Images in the sequence: {len(paths)}")

    track_times = []
    for i, (t, p) in enumerate(zip(ts, paths)):
        im = read_gray(p)
        t0 = time.perf_counter()
        sysm.track_monocular(im, t)
        track_times.append(time.perf_counter() - t0)
    sysm.shutdown()

    # timing stats (reference mono_tum.cc:111-120)
    tt = sorted(track_times)
    print(f"median tracking time: {tt[len(tt) // 2]:.4f}")
    print(f"mean tracking time: {sum(tt) / len(tt):.4f}")
    sysm.save_keyframe_trajectory_tum(out)
    sysm.save_trajectory_tum("FrameTrajectory.txt")
    print(f"trajectory saved to {out}")


if __name__ == "__main__":
    main()
