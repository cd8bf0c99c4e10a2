#!/usr/bin/env python3
"""Deformable monocular driver — the reference's primary E workflow
(`rosrun ORB_SLAM2_E MonoE voc settings` + rosbag, reference README.md:89-99
and Examples/ROS/ORB_SLAM2_E/src/ros_mono.cc), here over an image directory.

Builds or loads a map, tracks with the deformable relocalization mode, and
reports the relocalization precision/recall KPI (reference
Tracking.cc:488-525). With `RelocParam.bTestAllFrames: 1` in the YAML, every
frame is forced through relocalization (the KPI evaluation protocol).

Usage:
  python examples/mono_deformable.py <settings.yaml> <sequence_dir>
      [--load-map map.npz] [--save-map map.npz] [--stats StatsReloc.txt]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("settings")
    ap.add_argument("seq_dir")
    ap.add_argument("--load-map", default=None)
    ap.add_argument("--save-map", default=None)
    ap.add_argument("--stats", default=None)
    args = ap.parse_args()

    from orb_slam2_e_tpu.utils.config import load_settings, camera_from_settings
    from orb_slam2_e_tpu.utils.datasets import load_tum_rgb, iter_gray
    from orb_slam2_e_tpu.models.system import SlamSystem, SystemConfig, Sensor
    import dataclasses

    s = load_settings(args.settings)
    cam = camera_from_settings(s)
    cfg = SystemConfig.from_settings(s)
    cfg = dataclasses.replace(cfg, deformable=True,
                              stats_reloc_path=args.stats or cfg.stats_reloc_path)
    sysm = SlamSystem(cam, cfg, Sensor.MONOCULAR)
    if args.load_map:
        sysm.load_map(args.load_map)
        sysm.activate_localization_mode()

    seq = Path(args.seq_dir)
    if (seq / "rgb.txt").exists():
        ts, paths = load_tum_rgb(seq)
    else:
        paths = sorted(seq.glob("*.png")) or sorted(seq.glob("*.jpg"))
        fps = s.fps or 30.0
        ts = [i / fps for i in range(len(paths))]
    print(f"Images in the sequence: {len(paths)}")

    times = []
    for t, im in zip(ts, iter_gray(paths)):
        t0 = time.perf_counter()
        sysm.track_monocular(im, t)
        times.append(time.perf_counter() - t0)
    if args.save_map:
        sysm.save_map(args.save_map)
    sysm.shutdown()

    tt = sorted(times)
    print(f"median tracking time: {tt[len(tt) // 2]:.4f}")
    k = sysm.kpi
    print(f"reloc KPI: TP={k.tp} FP={k.fp} FN={k.fn} "
          f"precision={k.precision:.3f} recall={k.recall:.3f}")
    sysm.save_keyframe_trajectory_tum("KeyFrameTrajectory.txt")


if __name__ == "__main__":
    main()
