"""Benchmark: monocular tracking throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline anchor: the reference claims real-time (camera-rate, 30 fps) SLAM
on an i7-class CPU (reference README.md:19,46; 30 fps endoscopy configs at
roslaunch/sHamlyn01.yaml:21). vs_baseline = our frames/s / 30.
"""

import json
import time

import numpy as np


def main():
    import jax
    from orb_slam2_e_tpu.ops.camera import Camera
    from orb_slam2_e_tpu.models.system import SlamSystem, SystemConfig, Sensor
    from orb_slam2_e_tpu.utils.synthetic import SyntheticScene, orbit_trajectory

    W, H = 640, 480
    scene = SyntheticScene(n_points=600, seed=1, width=W, height=H,
                           fx=500, fy=500, cx=W / 2, cy=H / 2)
    n_frames = 40
    poses, centers = orbit_trajectory(n_frames=n_frames, radius=1.2,
                                      forward=0.05)
    images = [scene.render(R, t) for R, t in poses]

    cam = Camera.create(fx=500, fy=500, cx=W / 2, cy=H / 2, width=W, height=H)
    cfg = SystemConfig(max_keyframes=64, max_points=16384, n_features=1000,
                       n_levels=8, max_frames_between_kf=6,
                       min_init_matches=80)
    sys = SlamSystem(cam, cfg, Sensor.MONOCULAR)

    # warmup: initialize + compile all stages on the first frames
    times = []
    for k, img in enumerate(images):
        t0 = time.perf_counter()
        sys.track_monocular(img, k / 30.0)
        dt = time.perf_counter() - t0
        times.append(dt)
    # steady-state tracking time: median of the post-warmup, non-keyframe
    # frames (drop the first half which includes compilation)
    steady = sorted(times[n_frames // 2:])
    median = steady[len(steady) // 2]
    fps = 1.0 / median
    print(json.dumps({
        "metric": "mono_tracking_throughput",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
