"""Benchmark: tracking throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Two measurements:
- batched throughput (headline): B=8 independent camera streams tracked
  lock-step, one dispatch per step — total frames/s the chip sustains
  (the TPU utilization mode; SURVEY.md §7 M6).
- single-stream end-to-end SLAM fps (mapping enabled) for reference-like
  operation, reported as an extra field.

Baseline anchor: the reference claims real-time (30 fps) single-stream SLAM
on an i7-class CPU (reference README.md:19,46). vs_baseline = total
frames/s / 30.
"""

import json
import time

import numpy as np


def build_map_and_frames(B=8, W=640, H=480, n_frames=30):
    import jax
    import jax.numpy as jnp
    from orb_slam2_e_tpu.ops.camera import Camera
    from orb_slam2_e_tpu.models.system import SlamSystem, SystemConfig, Sensor
    from orb_slam2_e_tpu.utils.synthetic import SyntheticScene, orbit_trajectory

    scene = SyntheticScene(n_points=600, seed=1, width=W, height=H,
                           fx=500, fy=500, cx=W / 2, cy=H / 2)
    poses, centers = orbit_trajectory(n_frames=n_frames, radius=1.2,
                                      forward=0.05)
    images = [scene.render(R, t) for R, t in poses]
    cam = Camera.create(fx=500, fy=500, cx=W / 2, cy=H / 2, width=W, height=H)
    cfg = SystemConfig(max_keyframes=64, max_points=16384, n_features=1000,
                       n_levels=8, max_frames_between_kf=6,
                       min_init_matches=80, loop_closing=False)
    sys = SlamSystem(cam, cfg, Sensor.MONOCULAR)
    t_single = []
    for k, img in enumerate(images):
        t0 = time.perf_counter()
        sys.track_monocular(img, k / 30.0)
        t_single.append(time.perf_counter() - t0)
    steady = sorted(t_single[n_frames // 2:])
    single_fps = 1.0 / steady[len(steady) // 2]
    return sys, cam, images, single_fps


def main():
    import jax
    import jax.numpy as jnp
    from orb_slam2_e_tpu.parallel.batched import BatchedTracker

    B = 8
    sys, cam, images, single_fps = build_map_and_frames(B=B)

    # batched throughput over B replicas of the built map
    maps = [sys.map for _ in range(B)]
    bt = BatchedTracker(cam, sys.track_cfg, maps,
                        n_features=sys.cfg.n_features,
                        n_levels=sys.cfg.n_levels)
    bt.bootstrap([sys.last_frame for _ in range(B)])
    ref_kfs = jnp.full((B,), max(sys.last_kf_slot, 0), jnp.int32)
    # replay the last frames across all lanes
    replay = [jnp.asarray(im) for im in images[-10:]]
    batch_imgs = [jnp.stack([im] * B) for im in replay]
    # warmup/compile
    ok, n_in = bt.step(batch_imgs[0], ref_kfs)
    int(ok.sum())
    t0 = time.perf_counter()
    n_steps = 0
    for img_b in batch_imgs[1:]:
        ok, n_in = bt.step(img_b, ref_kfs)
        n_steps += 1
    int(ok.sum())   # sync once at the end
    dt = time.perf_counter() - t0
    batched_fps = B * n_steps / dt

    print(json.dumps({
        "metric": "tracking_throughput",
        "value": round(batched_fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(batched_fps / 30.0, 3),
        "batch_lanes": B,
        "single_stream_slam_fps": round(single_fps, 2),
    }))


if __name__ == "__main__":
    main()
