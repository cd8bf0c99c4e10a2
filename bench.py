"""Benchmark: tracking throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Measurements:
- batched throughput (headline): B=8 independent camera streams tracked
  lock-step, one dispatch per step — total frames/s the chip sustains
  (the TPU utilization mode; SURVEY.md §7 M6).
- single-stream end-to-end SLAM fps (mapping + local BA enabled, pipelined
  frame loop) for reference-like operation.
- per-stage device milliseconds (extract / fused track / insert+map), so
  regressions are attributable (VERDICT r2 asked for stage timings).

Baseline anchor: the reference claims real-time (30 fps) single-stream SLAM
on an i7-class CPU (reference README.md:19,46). vs_baseline = total
frames/s / 30.
"""

import json
import time

import numpy as np


def build_system(W=640, H=480):
    from orb_slam2_e_tpu.ops.camera import Camera
    from orb_slam2_e_tpu.models.system import SlamSystem, SystemConfig, \
        Sensor
    cam = Camera.create(fx=500, fy=500, cx=W / 2, cy=H / 2, width=W,
                        height=H)
    cfg = SystemConfig(max_keyframes=64, max_points=16384, n_features=1000,
                       n_levels=8, max_frames_between_kf=6,
                       min_init_matches=80, loop_closing=False)
    return SlamSystem(cam, cfg, Sensor.MONOCULAR), cam


def single_stream(sys, images, n_warm=14):
    import jax
    for k, img in enumerate(images[:n_warm]):
        sys.track_monocular(img, k / 30.0)
    jax.block_until_ready(sys.map.lm_xyz)
    t0 = time.perf_counter()
    n = 0
    for k, img in enumerate(images[n_warm:]):
        sys.track_monocular(img, (n_warm + k) / 30.0)
        n += 1
    jax.block_until_ready(sys.map.lm_xyz)
    sys._drain_pending() if hasattr(sys, "_drain_pending") else None
    dt = time.perf_counter() - t0
    return n / dt


def stage_times(sys, img):
    """Median device ms of the pipeline stages (post-warmup)."""
    import jax
    import jax.numpy as jnp
    img = jnp.asarray(img)

    def med(fn, n=8):
        """Amortized per-call ms: n async dispatches, ONE final sync — so
        the ~23 ms tunnel round-trip is paid once, not per call, and the
        number approximates device time (what an on-host deployment sees).
        fn(i) receives the call index: inputs must be salted per call, or
        the remote-TPU client replays cached results for repeated
        identical dispatches."""
        jax.block_until_ready(fn(0))  # warm/compile
        t0 = time.perf_counter()
        r = None
        for i in range(n):
            r = fn(i + 1)
        jax.block_until_ready(r)
        return round((time.perf_counter() - t0) / n * 1e3, 2)

    # salt in the IMAGE dtype — a float salt would promote uint8 frames to
    # f32 and force a second (multi-minute) compile of the whole step
    salt = (jnp.uint8 if img.dtype == jnp.uint8 else jnp.float32)
    out = {"extract_ms": med(
        lambda i: sys.extractor(img + salt(i)).desc)}
    if sys._loop_state is not None:
        import jax.tree_util as jtu
        loop = sys._loop_state

        def run_step(i):
            lo, flags, pose = sys._sstep[sys.sensor](
                jtu.tree_map(lambda x: jnp.asarray(x).copy(), loop),
                img + salt(i), jnp.int32(10 ** 6), jnp.float32(0.0),
                jnp.bool_(False))
            return flags

        out["super_step_ms"] = med(run_step)
    return out


def main():
    import contextlib
    import os
    import jax
    import jax.numpy as jnp
    from orb_slam2_e_tpu.parallel.batched import BatchedTracker
    from orb_slam2_e_tpu.utils.synthetic import SyntheticScene, \
        orbit_trajectory

    # ORB_SLAM2_E_TPU_TRACE=<dir>: capture a jax profiler trace of the
    # measured section (open with tensorboard / xprof). The per-kernel
    # view complements the stage_ms table below.
    trace_dir = os.environ.get("ORB_SLAM2_E_TPU_TRACE")
    trace = (jax.profiler.trace(trace_dir) if trace_dir
             else contextlib.nullcontext())

    B = int(os.environ.get("ORB_SLAM2_E_TPU_BENCH_LANES", "8"))
    W, H = 640, 480
    scene = SyntheticScene(n_points=600, seed=1, width=W, height=H,
                           fx=500, fy=500, cx=W / 2, cy=H / 2)
    poses, centers = orbit_trajectory(n_frames=60, radius=1.2, forward=0.03)
    # uint8 frames, as a real camera / dataset reader delivers them — and a
    # quarter of the per-frame host->device transfer of float32
    images = [scene.render(R, t).astype(np.uint8) for R, t in poses]

    sys, cam = build_system(W, H)
    with trace:
        single_fps = single_stream(sys, images)
    stages = stage_times(sys, images[-1])

    # batched throughput over B lanes sharing the built map, each lane
    # tracking a DIFFERENT segment of the sequence (staggered starts — not
    # B copies of one frame)
    maps = [sys.map for _ in range(B)]
    bt = BatchedTracker(cam, sys.track_cfg, maps,
                        n_features=sys.cfg.n_features,
                        n_levels=sys.cfg.n_levels)
    n_replay = 12
    starts = [len(images) - 1 - n_replay - b for b in range(B)]
    lane_frames = []
    for b in range(B):
        fr = sys._mk_frame_mono(jnp.asarray(images[starts[b]]))
        if starts[b] < len(sys.trajectory):
            pose7 = sys.trajectory[starts[b]][1]
            fr = fr._replace(pose7=jnp.asarray(pose7))
        lane_frames.append(fr)
    bt.bootstrap(lane_frames)
    ref_kfs = jnp.full((B,), max(sys.last_kf_slot, 0), jnp.int32)
    batch_imgs = [jnp.stack([jnp.asarray(images[starts[b] + 1 + s])
                             for b in range(B)])
                  for s in range(n_replay)]
    ok, n_in = bt.step(batch_imgs[0], ref_kfs)   # warmup/compile
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
        "stage_ms": stages,
    }))


if __name__ == "__main__":
    main()
