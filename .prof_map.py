import time, numpy as np, jax, jax.numpy as jnp
from orb_slam2_e_tpu.ops.camera import Camera
from orb_slam2_e_tpu.models.system import SlamSystem, SystemConfig, Sensor
from orb_slam2_e_tpu.models import tracking as T, local_mapping as LM
from orb_slam2_e_tpu.utils.synthetic import SyntheticScene, orbit_trajectory
import functools

W,H=640,480
scene = SyntheticScene(n_points=600, seed=1, width=W, height=H, fx=500, fy=500, cx=W/2, cy=H/2)
poses, centers = orbit_trajectory(n_frames=30, radius=1.2, forward=0.05)
images = [scene.render(R, t) for R, t in poses]
cam = Camera.create(fx=500, fy=500, cx=W/2, cy=H/2, width=W, height=H)
cfg = SystemConfig(max_keyframes=64, max_points=16384, n_features=1000,
                   n_levels=8, max_frames_between_kf=6,
                   min_init_matches=80, loop_closing=False)
sysm = SlamSystem(cam, cfg, Sensor.MONOCULAR)
for k, img in enumerate(images):
    sysm.track_monocular(img, k / 30.0)
mcfg = sysm.map_cfg
st = sysm.map
kf = jnp.int32(max(sysm.last_kf_slot,0))

def timeit(name, fn, n=10):
    jax.block_until_ready(fn())
    t0=time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    print(f"{name:30s} {(time.perf_counter()-t0)/n*1000:8.2f} ms", flush=True)

timeit("cull_map_points", lambda: LM.cull_map_points(mcfg, st, kf))
timeit("triangulate_with_neighbors", lambda: LM.triangulate_with_neighbors(cam, mcfg, st, kf))
timeit("fuse_neighbors", lambda: LM.fuse_neighbors(cam, mcfg, st, kf))
timeit("local_ba", lambda: LM.local_ba(cam, mcfg, st, kf))
timeit("cull_keyframes", lambda: LM.cull_keyframes(mcfg, st, kf))
frame = sysm._mk_frame_mono(jnp.asarray(images[-1]))
timeit("insert_keyframe", lambda: T.insert_keyframe(cam, sysm.track_cfg, st, frame, jnp.int32(99), jnp.float32(3.3), kf))
