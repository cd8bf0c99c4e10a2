import time, numpy as np, jax, jax.numpy as jnp
from orb_slam2_e_tpu.ops.camera import Camera
from orb_slam2_e_tpu.models.system import SlamSystem, SystemConfig, Sensor
from orb_slam2_e_tpu.models import tracking as T
from orb_slam2_e_tpu.utils.synthetic import SyntheticScene, orbit_trajectory

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
print("kfs:", sysm.n_keyframes)

img = jnp.asarray(images[-1])
def timeit(name, fn, n=20):
    fn()  # warm
    jax.block_until_ready(fn())
    t0=time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    dt=(time.perf_counter()-t0)/n
    print(f"{name:30s} {dt*1000:8.2f} ms")
    return dt

# 1. extraction only
timeit("extract (mk_frame_mono)", lambda: sysm._mk_frame_mono(img))
frame = sysm._mk_frame_mono(img)
# 2. full fused step
vel = sysm.velocity7
lastf = sysm.last_frame
have = jnp.bool_(True)
refkf = jnp.int32(max(sysm.last_kf_slot,0))
timeit("fused step (extract+track)", lambda: sysm._step_mono(sysm.map, img, lastf, vel, have, refkf))
# 3. track only (prebuilt frame)
import functools
tcfg = sysm.track_cfg
@jax.jit
def track_only(mp, fr, lf, v, hv, rk):
    return T.track_frame_fused(cam, tcfg, mp, fr, lf, v, hv, rk)
timeit("track only", lambda: track_only(sysm.map, frame, lastf, vel, have, refkf))
# 4. dispatch+sync overhead floor
@jax.jit
def tiny(x): return x + 1
xs = jnp.zeros((4,))
timeit("dispatch+sync floor", lambda: tiny(xs))
# 5. insert_and_map
timeit("insert_and_map", lambda: sysm._insert_and_map(
    sysm.map, frame, jnp.int32(99), jnp.float32(3.3), jnp.int32(max(sysm.last_kf_slot,0)),
    do_ba=True, do_cull_kf=True), n=5)
