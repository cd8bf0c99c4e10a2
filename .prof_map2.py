import time, numpy as np, jax, jax.numpy as jnp
from orb_slam2_e_tpu.ops.camera import Camera
from orb_slam2_e_tpu.models.system import SlamSystem, SystemConfig, Sensor
from orb_slam2_e_tpu.models import tracking as T, local_mapping as LM
from orb_slam2_e_tpu.utils.synthetic import SyntheticScene, orbit_trajectory

W, H = 640, 480
scene = SyntheticScene(n_points=600, seed=1, width=W, height=H, fx=500,
                       fy=500, cx=W/2, cy=H/2)
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
print("mcfg:", mcfg.ba_cams, mcfg.ba_fixed, mcfg.ba_points, mcfg.ba_obs,
      mcfg.ba_iters1, mcfg.ba_iters2)
st0 = sysm.map
kf = jnp.int32(max(sysm.last_kf_slot, 0))


def timeit(name, fn, n=6):
    jax.block_until_ready(fn(0.0))
    t0 = time.perf_counter()
    for i in range(n):
        r = fn(float(i + 1) * 1e-7)
    jax.block_until_ready(r)
    print(f"{name:34s} {(time.perf_counter()-t0)/n*1000:8.2f} ms", flush=True)


def salted(s):
    return st0._replace(lm_xyz=st0.lm_xyz + s)


timeit("cull_map_points", lambda s: LM.cull_map_points(mcfg, salted(s), kf))
timeit("triangulate_with_neighbors",
       lambda s: LM.triangulate_with_neighbors(cam, mcfg, salted(s), kf))
timeit("fuse_neighbors", lambda s: LM.fuse_neighbors(cam, mcfg, salted(s), kf))
timeit("refresh_landmarks", lambda s: LM.refresh_landmarks(mcfg, salted(s), kf))
timeit("local_ba", lambda s: LM.local_ba(cam, mcfg, salted(s), kf))
timeit("cull_keyframes", lambda s: LM.cull_keyframes(mcfg, salted(s), kf))
timeit("mapping_pass ALL", lambda s: LM.mapping_pass(cam, mcfg, salted(s), kf),
       n=4)
frame = sysm._mk_frame_mono(jnp.asarray(images[-1]))
timeit("insert_and_map ALL",
       lambda s: sysm._insert_and_map(salted(s), frame, jnp.int32(99),
                                      jnp.float32(3.3), kf,
                                      do_ba=True, do_cull_kf=True), n=4)
