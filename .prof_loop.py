import time, numpy as np, jax, jax.numpy as jnp
from orb_slam2_e_tpu.ops.camera import Camera
from orb_slam2_e_tpu.models.system import SlamSystem, SystemConfig, Sensor
from orb_slam2_e_tpu.utils.synthetic import SyntheticScene, orbit_trajectory

W, H = 640, 480
scene = SyntheticScene(n_points=600, seed=1, width=W, height=H, fx=500,
                       fy=500, cx=W/2, cy=H/2)
poses, centers = orbit_trajectory(n_frames=60, radius=1.2, forward=0.03)
images = [scene.render(R, t) for R, t in poses]
cam = Camera.create(fx=500, fy=500, cx=W/2, cy=H/2, width=W, height=H)
cfg = SystemConfig(max_keyframes=64, max_points=16384, n_features=1000,
                   n_levels=8, max_frames_between_kf=6,
                   min_init_matches=80, loop_closing=False)
sysm = SlamSystem(cam, cfg, Sensor.MONOCULAR)

# --- raw transfer cost of one image ---
img0 = images[0]
jax.block_until_ready(jax.device_put(img0))
t0 = time.perf_counter()
for i in range(8):
    r = jax.device_put(images[i % len(images)] + np.float32(i))
jax.block_until_ready(r)
print(f"device_put f32 image: {(time.perf_counter()-t0)/8*1000:.2f} ms")
u8 = [(im).astype(np.uint8) for im in images]
jax.block_until_ready(jax.device_put(u8[0]))
t0 = time.perf_counter()
for i in range(8):
    r = jax.device_put(u8[i % len(u8)])
jax.block_until_ready(r)
print(f"device_put u8 image:  {(time.perf_counter()-t0)/8*1000:.2f} ms")

# --- per-frame wall time in the real loop ---
times = []
kf_before = 0
for k, img in enumerate(images):
    t0 = time.perf_counter()
    sysm.track_monocular(img, k / 30.0)
    dt = (time.perf_counter() - t0) * 1000
    times.append(dt)
print("per-frame ms (frame: ms):")
print(" ".join(f"{t:.0f}" for t in times))
print(f"median {np.median(times[14:]):.1f} ms  mean {np.mean(times[14:]):.1f}"
      f"  kf_inserted={sysm.stats['kf_inserted']}")
