import time, functools, numpy as np, jax, jax.numpy as jnp
from orb_slam2_e_tpu.ops.camera import Camera
from orb_slam2_e_tpu.ops import ba

C, P, O = 32, 4096, 12288
rng = np.random.RandomState(0)
cam = Camera.create(fx=500., fy=500., cx=320., cy=240., width=640., height=480.)
pts = rng.uniform([-3, -3, 4], [3, 3, 10], (P, 3)).astype(np.float32)
pose7 = np.tile(np.asarray([1, 0, 0, 0, 0, 0, 0], np.float32), (C, 1))
pose7[:, 4] = np.linspace(0, 1.0, C)
obs_cam = rng.randint(0, C, O)
obs_point = rng.randint(0, P, O)
xc = pts[obs_point] + pose7[obs_cam][:, 4:7]
uv = np.stack([500 * xc[:, 0] / xc[:, 2] + 320,
               500 * xc[:, 1] / xc[:, 2] + 240,
               np.full(O, -1.0)], 1).astype(np.float32)
prob = ba.BAProblem(
    cam_pose7=jnp.asarray(pose7), cam_free=jnp.asarray(np.arange(C) > 0),
    points=jnp.asarray(pts), point_valid=jnp.ones(P, bool),
    obs_cam=jnp.asarray(obs_cam, jnp.int32),
    obs_point=jnp.asarray(obs_point, jnp.int32),
    obs_uvr=jnp.asarray(uv), obs_inv_sigma2=jnp.ones(O),
    obs_valid=jnp.ones(O, bool))

solve = jax.jit(functools.partial(ba.ba_solve, iters_phase1=4,
                                  iters_phase2=6))
salt = jax.device_put(jnp.float32(0.0))
t0 = time.perf_counter()
r = solve(cam, prob)
print("compile+run1:", time.perf_counter() - t0)
jax.block_until_ready(r)
print("sync1:", time.perf_counter() - t0)
for k in range(4):
    t0 = time.perf_counter()
    r = solve(cam, prob._replace(points=prob.points + jnp.float32(k) * 1e-6))
    jax.block_until_ready(r.cam_pose7)
    print(f"run{k}: {time.perf_counter()-t0:.3f}s")
# per-iteration scaling: 2+3 vs 4+6
solve2 = jax.jit(functools.partial(ba.ba_solve, iters_phase1=2,
                                   iters_phase2=3))
jax.block_until_ready(solve2(cam, prob))
for k in range(2):
    t0 = time.perf_counter()
    r = solve2(cam, prob._replace(points=prob.points + jnp.float32(k) * 1e-6))
    jax.block_until_ready(r.cam_pose7)
    print(f"run-small{k}: {time.perf_counter()-t0:.3f}s")
