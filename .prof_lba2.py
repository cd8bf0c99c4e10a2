import time, numpy as np, jax, jax.numpy as jnp
from orb_slam2_e_tpu.ops.camera import Camera
from orb_slam2_e_tpu.ops import ba

rng = np.random.RandomState(0)
C, P, O = 64, 8192, 24576
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


def mkprob(obs_cam, obs_point, valid_frac=1.0, point_frac=1.0, free_frac=1.0):
    o_valid = np.arange(O) < int(O * valid_frac)
    p_valid = np.arange(P) < int(P * point_frac)
    c_free = (np.arange(C) > 0) & (np.arange(C) < int(C * free_frac))
    return ba.BAProblem(
        cam_pose7=jnp.asarray(pose7), cam_free=jnp.asarray(c_free),
        points=jnp.asarray(pts), point_valid=jnp.asarray(p_valid),
        obs_cam=jnp.asarray(obs_cam, jnp.int32),
        obs_point=jnp.asarray(obs_point, jnp.int32),
        obs_uvr=jnp.asarray(uv), obs_inv_sigma2=jnp.ones(O),
        obs_valid=jnp.asarray(o_valid))


def timeit(name, fn, n=5):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r)
    print(f"{name:44s} {(time.perf_counter()-t0)/n*1000:8.2f} ms", flush=True)


p_rand = mkprob(obs_cam, obs_point)
timeit("random idx, all valid", lambda: ba.ba_solve_jit(cam, p_rand))

# padding like the real problem: only first 3000 obs live, rest alias 0
oc = obs_cam.copy(); op = obs_point.copy()
oc[3000:] = 0; op[3000:] = 0
p_pad = mkprob(oc, op, valid_frac=3000 / O, point_frac=1000 / P,
               free_frac=7 / C)
timeit("padded idx->0, 3000 live", lambda: ba.ba_solve_jit(cam, p_pad))

# padding but indices stay random (mask-only padding)
p_mask = mkprob(obs_cam, obs_point, valid_frac=3000 / O,
                point_frac=1000 / P, free_frac=7 / C)
timeit("mask-only padding, random idx", lambda: ba.ba_solve_jit(cam, p_mask))

# sorted observation indices
order = np.lexsort((obs_cam, obs_point))
p_sort = mkprob(obs_cam[order], obs_point[order])
timeit("sorted-by-point idx, all valid", lambda: ba.ba_solve_jit(cam, p_sort))
