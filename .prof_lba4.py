import time, numpy as np, jax, jax.numpy as jnp
from orb_slam2_e_tpu.ops.camera import Camera
from orb_slam2_e_tpu.ops import ba

cam = Camera.create(fx=500., fy=500., cx=320., cy=240., width=640., height=480.)


def mkprob(C, P, O, seed=0):
    rng = np.random.RandomState(seed)
    pts = rng.uniform([-3, -3, 4], [3, 3, 10], (P, 3)).astype(np.float32)
    pose7 = np.tile(np.asarray([1, 0, 0, 0, 0, 0, 0], np.float32), (C, 1))
    pose7[:, 4] = np.linspace(0, 1.0, C)
    obs_cam = rng.randint(0, C, O)
    obs_point = rng.randint(0, P, O)
    xc = pts[obs_point] + pose7[obs_cam][:, 4:7]
    uv = np.stack([500 * xc[:, 0] / xc[:, 2] + 320,
                   500 * xc[:, 1] / xc[:, 2] + 240,
                   np.full(O, -1.0)], 1).astype(np.float32)
    uv[:, :2] += rng.normal(0, 0.5, (O, 2))
    pts_n = pts + rng.normal(0, 0.05, (P, 3)).astype(np.float32)
    return ba.BAProblem(
        cam_pose7=jnp.asarray(pose7), cam_free=jnp.asarray(np.arange(C) > 0),
        points=jnp.asarray(pts_n), point_valid=jnp.ones(P, bool),
        obs_cam=jnp.asarray(obs_cam, jnp.int32),
        obs_point=jnp.asarray(obs_point, jnp.int32),
        obs_uvr=jnp.asarray(uv), obs_inv_sigma2=jnp.ones(O),
        obs_valid=jnp.ones(O, bool))


def timeit(name, fn, nrep=4):
    jax.block_until_ready(fn(0.0))
    t0 = time.perf_counter()
    for i in range(nrep):
        r = fn(float(i + 1) * 1e-6)
    jax.block_until_ready(r)
    print(f"{name:44s} {(time.perf_counter()-t0)/nrep*1000:8.2f} ms",
          flush=True)


for (C, P, O) in [(64, 8192, 24576), (32, 4096, 12288), (32, 8192, 24576),
                  (16, 4096, 12288)]:
    prob = mkprob(C, P, O)
    timeit(f"ba_solve 5+10  C={C} P={P} O={O}",
           jax.jit(lambda s, pr=prob: ba.ba_solve(
               cam, pr._replace(points=pr.points + s))))
    timeit(f"ba_solve 3+5   C={C} P={P} O={O}",
           jax.jit(lambda s, pr=prob: ba.ba_solve(
               cam, pr._replace(points=pr.points + s),
               iters_phase1=3, iters_phase2=5)))
