import time, numpy as np, jax, jax.numpy as jnp
from orb_slam2_e_tpu.ops.camera import Camera
from orb_slam2_e_tpu.ops import ba, lie

rng = np.random.RandomState(0)
C, P, O = 64, 8192, 24576
cam = Camera.create(fx=500., fy=500., cx=320., cy=240., width=640., height=480.)
pts = rng.uniform([-3, -3, 4], [3, 3, 10], (P, 3)).astype(np.float32)
pose7 = np.tile(np.asarray([1, 0, 0, 0, 0, 0, 0], np.float32), (C, 1))
pose7[:, 4] = np.linspace(0, 1.0, C)
obs_cam = jnp.asarray(rng.randint(0, C, O), jnp.int32)
obs_point = jnp.asarray(rng.randint(0, P, O), jnp.int32)
xc = pts[np.asarray(obs_point)] + pose7[np.asarray(obs_cam)][:, 4:7]
uv = np.stack([500 * xc[:, 0] / xc[:, 2] + 320,
               500 * xc[:, 1] / xc[:, 2] + 240,
               np.full(O, -1.0)], 1).astype(np.float32)
prob = ba.BAProblem(
    cam_pose7=jnp.asarray(pose7), cam_free=jnp.asarray(np.arange(C) > 0),
    points=jnp.asarray(pts), point_valid=jnp.ones(P, bool),
    obs_cam=obs_cam, obs_point=obs_point,
    obs_uvr=jnp.asarray(uv), obs_inv_sigma2=jnp.ones(O),
    obs_valid=jnp.ones(O, bool))

R, t = lie.pose7_unpack(prob.cam_pose7)
r, Jc, Jp, behind = jax.jit(ba._residual_jacobians)(cam, R, t, prob)
w, chi2, cost, live = jax.jit(
    lambda p, r, b: ba._weights(p, r, b, True))(prob, r, behind)
r, Jc, Jp, w = jax.block_until_ready((r, Jc, Jp, w))


def timeit(name, fn, n=5):
    # bust the axon dispatch cache: salt an input each call
    jax.block_until_ready(fn(0.0))
    t0 = time.perf_counter()
    for i in range(n):
        res = fn(float(i + 1) * 1e-6)
    jax.block_until_ready(res)
    print(f"{name:40s} {(time.perf_counter()-t0)/n*1000:8.2f} ms", flush=True)


blocks = jax.jit(lambda salt: ba._build_normal_blocks(
    prob, r + salt, Jc, Jp, w, C, P))
timeit("build_normal_blocks (5 scatters)", blocks)

Hcc, bc, Hpp, bp, Hcp = jax.block_until_ready(blocks(0.0))
solve = jax.jit(lambda salt: ba._schur_solve_dense(
    Hcc, bc + salt, Hpp, bp, Hcp, prob.cam_free, 1e-4))
timeit("schur_solve_dense", solve)

fullstep = jax.jit(lambda salt: ba.ba_solve(
    cam, prob._replace(points=prob.points + salt)))
timeit("ba_solve full (salted)", fullstep, n=3)

# individual scatters
s1 = jax.jit(lambda salt: jnp.zeros((C, 6, 6)).at[prob.obs_cam].add(
    jnp.einsum('oij,oik->ojk', Jc * (w + salt)[:, None, None], Jc)))
timeit("scatter Hcc (O->C)", s1)
s2 = jax.jit(lambda salt: jnp.zeros((P, 3, 3)).at[prob.obs_point].add(
    jnp.einsum('oij,oik->ojk', Jp * (w + salt)[:, None, None], Jp)))
timeit("scatter Hpp (O->P)", s2)
s3 = jax.jit(lambda salt: jnp.zeros((P, C, 6, 3)).at[
    prob.obs_point, prob.obs_cam].add(
    jnp.einsum('oij,oik->ojk', Jc * (w + salt)[:, None, None], Jp)))
timeit("scatter Hcp (O->PxC)", s3)
