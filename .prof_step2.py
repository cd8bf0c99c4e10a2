import time, numpy as np, jax, jax.numpy as jnp
from orb_slam2_e_tpu.ops.camera import Camera
from orb_slam2_e_tpu.ops import ba, lie

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


def timeit(name, fn, n=6):
    jax.block_until_ready(fn(0.0))
    t0 = time.perf_counter()
    for i in range(n):
        r = fn(float(i + 1) * 1e-6)
    jax.block_until_ready(r)
    print(f"{name:40s} {(time.perf_counter()-t0)/n*1000:8.2f} ms", flush=True)


@jax.jit
def resjac(s):
    R, t = lie.pose7_unpack(prob.cam_pose7)
    return ba._residual_jacobians(cam, R, t,
                                  prob._replace(points=prob.points + s))

timeit("residual_jacobians", resjac)
r, Jc, Jp, behind = jax.block_until_ready(resjac(0.0))
w = jnp.ones(O)

blocks = jax.jit(lambda s: ba._build_normal_blocks(
    prob, r + s, Jc, Jp, w, C, P))
timeit("build_normal_blocks", blocks)
Hcc, bc, Hpp, bp, Hcp = jax.block_until_ready(blocks(0.0))

solve = jax.jit(lambda s: ba._schur_solve_dense(
    Hcc, bc + s, Hpp, bp, Hcp, prob.cam_free, 1e-4))
timeit("schur_solve_dense (CG48)", solve)

# Schur assembly alone (everything except the CG)
def assemble(s):
    lam = 1e-4
    eye3 = jnp.eye(3)
    Hpp_l = (Hpp + lam * ba._diag_embed(jnp.diagonal(Hpp, axis1=1, axis2=2))
             + 1e-9 * eye3)
    Hpp_inv = ba._inv3x3(Hpp_l)
    T = jnp.einsum('pcij,pjk->pcik', Hcp, Hpp_inv)
    A = T.transpose(1, 2, 0, 3).reshape(C * 6, P * 3)
    B = Hcp.transpose(0, 3, 1, 2).reshape(P * 3, C * 6)
    S_flat = jax.lax.dot_general(A, B, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    rhs = (bc + s) - (A @ bp.reshape(-1)).reshape(C, 6)
    return S_flat, rhs

timeit("schur assembly only", jax.jit(assemble))
S_flat, rhs = jax.block_until_ready(jax.jit(assemble)(0.0))
Sq = S_flat.reshape(C, 6, C, 6).transpose(0, 2, 1, 3)
Sq = Sq.at[jnp.arange(C), jnp.arange(C)].add(Hcc)
Sf = Sq.transpose(0, 2, 1, 3).reshape(6 * C, 6 * C) + 10.0 * jnp.eye(6 * C)
cg = jax.jit(lambda s: ba._spd_solve_cg(Sf, rhs.reshape(-1) + s))
timeit("CG48 alone", cg)
cg24 = jax.jit(lambda s: ba._spd_solve_cg(Sf, rhs.reshape(-1) + s, iters=24))
timeit("CG24 alone", cg24)
lu = jax.jit(lambda s: jnp.linalg.solve(Sf, rhs.reshape(-1) + s))
timeit("LU alone", lu)
