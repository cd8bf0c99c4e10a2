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
N = 16


def chain(name, step, x0):
    jax.block_until_ready(step(x0))
    t0 = time.perf_counter()
    x = x0
    for _ in range(8):
        x = step(x)
    jax.block_until_ready(x)
    print(f"{name:44s} {(time.perf_counter()-t0)/8/N*1000:8.3f} ms/iter",
          flush=True)


R0, t0_ = lie.pose7_unpack(prob.cam_pose7)


@jax.jit
def step_resjac(x):
    def body(i, xyz):
        r, Jc, Jp, behind = ba._residual_jacobians(
            cam, R0, t0_, prob._replace(points=xyz))
        return xyz + 1e-12 * jnp.zeros((P, 3)).at[prob.obs_point].add(r)
    return jax.lax.fori_loop(0, N, body, x)

chain("resjac (dep-chained)", step_resjac, prob.points)


@jax.jit
def step_blocks(x):
    def body(i, xyz):
        r, Jc, Jp, behind = ba._residual_jacobians(
            cam, R0, t0_, prob._replace(points=xyz))
        w = jnp.ones(O)
        Hcc, bc, Hpp, bp, Hcp = ba._build_normal_blocks(
            prob._replace(points=xyz), r, Jc, Jp, w, C, P)
        return xyz + 1e-12 * bp + 1e-18 * Hcp[:, 0, 0, :]
    return jax.lax.fori_loop(0, N, body, x)

chain("resjac+blocks (dep-chained)", step_blocks, prob.points)


@jax.jit
def step_full(x):
    def body(i, xyz):
        r, Jc, Jp, behind = ba._residual_jacobians(
            cam, R0, t0_, prob._replace(points=xyz))
        w = jnp.ones(O)
        Hcc, bc, Hpp, bp, Hcp = ba._build_normal_blocks(
            prob._replace(points=xyz), r, Jc, Jp, w, C, P)
        dxc, dxp = ba._schur_solve_dense(Hcc, bc, Hpp, bp, Hcp,
                                         prob.cam_free, 1e-4)
        return xyz + 1e-6 * dxp
    return jax.lax.fori_loop(0, N, body, x)

chain("resjac+blocks+schur (dep-chained)", step_full, prob.points)


def schur_nocg(Hcc, bc, Hpp, bp, Hcp, cam_free, lam):
    """schur solve but direct LU instead of CG48."""
    eye3 = jnp.eye(3)
    Hpp_l = (Hpp + lam * ba._diag_embed(jnp.diagonal(Hpp, axis1=1, axis2=2))
             + 1e-9 * eye3)
    Hpp_inv = ba._inv3x3(Hpp_l)
    T = jnp.einsum('pcij,pjk->pcik', Hcp, Hpp_inv)
    A = T.transpose(1, 2, 0, 3).reshape(C * 6, P * 3)
    B = Hcp.transpose(0, 3, 1, 2).reshape(P * 3, C * 6)
    S_flat = jax.lax.dot_general(A.astype(jnp.bfloat16),
                                 B.astype(jnp.bfloat16),
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    S_off = S_flat.reshape(C, 6, C, 6).transpose(0, 2, 1, 3)
    rhs_red = bc - (A @ bp.reshape(-1)).reshape(C, 6)
    S = -S_off
    S = S.at[jnp.arange(C), jnp.arange(C)].add(
        Hcc + lam * ba._diag_embed(jnp.diagonal(Hcc, axis1=1, axis2=2)))
    free = cam_free.astype(S.dtype)
    S = S * free[:, None, None, None] * free[None, :, None, None]
    S = S.at[jnp.arange(C), jnp.arange(C)].add(
        (1.0 - free)[:, None, None] * jnp.eye(6))
    rhs_red = rhs_red * free[:, None]
    Sf = S.transpose(0, 2, 1, 3).reshape(6 * C, 6 * C)
    dxc = jnp.linalg.solve(Sf, -rhs_red.reshape(-1)).reshape(C, 6)
    dxc = dxc * free[:, None]
    t2 = jnp.einsum('pcij,ci->pj', Hcp, dxc)
    dxp = -jnp.einsum('pij,pj->pi', Hpp_inv, bp + t2)
    return dxc, dxp


@jax.jit
def step_full_lu(x):
    def body(i, xyz):
        r, Jc, Jp, behind = ba._residual_jacobians(
            cam, R0, t0_, prob._replace(points=xyz))
        w = jnp.ones(O)
        Hcc, bc, Hpp, bp, Hcp = ba._build_normal_blocks(
            prob._replace(points=xyz), r, Jc, Jp, w, C, P)
        dxc, dxp = schur_nocg(Hcc, bc, Hpp, bp, Hcp, prob.cam_free, 1e-4)
        return xyz + 1e-6 * dxp
    return jax.lax.fori_loop(0, N, body, x)

chain("resjac+blocks+schur-LU (dep-chained)", step_full_lu, prob.points)
