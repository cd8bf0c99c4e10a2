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

N = 10   # iterations inside the fused loop, emulating the LM loop


def timeit(name, fn, n=6):
    jax.block_until_ready(fn(0.0))
    t0 = time.perf_counter()
    for i in range(n):
        r = fn(float(i + 1) * 1e-6)
    jax.block_until_ready(r)
    print(f"{name:44s} {(time.perf_counter()-t0)/n*1000:8.2f} ms"
          f"  ({(time.perf_counter()-t0)/n/N*1000:6.2f} /iter)", flush=True)


R0, t0_ = lie.pose7_unpack(prob.cam_pose7)


@jax.jit
def loop_resjac(s):
    def body(i, acc):
        r, Jc, Jp, behind = ba._residual_jacobians(
            cam, R0, t0_, prob._replace(points=prob.points + s + i * 1e-9))
        return acc + r.sum() + Jc.sum() + Jp.sum()
    return jax.lax.fori_loop(0, N, body, jnp.float32(0))

timeit(f"resjac x{N}", loop_resjac)

r, Jc, Jp, behind = jax.block_until_ready(jax.jit(
    lambda: ba._residual_jacobians(cam, R0, t0_, prob))())
w = jnp.ones(O)


@jax.jit
def loop_blocks(s):
    def body(i, acc):
        Hcc, bc, Hpp, bp, Hcp = ba._build_normal_blocks(
            prob, r + s + i * 1e-9, Jc, Jp, w, C, P)
        return acc + Hcc.sum() + Hcp.sum() + Hpp.sum() + bc.sum() + bp.sum()
    return jax.lax.fori_loop(0, N, body, jnp.float32(0))

timeit(f"build_normal_blocks x{N}", loop_blocks)

Hcc, bc, Hpp, bp, Hcp = jax.block_until_ready(jax.jit(
    lambda: ba._build_normal_blocks(prob, r, Jc, Jp, w, C, P))())


@jax.jit
def loop_schur(s):
    def body(i, acc):
        dxc, dxp = ba._schur_solve_dense(Hcc, bc + s + i * 1e-9, Hpp, bp,
                                         Hcp, prob.cam_free, 1e-4)
        return acc + dxc.sum() + dxp.sum()
    return jax.lax.fori_loop(0, N, body, jnp.float32(0))

timeit(f"schur_solve_dense x{N}", loop_schur)


# schur pieces
def assemble(bc_s):
    lam = 1e-4
    Hpp_l = (Hpp + lam * ba._diag_embed(jnp.diagonal(Hpp, axis1=1, axis2=2))
             + 1e-9 * jnp.eye(3))
    Hpp_inv = ba._inv3x3(Hpp_l)
    T = jnp.einsum('pcij,pjk->pcik', Hcp, Hpp_inv)
    A = T.transpose(1, 2, 0, 3).reshape(C * 6, P * 3)
    B = Hcp.transpose(0, 3, 1, 2).reshape(P * 3, C * 6)
    S_flat = jax.lax.dot_general(A.astype(jnp.bfloat16),
                                 B.astype(jnp.bfloat16),
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    rhs = (bc_s) - (A @ bp.reshape(-1)).reshape(C, 6)
    return S_flat, rhs


@jax.jit
def loop_assemble(s):
    def body(i, acc):
        S_flat, rhs = assemble(bc + s + i * 1e-9)
        return acc + S_flat.sum() + rhs.sum()
    return jax.lax.fori_loop(0, N, body, jnp.float32(0))

timeit(f"schur assemble x{N}", loop_assemble)

S_flat, rhs = jax.block_until_ready(jax.jit(lambda: assemble(bc))())
Sq = S_flat.reshape(C, 6, C, 6).transpose(0, 2, 1, 3)
Sq = Sq.at[jnp.arange(C), jnp.arange(C)].add(Hcc)
Sf = Sq.transpose(0, 2, 1, 3).reshape(6 * C, 6 * C) + 10.0 * jnp.eye(6 * C)


@jax.jit
def loop_cg(s):
    def body(i, acc):
        x = ba._spd_solve_cg(Sf, rhs.reshape(-1) + s + i * 1e-9)
        return acc + x.sum()
    return jax.lax.fori_loop(0, N, body, jnp.float32(0))

timeit(f"CG48 x{N}", loop_cg)
