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
# sort by point (stable) so point-major scatters see sorted indices
order = np.argsort(obs_point, kind='stable')
obs_cam_s = obs_cam[order]
obs_point_s = obs_point[order]
xc = pts[obs_point_s] + pose7[obs_cam_s][:, 4:7]
uv = np.stack([500 * xc[:, 0] / xc[:, 2] + 320,
               500 * xc[:, 1] / xc[:, 2] + 240,
               np.full(O, -1.0)], 1).astype(np.float32)
prob = ba.BAProblem(
    cam_pose7=jnp.asarray(pose7), cam_free=jnp.asarray(np.arange(C) > 0),
    points=jnp.asarray(pts), point_valid=jnp.ones(P, bool),
    obs_cam=jnp.asarray(obs_cam_s, jnp.int32),
    obs_point=jnp.asarray(obs_point_s, jnp.int32),
    obs_uvr=jnp.asarray(uv), obs_inv_sigma2=jnp.ones(O),
    obs_valid=jnp.ones(O, bool))
N = 16
R0, t0_ = lie.pose7_unpack(prob.cam_pose7)


def chain(name, step, x0):
    jax.block_until_ready(step(x0))
    t0 = time.perf_counter()
    x = x0
    for _ in range(8):
        x = step(x)
    jax.block_until_ready(x)
    print(f"{name:52s} {(time.perf_counter()-t0)/8/N*1000:8.3f} ms/iter",
          flush=True)


def mkstep(blockfn):
    @jax.jit
    def step(x):
        def body(i, xyz):
            r, Jc, Jp, behind = ba._residual_jacobians(
                cam, R0, t0_, prob._replace(points=xyz))
            w = jnp.ones(O)
            out = blockfn(r, Jc, Jp, w)
            return xyz + 1e-12 * out
        return jax.lax.fori_loop(0, N, body, x)
    return step


def b_hcc(r, Jc, Jp, w):
    wJc = Jc * w[:, None, None]
    Hcc = jnp.zeros((C, 6, 6)).at[prob.obs_cam].add(
        jnp.einsum('oij,oik->ojk', wJc, Jc))
    bc = jnp.zeros((C, 6)).at[prob.obs_cam].add(
        jnp.einsum('oij,oi->oj', wJc, r))
    return Hcc.sum() + bc.sum()

chain("Hcc+bc scatter (by cam)", mkstep(b_hcc), prob.points)


def b_hcc_onehot(r, Jc, Jp, w):
    wJc = Jc * w[:, None, None]
    onehot = (prob.obs_cam[None, :] == jnp.arange(C)[:, None]).astype(
        jnp.bfloat16)                                    # (C, O)
    vals = jnp.concatenate([
        jnp.einsum('oij,oik->ojk', wJc, Jc).reshape(O, 36),
        jnp.einsum('oij,oi->oj', wJc, r)], -1)           # (O, 42)
    agg = jax.lax.dot_general(onehot, vals.astype(jnp.bfloat16),
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return agg.sum()

chain("Hcc+bc one-hot matmul (by cam)", mkstep(b_hcc_onehot), prob.points)


def b_hpp(r, Jc, Jp, w):
    wJp = Jp * w[:, None, None]
    Hpp = jnp.zeros((P, 3, 3)).at[prob.obs_point].add(
        jnp.einsum('oij,oik->ojk', wJp, Jp))
    bp = jnp.zeros((P, 3)).at[prob.obs_point].add(
        jnp.einsum('oij,oi->oj', wJp, r))
    return Hpp.sum() + bp.sum()

chain("Hpp+bp scatter (by point)", mkstep(b_hpp), prob.points)


def b_hpp_sorted(r, Jc, Jp, w):
    wJp = Jp * w[:, None, None]
    Hpp = jnp.zeros((P, 3, 3)).at[prob.obs_point].add(
        jnp.einsum('oij,oik->ojk', wJp, Jp), indices_are_sorted=True)
    bp = jnp.zeros((P, 3)).at[prob.obs_point].add(
        jnp.einsum('oij,oi->oj', wJp, r), indices_are_sorted=True)
    return Hpp.sum() + bp.sum()

chain("Hpp+bp scatter sorted-hint", mkstep(b_hpp_sorted), prob.points)


def b_hpp_seg(r, Jc, Jp, w):
    wJp = Jp * w[:, None, None]
    vals = jnp.concatenate([
        jnp.einsum('oij,oik->ojk', wJp, Jp).reshape(O, 9),
        jnp.einsum('oij,oi->oj', wJp, r)], -1)           # (O, 12)
    agg = jax.ops.segment_sum(vals, prob.obs_point, num_segments=P,
                              indices_are_sorted=True)
    return agg.sum()

chain("Hpp+bp segment_sum sorted", mkstep(b_hpp_seg), prob.points)


def b_hcp(r, Jc, Jp, w):
    wJc = Jc * w[:, None, None]
    Hcp = jnp.zeros((P, C, 6, 3)).at[prob.obs_point, prob.obs_cam].add(
        jnp.einsum('oij,oik->ojk', wJc, Jp))
    return Hcp.sum()

chain("Hcp scatter (by point,cam)", mkstep(b_hcp), prob.points)


def b_hcp_sorted(r, Jc, Jp, w):
    wJc = Jc * w[:, None, None]
    Hcp = jnp.zeros((P, C, 6, 3)).at[prob.obs_point, prob.obs_cam].add(
        jnp.einsum('oij,oik->ojk', wJc, Jp), indices_are_sorted=True,
        unique_indices=True)
    return Hcp.sum()

chain("Hcp scatter sorted+unique hints", mkstep(b_hcp_sorted), prob.points)


def b_hcp_flat(r, Jc, Jp, w):
    wJc = Jc * w[:, None, None]
    flat = prob.obs_point * C + prob.obs_cam
    Hcp = jnp.zeros((P * C, 6, 3)).at[flat].add(
        jnp.einsum('oij,oik->ojk', wJc, Jp))
    return Hcp.sum()

chain("Hcp scatter flat-index", mkstep(b_hcp_flat), prob.points)


def b_hcp_seg(r, Jc, Jp, w):
    wJc = Jc * w[:, None, None]
    flat = prob.obs_point * C + prob.obs_cam
    vals = jnp.einsum('oij,oik->ojk', wJc, Jp).reshape(O, 18)
    Hcp = jax.ops.segment_sum(vals, flat, num_segments=P * C,
                              indices_are_sorted=True)
    return Hcp.sum()

chain("Hcp segment_sum flat sorted", mkstep(b_hcp_seg), prob.points)


# CG iteration-count share inside schur solve
def mk_schur(iters):
    @jax.jit
    def step(x):
        def body(i, xyz):
            r, Jc, Jp, behind = ba._residual_jacobians(
                cam, R0, t0_, prob._replace(points=xyz))
            w = jnp.ones(O)
            Hcc, bc, Hpp, bp, Hcp = ba._build_normal_blocks(
                prob._replace(points=xyz), r, Jc, Jp, w, C, P)
            eye3 = jnp.eye(3)
            lam = 1e-4
            Hpp_l = (Hpp + lam * ba._diag_embed(
                jnp.diagonal(Hpp, axis1=1, axis2=2)) + 1e-9 * eye3)
            Hpp_inv = ba._inv3x3(Hpp_l)
            T = jnp.einsum('pcij,pjk->pcik', Hcp, Hpp_inv)
            A = T.transpose(1, 2, 0, 3).reshape(C * 6, P * 3)
            B = Hcp.transpose(0, 3, 1, 2).reshape(P * 3, C * 6)
            S_flat = jax.lax.dot_general(A.astype(jnp.bfloat16),
                                         B.astype(jnp.bfloat16),
                                         (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
            S = S_flat.reshape(C, 6, C, 6).transpose(0, 2, 1, 3) * -1.0
            S = S.at[jnp.arange(C), jnp.arange(C)].add(Hcc)
            Sf = S.transpose(0, 2, 1, 3).reshape(6 * C, 6 * C) \
                + 10.0 * jnp.eye(6 * C)
            rhs = (bc - (A @ bp.reshape(-1)).reshape(C, 6)).reshape(-1)
            dxc = ba._spd_solve_cg(Sf, rhs, iters=iters)
            return xyz + 1e-9 * dxc.sum()
        return jax.lax.fori_loop(0, N, body, x)
    return step

chain("full iter w/ CG48", mk_schur(48), prob.points)
chain("full iter w/ CG16", mk_schur(16), prob.points)
chain("full iter w/ CG0", mk_schur(0), prob.points)
