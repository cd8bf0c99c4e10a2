"""Bundle adjustment: Levenberg-Marquardt over cameras + landmarks with
Schur-complement elimination, in two flavors:

- `ba_solve` (dense Schur): for local BA windows (tens of cameras), the
  reduced (6C x 6C) camera system is materialized and solved with Cholesky.
  Replaces reference Optimizer::LocalBundleAdjustment +
  g2o BlockSolver_6_3 Schur marginalization (reference src/Optimizer.cc:837,
  Thirdparty/g2o/g2o/core/block_solver.hpp).
- `ba_solve_pcg` (matrix-free): the Schur product S.x is computed from the
  observation COO arrays with segment-sums and solved with preconditioned
  conjugate gradients (block-Jacobi). This is the scale-out path: each term
  of S.x is a per-device partial reduction followed by a psum (see
  orb_slam2_e_tpu.parallel.dist_ba). Replaces g2o's sparse Cholesky for
  global BA (reference Optimizer.cc:66-262 GlobalBundleAdjustemnt).

Structure-of-arrays problem layout (all fixed capacity, masked):
  cam_pose7 (C, 7), cam_free (C,), points (P, 3), point_valid (P,),
  obs_cam (O,), obs_point (O,), obs_uvr (O, 3), obs_inv_sigma2 (O,),
  obs_valid (O,).

The LM schedule mirrors the reference: 5 its -> outlier down-weight
(chi2 > 5.991 mono / 7.815 stereo or negative depth) -> 10 its
(reference src/Optimizer.cc:1008-1033), with Huber kernels
delta = sqrt(5.991)/sqrt(7.815) (reference Optimizer.cc:961-976).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import lie
from .camera import Camera
from .pose_opt import CHI2_MONO, CHI2_STEREO, huber_weight


class BAProblem(NamedTuple):
    cam_pose7: jnp.ndarray      # (C, 7) Tcw quaternion+translation
    cam_free: jnp.ndarray       # (C,) bool — False = gauge/fixed ring
    points: jnp.ndarray         # (P, 3) world positions
    point_valid: jnp.ndarray    # (P,) bool
    obs_cam: jnp.ndarray        # (O,) int32
    obs_point: jnp.ndarray      # (O,) int32
    obs_uvr: jnp.ndarray        # (O, 3) measured u, v, u_right (<0 => mono)
    obs_inv_sigma2: jnp.ndarray # (O,)
    obs_valid: jnp.ndarray      # (O,) bool


class BAResult(NamedTuple):
    cam_pose7: jnp.ndarray
    points: jnp.ndarray
    obs_inlier: jnp.ndarray     # (O,) bool — chi2 test at final state
    final_cost: jnp.ndarray


def _residual_jacobians(cam: Camera, R, t, prob: BAProblem):
    """Per-observation residual (O,3), camera Jacobian (O,3,6) and point
    Jacobian (O,3,3). R/t: (C,3,3)/(C,3)."""
    Ro = R[prob.obs_cam]                            # (O, 3, 3)
    to = t[prob.obs_cam]
    Xw = prob.points[prob.obs_point]
    xc = jnp.einsum('oij,oj->oi', Ro, Xw) + to
    z = jnp.maximum(xc[:, 2], 1e-6)
    u = cam.fx * xc[:, 0] / z + cam.cx
    v = cam.fy * xc[:, 1] / z + cam.cy
    ur = u - cam.bf / z
    is_stereo = prob.obs_uvr[:, 2] >= 0
    r = jnp.stack([u - prob.obs_uvr[:, 0], v - prob.obs_uvr[:, 1],
                   jnp.where(is_stereo, ur - prob.obs_uvr[:, 2], 0.0)], -1)
    iz = 1.0 / z
    iz2 = iz * iz
    zeros = jnp.zeros_like(z)
    du = jnp.stack([cam.fx * iz, zeros, -cam.fx * xc[:, 0] * iz2], -1)
    dv = jnp.stack([zeros, cam.fy * iz, -cam.fy * xc[:, 1] * iz2], -1)
    dur = du + jnp.stack([zeros, zeros, cam.bf * iz2], -1)
    dr_dxc = jnp.stack([du, dv, jnp.where(is_stereo[:, None], dur, 0.0)], -2)
    # camera: xi = [omega, upsilon], delta xc = -[xc]x w + v
    Jc = jnp.concatenate([
        jnp.einsum('oij,ojk->oik', dr_dxc, -lie.so3_hat(xc)), dr_dxc], -1)
    # point: delta xc = R delta Xw
    Jp = jnp.einsum('oij,ojk->oik', dr_dxc, Ro)
    behind = xc[:, 2] <= 1e-6
    return r, Jc, Jp, behind


def _weights(prob: BAProblem, r, behind, robust: bool, extra_mask=None):
    chi2 = jnp.sum(r * r, -1) * prob.obs_inv_sigma2
    is_stereo = prob.obs_uvr[:, 2] >= 0
    delta2 = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
    w_rob = jnp.where(robust, huber_weight(chi2, delta2), 1.0)
    live = (prob.obs_valid & prob.point_valid[prob.obs_point] & ~behind)
    if extra_mask is not None:
        live &= extra_mask
    w = prob.obs_inv_sigma2 * w_rob * live
    cost = jnp.sum(jnp.where(live, chi2 * w_rob, 0.0))
    return w, chi2, cost, live


def _build_normal_blocks(prob: BAProblem, r, Jc, Jp, w, C: int, P: int):
    """Per-obs products -> per-camera / per-point blocks, scatter-free.

    TPU rationale: XLA's scatter-add lowering dominated the whole BA
    iteration (~3 ms of a 6 ms step at O=12k). Camera aggregation is an
    (C, O) one-hot matmul (the MXU does the reduction); point aggregation
    is a segment_sum over point-sorted observations (ba_solve sorts obs
    once up front), which lowers to a vectorized sorted reduction instead
    of a serialized scatter.

    Returns Hcc (C,6,6), bc (C,6), Hpp (P,3,3), bp (P,3).
    REQUIRES prob.obs_* sorted by obs_point (padding has w == 0)."""
    O = r.shape[0]
    wJc = Jc * w[:, None, None]
    wJp = Jp * w[:, None, None]
    onehot_c = (prob.obs_cam[None, :]
                == jnp.arange(C)[:, None]).astype(r.dtype)     # (C, O)
    vals_c = jnp.concatenate([
        jnp.einsum('oij,oik->ojk', wJc, Jc).reshape(O, 36),
        jnp.einsum('oij,oi->oj', wJc, r)], -1)                 # (O, 42)
    # HIGHEST: this replaces an exact f32 scatter-add; default TPU matmul
    # precision would round vals_c to bf16 and cost Hcc/bc mantissa bits.
    # The matmul is tiny (C x O x 42), so full precision is free.
    agg_c = jnp.matmul(onehot_c, vals_c,
                       precision=jax.lax.Precision.HIGHEST)
    Hcc = agg_c[:, :36].reshape(C, 6, 6)
    bc = agg_c[:, 36:]
    vals_p = jnp.concatenate([
        jnp.einsum('oij,oik->ojk', wJp, Jp).reshape(O, 9),
        jnp.einsum('oij,oi->oj', wJp, r)], -1)                 # (O, 12)
    agg_p = jax.ops.segment_sum(vals_p, prob.obs_point, num_segments=P,
                                indices_are_sorted=True)
    Hpp = agg_p[:, :9].reshape(P, 3, 3)
    bp = agg_p[:, 9:]
    return Hcc, bc, Hpp, bp


def _chol3x3(M):
    """Closed-form batched Cholesky of SPD 3x3 blocks (lower L, M = L L^T).
    Pure VPU arithmetic like _inv3x3."""
    eps = 1e-12
    a = jnp.sqrt(jnp.maximum(M[..., 0, 0], eps))
    b = M[..., 1, 0] / a
    c = M[..., 2, 0] / a
    d = jnp.sqrt(jnp.maximum(M[..., 1, 1] - b * b, eps))
    e = (M[..., 2, 1] - c * b) / d
    f = jnp.sqrt(jnp.maximum(M[..., 2, 2] - c * c - e * e, eps))
    z = jnp.zeros_like(a)
    return jnp.stack([jnp.stack([a, z, z], -1),
                      jnp.stack([b, d, z], -1),
                      jnp.stack([c, e, f], -1)], -2)


def _schur_solve_dense(prob: BAProblem, Hcc, bc, Hpp, bp, Jc, Jp, w,
                       cam_free, lam):
    """Marginalize points, solve the reduced camera system, back-substitute.
    Returns (dxc (C,6), dxp (P,3)).

    Symmetric factored form: with L = chol(Hpp_lambda^-1) per point,
    Z[p,c] = Hcp[p,c] @ L[p] is accumulated DIRECTLY from the observations
    (segment_sum of wJc^T Jp L[point(o)] over point-sorted obs), so the
    (P,C,6,3) Hcp tensor is never materialized; the marginalization
    sum_p Hcp Hpp^-1 Hcp^T becomes ONE A @ A^T matmul with
    A = Z^(6C x 3P) on the MXU, and the rhs / back-substitution reuse A:
        Hcp Hpp^-1 bp = A (L^T bp),   Hpp^-1 Hcp^T dxc = L (A^T dxc).
    bf16 operands + f32 accumulation on the big matmul: the LM
    accept/reject (exact f32 residual costs) absorbs the rounding."""
    C = Hcc.shape[0]
    P = Hpp.shape[0]
    O = w.shape[0]
    Hpp_l = (Hpp + lam * _diag_embed(jnp.diagonal(Hpp, axis1=1, axis2=2))
             + 1e-9 * jnp.eye(3))
    Hpp_inv = _inv3x3(Hpp_l)                             # (P, 3, 3)
    L = _chol3x3(Hpp_inv)                                # (P, 3, 3)
    # Z accumulated straight from observations (obs sorted by point)
    wJc = Jc * w[:, None, None]
    Lo = L[prob.obs_point]                               # (O, 3, 3)
    zvals = jnp.einsum('oij,oik,okl->ojl', wJc, Jp, Lo)  # (O, 6, 3)
    flat = prob.obs_point * C + prob.obs_cam
    Z = jax.ops.segment_sum(zvals.reshape(O, 18), flat, num_segments=P * C,
                            indices_are_sorted=True).reshape(P, C, 6, 3)
    A = Z.transpose(1, 2, 0, 3).reshape(C * 6, P * 3)    # rows: (c,i)
    Ab = A.astype(jnp.bfloat16)
    S_flat = jax.lax.dot_general(Ab, Ab, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    S_off = S_flat.reshape(C, 6, C, 6).transpose(0, 2, 1, 3)
    Ltb = jnp.einsum('pji,pj->pi', L, bp)                # (P, 3) L^T bp
    # NOTE: the flat (point, cam) key two steps up and the segment key in
    # ba_solve are int32 — P * C must stay below 2^31 (local-BA capacities
    # are orders of magnitude under this; guarded in ba_solve).
    rhs_red = bc - (A @ Ltb.reshape(-1)).reshape(C, 6)   # (C, 6)
    S = -S_off
    S = S.at[jnp.arange(C), jnp.arange(C)].add(
        Hcc + lam * _diag_embed(jnp.diagonal(Hcc, axis1=1, axis2=2)))
    # fixed cameras: identity rows/cols, zero rhs
    free = cam_free.astype(S.dtype)
    S = S * free[:, None, None, None] * free[None, :, None, None]
    S = S.at[jnp.arange(C), jnp.arange(C)].add(
        (1.0 - free)[:, None, None] * jnp.eye(6))
    rhs_red = rhs_red * free[:, None]
    Sf = S.transpose(0, 2, 1, 3).reshape(6 * C, 6 * C)
    dxc = _spd_solve_cg(Sf, -rhs_red.reshape(-1)).reshape(C, 6)
    dxc = dxc * free[:, None]
    # back-substitute: dxp = -(Hpp^-1 bp + L (A^T dxc)) = -L (L^T bp + Z^T dxc).
    # Using the factored form for BOTH terms keeps the step consistent with
    # the solved system even when _chol3x3's pivot clamps engage on
    # near-singular point blocks (where L L^T != Hpp_inv exactly).
    v = (dxc.reshape(-1) @ A).reshape(P, 3)              # (P, 3) = Z^T dxc
    dxp = -jnp.einsum('pij,pj->pi', L, Ltb + v)
    return dxc, dxp


def _spd_solve_cg(S, b, iters: int = 32):
    """Jacobi-preconditioned CG for the (damped, SPD) reduced camera system.

    TPU rationale: LU/Cholesky on a 100-400-wide matrix is a sequential
    panel factorization — multiple ms of latency-bound work — while CG is
    `iters` dense matvecs that the MXU eats. The LM loop re-solves every
    iteration with a fresh lambda damping, so a 1e-6-accurate CG solution is
    indistinguishable from a direct solve in the accept/reject test.
    (Replaces the g2o LinearSolverEigen/LinearSolverDense role, reference
    Thirdparty/g2o/g2o/solvers/linear_solver_eigen.h.)"""
    d = jnp.maximum(jnp.diagonal(S), 1e-12)

    def body(i, st):
        x, r, p, rz = st
        Ap = S @ p
        denom = jnp.dot(p, Ap)
        alpha = jnp.where(jnp.abs(denom) > 1e-20, rz / denom, 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = r / d
        rz2 = jnp.dot(r, z)
        beta = jnp.where(jnp.abs(rz) > 1e-20, rz2 / rz, 0.0)
        p = z + beta * p
        return (x, r, p, rz2)

    x0 = jnp.zeros_like(b)
    z0 = b / d
    st = (x0, b, z0, jnp.dot(b, z0))
    return jax.lax.fori_loop(0, iters, body, st)[0]


def _inv3x3(M):
    """Closed-form batched 3x3 inverse (adjugate/determinant). TPU's batched
    LU path costs ~7ms per (8k,3,3) call; this is pure VPU arithmetic."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    row0 = jnp.stack([A, -(b * i - c * h), b * f - c * e], -1)
    row1 = jnp.stack([B, a * i - c * g, -(a * f - c * d)], -1)
    row2 = jnp.stack([C, -(a * h - b * g), a * e - b * d], -1)
    return jnp.stack([row0, row1, row2], -2) * inv_det[..., None, None]


def _diag_embed(d):
    """(..., n) -> (..., n, n) diagonal matrices."""
    n = d.shape[-1]
    out = jnp.zeros(d.shape + (n,), d.dtype)
    idx = jnp.arange(n)
    return out.at[..., idx, idx].set(d)


def _apply_updates(cam_pose7, points, dxc, dxp, point_valid):
    R, t = lie.pose7_unpack(cam_pose7)
    dR, dt = lie.se3_exp(dxc)
    Rn, tn = lie.se3_compose(dR, dt, R, t)
    pose_n = lie.pose7_pack(Rn, tn)
    pts_n = jnp.where(point_valid[:, None], points + dxp, points)
    return pose_n, pts_n


def ba_solve(cam: Camera, prob: BAProblem, iters_phase1: int = 5,
             iters_phase2: int = 10, extra_cost_fn=None) -> BAResult:
    """Dense-Schur LM bundle adjustment (local BA / small GBA).

    Two phases with outlier reclassification in between, mirroring
    reference Optimizer::LocalBundleAdjustment (src/Optimizer.cc:1003-1033).

    extra_cost_fn(points) -> scalar: optional additive term in the LM
    accept/reject cost. This is how the deformable mode embeds the FEM
    strain energy into the optimization — exactly the reference's modified
    g2o LM, which adds w_sE * nsE to tempChi before the rho-test but keeps
    the reprojection-only normal equations (reference
    optimization_algorithm_levenberg.cpp:145-199).
    """
    C = prob.cam_pose7.shape[0]
    P = prob.points.shape[0]
    # int32 flat (point, cam) keys are used for the sort and segment sums
    assert P * C < 2 ** 31, "BA capacity overflow: P*C must fit in int32"

    # Sort observations by (point, cam) ONCE: every per-point aggregation in
    # the LM loop then runs as a sorted segment reduction instead of a
    # scatter (see _build_normal_blocks). The inlier classification is
    # un-permuted before returning so callers see their own obs order.
    obs_order = jnp.argsort(prob.obs_point * C + prob.obs_cam)
    prob_in = prob
    prob = prob._replace(
        obs_cam=prob.obs_cam[obs_order], obs_point=prob.obs_point[obs_order],
        obs_uvr=prob.obs_uvr[obs_order],
        obs_inv_sigma2=prob.obs_inv_sigma2[obs_order],
        obs_valid=prob.obs_valid[obs_order])

    def extra(pts):
        return extra_cost_fn(pts) if extra_cost_fn is not None else 0.0

    # Delayed-accept LM: each iteration evaluates the PREVIOUS iteration's
    # trial step (one residual/Jacobian pass per iteration), falling back to
    # the cached linearization of the last accepted state on rejection. This
    # halves the residual evaluations of the classic
    # evaluate-step-then-evaluate-again LM loop at identical semantics (the
    # accept/reject test still compares exact f32 costs); the cached
    # (r, Jc, Jp, w) block is ~1.5 MB — noise next to the Schur tensors.
    def lm_step(state, robust, extra_mask):
        (pose_b, pts_b, cost_b, r_b, Jc_b, Jp_b, w_b, lam,
         pose_t, pts_t) = state
        R, t = lie.pose7_unpack(pose_t)
        p = prob._replace(cam_pose7=pose_t, points=pts_t)
        r, Jc, Jp, behind = _residual_jacobians(cam, R, t, p)
        w, chi2, cost_t, live = _weights(p, r, behind, robust, extra_mask)
        cost_t = cost_t + extra(pts_t)
        accept = cost_t < cost_b
        # The first iteration of each phase evaluates the seed against
        # cost_b = +inf — a guaranteed accept that must NOT touch lambda
        # (else phase 1 starts at lam/2 instead of the documented seed).
        seed_eval = ~jnp.isfinite(cost_b)
        pose_b = jnp.where(accept, pose_t, pose_b)
        pts_b = jnp.where(accept, pts_t, pts_b)
        cost_b = jnp.where(accept, cost_t, cost_b)
        r_b = jnp.where(accept, r, r_b)
        Jc_b = jnp.where(accept, Jc, Jc_b)
        Jp_b = jnp.where(accept, Jp, Jp_b)
        w_b = jnp.where(accept, w, w_b)
        lam = jnp.where(seed_eval, lam,
                        jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0),
                                 1e-9, 1e6))
        pb = prob._replace(cam_pose7=pose_b, points=pts_b)
        Hcc, bc, Hpp, bp = _build_normal_blocks(pb, r_b, Jc_b, Jp_b, w_b,
                                                C, P)
        # never move points nobody observes (weights sum to 0 -> Hpp ~ 0)
        dxc, dxp = _schur_solve_dense(pb, Hcc, bc, Hpp, bp, Jc_b, Jp_b,
                                      w_b, prob.cam_free, lam)
        pose_t, pts_t = _apply_updates(pose_b, pts_b, dxc, dxp,
                                       prob.point_valid)
        return (pose_b, pts_b, cost_b, r_b, Jc_b, Jp_b, w_b, lam,
                pose_t, pts_t)

    def phase_init(pose7, pts, lam):
        """Seed the carry: trial = current state, cost_best = +inf, so the
        first iteration evaluates and accepts the seed, then solves."""
        O = prob.obs_cam.shape[0]
        return (pose7, pts, jnp.asarray(jnp.inf, pts.dtype),
                jnp.zeros((O, 3), pts.dtype), jnp.zeros((O, 3, 6), pts.dtype),
                jnp.zeros((O, 3, 3), pts.dtype), jnp.zeros((O,), pts.dtype),
                lam, pose7, pts)

    lam0 = jnp.asarray(1e-4, prob.points.dtype)
    # Gross-outlier gate at the seed state: observations hundreds of sigma
    # off at the CURRENT (tracked, trustworthy) poses are wrong bindings,
    # not noise — e.g. RGB-D/stereo depth samples that landed across a depth
    # discontinuity. Under Huber their cost is ~sqrt(delta2*chi2), so a few
    # percent of them still dominates the phase-1 objective and drags the
    # whole window off before reclassification can run. Gate them out of
    # phase 1 only; the phase-2 reclassification below re-tests EVERY
    # observation at the phase-1 state, so a mistakenly gated observation is
    # re-admitted. (The reference gets away without this because g2o erases
    # outlier edges map-side every mapping pass — our erase happens post-BA.)
    R0, t0 = lie.pose7_unpack(prob.cam_pose7)
    r0, _, _, behind0 = _residual_jacobians(cam, R0, t0, prob)
    chi2_0 = jnp.sum(r0 * r0, -1) * prob.obs_inv_sigma2
    # adaptive threshold: when the seed itself is noisy (mono init, GBA
    # after a loop correction) honest residuals are large, so the gate
    # scales with the median seed chi2 instead of cutting into the
    # inlier population; when tracking is tight (median chi2 ~0.1) the
    # static 32x floor rules
    live0 = prob.obs_valid & prob.point_valid[prob.obs_point] & ~behind0
    med0 = jnp.nanmedian(jnp.where(live0, chi2_0, jnp.nan))
    med0 = jnp.where(jnp.isnan(med0), 0.0, med0)
    gross_th = jnp.maximum(
        32.0 * jnp.where(prob.obs_uvr[:, 2] >= 0, CHI2_STEREO, CHI2_MONO),
        25.0 * med0)
    gross_mask = (chi2_0 <= gross_th) & ~behind0
    state = phase_init(prob.cam_pose7, prob.points, lam0)
    state = jax.lax.fori_loop(
        0, iters_phase1, lambda i, s: lm_step(s, True, gross_mask), state)

    def phase_best(state, robust, extra_mask):
        """Resolve the trailing trial: keep it if it improved the cost."""
        (pose_b, pts_b, cost_b, _, _, _, _, lam, pose_t, pts_t) = state
        R, t = lie.pose7_unpack(pose_t)
        p = prob._replace(cam_pose7=pose_t, points=pts_t)
        r, _, _, behind = _residual_jacobians(cam, R, t, p)
        _, _, cost_t, _ = _weights(p, r, behind, robust, extra_mask)
        cost_t = cost_t + extra(pts_t)
        accept = cost_t < cost_b
        return (jnp.where(accept, pose_t, pose_b),
                jnp.where(accept, pts_t, pts_b), lam)

    pose7, pts, lam = phase_best(state, True, gross_mask)

    # reclassify outliers (reference Optimizer.cc:1011-1031)
    R, t = lie.pose7_unpack(pose7)
    p = prob._replace(cam_pose7=pose7, points=pts)
    r, _, _, behind = _residual_jacobians(cam, R, t, p)
    chi2 = jnp.sum(r * r, -1) * prob.obs_inv_sigma2
    is_stereo = prob.obs_uvr[:, 2] >= 0
    chi_th = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
    inlier_mask = (chi2 <= chi_th) & ~behind

    state = phase_init(pose7, pts, lam)
    state = jax.lax.fori_loop(
        0, iters_phase2, lambda i, s: lm_step(s, False, inlier_mask), state)
    pose7, pts, lam = phase_best(state, False, inlier_mask)

    # final classification for observation culling
    R, t = lie.pose7_unpack(pose7)
    # final classification in the CALLER's observation order (prob_in)
    p = prob_in._replace(cam_pose7=pose7, points=pts)
    r, _, _, behind = _residual_jacobians(cam, R, t, p)
    chi2 = jnp.sum(r * r, -1) * prob_in.obs_inv_sigma2
    chi_th_in = jnp.where(prob_in.obs_uvr[:, 2] >= 0, CHI2_STEREO, CHI2_MONO)
    final_inlier = (chi2 <= chi_th_in) & ~behind & prob_in.obs_valid
    _, _, cost, _ = _weights(p, r, behind, False, None)
    return BAResult(cam_pose7=pose7, points=pts, obs_inlier=final_inlier,
                    final_cost=cost)


ba_solve_jit = jax.jit(ba_solve, static_argnames=('iters_phase1', 'iters_phase2',
                                                  'extra_cost_fn'))


# ---------------------------------------------------------------------------
# Matrix-free Schur PCG (global BA / distributed path)
# ---------------------------------------------------------------------------

def _schur_matvec(x, prob: BAProblem, Jc, Jp, w, Hcc_l, Hpp_inv, psum=None):
    """S @ x without materializing S.

    x: (C, 6). Per-observation gathers + segment scatters; `psum` is an
    optional collective (lambda v: lax.psum(v, axis)) applied to the
    point-space partial sums when observations are sharded across devices."""
    C = x.shape[0]
    P = Hpp_inv.shape[0]
    # y_p = sum_obs Jp^T w Jc x_c
    Jcx = jnp.einsum('oij,oj->oi', Jc, x[prob.obs_cam])          # (O, 3)
    y = jnp.zeros((P, 3)).at[prob.obs_point].add(
        jnp.einsum('oij,oi->oj', Jp * w[:, None, None], Jcx))
    if psum is not None:
        y = psum(y)
    z = jnp.einsum('pij,pj->pi', Hpp_inv, y)                     # (P, 3)
    # w_c = sum_obs Jc^T w Jp z_p
    Jpz = jnp.einsum('oij,oj->oi', Jp, z[prob.obs_point])        # (O, 3)
    wc = jnp.zeros((C, 6)).at[prob.obs_cam].add(
        jnp.einsum('oij,oi->oj', Jc * w[:, None, None], Jpz))
    if psum is not None:
        wc = psum(wc)
    Hx = jnp.einsum('cij,cj->ci', Hcc_l, x)
    return Hx - wc


def _pcg_lm_step(cam: Camera, prob: BAProblem, carry, cg_iters: int,
                 robust: bool, psum):
    """One LM iteration of the matrix-free Schur PCG solver; carry =
    (cam_pose7, points, lambda). Shared by ba_solve_pcg and ba_pcg_chunk
    (the chunked/abortable global-BA path)."""
    C = prob.cam_pose7.shape[0]
    P = prob.points.shape[0]
    if True:  # (indentation shim — body unchanged from the inline lm_step)
        pose7, pts, lam = carry
        R, t = lie.pose7_unpack(pose7)
        p = prob._replace(cam_pose7=pose7, points=pts)
        r, Jc, Jp, behind = _residual_jacobians(cam, R, t, p)
        w, chi2, cost, live = _weights(p, r, behind, robust)
        if psum is not None:
            cost = psum(cost)   # accept/reject must agree across shards
        wJc = Jc * w[:, None, None]
        Hcc = jnp.zeros((C, 6, 6)).at[prob.obs_cam].add(
            jnp.einsum('oij,oik->ojk', wJc, Jc))
        bc = jnp.zeros((C, 6)).at[prob.obs_cam].add(
            jnp.einsum('oij,oi->oj', wJc, r))
        wJp = Jp * w[:, None, None]
        Hpp = jnp.zeros((P, 3, 3)).at[prob.obs_point].add(
            jnp.einsum('oij,oik->ojk', wJp, Jp))
        bp = jnp.zeros((P, 3)).at[prob.obs_point].add(
            jnp.einsum('oij,oi->oj', wJp, r))
        if psum is not None:
            Hcc, bc, Hpp, bp = psum(Hcc), psum(bc), psum(Hpp), psum(bp)
        Hcc_l = Hcc + _diag_embed(
            lam * jnp.diagonal(Hcc, axis1=1, axis2=2) + 1e-8)
        Hpp_l = Hpp + _diag_embed(
            lam * jnp.diagonal(Hpp, axis1=1, axis2=2) + 1e-8)
        Hpp_inv = _inv3x3(Hpp_l)
        # rhs = -(bc - Hcp Hpp^-1 bp); gauge: zero rhs of fixed cams
        z0 = jnp.einsum('pij,pj->pi', Hpp_inv, bp)
        Jpz = jnp.einsum('oij,oj->oi', Jp, z0[prob.obs_point])
        red = jnp.zeros((C, 6)).at[prob.obs_cam].add(
            jnp.einsum('oij,oi->oj', wJc, Jpz))
        if psum is not None:
            red = psum(red)
        free = prob.cam_free.astype(pts.dtype)[:, None]
        rhs = -(bc - red) * free

        # block-Jacobi preconditioner
        M_inv = jnp.linalg.inv(Hcc_l + jnp.eye(6) * 1e-6)

        def matvec(x):
            return _schur_matvec(x * free, prob, Jc, Jp, w, Hcc_l,
                                 Hpp_inv, psum) * free

        def prec(x):
            return jnp.einsum('cij,cj->ci', M_inv, x) * free

        # PCG (fixed iterations, masked dofs)
        x = jnp.zeros_like(rhs)
        rcg = rhs - matvec(x)
        zc = prec(rcg)
        pdir = zc
        rz = jnp.sum(rcg * zc)

        def cg_body(i, st):
            x, rcg, pdir, rz = st
            Ap = matvec(pdir)
            denom = jnp.sum(pdir * Ap)
            alpha = jnp.where(jnp.abs(denom) > 1e-12, rz / denom, 0.0)
            x = x + alpha * pdir
            rcg = rcg - alpha * Ap
            zc = prec(rcg)
            rz_new = jnp.sum(rcg * zc)
            beta = jnp.where(jnp.abs(rz) > 1e-12, rz_new / rz, 0.0)
            pdir = zc + beta * pdir
            return (x, rcg, pdir, rz_new)

        x, _, _, _ = jax.lax.fori_loop(0, cg_iters, cg_body,
                                       (x, rcg, pdir, rz))
        dxc = x * free
        Jcx = jnp.einsum('oij,oj->oi', Jc, dxc[prob.obs_cam])
        yb = jnp.zeros((P, 3)).at[prob.obs_point].add(
            jnp.einsum('oij,oi->oj', wJp, Jcx))
        if psum is not None:
            yb = psum(yb)
        dxp = -jnp.einsum('pij,pj->pi', Hpp_inv, bp + yb)

        pose_n, pts_n = _apply_updates(pose7, pts, dxc, dxp, prob.point_valid)
        Rn, tn = lie.pose7_unpack(pose_n)
        pn = prob._replace(cam_pose7=pose_n, points=pts_n)
        rn, _, _, behind_n = _residual_jacobians(cam, Rn, tn, pn)
        _, _, cost_n, _ = _weights(pn, rn, behind_n, robust)
        if psum is not None:
            cost_n = psum(cost_n)
        accept = cost_n < cost
        pose7 = jnp.where(accept, pose_n, pose7)
        pts = jnp.where(accept, pts_n, pts)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e6)
        return (pose7, pts, lam), cost_n


def ba_pcg_carry_init(prob: BAProblem):
    """Initial (pose, points, lambda) carry for chunked PCG bundle
    adjustment."""
    return (prob.cam_pose7, prob.points,
            jnp.asarray(1e-4, prob.points.dtype))


@functools.partial(jax.jit, static_argnames=('n_outer', 'cg_iters',
                                             'robust'))
def ba_pcg_chunk(cam: Camera, prob: BAProblem, carry, n_outer: int = 2,
                 cg_iters: int = 30, robust: bool = True):
    """Run `n_outer` LM iterations of the matrix-free PCG solver from
    `carry`, returning the new carry. This is the bounded-work unit of the
    ABORTABLE global BA: the host interleaves one chunk per tracked frame
    instead of a single multi-second dispatch (the functional analogue of
    the reference's GBA thread + mbStopGBA abort flag,
    LoopClosing.cc:645-749, Optimizer.cc:90). Dropping the carry aborts."""
    def f(c, _):
        return _pcg_lm_step(cam, prob, c, cg_iters, robust, None)

    carry, _ = jax.lax.scan(f, carry, None, length=n_outer)
    return carry


def ba_solve_pcg(cam: Camera, prob: BAProblem, n_outer: int = 10,
                 cg_iters: int = 30, robust: bool = True,
                 psum=None) -> BAResult:
    """LM with matrix-free Schur + block-Jacobi PCG camera solve.

    With `psum` supplied, observation arrays may be sharded over devices:
    every segment-sum reduces locally, then psum combines shards —
    the distributed BA design of SURVEY.md §2.4/§5.
    """
    def lm_step(carry, _):
        return _pcg_lm_step(cam, prob, carry, cg_iters, robust, psum)

    (pose7, pts, _), _ = jax.lax.scan(
        lm_step, ba_pcg_carry_init(prob), None, length=n_outer)

    R, t = lie.pose7_unpack(pose7)
    p = prob._replace(cam_pose7=pose7, points=pts)
    r, _, _, behind = _residual_jacobians(cam, R, t, p)
    chi2 = jnp.sum(r * r, -1) * prob.obs_inv_sigma2
    is_stereo = prob.obs_uvr[:, 2] >= 0
    chi_th = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
    final_inlier = (chi2 <= chi_th) & ~behind & prob.obs_valid
    _, _, cost, _ = _weights(p, r, behind, False)
    if psum is not None:
        cost = psum(cost)
    return BAResult(cam_pose7=pose7, points=pts, obs_inlier=final_inlier,
                    final_cost=cost)


ba_solve_pcg_jit = jax.jit(ba_solve_pcg,
                           static_argnames=('n_outer', 'cg_iters', 'robust'))
