"""BA numerics guardrail at the production local-BA window size
(32 cams / 4k points / 12k observations): the TPU solver's bf16 Schur
marginalization + fixed-iteration CG must match an exact float64
dense-Schur LM reference (VERDICT r3 weak #8 / next #9; parity target:
g2o BlockSolver_6_3 Schur + Cholesky exactness)."""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam2_e_tpu.ops import ba, lie
from orb_slam2_e_tpu.ops.camera import Camera
from orb_slam2_e_tpu.ops.pose_opt import CHI2_MONO

C_FREE, C_FIX = 16, 16
C = C_FREE + C_FIX
P = 4096
OBS_PER_PT = 3
FX = FY = 500.0
CX, CY = 320.0, 240.0


# ----------------------------- float64 reference -----------------------------

def _so3_exp64(w):
    th = np.linalg.norm(w)
    if th < 1e-12:
        return np.eye(3)
    k = w / th
    Kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * Kx @ Kx


def _residuals64(Rs, ts, pts, oc, op, meas):
    xc = np.einsum('oij,oj->oi', Rs[oc], pts[op]) + ts[oc]
    z = np.maximum(xc[:, 2], 1e-6)
    u = FX * xc[:, 0] / z + CX
    v = FY * xc[:, 1] / z + CY
    r = np.stack([u - meas[:, 0], v - meas[:, 1]], 1)
    iz = 1.0 / z
    iz2 = iz * iz
    zeros = np.zeros_like(z)
    du = np.stack([FX * iz, zeros, -FX * xc[:, 0] * iz2], 1)
    dv = np.stack([zeros, FY * iz, -FY * xc[:, 1] * iz2], 1)
    dr_dxc = np.stack([du, dv], 1)                       # (O, 2, 3)
    hat = np.zeros((len(z), 3, 3))
    hat[:, 0, 1] = -xc[:, 2]; hat[:, 0, 2] = xc[:, 1]
    hat[:, 1, 0] = xc[:, 2];  hat[:, 1, 2] = -xc[:, 0]
    hat[:, 2, 0] = -xc[:, 1]; hat[:, 2, 1] = xc[:, 0]
    Jc = np.concatenate([np.einsum('oij,ojk->oik', dr_dxc, -hat), dr_dxc], 2)
    Jp = np.einsum('oij,ojk->oik', dr_dxc, Rs[oc])
    return r, Jc, Jp, xc[:, 2] <= 1e-6


def _huber_w64(chi2, delta2):
    w = np.ones_like(chi2)
    over = chi2 > delta2
    w[over] = np.sqrt(delta2 / chi2[over])
    return w


def ba_reference_f64(Rs, ts, pts, free, oc, op, meas, iters=18, robust=True):
    """Exact dense-Schur LM in float64: per-point 3x3 inverses, dense
    (6C x 6C) reduced system solved with numpy (LAPACK Cholesky-class
    accuracy) — the role g2o's BlockSolver_6_3 + LinearSolverEigen plays."""
    Rs, ts, pts = Rs.copy(), ts.copy(), pts.copy()
    lam = 1e-4
    O = len(oc)

    def cost_of(Rs, ts, pts):
        r, _, _, behind = _residuals64(Rs, ts, pts, oc, op, meas)
        chi2 = (r * r).sum(1)
        if robust:
            w = _huber_w64(chi2, CHI2_MONO)
        else:
            w = np.ones_like(chi2)
        return np.sum(np.where(behind, 0.0, chi2 * w))

    cost = cost_of(Rs, ts, pts)
    for _ in range(iters):
        r, Jc, Jp, behind = _residuals64(Rs, ts, pts, oc, op, meas)
        chi2 = (r * r).sum(1)
        w = _huber_w64(chi2, CHI2_MONO) if robust else np.ones_like(chi2)
        w = np.where(behind, 0.0, w)
        wJc = Jc * w[:, None, None]
        wJp = Jp * w[:, None, None]
        Hcc = np.zeros((C, 6, 6)); bc = np.zeros((C, 6))
        Hpp = np.zeros((P, 3, 3)); bp = np.zeros((P, 3))
        np.add.at(Hcc, oc, np.einsum('oij,oik->ojk', wJc, Jc))
        np.add.at(bc, oc, np.einsum('oij,oi->oj', wJc, r))
        np.add.at(Hpp, op, np.einsum('oij,oik->ojk', wJp, Jp))
        np.add.at(bp, op, np.einsum('oij,oi->oj', wJp, r))
        Hpp_l = Hpp + lam * Hpp * np.eye(3) + 1e-9 * np.eye(3)
        Hpp_inv = np.linalg.inv(Hpp_l)
        Hcp = np.zeros((P, C, 6, 3))
        np.add.at(Hcp, (op, oc),
                  np.einsum('oij,oik->ojk', wJc, Jp))
        A = np.einsum('pcij,pjk->pcik', Hcp, Hpp_inv)     # (P, C, 6, 3)
        S = np.zeros((C, 6, C, 6))
        S -= np.einsum('pcij,pdkj->cidk', A, Hcp)
        idx = np.arange(C)
        S[idx, :, idx, :] += Hcc + lam * Hcc * np.eye(6)
        rhs = -(bc - np.einsum('pcij,pj->ci', A, bp))
        # gauge: fixed cameras -> identity rows/cols
        for c in np.where(~free)[0]:
            S[c, :, :, :] = 0; S[:, :, c, :] = 0
            S[c, :, c, :] = np.eye(6)
            rhs[c] = 0
        dxc = np.linalg.solve(S.reshape(6 * C, 6 * C),
                              rhs.reshape(-1)).reshape(C, 6)
        dxc[~free] = 0
        Hcp_dxc = np.einsum('pcij,ci->pj', Hcp, dxc)
        dxp = -np.einsum('pij,pj->pi', Hpp_inv, bp + Hcp_dxc)
        Rs_n = Rs.copy(); ts_n = ts.copy()
        for c in range(C):
            dR = _so3_exp64(dxc[c, :3])
            Rs_n[c] = dR @ Rs[c]
            ts_n[c] = dR @ ts[c] + dxc[c, 3:]
        pts_n = pts + dxp
        cost_n = cost_of(Rs_n, ts_n, pts_n)
        if cost_n < cost:
            Rs, ts, pts, cost = Rs_n, ts_n, pts_n, cost_n
            lam = max(lam * 0.5, 1e-9)
        else:
            lam = min(lam * 4.0, 1e6)
    return Rs, ts, pts, cost


# ------------------------------- the guardrail -------------------------------

@pytest.mark.slow
def test_production_window_matches_f64_reference():
    rng = np.random.RandomState(0)
    # ground truth: cameras on an arc looking at a point field
    pts_gt = rng.uniform([-4, -3, 6], [4, 3, 14], (P, 3))
    Rs_gt = np.zeros((C, 3, 3)); ts_gt = np.zeros((C, 3))
    for c in range(C):
        w = np.array([0, 0.01 * (c - C / 2), 0])
        Rs_gt[c] = _so3_exp64(w)
        ctr = np.array([0.15 * (c - C / 2), 0.02 * c, 0.0])
        ts_gt[c] = -Rs_gt[c] @ ctr
    # observations: each point seen by OBS_PER_PT consecutive cameras
    op = np.repeat(np.arange(P), OBS_PER_PT)
    oc = (np.repeat(rng.randint(0, C - OBS_PER_PT, P), OBS_PER_PT)
          + np.tile(np.arange(OBS_PER_PT), P))
    xc = np.einsum('oij,oj->oi', Rs_gt[oc], pts_gt[op]) + ts_gt[oc]
    meas = np.stack([FX * xc[:, 0] / xc[:, 2] + CX,
                     FY * xc[:, 1] / xc[:, 2] + CY], 1)
    meas += rng.normal(0, 0.4, meas.shape)               # pixel noise
    keep = (xc[:, 2] > 1) & (np.abs(meas[:, 0] - CX) < 400) \
        & (np.abs(meas[:, 1] - CY) < 300)
    op, oc, meas = op[keep], oc[keep], meas[keep]
    O = len(op)
    assert O > 11000, O

    # perturbed initialization
    pts0 = pts_gt + rng.normal(0, 0.03, pts_gt.shape)
    Rs0 = Rs_gt.copy(); ts0 = ts_gt.copy()
    free = np.zeros(C, bool); free[C_FIX:] = True
    for c in np.where(free)[0]:
        dR = _so3_exp64(rng.normal(0, 0.004, 3))
        Rs0[c] = dR @ Rs_gt[c]
        ts0[c] = ts_gt[c] + rng.normal(0, 0.01, 3)

    # ---- float64 exact reference ----
    Rs_f, ts_f, pts_f, cost_f = ba_reference_f64(
        Rs0, ts0, pts0, free, oc, op, meas, iters=18)

    # ---- TPU bf16-Schur + CG solver on the identical problem ----
    cam = Camera.create(fx=FX, fy=FY, cx=CX, cy=CY, width=640, height=480)
    pose7 = np.zeros((C, 7), np.float32)
    for c in range(C):
        pose7[c] = np.asarray(lie.pose7_pack(jnp.asarray(Rs0[c], jnp.float32),
                                             jnp.asarray(ts0[c], jnp.float32)))
    O_cap = 1 << int(np.ceil(np.log2(O)))
    pad = O_cap - O
    prob = ba.BAProblem(
        cam_pose7=jnp.asarray(pose7),
        cam_free=jnp.asarray(free),
        points=jnp.asarray(pts0, jnp.float32),
        point_valid=jnp.ones((P,), bool),
        obs_cam=jnp.asarray(np.pad(oc, (0, pad)), jnp.int32),
        obs_point=jnp.asarray(np.pad(op, (0, pad)), jnp.int32),
        obs_uvr=jnp.asarray(np.pad(
            np.concatenate([meas, -np.ones((O, 1))], 1),
            ((0, pad), (0, 0))), jnp.float32),
        obs_inv_sigma2=jnp.ones((O_cap,)),
        obs_valid=jnp.asarray(np.arange(O_cap) < O),
    )
    res = ba.ba_solve_jit(cam, prob, iters_phase1=9, iters_phase2=9)

    # ---- comparisons ----
    r, _, _, behind = _residuals64(
        *_unpack7(np.asarray(res.cam_pose7)),
        np.asarray(res.points, np.float64), oc, op, meas)
    chi2 = (r * r).sum(1)
    w = _huber_w64(chi2, CHI2_MONO)
    cost_tpu = np.sum(np.where(behind, 0.0, chi2 * w))
    # final cost within 0.1% of the f64 reference's
    assert cost_tpu <= cost_f * 1.001, (cost_tpu, cost_f)

    Rs_t, ts_t = _unpack7(np.asarray(res.cam_pose7))
    # free-camera pose agreement with the f64 solution: rotation geodesic
    # + camera-center distance below 1e-3 (rad / scene units)
    for c in np.where(free)[0]:
        dR = Rs_t[c] @ Rs_f[c].T
        ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
        c_t = -Rs_t[c].T @ ts_t[c]
        c_f = -Rs_f[c].T @ ts_f[c]
        assert ang < 1e-3, (c, ang)
        assert np.linalg.norm(c_t - c_f) < 1e-3, (c, c_t - c_f)


def _unpack7(pose7):
    Rs = np.zeros((len(pose7), 3, 3)); ts = np.zeros((len(pose7), 3))
    for c in range(len(pose7)):
        R, t = lie.pose7_unpack(jnp.asarray(pose7[c], jnp.float32))
        Rs[c] = np.asarray(R, np.float64)
        ts[c] = np.asarray(t, np.float64)
    return Rs, ts
