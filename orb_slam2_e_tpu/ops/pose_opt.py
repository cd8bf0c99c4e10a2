"""Motion-only bundle adjustment: Levenberg-Marquardt on a single SE(3) pose.

Functional equivalent of reference Optimizer::PoseOptimization
(reference src/Optimizer.cc:264-476): unary reprojection edges from fixed
3D map points to one camera pose, Huber robust kernel (delta = sqrt(5.991)
mono / sqrt(7.815) stereo), 4 rounds x 10 LM iterations with chi-square
inlier reclassification between rounds and the robust kernel dropped from
round 3 on.

TPU-first design: observations are fixed-capacity arrays with masks; the
whole optimization is one jitted program — rounds and iterations are
`lax.fori_loop`s, reclassification is a mask update, the 6x6 normal system
is solved in closed form. Analytic Jacobians (same math as reference
types_six_dof_expmap.cpp linearizeOplus, re-derived) keep it fast; a
`jax.jacobian` path exists in tests to validate them.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import lie
from .camera import Camera

CHI2_MONO = 5.991    # 95% chi-square, 2 dof (reference Optimizer.cc:391)
CHI2_STEREO = 7.815  # 95% chi-square, 3 dof (reference Optimizer.cc:392)


class PoseObs(NamedTuple):
    """Fixed-capacity observation block for one frame.

    uvr: (N, 3) measured (u, v, u_right); u_right < 0 => monocular feature
         (the reference uses mvuRight<0 the same way, src/Frame.cc:704).
    xyz: (N, 3) world points (fixed).
    inv_sigma2: (N,) information weight = 1/sigma^2(octave)
         (reference mvInvLevelSigma2 lookup, src/Optimizer.cc:334).
    valid: (N,) bool — observation exists.
    """
    uvr: jnp.ndarray
    xyz: jnp.ndarray
    inv_sigma2: jnp.ndarray
    valid: jnp.ndarray


def project_residual(cam: Camera, R, t, xyz, uvr):
    """Residual (N, 3): [du, dv, dur]; dur zeroed for mono features."""
    xc = lie.se3_apply(R, t, xyz)
    z = jnp.maximum(xc[..., 2], 1e-6)
    u = cam.fx * xc[..., 0] / z + cam.cx
    v = cam.fy * xc[..., 1] / z + cam.cy
    ur = u - cam.bf / z
    is_stereo = uvr[..., 2] >= 0
    r = jnp.stack([u - uvr[..., 0], v - uvr[..., 1],
                   jnp.where(is_stereo, ur - uvr[..., 2], 0.0)], axis=-1)
    return r, xc


def pose_jacobian(cam: Camera, xc, is_stereo):
    """Analytic d(residual)/d(xi) for xi = [omega, upsilon] left-perturbation
    of Tcw: delta_xc = -[xc]x omega + upsilon. Returns (N, 3, 6)."""
    x, y = xc[..., 0], xc[..., 1]
    z = jnp.maximum(xc[..., 2], 1e-6)
    iz = 1.0 / z
    iz2 = iz * iz
    fx, fy, bf = cam.fx, cam.fy, cam.bf
    # du/dxc, dv/dxc, dur/dxc  (N, 3)
    du_dxc = jnp.stack([fx * iz, jnp.zeros_like(z), -fx * x * iz2], -1)
    dv_dxc = jnp.stack([jnp.zeros_like(z), fy * iz, -fy * y * iz2], -1)
    dur_dxc = du_dxc + jnp.stack(
        [jnp.zeros_like(z), jnp.zeros_like(z), bf * iz2], -1)
    dr_dxc = jnp.stack([du_dxc, dv_dxc,
                        jnp.where(is_stereo[..., None], dur_dxc, 0.0)], -2)
    # dxc/dxi: [ -[xc]x | I ]
    dxc_dxi = jnp.concatenate([-lie.so3_hat(xc),
                               jnp.broadcast_to(jnp.eye(3, dtype=xc.dtype),
                                                xc.shape[:-1] + (3, 3))], -1)
    return dr_dxc @ dxc_dxi  # (N, 3, 6)


def huber_weight(chi2, delta2):
    """Huber IRLS weight on squared error: 1 if chi2<=delta2 else delta/sqrt(chi2)."""
    return jnp.where(chi2 <= delta2, 1.0,
                     jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)))


def _lm_rounds(cam: Camera, R0, t0, obs: PoseObs, n_rounds: int,
               n_iters: int, chi2_th_mono: float, chi2_th_stereo: float):
    is_stereo = obs.uvr[..., 2] >= 0
    chi_th = jnp.where(is_stereo, chi2_th_stereo, chi2_th_mono)
    delta2 = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)

    def chi2_of(R, t):
        r, xc = project_residual(cam, R, t, obs.xyz, obs.uvr)
        c = jnp.sum(r * r, -1) * obs.inv_sigma2
        return c, r, xc

    def lm_iter(state, use_robust):
        R, t, lam, inlier = state
        r, xc = project_residual(cam, R, t, obs.xyz, obs.uvr)
        J = pose_jacobian(cam, xc, is_stereo)                 # (N, 3, 6)
        chi2 = jnp.sum(r * r, -1) * obs.inv_sigma2
        w_rob = jnp.where(use_robust, huber_weight(chi2, delta2), 1.0)
        w = obs.inv_sigma2 * w_rob * inlier * obs.valid       # (N,)
        # depth gate: behind-camera points contribute nothing
        w = jnp.where(xc[..., 2] > 1e-6, w, 0.0)
        H = jnp.einsum('nij,n,nik->jk', J, w, J)              # (6, 6)
        g = jnp.einsum('nij,n,ni->j', J, w, r)                # (6,)
        cost = jnp.sum(chi2 * w_rob * inlier * obs.valid
                       * (xc[..., 2] > 1e-6))

        def try_step(lam):
            Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-10 * jnp.eye(6)
            dx = jnp.linalg.solve(Hd, -g)
            dR, dt = lie.se3_exp(dx)
            Rn, tn = lie.se3_compose(dR, dt, R, t)
            rn, xcn = project_residual(cam, Rn, tn, obs.xyz, obs.uvr)
            chin = jnp.sum(rn * rn, -1) * obs.inv_sigma2
            wn = jnp.where(use_robust, huber_weight(chin, delta2), 1.0)
            costn = jnp.sum(chin * wn * inlier * obs.valid
                            * (xcn[..., 2] > 1e-6))
            return Rn, tn, costn

        Rn, tn, costn = try_step(lam)
        accept = costn < cost
        R = jnp.where(accept, Rn, R)
        t = jnp.where(accept, tn, t)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        lam = jnp.clip(lam, 1e-8, 1e6)
        return (R, t, lam, inlier)

    R, t = R0, t0
    inlier = jnp.ones(obs.valid.shape, jnp.float32)
    for rnd in range(n_rounds):
        use_robust = rnd < 2  # kernel dropped from round 3 (Optimizer.cc:455)
        state = (R, t, jnp.asarray(1e-2, R0.dtype), inlier)
        state = jax.lax.fori_loop(
            0, n_iters, lambda i, s: lm_iter(s, use_robust), state)
        R, t, _, _ = state
        chi2, _, xc = chi2_of(R, t)
        inlier = ((chi2 <= chi_th) & (xc[..., 2] > 1e-6)).astype(jnp.float32)
    n_inliers = jnp.sum(inlier * obs.valid)
    final_inlier = (inlier > 0) & obs.valid
    return R, t, final_inlier, n_inliers.astype(jnp.int32)


def pose_optimize(cam: Camera, R0, t0, obs: PoseObs,
                  n_rounds: int = 4, n_iters: int = 10):
    """Returns (R, t, inlier_mask (N,) bool, n_inliers int32).

    Mirrors the reference's 4x10 structure with chi2 reclassification
    (reference src/Optimizer.cc:392-467)."""
    return _lm_rounds(cam, R0, t0, obs, n_rounds, n_iters,
                      CHI2_MONO, CHI2_STEREO)


pose_optimize_jit = jax.jit(pose_optimize, static_argnames=('n_rounds', 'n_iters'))
