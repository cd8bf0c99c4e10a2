"""Sim(3) estimation: Horn closed form, RANSAC, and two-view refinement.

Equivalent of reference src/Sim3Solver.cc (Horn 1987 absolute orientation +
RANSAC with reprojection checks in both cameras, include/Sim3Solver.h:39-61)
and Optimizer::OptimizeSim3 (reference src/Optimizer.cc:1430-1625,
bidirectional EdgeSim3ProjectXYZ pairs) — re-derived, batched.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import lie


def umeyama_sim3(x: jnp.ndarray, y: jnp.ndarray, w: jnp.ndarray,
                 fix_scale: bool = False):
    """Weighted closed-form similarity y ~ s R x + t.

    x, y: (N, 3); w: (N,) nonnegative weights. Differentiable, batched-safe.
    (Same solution family as reference Sim3Solver::ComputeSim3.)"""
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    mx = jnp.sum(x * w[:, None], 0) / wsum
    my = jnp.sum(y * w[:, None], 0) / wsum
    xc = (x - mx) * w[:, None]
    yc = y - my
    cov = yc.T @ xc / wsum                              # (3, 3)
    U, d, Vt = jnp.linalg.svd(cov)
    sgn = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt))
    S = jnp.diag(jnp.array([1.0, 1.0, 1.0]).at[2].set(sgn))
    R = U @ S @ Vt
    var_x = jnp.sum(((x - mx) ** 2) * w[:, None]) / wsum
    s = jnp.where(fix_scale, 1.0,
                  jnp.sum(d * jnp.diag(S)) / jnp.maximum(var_x, 1e-12))
    t = my - s * R @ mx
    return R, t, s


class Sim3RansacResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    s: jnp.ndarray
    n_inliers: jnp.ndarray
    inliers: jnp.ndarray


def ransac_sim3(key, xyz1: jnp.ndarray, xyz2: jnp.ndarray, valid: jnp.ndarray,
                uv1: jnp.ndarray, uv2: jnp.ndarray, K: jnp.ndarray,
                fix_scale: bool = False, n_hyp: int = 128,
                th_px: float = 9.21 ** 0.5) -> Sim3RansacResult:
    """RANSAC Sim3 from 3D-3D correspondences with reprojection-error inlier
    checks in both cameras (reference Sim3Solver::CheckInliers: chi2 9.21).

    xyz1/xyz2: (N, 3) matched points in camera-1/camera-2 frames.
    uv1/uv2: (N, 2) their pixel measurements in each image."""
    logits = jnp.where(valid, 0.0, -1e9)
    g = jax.random.gumbel(key, (n_hyp, valid.shape[0])) + logits[None]
    _, sets = jax.lax.top_k(g, 3)

    def solve_one(idx):
        w3 = jnp.ones((3,))
        return umeyama_sim3(xyz2[idx], xyz1[idx], w3, fix_scale)

    Rs, ts, ss = jax.vmap(solve_one)(sets)              # S12: x1 ~ s R x2 + t

    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

    def project(xc):
        z = jnp.where(jnp.abs(xc[..., 2]) < 1e-9, 1e-9, xc[..., 2])
        return jnp.stack([fx * xc[..., 0] / z + cx,
                          fy * xc[..., 1] / z + cy], -1), xc[..., 2]

    # x2 mapped into camera-1 and reprojected; and inverse
    x2_in_1 = ss[:, None, None] * jnp.einsum('bij,nj->bni', Rs, xyz2) \
        + ts[:, None, :]
    uv1p, z1 = project(x2_in_1)
    Rinv = jnp.swapaxes(Rs, 1, 2)
    x1_in_2 = jnp.einsum('bij,bnj->bni', Rinv,
                         (xyz1[None] - ts[:, None, :])) / ss[:, None, None]
    uv2p, z2 = project(x1_in_2)
    e1 = jnp.sum((uv1p - uv1[None]) ** 2, -1)
    e2 = jnp.sum((uv2p - uv2[None]) ** 2, -1)
    inl = (e1 < th_px ** 2) & (e2 < th_px ** 2) & (z1 > 0) & (z2 > 0) \
        & valid[None]
    counts = jnp.sum(inl, 1)
    best = jnp.argmax(counts)
    # refine on inliers with weighted Horn
    w = inl[best].astype(jnp.float32)
    Rr, tr, sr = umeyama_sim3(xyz2, xyz1, w, fix_scale)
    return Sim3RansacResult(R=Rr, t=tr, s=jnp.asarray(sr),
                            n_inliers=counts[best], inliers=inl[best])


ransac_sim3_jit = jax.jit(ransac_sim3, static_argnames=('fix_scale', 'n_hyp'))


def refine_sim3(R0, t0, s0, xyz1, xyz2, valid, uv1, uv2, K,
                inv_sigma2_1, inv_sigma2_2, fix_scale: bool = False,
                n_iters: int = 10, chi2_th: float = 10.0):
    """Gauss-Newton refinement of S12 minimizing bidirectional reprojection
    error (reference Optimizer::OptimizeSim3 with Huber, two-stage outlier
    drop). Returns (R, t, s, n_inliers, inlier_mask)."""
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

    def residuals(xi):
        dR, dt, ds = lie.sim3_exp(xi)
        R = dR @ R0
        s = ds * s0
        t = ds * (dR @ t0) + dt
        x2_in_1 = s * (xyz2 @ R.T) + t
        z1 = jnp.maximum(x2_in_1[:, 2], 1e-6)
        uv1p = jnp.stack([fx * x2_in_1[:, 0] / z1 + cx,
                          fy * x2_in_1[:, 1] / z1 + cy], -1)
        x1_in_2 = ((xyz1 - t) @ R) / s
        z2 = jnp.maximum(x1_in_2[:, 2], 1e-6)
        uv2p = jnp.stack([fx * x1_in_2[:, 0] / z2 + cx,
                          fy * x1_in_2[:, 1] / z2 + cy], -1)
        r1 = (uv1p - uv1) * jnp.sqrt(inv_sigma2_1)[:, None]
        r2 = (uv2p - uv2) * jnp.sqrt(inv_sigma2_2)[:, None]
        return jnp.concatenate([r1, r2], axis=1)  # (N, 4)

    def gn_step(carry, _):
        xi, inlier = carry
        J = jax.jacfwd(residuals)(xi)                    # (N, 4, 7)
        r = residuals(xi)
        w = (inlier & valid).astype(jnp.float32)
        H = jnp.einsum('nij,n,nik->jk', J, w, J) + 1e-6 * jnp.eye(7)
        if fix_scale:
            H = H.at[6, 6].add(1e9)
        g = jnp.einsum('nij,n,ni->j', J, w, r)
        dx = jnp.linalg.solve(H, -g)
        xi = xi + dx
        r = residuals(xi)
        chi2 = jnp.sum(r[:, :2] ** 2, 1) + jnp.sum(r[:, 2:] ** 2, 1)
        inlier = chi2 < 2 * chi2_th
        return (xi, inlier), None

    xi0 = jnp.zeros((7,))
    (xi, inlier), _ = jax.lax.scan(gn_step, (xi0, valid), None, length=n_iters)
    dR, dt, ds = lie.sim3_exp(xi)
    R = dR @ R0
    s = ds * s0
    t = ds * (dR @ t0) + dt
    return R, t, s, jnp.sum(inlier & valid), inlier & valid
