"""Perspective-n-Point: batched RANSAC for relocalization.

Equivalent role to the reference's PnPsolver (reference src/PnPsolver.cc:
EPnP + RANSAC, with the E-extension keeping sub-threshold pose hypotheses in
a histogram and falling back to best-effort poses with full-map projection,
PnPsolver.cc:267-646).

TPU-first redesign: instead of EPnP's sequential control-point machinery
with early-exit RANSAC, ALL hypotheses are solved in one batch with the
6-point DLT (SVD of a (2n, 12) system -> P -> orthonormalized [R|t]) and
scored densely; the best hypothesis is then polished by the motion-only LM
(ops/pose_opt). The E-version's "sub-threshold pose histogram" becomes
simply the ranked hypothesis list — top poses are returned for the caller's
full-map projection fallback (reference PnPsolver.cc:403-634).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import lie


def pnp_dlt(xyz: jnp.ndarray, uv_n: jnp.ndarray):
    """Direct linear transform PnP from n >= 6 points.

    xyz: (n, 3) world points; uv_n: (n, 2) NORMALIZED image coords (K^-1 px).
    Returns (R (3,3), t (3,)) with proper orthonormalization and positive
    depth convention."""
    n = xyz.shape[0]
    zeros = jnp.zeros((n, 4))
    Xh = jnp.concatenate([xyz, jnp.ones((n, 1))], axis=1)     # (n, 4)
    rows_u = jnp.concatenate([Xh, zeros, -uv_n[:, :1] * Xh], axis=1)
    rows_v = jnp.concatenate([zeros, Xh, -uv_n[:, 1:2] * Xh], axis=1)
    A = jnp.concatenate([rows_u, rows_v], axis=0)             # (2n, 12)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    P = vt[11].reshape(3, 4)
    M = P[:, :3]
    # scale: make det positive and rows unit-ish
    detM = jnp.linalg.det(M)
    P = P * jnp.sign(detM)
    M = P[:, :3]
    scale = jnp.exp(jnp.log(jnp.maximum(
        jnp.abs(jnp.linalg.det(M)), 1e-12)) / 3.0)
    M = M / scale
    t = P[:, 3] / scale
    # orthonormalize via SVD
    U, _, Vt = jnp.linalg.svd(M)
    R = U @ Vt
    R = R * jnp.sign(jnp.linalg.det(R))
    return R, t


class PnPResult(NamedTuple):
    R: jnp.ndarray          # (B, 3, 3) hypothesis rotations (ranked)
    t: jnp.ndarray          # (B, 3)
    n_inliers: jnp.ndarray  # (B,)
    inliers_best: jnp.ndarray  # (N,) inlier mask of the best hypothesis


def ransac_pnp(key, xyz: jnp.ndarray, uv: jnp.ndarray, valid: jnp.ndarray,
               K: jnp.ndarray, n_hyp: int = 256, sample_size: int = 6,
               inlier_px: float = 5.991 ** 0.5 * 2.0) -> PnPResult:
    """Batched-hypothesis PnP RANSAC.

    xyz (N, 3), uv (N, 2) pixel coords, valid (N,) mask.
    Returns all hypotheses ranked by inlier count (the E-version's pose
    histogram, reference PnPsolver.cc:326-335, becomes this ranking)."""
    Kinv = jnp.linalg.inv(K)
    uv_n = (jnp.concatenate([uv, jnp.ones_like(uv[:, :1])], 1) @ Kinv.T)[:, :2]
    logits = jnp.where(valid, 0.0, -1e9)
    g = jax.random.gumbel(key, (n_hyp, valid.shape[0])) + logits[None]
    _, sets = jax.lax.top_k(g, sample_size)                  # (B, 6)

    def solve_one(idx):
        return pnp_dlt(xyz[idx], uv_n[idx])

    Rs, ts = jax.vmap(solve_one)(sets)                       # (B, 3, 3), (B, 3)

    # score all hypotheses densely
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    xc = jnp.einsum('bij,nj->bni', Rs, xyz) + ts[:, None, :]
    z = xc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = fx * xc[..., 0] / zs + cx
    v = fy * xc[..., 1] / zs + cy
    err2 = (u - uv[None, :, 0]) ** 2 + (v - uv[None, :, 1]) ** 2
    inl = (err2 < inlier_px ** 2) & (z > 0) & valid[None, :]
    counts = jnp.sum(inl, axis=1)
    order = jnp.argsort(-counts)
    best = order[0]
    return PnPResult(R=Rs[order], t=ts[order], n_inliers=counts[order],
                     inliers_best=inl[best])


ransac_pnp_jit = jax.jit(ransac_pnp, static_argnames=('n_hyp', 'sample_size'))
