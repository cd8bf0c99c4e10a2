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


def pnp_planar(xyz: jnp.ndarray, uv_n: jnp.ndarray):
    """Pose from a (near-)planar point set via plane-basis homography
    decomposition (IPPE-style). The 12-parameter DLT is degenerate when the
    sample is coplanar — the common case for the E extension's surface maps
    (endoscopy) — so RANSAC emits this solution alongside the DLT one.

    xyz: (n, 3) world points; uv_n: (n, 2) normalized image coords.
    Returns (R (3,3), t (3,)) world-to-camera."""
    n = xyz.shape[0]
    c = xyz.mean(0)
    X0 = xyz - c
    # plane frame from the sample's principal axes: rows b1, b2 span the
    # plane, row 3 is the normal; right-handed
    _, _, Vt = jnp.linalg.svd(X0, full_matrices=True)
    M = Vt * jnp.sign(jnp.linalg.det(Vt))
    q = X0 @ M.T                                  # plane coords, q[:, 2] ~ 0
    qh = jnp.concatenate([q[:, :2], jnp.ones((n, 1))], 1)
    zeros = jnp.zeros((n, 3))
    rows_u = jnp.concatenate([qh, zeros, -uv_n[:, :1] * qh], 1)
    rows_v = jnp.concatenate([zeros, qh, -uv_n[:, 1:2] * qh], 1)
    A = jnp.concatenate([rows_u, rows_v], 0)      # (2n, 9)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    H = vt[8].reshape(3, 3)
    h1, h2, h3 = H[:, 0], H[:, 1], H[:, 2]
    lam = 1.0 / jnp.maximum(
        jnp.sqrt(jnp.linalg.norm(h1) * jnp.linalg.norm(h2)), 1e-12)
    A12 = jnp.stack([h1 * lam, h2 * lam], 1)      # (3, 2)
    U2, _, V2t = jnp.linalg.svd(A12, full_matrices=False)
    R12 = U2 @ V2t                                 # closest orthonormal pair
    r3 = jnp.cross(R12[:, 0], R12[:, 1])
    tp = h3 * lam
    # two sign solutions (H ~ -H); pick the one with the sample in front
    Rp_a = jnp.stack([R12[:, 0], R12[:, 1], r3], 1)
    Rw_a = Rp_a @ M
    tw_a = tp - Rw_a @ c
    Rp_b = jnp.stack([-R12[:, 0], -R12[:, 1], r3], 1)
    Rw_b = Rp_b @ M
    tw_b = -tp - Rw_b @ c
    za = xyz @ Rw_a.T[:, 2] + tw_a[2]
    flip = jnp.sum(za) < 0
    R = jnp.where(flip, Rw_b, Rw_a)
    t = jnp.where(flip, tw_b, tw_a)
    return R, t


def pnp_dlt_weighted(xyz: jnp.ndarray, uv_n: jnp.ndarray, w: jnp.ndarray):
    """DLT refit over a weighted (masked) point set of any size.

    Solves the same (2n, 12) system as `pnp_dlt` but via the 12x12 normal
    matrix (eigh), so n can be the full frame capacity without a giant SVD.
    Plays the role of the reference's post-RANSAC `Refine()` over the
    inlier set (reference src/PnPsolver.cc:356-396)."""
    n = xyz.shape[0]
    zeros = jnp.zeros((n, 4))
    Xh = jnp.concatenate([xyz, jnp.ones((n, 1))], axis=1)
    rows_u = jnp.concatenate([Xh, zeros, -uv_n[:, :1] * Xh], axis=1)
    rows_v = jnp.concatenate([zeros, Xh, -uv_n[:, 1:2] * Xh], axis=1)
    A = jnp.concatenate([rows_u, rows_v], axis=0)            # (2n, 12)
    ww = jnp.concatenate([w, w])[:, None]
    G = (A * ww).T @ A                                       # (12, 12)
    _, vecs = jnp.linalg.eigh(G)
    P = vecs[:, 0].reshape(3, 4)
    M = P[:, :3]
    P = P * jnp.sign(jnp.linalg.det(M))
    M = P[:, :3]
    scale = jnp.exp(jnp.log(jnp.maximum(
        jnp.abs(jnp.linalg.det(M)), 1e-12)) / 3.0)
    t = P[:, 3] / scale
    U, _, Vt = jnp.linalg.svd(M / scale)
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
               inlier_px: float = 5.991 ** 0.5 * 2.0,
               local_frac: float = 0.5) -> PnPResult:
    """Batched-hypothesis PnP RANSAC.

    xyz (N, 3), uv (N, 2) pixel coords, valid (N,) mask.
    Returns all hypotheses ranked by inlier count (the E-version's pose
    histogram, reference PnPsolver.cc:326-335, becomes this ranking).

    Hypothesis sampling is mixed: `1 - local_frac` of the hypotheses use
    uniform random minimal sets (the classic scheme; robust on rigid
    scenes), the rest use SPATIALLY LOCAL sets — a random anchor match plus
    its nearest matched neighbors in the image. Under smooth surface
    deformation (the E scenario) a local patch is quasi-rigid, so local
    sets still produce usable coarse poses where global sets mix
    incompatibly-deformed regions and fit nothing (the reference gets the
    same effect from 4-point EPnP over 300 sequential iterations,
    PnPsolver.cc:170-265; a deformation-tolerant sampler is the batched
    equivalent)."""
    Kinv = jnp.linalg.inv(K)
    uv_n = (jnp.concatenate([uv, jnp.ones_like(uv[:, :1])], 1) @ Kinv.T)[:, :2]
    logits = jnp.where(valid, 0.0, -1e9)
    n_loc = int(round(n_hyp * local_frac))
    kg, kl = jax.random.split(key)
    g = jax.random.gumbel(kg, (n_hyp - n_loc, valid.shape[0])) + logits[None]
    _, sets_g = jax.lax.top_k(g, sample_size)                # (Bg, 6)
    ga = jax.random.gumbel(kl, (n_loc, valid.shape[0])) + logits[None]
    anchors = jnp.argmax(ga, axis=1)                         # (Bl,)
    d2 = jnp.sum((uv[anchors][:, None, :] - uv[None, :, :]) ** 2, -1)
    d2 = jnp.where(valid[None, :], d2, jnp.inf)
    _, sets_l = jax.lax.top_k(-d2, sample_size)              # (Bl, 6)
    sets = jnp.concatenate([sets_g, sets_l], axis=0)         # (B, 6)

    def solve_one(idx):
        return pnp_dlt(xyz[idx], uv_n[idx])

    def solve_one_planar(idx):
        return pnp_planar(xyz[idx], uv_n[idx])

    # every sample yields BOTH the DLT pose (general scenes) and the
    # homography-decomposition pose (planar scenes, where DLT degenerates);
    # scoring ranks the union
    Rs_d, ts_d = jax.vmap(solve_one)(sets)
    Rs_p, ts_p = jax.vmap(solve_one_planar)(sets)
    Rs = jnp.concatenate([Rs_d, Rs_p])                       # (2B, 3, 3)
    ts = jnp.concatenate([ts_d, ts_p])                       # (2B, 3)

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

    # refit the best hypothesis on its full inlier set (the reference
    # refines the winning EPnP pose before the full-map projection,
    # PnPsolver.cc:356-396); keep the refit only if it scores >= the raw one
    w = inl[best].astype(jnp.float32)
    Rr, tr = pnp_dlt_weighted(xyz, uv_n, w)
    xcr = xyz @ Rr.T + tr
    zr = jnp.where(jnp.abs(xcr[:, 2]) < 1e-9, 1e-9, xcr[:, 2])
    ur = fx * xcr[:, 0] / zr + cx
    vr = fy * xcr[:, 1] / zr + cy
    err2r = (ur - uv[:, 0]) ** 2 + (vr - uv[:, 1]) ** 2
    inl_r = (err2r < inlier_px ** 2) & (xcr[:, 2] > 0) & valid
    cnt_r = jnp.sum(inl_r)
    take = cnt_r >= counts[best]
    R_out, t_out = Rs[order], ts[order]
    R_out = R_out.at[0].set(jnp.where(take, Rr, R_out[0]))
    t_out = t_out.at[0].set(jnp.where(take, tr, t_out[0]))
    cnt_out = counts[order].at[0].max(jnp.where(take, cnt_r, 0))
    return PnPResult(R=R_out, t=t_out, n_inliers=cnt_out,
                     inliers_best=jnp.where(take, inl_r, inl[best]))


ransac_pnp_jit = jax.jit(ransac_pnp, static_argnames=('n_hyp', 'sample_size'))
