"""Two-view geometry: batched RANSAC for H/F, model selection, reconstruction.

Functional equivalent of the reference's monocular Initializer (reference
src/Initializer.cc, include/Initializer.h:38-72): parallel Homography
(normalized DLT + symmetric transfer error) and Fundamental (8-point +
epipolar error) hypothesis search, model selection by score ratio
RH > 0.40, decomposition (Faugeras 8 hypotheses for H, 4 for F via the
essential matrix), and triangulation/parallax voting (CheckRT).

TPU-first design: instead of the reference's two host threads each running a
sequential 200-iteration RANSAC with early exits, ALL hypotheses are
evaluated as one batched program (vmapped DLT solves + dense inlier scoring
— a few MB of residual matrices, ideal VPU work), and all 12 candidate
motions are triangulated/voted in parallel.

Also hosts the shared linear triangulation used by local mapping
(reference src/LocalMapping.cc:243-520 CreateNewMapPoints).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import lie

RANSAC_ITERS = 200       # reference Tracking.cc:698 (200 iterations)
SIGMA = 1.0              # reference Tracking.cc:698 (sigma = 1.0)
TH_F = 3.841             # chi2 95% 1-dof (reference CheckFundamental)
TH_H = 5.991             # chi2 95% 2-dof (reference CheckHomography)
TH_SCORE = 5.991         # score saturation


def triangulate_linear(P1: jnp.ndarray, P2: jnp.ndarray,
                       uv1: jnp.ndarray, uv2: jnp.ndarray) -> jnp.ndarray:
    """Batched SVD linear triangulation.

    P1, P2: (3, 4) projection matrices (can carry K or be normalized).
    uv1, uv2: (N, 2) pixel/normalized coords. Returns (N, 3) world points.
    Same construction as reference LocalMapping.cc:389-397 (A x = 0, SVD).
    """
    rows = jnp.stack([
        uv1[:, 0, None] * P1[2] - P1[0],
        uv1[:, 1, None] * P1[2] - P1[1],
        uv2[:, 0, None] * P2[2] - P2[0],
        uv2[:, 1, None] * P2[2] - P2[1],
    ], axis=1)                                        # (N, 4, 4)
    # Affine DLT: solve M X = -q in least squares via 3x3 normal equations
    # (the reference uses a 4x4 SVD; batched small SVDs are slow on TPU and
    # the finite-point assumption w=1 holds for triangulable geometry).
    M = rows[:, :, :3]
    q = rows[:, :, 3]
    MtM = jnp.einsum('nij,nik->njk', M, M) + 1e-9 * jnp.eye(3)
    Mtq = jnp.einsum('nij,ni->nj', M, q)
    return -jnp.linalg.solve(MtM, Mtq[..., None])[..., 0]


def _normalize_points(uv: jnp.ndarray, valid: jnp.ndarray):
    """Hartley normalization: zero-mean, unit mean abs dev. Returns (uvn, T)."""
    n = jnp.maximum(jnp.sum(valid), 1.0)
    mean = jnp.sum(jnp.where(valid[:, None], uv, 0.0), 0) / n
    d = jnp.where(valid[:, None], jnp.abs(uv - mean), 0.0)
    md = jnp.sum(d, 0) / n
    s = 1.0 / jnp.maximum(md, 1e-9)
    uvn = (uv - mean) * s
    T = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]], uv.dtype)
    T = T.at[0, 0].set(s[0]).at[1, 1].set(s[1]) \
         .at[0, 2].set(-mean[0] * s[0]).at[1, 2].set(-mean[1] * s[1])
    return uvn, T


def _dlt_fundamental(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """8-point algorithm on (8, 2) + (8, 2) -> F (3, 3), rank-2 enforced."""
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1,
                   jnp.ones_like(x1)], axis=1)        # (8, 9)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    F = vt[8].reshape(3, 3)
    u, s, v = jnp.linalg.svd(F)
    return u @ jnp.diag(s.at[2].set(0.0)) @ v


def _dlt_homography(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """DLT on (8, 2) pairs -> H (3, 3) mapping p1 -> p2."""
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    z = jnp.zeros_like(x1)
    o = jnp.ones_like(x1)
    r1 = jnp.stack([z, z, z, -x1, -y1, -o, y2 * x1, y2 * y1, y2], 1)
    r2 = jnp.stack([x1, y1, o, z, z, z, -x2 * x1, -x2 * y1, -x2], 1)
    A = jnp.concatenate([r1, r2], 0)                  # (16, 9)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    return vt[8].reshape(3, 3)


def _fundamental_score(F: jnp.ndarray, uv1, uv2, valid, sigma: float):
    """Symmetric epipolar chi2 score (reference Initializer::CheckFundamental):
    sum over inliers of (TH_SCORE - chi2) in both directions."""
    ones = jnp.ones_like(uv1[:, :1])
    p1 = jnp.concatenate([uv1, ones], 1)
    p2 = jnp.concatenate([uv2, ones], 1)
    Fp1 = p1 @ F.T                                    # lines in image 2
    Ftp2 = p2 @ F                                     # lines in image 1
    num = jnp.sum(p2 * Fp1, axis=1)
    inv_sigma2 = 1.0 / sigma ** 2
    d2_2 = num ** 2 / jnp.maximum(Fp1[:, 0] ** 2 + Fp1[:, 1] ** 2, 1e-12) * inv_sigma2
    d2_1 = num ** 2 / jnp.maximum(Ftp2[:, 0] ** 2 + Ftp2[:, 1] ** 2, 1e-12) * inv_sigma2
    in1 = d2_1 < TH_F
    in2 = d2_2 < TH_F
    score = jnp.sum(jnp.where(valid & in1, TH_SCORE - d2_1, 0.0)
                    + jnp.where(valid & in2, TH_SCORE - d2_2, 0.0))
    inlier = valid & in1 & in2
    return score, inlier


def _homography_score(H: jnp.ndarray, uv1, uv2, valid, sigma: float):
    """Symmetric transfer error score (reference Initializer::CheckHomography)."""
    Hinv = jnp.linalg.inv(H)
    ones = jnp.ones_like(uv1[:, :1])
    p1 = jnp.concatenate([uv1, ones], 1)
    p2 = jnp.concatenate([uv2, ones], 1)

    def transfer(Hm, a, b):
        q = a @ Hm.T
        w = jnp.where(jnp.abs(q[:, 2:3]) < 1e-12, 1e-12, q[:, 2:3])
        return jnp.sum((b - q[:, :2] / w) ** 2, axis=1)

    inv_sigma2 = 1.0 / sigma ** 2
    d2_12 = transfer(H, p1, uv2) * inv_sigma2
    d2_21 = transfer(Hinv, p2, uv1) * inv_sigma2
    in12 = d2_12 < TH_H
    in21 = d2_21 < TH_H
    score = jnp.sum(jnp.where(valid & in12, TH_SCORE - d2_12, 0.0)
                    + jnp.where(valid & in21, TH_SCORE - d2_21, 0.0))
    return score, valid & in12 & in21


def _sample_minimal_sets(key, valid: jnp.ndarray, n_sets: int, set_size: int = 8):
    """(n_sets, 8) indices drawn from valid entries (with-replacement Gumbel
    top-k per set gives distinct indices with overwhelming probability)."""
    n = valid.shape[0]
    logits = jnp.where(valid, 0.0, -1e9)
    g = jax.random.gumbel(key, (n_sets, n)) + logits[None]
    _, idx = jax.lax.top_k(g, set_size)
    return idx


def ransac_fundamental(key, uv1, uv2, valid, sigma: float = SIGMA,
                       n_iters: int = RANSAC_ITERS):
    """Batched F RANSAC. Returns (F, score, inlier_mask)."""
    uvn1, T1 = _normalize_points(uv1, valid)
    uvn2, T2 = _normalize_points(uv2, valid)
    sets = _sample_minimal_sets(key, valid, n_iters)

    def one(idx):
        Fn = _dlt_fundamental(uvn1[idx], uvn2[idx])
        return T2.T @ Fn @ T1

    Fs = jax.vmap(one)(sets)                          # (R, 3, 3)
    scores, inliers = jax.vmap(
        lambda F: _fundamental_score(F, uv1, uv2, valid, sigma))(Fs)
    best = jnp.argmax(scores)
    return Fs[best], scores[best], inliers[best]


def ransac_homography(key, uv1, uv2, valid, sigma: float = SIGMA,
                      n_iters: int = RANSAC_ITERS):
    """Batched H RANSAC. Returns (H, score, inlier_mask)."""
    uvn1, T1 = _normalize_points(uv1, valid)
    uvn2, T2 = _normalize_points(uv2, valid)
    sets = _sample_minimal_sets(key, valid, n_iters)

    def one(idx):
        Hn = _dlt_homography(uvn1[idx], uvn2[idx])
        return jnp.linalg.inv(T2) @ Hn @ T1

    Hs = jax.vmap(one)(sets)
    scores, inliers = jax.vmap(
        lambda H: _homography_score(H, uv1, uv2, valid, sigma))(Hs)
    best = jnp.argmax(scores)
    return Hs[best], scores[best], inliers[best]


def decompose_essential(E: jnp.ndarray):
    """E -> 4 motion hypotheses (R (4,3,3), t (4,3) unit norm)
    (reference Initializer::DecomposeE)."""
    u, _, vt = jnp.linalg.svd(E)
    # ensure proper rotations
    u = u * jnp.sign(jnp.linalg.det(u))
    vt = vt * jnp.sign(jnp.linalg.det(vt))
    W = jnp.array([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]], E.dtype)
    R1 = u @ W @ vt
    R2 = u @ W.T @ vt
    t = u[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def decompose_homography(H: jnp.ndarray, K: jnp.ndarray):
    """Faugeras SVD decomposition of a calibrated homography -> 8 hypotheses
    (R (8,3,3), t (8,3), n (8,3)) (reference Initializer::ReconstructH,
    Faugeras et al. 1988 — re-derived).

    Degenerate (d1~d2 or d2~d3) cases yield duplicated/invalid hypotheses
    that simply lose the triangulation vote."""
    A = jnp.linalg.inv(K) @ H @ K
    U, d, Vt = jnp.linalg.svd(A)
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d1, d2, d3 = d[0], d[1], d[2]
    V = Vt.T

    eps = 1e-9
    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0))
    aux3 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2), 0.0)) / jnp.maximum(d2 * (d1 + d3), eps) * d3  # unused helper
    x1_abs = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) /
                                  jnp.maximum(d1 * d1 - d3 * d3, eps), 0.0))
    x3_abs = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) /
                                  jnp.maximum(d1 * d1 - d3 * d3, eps), 0.0))
    e1 = jnp.array([1.0, 1.0, -1.0, -1.0])
    e3 = jnp.array([1.0, -1.0, 1.0, -1.0])

    # Case d' = +d2
    sin_t = e1 * e3 * aux1 / jnp.maximum((d1 + d3) * d2, eps)
    cos_t = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, eps)
    Rp_pos = jnp.zeros((4, 3, 3)).at[:, 0, 0].set(cos_t).at[:, 1, 1].set(1.0) \
        .at[:, 2, 2].set(cos_t).at[:, 0, 2].set(-sin_t).at[:, 2, 0].set(sin_t)
    tp_pos = (d1 - d3) * jnp.stack([e1 * x1_abs, jnp.zeros(4), -e3 * x3_abs], 1)
    np_pos = jnp.stack([e1 * x1_abs, jnp.zeros(4), e3 * x3_abs], 1)

    # Case d' = -d2
    sin_p = e1 * e3 * aux1 / jnp.maximum((d1 - d3) * d2, eps)
    cos_p = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, eps)
    Rp_neg = jnp.zeros((4, 3, 3)).at[:, 0, 0].set(cos_p).at[:, 1, 1].set(-1.0) \
        .at[:, 2, 2].set(-cos_p).at[:, 0, 2].set(sin_p).at[:, 2, 0].set(sin_p)
    tp_neg = (d1 + d3) * jnp.stack([e1 * x1_abs, jnp.zeros(4), e3 * x3_abs], 1)
    np_neg = np_pos

    Rp = jnp.concatenate([Rp_pos, Rp_neg])            # (8, 3, 3)
    tp = jnp.concatenate([tp_pos, tp_neg])
    npl = jnp.concatenate([np_pos, np_neg])
    R = s * jnp.einsum('ij,njk,kl->nil', U, Rp, Vt)
    t = jnp.einsum('ij,nj->ni', U, tp)
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=1, keepdims=True), eps)
    n = jnp.einsum('ij,nj->ni', V, npl)
    return R, t, n


def check_rt(R, t, uv1, uv2, valid, K: jnp.ndarray, sigma: float = SIGMA):
    """Vote for a motion hypothesis: triangulate all pairs, count those with
    positive depth in both views, parallax > 0.36deg-ish, and reprojection
    chi2 < 4 sigma^2 (reference Initializer::CheckRT).

    Returns (n_good, good_mask (N,), parallax_deg, X (N, 3))."""
    P1 = K @ jnp.concatenate([jnp.eye(3, dtype=K.dtype),
                              jnp.zeros((3, 1), K.dtype)], 1)
    P2 = K @ jnp.concatenate([R, t[:, None]], 1)
    X = triangulate_linear(P1, P2, uv1, uv2)
    finite = jnp.all(jnp.isfinite(X), axis=1)
    z1 = X[:, 2]
    Xc2 = X @ R.T + t
    z2 = Xc2[:, 2]
    # parallax between rays
    O2 = -R.T @ t
    r1 = X
    r2 = X - O2
    cosp = jnp.sum(r1 * r2, 1) / jnp.maximum(
        jnp.linalg.norm(r1, axis=1) * jnp.linalg.norm(r2, axis=1), 1e-12)
    # reprojection errors
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    u1 = fx * X[:, 0] / jnp.where(jnp.abs(z1) < 1e-12, 1e-12, z1) + cx
    v1 = fy * X[:, 1] / jnp.where(jnp.abs(z1) < 1e-12, 1e-12, z1) + cy
    u2 = fx * Xc2[:, 0] / jnp.where(jnp.abs(z2) < 1e-12, 1e-12, z2) + cy * 0 + cx
    v2 = fy * Xc2[:, 1] / jnp.where(jnp.abs(z2) < 1e-12, 1e-12, z2) + cy
    e1 = (u1 - uv1[:, 0]) ** 2 + (v1 - uv1[:, 1]) ** 2
    e2 = (u2 - uv2[:, 0]) ** 2 + (v2 - uv2[:, 1]) ** 2
    th2 = 4.0 * sigma ** 2
    good = (valid & finite & (z1 > 0) & (z2 > 0) & (cosp < 0.99998)
            & (e1 < th2) & (e2 < th2))
    n_good = jnp.sum(good)
    # median-ish parallax of good points: use 50th largest angle as reference
    ang = jnp.degrees(jnp.arccos(jnp.clip(cosp, -1.0, 1.0)))
    ang_good = jnp.where(good, ang, 0.0)
    k = jnp.minimum(50, jnp.maximum(n_good, 1)) - 1
    ang_sorted = jnp.sort(ang_good)[::-1]
    parallax = ang_sorted[k]
    return n_good, good, parallax, X


class InitResult(NamedTuple):
    success: jnp.ndarray     # bool
    R: jnp.ndarray           # (3, 3) pose of frame 2 w.r.t. frame 1 (Tc2c1)
    t: jnp.ndarray           # (3,)
    points: jnp.ndarray      # (N, 3) triangulated points in frame-1 coords
    good: jnp.ndarray        # (N,) bool: triangulated & voted good
    used_homography: jnp.ndarray


def initialize_two_view(key, uv1, uv2, valid, K: jnp.ndarray,
                        sigma: float = SIGMA, min_triangulated: int = 50,
                        min_parallax_deg: float = 1.0) -> InitResult:
    """Full monocular bootstrap (reference Initializer::Initialize):
    run H and F RANSAC, pick model by RH = SH/(SH+SF) > 0.40, decompose,
    vote all 12 candidate motions by triangulation, accept a clear winner.

    All candidate motions are evaluated in one batch (cond-free)."""
    kh, kf = jax.random.split(key)
    H, sh, in_h = ransac_homography(kh, uv1, uv2, valid, sigma)
    F, sf, in_f = ransac_fundamental(kf, uv1, uv2, valid, sigma)
    rh = sh / jnp.maximum(sh + sf, 1e-12)
    use_h = rh > 0.40                                 # reference Initializer.cc:120

    E = K.T @ F @ K
    Rs_e, ts_e = decompose_essential(E)               # (4, .)
    Rs_h, ts_h, _ = decompose_homography(H, K)        # (8, .)
    Rs = jnp.concatenate([Rs_e, Rs_h])                # (12, 3, 3)
    ts = jnp.concatenate([ts_e, ts_h])
    model_mask = jnp.concatenate([
        jnp.broadcast_to(~use_h, (4,)), jnp.broadcast_to(use_h, (8,))])
    vote_valid = valid & jnp.where(use_h, in_h, in_f)

    n_good, good, parallax, X = jax.vmap(
        lambda R, t: check_rt(R, t, uv1, uv2, vote_valid, K, sigma))(Rs, ts)
    n_good = jnp.where(model_mask, n_good, -1)
    best = jnp.argmax(n_good)
    best_n = n_good[best]
    # clear winner: no other hypothesis within 75% of best
    # (reference ReconstructF: nsimilar over 0.7*maxGood must be 1)
    n_similar = jnp.sum(n_good > 0.75 * best_n)
    n_valid = jnp.sum(vote_valid)
    success = ((best_n >= min_triangulated)
               & (best_n >= 0.5 * n_valid)
               & (n_similar == 1)
               & (parallax[best] > min_parallax_deg))
    return InitResult(success=success, R=Rs[best], t=ts[best],
                      points=X[best], good=good[best],
                      used_homography=use_h)


initialize_two_view_jit = jax.jit(initialize_two_view,
                                  static_argnames=('min_triangulated',))
