"""Relocalization: BoW candidates -> PnP RANSAC -> pose refinement ->
full-map projection fallback.

Equivalent of reference Tracking::Relocalization (src/Tracking.cc:1711-2141,
SURVEY.md §3.3) with the E-extensions: lowered BoW match gate (>= 4 vs stock
15), full-map SearchByProjection with TH_RELOC after PnP (reference
PnPsolver.cc:364-396 E-overload), and the staged S1/S2/S3 escalation. The
non-rigid branch (PoseOptimizationNR) is wired in by models/system when the
deformable mode is active (reference runs rigid and non-rigid side by side,
Tracking.cc:1951-2107).

TPU-first: candidate keyframes are processed in one batched program
(lax.scan over a fixed candidate count), PnP evaluates all RANSAC
hypotheses in parallel, and the full-map fallback is a dense projection
search over a compacted landmark subset.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import lie, matching, pnp, pose_opt
from ..ops.camera import Camera
from ..ops import camera as cam_ops
from .frame import Frame, scale_invsigma2
from .map_state import MapState, INVALID
from .tracking import TrackConfig, search_landmarks_projected, bind_matches, \
    optimize_frame_pose

N_CANDIDATES = 5
MIN_BOW_MATCHES = 4       # E-addition (reference Tracking.cc:1768: >= 4)
MIN_PNP_FULLMAP = 12      # reference PnPsolver.cc:396 (>= 12 full-map)
RELOC_GOOD = 50           # final acceptance (reference Tracking.cc:2110)


@functools.partial(jax.jit, static_argnames=('cfg',))
def relocalize_candidates(key, cam: Camera, cfg: TrackConfig,
                          state: MapState, frame: Frame,
                          cand_kfs: jnp.ndarray, cand_ok: jnp.ndarray):
    """Evaluate relocalization candidates; return the best frame pose.

    Per candidate (scanned): descriptor match frame <-> candidate KF
    landmarks (ratio 0.75) -> RANSAC PnP -> inlier count. The best
    candidate's pose seeds optimize + full-map widening in `relocalize`.
    Returns (pose7_best (7,), n_inliers_best, matches_best (F,) point ids)."""
    bits_f = matching.unpack_desc(frame.desc)

    def eval_cand(carry, inp):
        key = carry
        kf, ok = inp
        key, sub = jax.random.split(key)
        kp_pid = state.kf_kp_point[kf]
        kp_ok = state.kf_kp_valid[kf] & (kp_pid >= 0)
        safe = jnp.where(kp_ok, kp_pid, 0)
        kp_ok &= state.lm_valid[safe]
        bits_kf = matching.unpack_desc(state.kf_desc[kf])
        dmat = matching.hamming_matrix(bits_kf, bits_f)
        mask = kp_ok[:, None] & frame.valid[None, :]
        bi, d1, d2 = matching.masked_best2(dmat, mask)
        good = (d1 <= matching.TH_LOW) & (d1.astype(jnp.float32)
                                          < 0.75 * d2.astype(jnp.float32))
        midx = matching.resolve_duplicates(
            jnp.where(good, bi, INVALID), d1, frame.F)
        pair = midx >= 0
        fsafe = jnp.where(pair, midx, 0)
        xyz = state.lm_xyz[safe]
        uv = frame.uvr[fsafe][:, :2]
        n_pairs = jnp.sum(pair)
        res = pnp.ransac_pnp(sub, xyz, uv, pair & (n_pairs >= MIN_BOW_MATCHES),
                             cam.K, n_hyp=128)
        pose7 = lie.pose7_pack(res.R[0], res.t[0])
        # frame point ids implied by the candidate's inliers
        pid_frame = jnp.full((frame.F,), INVALID).at[fsafe].max(
            jnp.where(pair & res.inliers_best, kp_pid, INVALID))
        n_in = jnp.where(ok, res.n_inliers[0], -1)
        return key, (pose7, n_in, pid_frame)

    _, (poses, n_ins, pids) = jax.lax.scan(
        eval_cand, key, (cand_kfs, cand_ok))
    best = jnp.argmax(n_ins)
    return poses[best], n_ins[best], pids[best]


@functools.partial(jax.jit, static_argnames=('cfg',))
def fullmap_search(cam: Camera, cfg: TrackConfig, state: MapState,
                   frame: Frame, radius_scale, max_hamming):
    """Project the ENTIRE landmark pool with the current pose estimate and
    bind new matches (the E-addition ORBmatcher::SearchByProjection(Frame&,
    Map*, ...) — reference src/ORBmatcher.cc:134-222).

    The pool is scanned in chunks of cfg.local_points_cap so the search
    covers ALL landmarks, not a truncated subset (no silent capacity clip).
    Already-bound features are never stolen (search_landmarks_projected
    masks them), so chunk-sequential binding is consistent.

    Returns (frame, n_bound_total)."""
    L = cfg.local_points_cap
    P = state.P
    n_chunks = -(-P // L)
    R, t = lie.pose7_unpack(frame.pose7)

    def body(frame, start):
        raw = start + jnp.arange(L)
        ids = jnp.clip(raw, 0, P - 1)
        mask = state.lm_valid[ids] & (raw < P)
        best_feat, dists, _ = search_landmarks_projected(
            cam, cfg, R, t, state.lm_xyz[ids], state.lm_desc[ids], mask,
            state.lm_max_dist[ids], state.lm_min_dist[ids],
            state.lm_normal[ids], frame, radius_scale=radius_scale,
            max_hamming=max_hamming, ratio=1.0, check_view_cos=False,
            angles=state.lm_angle[ids])
        frame = bind_matches(frame, jnp.where(mask, ids, INVALID),
                             best_feat, dists)
        return frame, None

    frame, _ = jax.lax.scan(body, frame,
                            jnp.arange(n_chunks, dtype=jnp.int32) * L)
    return frame, jnp.sum((frame.point_ids >= 0) & frame.valid)


# Jitted motion-only pose optimization for the reloc ladder (reference
# Optimizer::PoseOptimization call inside Tracking::Relocalization).
optimize_pose = jax.jit(optimize_frame_pose, static_argnames=('cfg',))


def fullmap_search_and_optimize(cam: Camera, cfg: TrackConfig,
                                state: MapState, frame: Frame,
                                radius_scale: float,
                                max_hamming: int = matching.TH_RELOC):
    """Full-map projection search then rigid pose re-optimization."""
    frame, _ = fullmap_search(cam, cfg, state, frame,
                              jnp.float32(radius_scale),
                              jnp.int32(max_hamming))
    return optimize_pose(cam, cfg, state, frame)
