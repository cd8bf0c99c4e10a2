"""Per-frame tracking: motion-model search, local-map tracking, pose
optimization, keyframe policy, monocular initialization.

Functional equivalent of reference src/Tracking.cc (the L4 hot path,
SURVEY.md §3.1): GrabImage* -> Track -> {TrackWithMotionModel |
TrackReferenceKeyFrame | Relocalization} -> TrackLocalMap ->
NeedNewKeyFrame/CreateNewKeyFrame.

Design: each stage is a jitted, static-shape function over the MapState SoA
pytree; the host `Tracker` orchestrates per-frame control flow on a handful
of scalars (track state machine — reference Tracking.h:91-97). Searches are
dense masked Hamming matrices (ops/matching.py) instead of grid walks.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import lie, matching, pose_opt, twoview, scatter
from ..ops.camera import Camera
from ..ops import camera as cam_ops
from .frame import Frame, scale_invsigma2
from .map_state import MapState, INVALID


class TrackConfig(NamedTuple):
    scale_factor: float = 1.2
    n_levels: int = 8
    local_points_cap: int = 4096   # compacted local-map subset size
    local_kf_cap: int = 80         # reference Tracking.cc:1655 (80 KFs)
    min_inliers_motion: int = 10   # reference TrackWithMotionModel gate
    min_inliers_map: int = 30      # reference TrackLocalMap gate :1320
    radius_motion: float = 15.0    # search window (mono th=15, Tracking.cc:379)
    radius_map: float = 4.0        # local map search radius factor
    th_depth: float = 35.0         # close/far stereo threshold, in units of
                                   # baseline (reference mThDepth = bf*Th/fx)
    min_close_spawn: int = 100     # always spawn at least this many closest
                                   # depth points per new KF (reference
                                   # Tracking::CreateNewKeyFrame keeps
                                   # inserting sorted-by-depth points until
                                   # 100 even beyond ThDepth,
                                   # src/Tracking.cc:1467-1481)


# ---------------------------------------------------------------------------
# Projection-guided matching against a landmark subset
# ---------------------------------------------------------------------------

def predict_scale(dist, max_dist, scale_factor: float, n_levels: int):
    """Scale level a landmark should appear at, from its distance
    (reference MapPoint::PredictScale)."""
    ratio = jnp.maximum(max_dist / jnp.maximum(dist, 1e-6), 1e-6)
    lvl = jnp.ceil(jnp.log(ratio) / np.log(scale_factor)).astype(jnp.int32)
    return jnp.clip(lvl, 0, n_levels - 1)


def search_landmarks_projected(
        cam: Camera, cfg: TrackConfig, R, t,
        lm_xyz, lm_desc, lm_mask, lm_maxdist, lm_mindist, lm_normal,
        frame: Frame, radius_scale: float, max_hamming: int,
        ratio: float = 0.8, pred_octave=None, check_view_cos: bool = True,
        angles=None):
    """Project a landmark subset and match to frame features.

    Mirrors reference ORBmatcher::SearchByProjection(Frame&, vector<MapPoint*>)
    (src/ORBmatcher.cc:46-131): frustum check, distance bounds, viewing angle
    < 60deg, scale-predicted window radius, ratio test at the same octave.

    angles (L,): per-landmark source keypoint angle — applies the 30-bin
    rotation-consistency histogram against the matched frame keypoint's
    angle (reference SearchByProjection last-frame variant,
    src/ORBmatcher.cc:1529-1670, and the reloc-KF variant :1673-1844;
    VERDICT r4 missing #4).

    Returns (lm_best_feature (L,), dists (L,), proj_ok (L,)).
    """
    xc = lie.se3_apply(R, t, lm_xyz)
    (uv, z) = cam_ops.project(cam, xc)
    in_img = cam_ops.in_image(cam, uv) & (z > 0)
    dist = jnp.linalg.norm(xc, axis=-1)
    in_dist = (dist >= 0.8 * lm_mindist) & (dist <= 1.2 * lm_maxdist)
    ok = lm_mask & in_img & in_dist
    if check_view_cos:
        # viewing direction vs stored normal (reference Frame::isInFrustum)
        Ow = -jnp.einsum('ji,j->i', R, t)
        po = lm_xyz - Ow
        pn = po / jnp.maximum(jnp.linalg.norm(po, axis=-1, keepdims=True), 1e-9)
        view_cos = jnp.sum(pn * lm_normal, axis=-1)
        ok &= view_cos > 0.5
    if pred_octave is None:
        oct_pred = predict_scale(dist, lm_maxdist, cfg.scale_factor, cfg.n_levels)
    else:
        oct_pred = pred_octave
    sigma = cfg.scale_factor ** oct_pred.astype(jnp.float32)
    radius = radius_scale * sigma

    bits_lm = matching.unpack_desc(lm_desc)
    bits_f = matching.unpack_desc(frame.desc)
    dmat = matching.hamming_matrix(bits_lm, bits_f)
    mask = matching.window_mask(uv, frame.uvr[:, :2], radius)
    mask &= matching.octave_range_mask(oct_pred, frame.octave)
    mask &= ok[:, None] & frame.valid[None, :]
    # don't steal features already bound to a landmark
    mask &= (frame.point_ids[None, :] < 0)
    best_idx, d1, d2 = matching.masked_best2(dmat, mask)
    good = (d1 <= max_hamming) & (d1.astype(jnp.float32)
                                  < ratio * d2.astype(jnp.float32))
    if angles is not None:
        ang_lm = angles
        ang_f = frame.angle[jnp.clip(best_idx, 0, frame.F - 1)]
        good = matching.rotation_consistency_mask(ang_lm, ang_f, good)
    return jnp.where(good, best_idx, INVALID), d1, ok


def bind_matches(frame: Frame, lm_ids, lm_best_feature, dists):
    """Write landmark->feature matches into frame.point_ids, resolving
    feature collisions by lowest Hamming distance."""
    L = lm_ids.shape[0]
    F = frame.F
    feat = jnp.where(lm_best_feature >= 0, lm_best_feature, F)  # F = dump slot
    best_d = jnp.full((F + 1,), matching.BIG).at[feat].min(
        jnp.where(lm_best_feature >= 0, dists, matching.BIG))
    win = (lm_best_feature >= 0) & (dists <= best_d[feat])
    # tie-break: lowest landmark row wins
    lrow = jnp.arange(L)
    first = jnp.full((F + 1,), L).at[feat].min(jnp.where(win, lrow, L))
    win &= first[feat] == lrow
    new_ids = jnp.full((F + 1,), INVALID).at[feat].max(
        jnp.where(win, lm_ids, INVALID))[:F]
    return frame._replace(point_ids=jnp.where(new_ids >= 0, new_ids,
                                              frame.point_ids))


# ---------------------------------------------------------------------------
# Pose optimization on current frame matches
# ---------------------------------------------------------------------------

def optimize_frame_pose(cam: Camera, cfg: TrackConfig, state: MapState,
                        frame: Frame):
    """Gather observations from frame.point_ids and run motion-only LM
    (reference Tracking: Optimizer::PoseOptimization call sites)."""
    pid = frame.point_ids
    okp = (pid >= 0) & frame.valid
    safe = jnp.where(okp, pid, 0)
    xyz = state.lm_xyz[safe]
    okp &= state.lm_valid[safe]
    obs = pose_opt.PoseObs(
        uvr=frame.uvr,
        xyz=xyz,
        inv_sigma2=scale_invsigma2(frame.octave, cfg.scale_factor),
        valid=okp,
    )
    R0, t0 = lie.pose7_unpack(frame.pose7)
    R, t, inlier, n_in = pose_opt.pose_optimize(cam, R0, t0, obs)
    # unbind outlier associations (reference Tracking.cc:371-383 clears
    # mvbOutlier points after pose opt)
    new_pid = jnp.where(okp & ~inlier, INVALID, pid)
    frame = frame._replace(pose7=lie.pose7_pack(R, t), point_ids=new_pid)
    return frame, n_in


# ---------------------------------------------------------------------------
# Stage kernels (jitted): motion-model track, local-map track
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=('cfg',))
def track_motion_model(cam: Camera, cfg: TrackConfig, state: MapState,
                       frame: Frame, last_frame: Frame, pose7_pred):
    """Match last frame's landmarks into the current frame around the
    motion-model prediction, then optimize the pose
    (reference Tracking::TrackWithMotionModel, src/Tracking.cc:1060-1132).
    """
    R, t = lie.pose7_unpack(pose7_pred)
    lm_ids = jnp.where(last_frame.valid, last_frame.point_ids, INVALID)
    safe = jnp.where(lm_ids >= 0, lm_ids, 0)
    lm_mask = (lm_ids >= 0) & state.lm_valid[safe]
    best_feat, dists, _ = search_landmarks_projected(
        cam, cfg, R, t,
        state.lm_xyz[safe], state.lm_desc[safe], lm_mask,
        # distance bounds disabled for last-frame search: use octave hint
        jnp.full(safe.shape, 1e9), jnp.zeros(safe.shape), state.lm_normal[safe],
        frame, radius_scale=cfg.radius_motion, max_hamming=matching.TH_HIGH,
        ratio=0.9, pred_octave=last_frame.octave, check_view_cos=False,
        angles=last_frame.angle)
    frame = frame._replace(pose7=pose7_pred)
    frame = bind_matches(frame, lm_ids, best_feat, dists)
    n_matches = jnp.sum(frame.point_ids >= 0)
    frame, n_in = optimize_frame_pose(cam, cfg, state, frame)
    return frame, n_matches, n_in


@functools.partial(jax.jit, static_argnames=('cfg',))
def track_reference_keyframe(cam: Camera, cfg: TrackConfig, state: MapState,
                             frame: Frame, ref_kf, pose7_init):
    """Match the reference keyframe's landmarks by pure descriptor search
    (no motion prior) and optimize (reference Tracking::TrackReferenceKeyFrame,
    src/Tracking.cc:978: SearchByBoW >= 15 then PoseOptimization; we use a
    global ratio-test search which subsumes the BoW-node acceleration)."""
    kp_pid = state.kf_kp_point[ref_kf]
    kp_ok = state.kf_kp_valid[ref_kf] & (kp_pid >= 0)
    safe = jnp.where(kp_ok, kp_pid, 0)
    kp_ok &= state.lm_valid[safe]
    bits_kf = matching.unpack_desc(state.kf_desc[ref_kf])
    bits_f = matching.unpack_desc(frame.desc)
    dmat = matching.hamming_matrix(bits_kf, bits_f)
    mask = kp_ok[:, None] & frame.valid[None, :]
    best_idx, d1, d2 = matching.masked_best2(dmat, mask)
    good = (d1 <= matching.TH_LOW) & (d1.astype(jnp.float32)
                                      < 0.7 * d2.astype(jnp.float32))
    good = matching.rotation_consistency_mask(
        state.kf_kp_angle[ref_kf],
        frame.angle[jnp.clip(best_idx, 0, frame.F - 1)], good)
    frame = frame._replace(pose7=pose7_init)
    frame = bind_matches(frame, jnp.where(kp_ok, kp_pid, INVALID),
                         jnp.where(good, best_idx, INVALID),
                         jnp.where(good, d1, matching.BIG))
    n_matches = jnp.sum(frame.point_ids >= 0)
    frame, n_in = optimize_frame_pose(cam, cfg, state, frame)
    return frame, n_matches, n_in


@functools.partial(jax.jit, static_argnames=('cfg',))
def track_local_map(cam: Camera, cfg: TrackConfig, state: MapState,
                    frame: Frame):
    """Select the local map (keyframes voting via current matches + their
    points), project + match, optimize (reference Tracking::TrackLocalMap +
    UpdateLocalKeyFrames/UpdateLocalPoints/SearchLocalPoints,
    src/Tracking.cc:1287-1331, 1500-1709).

    Returns (frame, n_inliers, visible_mask (P,), found_mask (P,))."""
    # --- keyframe votes from currently matched points ---
    pid = frame.point_ids
    okp = (pid >= 0) & frame.valid
    marker = jnp.zeros((state.P,), jnp.int32).at[
        jnp.where(okp, pid, 0)].max(okp.astype(jnp.int32))
    kf_pt = jnp.where(state.kf_kp_valid, state.kf_kp_point, 0)
    kf_hit = marker[kf_pt] * (state.kf_kp_point >= 0) * state.kf_kp_valid
    votes = jnp.sum(kf_hit, axis=1) * state.kf_valid         # (K,)
    # top local_kf_cap keyframes by vote
    k_cap = min(cfg.local_kf_cap, int(votes.shape[0]))
    top_votes, top_kfs = jax.lax.top_k(votes, k_cap)
    local_kf_mask = jnp.zeros((state.K,), bool).at[top_kfs].max(top_votes > 0)
    # --- local points: union of local keyframes' observations ---
    in_local = local_kf_mask[:, None] & state.kf_kp_valid & (state.kf_kp_point >= 0)
    lm_local = jnp.zeros((state.P,), bool).at[
        jnp.where(in_local, state.kf_kp_point, 0)].max(in_local)
    lm_local &= state.lm_valid
    # exclude already-matched points (reference SearchLocalPoints skips
    # mnLastFrameSeen == current)
    lm_local &= ~(marker > 0)
    # --- compact to subset ---
    L = cfg.local_points_cap
    clipped = (jnp.sum(lm_local) > L).astype(jnp.int32)
    (ids,) = jnp.nonzero(lm_local, size=L, fill_value=0)
    sub_mask = jnp.arange(L) < jnp.sum(lm_local)   # fill slots alias id 0
    R, t = lie.pose7_unpack(frame.pose7)
    best_feat, dists, proj_ok = search_landmarks_projected(
        cam, cfg, R, t,
        state.lm_xyz[ids], state.lm_desc[ids], sub_mask,
        state.lm_max_dist[ids], state.lm_min_dist[ids], state.lm_normal[ids],
        frame, radius_scale=cfg.radius_map, max_hamming=matching.TH_HIGH,
        ratio=0.8)
    frame = bind_matches(frame, jnp.where(sub_mask, ids, INVALID),
                         best_feat, dists)
    frame, n_in = optimize_frame_pose(cam, cfg, state, frame)
    # visibility bookkeeping (IncreaseVisible/IncreaseFound,
    # reference Tracking.cc:1609-1628)
    visible = jnp.zeros((state.P,), bool).at[ids].max(sub_mask & proj_ok)
    visible |= marker > 0
    fin = (frame.point_ids >= 0) & frame.valid
    found = jnp.zeros((state.P,), bool).at[
        jnp.where(fin, frame.point_ids, 0)].max(fin)
    return frame, n_in, visible, found, clipped


@jax.jit
def update_visibility_counters(state: MapState, visible, found):
    return state._replace(
        lm_visible=state.lm_visible + visible.astype(state.lm_visible.dtype),
        lm_found=state.lm_found + found.astype(state.lm_found.dtype))


@functools.partial(jax.jit, static_argnames=('cfg',))
def track_frame_fused(cam: Camera, cfg: TrackConfig, state: MapState,
                      frame: Frame, last_frame: Frame, velocity7,
                      have_velocity, ref_kf):
    """One-dispatch tracking step: motion-model attempt, reference-keyframe
    fallback, local-map tracking, visibility counters, the keyframe-
    policy statistics, AND the next-frame velocity — all in a single jitted
    program. On a tunneled remote TPU every device->host read costs a full
    ~25 ms network round trip, so all per-frame scalars are packed into ONE
    int32 vector the host fetches with a single transfer (the reference's
    threads never had this concern; its per-frame scalars were free).

    Returns (state, frame, velocity7', flags) with
    flags = [ok, n_inliers, ref_matches] int32."""
    # --- pose prediction ---
    Rv, tv = lie.pose7_unpack(velocity7)
    Rl, tl = lie.pose7_unpack(last_frame.pose7)
    pred7 = lie.pose7_pack(*lie.se3_compose(Rv, tv, Rl, tl))
    pred7 = jnp.where(have_velocity, pred7, last_frame.pose7)

    # --- stage 1: motion model (always computed; cheap vs a cond) ---
    f_mm, n_m_mm, n_in_mm = track_motion_model(
        cam, cfg, state, frame, last_frame, pred7)
    mm_ok = have_velocity & (n_in_mm >= cfg.min_inliers_motion)

    # --- stage 2: reference-KF fallback ---
    f_rf, n_m_rf, n_in_rf = track_reference_keyframe(
        cam, cfg, state, frame, ref_kf, last_frame.pose7)
    use_mm = mm_ok
    f1 = jax.tree.map(lambda a, b: jnp.where(use_mm, a, b), f_mm, f_rf)
    stage1_ok = mm_ok | (n_in_rf >= cfg.min_inliers_motion)

    # --- stage 3: local map ---
    f2, n_in, visible, found, clipped = track_local_map(cam, cfg, state, f1)
    state = update_visibility_counters(state, visible & stage1_ok,
                                       found & stage1_ok)
    ok = stage1_ok & (n_in >= cfg.min_inliers_map)
    frame_out = jax.tree.map(lambda a, b: jnp.where(stage1_ok, a, b),
                             f2, frame)
    # keyframe policy statistic: reference KF's bound features
    ref_matches = jnp.sum((state.kf_kp_point[ref_kf] >= 0)
                          & state.kf_kp_valid[ref_kf])
    # next-frame velocity = Tcw_cur * Twc_last (reference Tracking.cc:545-552)
    # computed on device so the host never does eager pose math
    R_c, t_c = lie.pose7_unpack(frame_out.pose7)
    R_li, t_li = lie.se3_inverse(Rl, tl)
    vel_new = lie.pose7_pack(*lie.se3_compose(R_c, t_c, R_li, t_li))
    flags = jnp.stack([ok.astype(jnp.int32),
                       jnp.where(stage1_ok, n_in, 0).astype(jnp.int32),
                       ref_matches.astype(jnp.int32),
                       clipped])
    return state, frame_out, vel_new, flags


# ---------------------------------------------------------------------------
# Localization-only mode with visual-odometry points (reference mbVO)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=('cfg',))
def track_motion_model_vo(cam: Camera, cfg: TrackConfig, state: MapState,
                          frame: Frame, last_frame: Frame, pose7_pred):
    """Motion-model tracking augmented with temporary "visual odometry"
    points: features of the last frame that carry depth but no landmark are
    unprojected and matched frame-to-frame, so tracking survives when the
    camera leaves the mapped region (reference UpdateLastFrame spawns
    temporal MapPoints from last-frame depth in localization mode,
    src/Tracking.cc:1160-1222; TrackWithMotionModel then counts map-vs-VO
    matches and sets mbVO = nmatchesMap < 10, src/Tracking.cc:1224-1280).

    Returns (frame, n_map_inliers, n_total_inliers)."""
    R, t = lie.pose7_unpack(pose7_pred)
    # --- real landmark matches (same search as track_motion_model) ---
    lm_ids = jnp.where(last_frame.valid, last_frame.point_ids, INVALID)
    safe = jnp.where(lm_ids >= 0, lm_ids, 0)
    lm_mask = (lm_ids >= 0) & state.lm_valid[safe]
    best_feat, dists, _ = search_landmarks_projected(
        cam, cfg, R, t,
        state.lm_xyz[safe], state.lm_desc[safe], lm_mask,
        jnp.full(safe.shape, 1e9), jnp.zeros(safe.shape),
        state.lm_normal[safe], frame, radius_scale=cfg.radius_motion,
        max_hamming=matching.TH_HIGH, ratio=0.9,
        pred_octave=last_frame.octave, check_view_cos=False)
    frame = frame._replace(pose7=pose7_pred)
    frame = bind_matches(frame, lm_ids, best_feat, dists)

    # --- temporary VO points from last-frame depth (never enter the map,
    # like the reference's mlpTemporalPoints) ---
    Rl, tl = lie.pose7_unpack(last_frame.pose7)
    Rwl, twl = lie.se3_inverse(Rl, tl)
    vo_src = last_frame.valid & (last_frame.depth > 0) \
        & (last_frame.point_ids < 0)
    xyz_cam = cam_ops.backproject(cam, last_frame.uvr[:, :2],
                                  last_frame.depth)
    vo_xyz = lie.se3_apply(Rwl, twl, xyz_cam)
    xc = lie.se3_apply(R, t, vo_xyz)
    uv, z = cam_ops.project(cam, xc)
    proj_ok = vo_src & cam_ops.in_image(cam, uv) & (z > 0)
    sigma = cfg.scale_factor ** last_frame.octave.astype(jnp.float32)
    bits_l = matching.unpack_desc(last_frame.desc)
    bits_f = matching.unpack_desc(frame.desc)
    dmat = matching.hamming_matrix(bits_l, bits_f)
    mask = matching.window_mask(uv, frame.uvr[:, :2],
                                cfg.radius_motion * sigma)
    mask &= matching.octave_range_mask(last_frame.octave, frame.octave)
    mask &= proj_ok[:, None] & frame.valid[None, :]
    mask &= frame.point_ids[None, :] < 0   # landmark matches take precedence
    vo_feat, d1, d2 = matching.masked_best2(dmat, mask)
    vo_good = (d1 <= matching.TH_HIGH) \
        & (d1.astype(jnp.float32) < 0.9 * d2.astype(jnp.float32))
    vo_feat = matching.resolve_duplicates(
        jnp.where(vo_good, vo_feat, INVALID), d1, frame.F)
    vo_ok = vo_feat >= 0
    fsafe = jnp.where(vo_ok, vo_feat, 0)

    # --- joint pose optimization over map + VO observations ---
    pid = frame.point_ids
    okp = (pid >= 0) & frame.valid
    psafe = jnp.where(okp, pid, 0)
    okp &= state.lm_valid[psafe]
    obs = pose_opt.PoseObs(
        uvr=jnp.concatenate([frame.uvr, frame.uvr[fsafe]]),
        xyz=jnp.concatenate([state.lm_xyz[psafe], vo_xyz]),
        inv_sigma2=jnp.concatenate([
            scale_invsigma2(frame.octave, cfg.scale_factor),
            scale_invsigma2(frame.octave[fsafe], cfg.scale_factor)]),
        valid=jnp.concatenate([okp, vo_ok]))
    R1, t1, inlier, n_tot = pose_opt.pose_optimize(cam, R, t, obs)
    F = frame.F
    n_map = jnp.sum(inlier[:F] & okp).astype(jnp.int32)
    new_pid = jnp.where(okp & ~inlier[:F], INVALID, pid)
    frame = frame._replace(pose7=lie.pose7_pack(R1, t1), point_ids=new_pid)
    return frame, n_map, n_tot


@functools.partial(jax.jit, static_argnames=('cfg',))
def track_frame_loc(cam: Camera, cfg: TrackConfig, state: MapState,
                    frame: Frame, last_frame: Frame, velocity7,
                    have_velocity, ref_kf):
    """Localization-only per-frame step (reference "Localization Mode"
    branch, src/Tracking.cc:395-485): motion-model tracking with temporary
    VO points; the local map is only tracked when enough REAL map points
    are in view (mbVO false) — "mbVO true means that there are few matches
    to MapPoints in the map. We cannot retrieve a local map"
    (src/Tracking.cc:478-485). The map state is never mutated.

    Returns (frame, velocity7', flags) with flags =
    [ok, n_inliers, ref_matches, clipped, vo, n_total_mm] int32."""
    Rv, tv = lie.pose7_unpack(velocity7)
    Rl, tl = lie.pose7_unpack(last_frame.pose7)
    pred7 = lie.pose7_pack(*lie.se3_compose(Rv, tv, Rl, tl))
    pred7 = jnp.where(have_velocity, pred7, last_frame.pose7)

    f_mm, n_map_mm, n_tot_mm = track_motion_model_vo(
        cam, cfg, state, frame, last_frame, pred7)
    mm_ok = have_velocity & (n_tot_mm > 20)   # reference: nmatches>20 gate

    f_rf, n_m_rf, n_in_rf = track_reference_keyframe(
        cam, cfg, state, frame, ref_kf, last_frame.pose7)
    use_mm = mm_ok
    f1 = jax.tree.map(lambda a, b: jnp.where(use_mm, a, b), f_mm, f_rf)
    n_map1 = jnp.where(use_mm, n_map_mm, n_in_rf)
    stage1_ok = mm_ok | (n_in_rf >= cfg.min_inliers_motion)
    vo = stage1_ok & (n_map1 < 10)            # reference Tracking.cc:1280

    f2, n_in, _, _, clipped = track_local_map(cam, cfg, state, f1)
    ok = jnp.where(vo, stage1_ok,
                   stage1_ok & (n_in >= cfg.min_inliers_map))
    f_sel = jax.tree.map(lambda a, b: jnp.where(vo, a, b), f1, f2)
    frame_out = jax.tree.map(lambda a, b: jnp.where(stage1_ok, a, b),
                             f_sel, frame)
    ref_matches = jnp.sum((state.kf_kp_point[ref_kf] >= 0)
                          & state.kf_kp_valid[ref_kf])
    R_c, t_c = lie.pose7_unpack(frame_out.pose7)
    R_li, t_li = lie.se3_inverse(Rl, tl)
    vel_new = lie.pose7_pack(*lie.se3_compose(R_c, t_c, R_li, t_li))
    flags = jnp.stack([ok.astype(jnp.int32),
                       jnp.where(vo, n_tot_mm, n_in).astype(jnp.int32),
                       ref_matches.astype(jnp.int32),
                       clipped,
                       vo.astype(jnp.int32),
                       n_tot_mm.astype(jnp.int32)])
    return frame_out, vel_new, flags


# ---------------------------------------------------------------------------
# Keyframe insertion
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=('cfg',))
def insert_keyframe(cam: Camera, cfg: TrackConfig, state: MapState,
                    frame: Frame, frame_id, timestamp, parent_kf):
    """Write the frame into a free keyframe slot; for features with depth but
    no landmark, spawn close stereo/RGB-D landmarks (reference
    Tracking::CreateNewKeyFrame creates MapPoints for mvDepth < mThDepth,
    src/Tracking.cc:1421-1498).

    Returns (state, kf_slot)."""
    slot = state.free_kf_slot()
    R, t = lie.pose7_unpack(frame.pose7)
    Rwc, twc = lie.se3_inverse(R, t)

    # spawn landmarks for close depth features lacking one; like the
    # reference, always take at least the `min_close_spawn` closest depth
    # features even when they are beyond ThDepth (src/Tracking.cc:1467-1481),
    # so scenes without close structure still seed a map.
    th_depth = cam.bf / cam.fx * cfg.th_depth
    candidate = frame.valid & (frame.depth > 0) & (frame.point_ids < 0)
    depth_key = jnp.where(candidate, frame.depth, jnp.inf)
    rank = jnp.zeros(frame.depth.shape, jnp.int32).at[
        jnp.argsort(depth_key)].set(jnp.arange(frame.depth.shape[0],
                                               dtype=jnp.int32))
    want = candidate & ((frame.depth < th_depth)
                        | (rank < cfg.min_close_spawn))
    slots, ok = state.allocate_points(want)
    xyz_cam = cam_ops.backproject(cam, frame.uvr[:, :2], frame.depth)
    xyz_w = lie.se3_apply(Rwc, twc, xyz_cam)
    dist = jnp.linalg.norm(xyz_cam, axis=-1)
    maxd = dist * cfg.scale_factor ** frame.octave.astype(jnp.float32)
    mind = maxd / cfg.scale_factor ** (cfg.n_levels - 1)
    normal = xyz_w - twc
    normal = normal / jnp.maximum(
        jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-9)
    ms = scatter.masked_set
    state = state._replace(
        lm_xyz=ms(state.lm_xyz, slots, ok, xyz_w),
        lm_valid=state.lm_valid.at[jnp.where(ok, slots, 0)].max(ok),
        lm_desc=ms(state.lm_desc, slots, ok, frame.desc),
        lm_angle=ms(state.lm_angle, slots, ok, frame.angle),
        lm_normal=ms(state.lm_normal, slots, ok, normal),
        lm_min_dist=ms(state.lm_min_dist, slots, ok, mind),
        lm_max_dist=ms(state.lm_max_dist, slots, ok, maxd),
        lm_ref_kf=ms(state.lm_ref_kf, slots, ok, slot),
        lm_first_seq=ms(state.lm_first_seq, slots, ok, state.next_seq),
    )
    point_ids = jnp.where(ok, slots, frame.point_ids)
    state = state.add_keyframe(
        slot, frame.pose7, frame_id, timestamp, frame.uvr, frame.octave,
        frame.angle, frame.valid, frame.desc, point_ids, parent=parent_kf)
    frame = frame._replace(point_ids=point_ids)
    return state, frame, slot


# ---------------------------------------------------------------------------
# Monocular initialization
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=('cfg',))
def mono_init_match(cfg: TrackConfig, f_ref: Frame, f_cur: Frame):
    """Windowed descriptor match for initialization (reference
    ORBmatcher::SearchForInitialization, window 100, ratio 0.9)."""
    bits_a = matching.unpack_desc(f_ref.desc)
    bits_b = matching.unpack_desc(f_cur.desc)
    level0 = (f_ref.octave == 0)
    idx, dist = matching.search_windowed(
        bits_a, bits_b, f_ref.uvr[:, :2], f_cur.uvr[:, :2],
        f_ref.valid & level0, f_cur.valid & (f_cur.octave == 0),
        radius=100.0, max_dist=matching.TH_LOW, ratio=0.9,
        angles=(f_ref.angle, f_cur.angle))
    idx = matching.resolve_duplicates(idx, dist, f_cur.F)
    return idx, jnp.sum(idx >= 0)


@functools.partial(jax.jit, static_argnames=('out_cap',))
def mono_init_compact(f_ref: Frame, f_cur: Frame, midx, out_cap: int):
    """Reduce the 2x-feature initializer frames (reference Tracking.cc:131-134
    uses a doubled-budget extractor during monocular init) to the map's
    feature capacity, keeping matched pairs first, and remap the match
    indices. Returns (f_ref', f_cur', midx')."""
    from .frame import compact_frame
    ok_pair = midx >= 0
    f_ref_c, ref_sel, _ = compact_frame(f_ref, ok_pair, out_cap)
    cur_matched = jnp.zeros((f_cur.F,), bool).at[
        jnp.where(ok_pair, midx, 0)].max(ok_pair)
    f_cur_c, _, cur_inv = compact_frame(f_cur, cur_matched, out_cap)
    m_old = midx[ref_sel]
    midx_c = jnp.where(m_old >= 0,
                       cur_inv[jnp.where(m_old >= 0, m_old, 0)], INVALID)
    return f_ref_c, f_cur_c, midx_c


@functools.partial(jax.jit, static_argnames=('cfg',))
def mono_init_reconstruct(key, cam: Camera, cfg: TrackConfig,
                          state: MapState, f_ref: Frame, f_cur: Frame,
                          match_idx, ts_ref, ts_cur,
                          min_good=jnp.int32(80)):
    """Run two-view reconstruction; on success build the initial map:
    KF0 at identity, KF1 at [R|t], landmarks at triangulated points with
    median-depth normalization (reference Tracking::MonocularInitialization +
    CreateInitialMapMonocular, src/Tracking.cc:681-934).

    Returns (state, f_cur', success, kf0, kf1)."""
    ok_pair = match_idx >= 0
    safe = jnp.where(ok_pair, match_idx, 0)
    uv1 = f_ref.uvr[:, :2]
    uv2 = f_cur.uvr[safe][:, :2]
    res = twoview.initialize_two_view(key, uv1, uv2, ok_pair, cam.K)
    good = res.good & ok_pair
    # median depth normalization (reference Tracking.cc:906-930)
    z = jnp.where(good, res.points[:, 2], jnp.nan)
    med_depth = jnp.nanmedian(z)
    scale = 1.0 / jnp.maximum(med_depth, 1e-6)
    pts = res.points * scale
    t_n = res.t * scale
    pose0 = lie.pose7_identity((), pts.dtype)
    pose1 = lie.pose7_pack(res.R, t_n)

    slots, alloc_ok = state.allocate_points(good)
    ok = good & alloc_ok
    # landmark attributes from ref-frame viewpoint
    dist = jnp.linalg.norm(pts, axis=-1)
    maxd = dist * cfg.scale_factor ** f_ref.octave.astype(jnp.float32)
    mind = maxd / cfg.scale_factor ** (cfg.n_levels - 1)
    normal = pts / jnp.maximum(jnp.linalg.norm(pts, axis=-1, keepdims=True), 1e-9)
    ms = scatter.masked_set
    state = state._replace(
        lm_xyz=ms(state.lm_xyz, slots, ok, pts),
        lm_valid=state.lm_valid.at[jnp.where(ok, slots, 0)].max(ok),
        lm_desc=ms(state.lm_desc, slots, ok, f_cur.desc[safe]),
        lm_angle=ms(state.lm_angle, slots, ok, f_cur.angle[safe]),
        lm_normal=ms(state.lm_normal, slots, ok, normal),
        lm_min_dist=ms(state.lm_min_dist, slots, ok, mind),
        lm_max_dist=ms(state.lm_max_dist, slots, ok, maxd),
        lm_ref_kf=ms(state.lm_ref_kf, slots, ok, 0),
        lm_first_seq=ms(state.lm_first_seq, slots, ok, 0),
    )
    pid_ref = jnp.where(ok, slots, INVALID)
    pid_cur_scatter = jnp.full((f_cur.F,), INVALID).at[safe].max(
        jnp.where(ok, slots, INVALID))
    state = state.add_keyframe(0, pose0, 0, ts_ref, f_ref.uvr, f_ref.octave,
                               f_ref.angle, f_ref.valid, f_ref.desc, pid_ref,
                               parent=INVALID)
    state = state.add_keyframe(1, pose1, 1, ts_cur, f_cur.uvr, f_cur.octave,
                               f_cur.angle, f_cur.valid, f_cur.desc,
                               pid_cur_scatter, parent=0)
    f_cur = f_cur._replace(pose7=pose1, point_ids=pid_cur_scatter)
    n_good = jnp.sum(ok)
    return state, f_cur, res.success & (n_good >= min_good), n_good
