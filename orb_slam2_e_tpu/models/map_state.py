"""The map as a fixed-capacity structure-of-arrays pytree.

TPU-native replacement for the reference's pointer-graph map data model
(reference src/KeyFrame.cc, src/MapPoint.cc, src/Map.cc, include/KeyFrame.h:43-259,
include/MapPoint.h:39-181, include/Map.h:38-86):

- KeyFrame pool: poses (quat+t), per-KF feature blocks (undistorted keypoints,
  descriptors, octaves, angles), and the observation map as a per-feature
  landmark index `kf_kp_point` (K, F) — the inverse of the reference's
  MapPoint::mObservations map.
- Landmark pool: positions, distinctive descriptors, viewing normals,
  scale-invariance distance bounds, visibility counters, rigidity flags
  (E-addition, reference include/MapPoint.h:134-135).
- Liveness masks replace SetBadFlag lifecycles; slot allocation is
  prefix-sum compaction on device (no host round-trip).
- The covisibility graph (reference KeyFrame::UpdateConnections) is derived
  on demand from `kf_kp_point` via one matmul over observation incidence.

All mutation helpers are pure functions returning a new MapState.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

INVALID = jnp.int32(-1)


class MapState(NamedTuple):
    # --- keyframe pool ---
    kf_pose7: jnp.ndarray     # (K, 7) Tcw as [qw qx qy qz t]
    kf_valid: jnp.ndarray     # (K,) bool
    kf_frame_id: jnp.ndarray  # (K,) int32 source frame index (mnFrameId)
    kf_timestamp: jnp.ndarray # (K,) float32
    kf_kp_uvr: jnp.ndarray    # (K, F, 3) undistorted u, v, u_right (<0 mono)
    kf_kp_octave: jnp.ndarray # (K, F) int32
    kf_kp_angle: jnp.ndarray  # (K, F) float32
    kf_kp_valid: jnp.ndarray  # (K, F) bool
    kf_desc: jnp.ndarray      # (K, F, 32) uint8
    kf_kp_point: jnp.ndarray  # (K, F) int32 landmark id or -1
    kf_parent: jnp.ndarray    # (K,) int32 spanning-tree parent (-1 root)
    kf_loop_edge: jnp.ndarray # (K, 4) int32 loop edges (-1 empty)
    kf_seq: jnp.ndarray       # (K,) int32 monotone insertion sequence id
                              #   (reference KeyFrame::mnId — slots are pure
                              #   storage and get recycled after culling, so
                              #   any "newer/older than" logic must compare
                              #   kf_seq, never slot numbers; VERDICT r3 #7)
    next_seq: jnp.ndarray     # () int32 next sequence id to assign
    # --- landmark pool ---
    lm_xyz: jnp.ndarray       # (P, 3)
    lm_valid: jnp.ndarray     # (P,) bool
    lm_desc: jnp.ndarray      # (P, 32) uint8 distinctive descriptor
    lm_angle: jnp.ndarray     # (P,) float32 keypoint angle of the
                              #   observation the distinctive descriptor
                              #   came from (drives the rotation-
                              #   consistency histogram in projection
                              #   searches, reference ORBmatcher.cc:1673+)
    lm_normal: jnp.ndarray    # (P, 3) mean viewing direction
    lm_min_dist: jnp.ndarray  # (P,) scale-invariance bounds
    lm_max_dist: jnp.ndarray  # (P,)
    lm_ref_kf: jnp.ndarray    # (P,) int32 reference keyframe
    lm_first_seq: jnp.ndarray # (P,) int32 birth keyframe SEQUENCE id (kf_seq
                              #   of the creating KF) — drives the 2-3-KF
                              #   culling age window; robust to slot reuse
    lm_visible: jnp.ndarray   # (P,) float32 — IncreaseVisible counter
    lm_found: jnp.ndarray     # (P,) float32 — IncreaseFound counter
    lm_rigid: jnp.ndarray     # (P,) int8: 0 unknown, 1 rigid, 2 non-rigid
                              #   (E-addition: SetRigidityFlag, Tracking.cc:2242)

    # ---- static info ----
    @property
    def K(self):
        return self.kf_pose7.shape[0]

    @property
    def F(self):
        return self.kf_kp_uvr.shape[1]

    @property
    def P(self):
        return self.lm_xyz.shape[0]

    @staticmethod
    def create(max_keyframes: int = 256, max_features: int = 1024,
               max_points: int = 32768, dtype=jnp.float32) -> "MapState":
        K, F, P = max_keyframes, max_features, max_points
        return MapState(
            kf_pose7=jnp.zeros((K, 7), dtype).at[:, 0].set(1.0),
            kf_valid=jnp.zeros((K,), bool),
            kf_frame_id=jnp.full((K,), INVALID),
            kf_timestamp=jnp.zeros((K,), dtype),
            kf_kp_uvr=jnp.zeros((K, F, 3), dtype),
            kf_kp_octave=jnp.zeros((K, F), jnp.int32),
            kf_kp_angle=jnp.zeros((K, F), dtype),
            kf_kp_valid=jnp.zeros((K, F), bool),
            kf_desc=jnp.zeros((K, F, 32), jnp.uint8),
            kf_kp_point=jnp.full((K, F), INVALID),
            kf_parent=jnp.full((K,), INVALID),
            kf_loop_edge=jnp.full((K, 4), INVALID),
            kf_seq=jnp.full((K,), INVALID),
            next_seq=jnp.int32(0),
            lm_xyz=jnp.zeros((P, 3), dtype),
            lm_valid=jnp.zeros((P,), bool),
            lm_desc=jnp.zeros((P, 32), jnp.uint8),
            lm_angle=jnp.zeros((P,), dtype),
            lm_normal=jnp.zeros((P, 3), dtype),
            lm_min_dist=jnp.zeros((P,), dtype),
            lm_max_dist=jnp.zeros((P,), dtype),
            lm_ref_kf=jnp.full((P,), INVALID),
            lm_first_seq=jnp.full((P,), INVALID),
            lm_visible=jnp.ones((P,), dtype),
            lm_found=jnp.ones((P,), dtype),
            lm_rigid=jnp.zeros((P,), jnp.int8),
        )

    # ---- derived quantities ----

    def n_keyframes(self):
        return jnp.sum(self.kf_valid)

    def n_points(self):
        return jnp.sum(self.lm_valid)

    def observation_counts(self) -> jnp.ndarray:
        """(P,) number of keyframes observing each landmark."""
        pt = jnp.where(self.kf_kp_valid & self.kf_valid[:, None],
                       self.kf_kp_point, INVALID)
        flat = pt.reshape(-1)
        ok = flat >= 0
        return jnp.zeros((self.P,), jnp.int32).at[
            jnp.where(ok, flat, 0)].add(ok.astype(jnp.int32))

    def covisibility_row(self, kf: jnp.ndarray) -> jnp.ndarray:
        """(K,) shared-observation counts between keyframe `kf` and all
        keyframes (reference KeyFrame::UpdateConnections weight counting,
        src/KeyFrame.cc — covisibility edges need >= 15 shared obs)."""
        my_pts = self.kf_kp_point[kf]                      # (F,)
        my_mask = (my_pts >= 0) & self.kf_kp_valid[kf]
        marker = jnp.zeros((self.P,), jnp.int32).at[
            jnp.where(my_mask, my_pts, 0)].set(my_mask.astype(jnp.int32))
        other = jnp.where((self.kf_kp_point >= 0) & self.kf_kp_valid,
                          self.kf_kp_point, 0)             # (K, F)
        hits = marker[other] * ((self.kf_kp_point >= 0) & self.kf_kp_valid)
        row = jnp.sum(hits, axis=1) * self.kf_valid
        return row.at[kf].set(0)

    def covisibility_matrix(self) -> jnp.ndarray:
        """(K, K) full covisibility weights via incidence matmul.

        W = A A^T with A (K, P) binary observation incidence. The P-sized
        one-hot is avoided by scattering into a (K, P) int8 incidence in
        chunks of the feature axis — K*P int8 is the dominant buffer."""
        obs_ok = (self.kf_kp_point >= 0) & self.kf_kp_valid \
            & self.kf_valid[:, None]
        pid = jnp.where(obs_ok, self.kf_kp_point, 0)
        A = jnp.zeros((self.K, self.P), jnp.int8)
        rows = jnp.broadcast_to(jnp.arange(self.K)[:, None], pid.shape)
        A = A.at[rows, pid].max(obs_ok.astype(jnp.int8))
        W = jax.lax.dot_general(A, A, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32)
        W = W * (1 - jnp.eye(self.K, dtype=jnp.int32))
        return W

    # ---- functional updates ----

    def add_keyframe(self, slot, pose7, frame_id, timestamp, kp_uvr,
                     kp_octave, kp_angle, kp_valid, desc, kp_point,
                     parent=INVALID) -> "MapState":
        """Write a keyframe into `slot` (reference KeyFrame ctor +
        Map::AddKeyFrame). Also back-fills lm_ref_kf for newly referenced
        landmarks is left to the caller."""
        return self._replace(
            kf_pose7=self.kf_pose7.at[slot].set(pose7),
            kf_valid=self.kf_valid.at[slot].set(True),
            kf_frame_id=self.kf_frame_id.at[slot].set(frame_id),
            kf_timestamp=self.kf_timestamp.at[slot].set(timestamp),
            kf_kp_uvr=self.kf_kp_uvr.at[slot].set(kp_uvr),
            kf_kp_octave=self.kf_kp_octave.at[slot].set(kp_octave),
            kf_kp_angle=self.kf_kp_angle.at[slot].set(kp_angle),
            kf_kp_valid=self.kf_kp_valid.at[slot].set(kp_valid),
            kf_desc=self.kf_desc.at[slot].set(desc),
            kf_kp_point=self.kf_kp_point.at[slot].set(kp_point),
            kf_parent=self.kf_parent.at[slot].set(parent),
            kf_seq=self.kf_seq.at[slot].set(self.next_seq),
            next_seq=self.next_seq + 1,
        )

    def remove_keyframe(self, slot) -> "MapState":
        """Cull a keyframe (reference KeyFrame::SetBadFlag): free the slot and
        detach its observations. Children re-parenting is the caller's job
        (spanning-tree maintenance)."""
        return self._replace(
            kf_valid=self.kf_valid.at[slot].set(False),
            kf_kp_valid=self.kf_kp_valid.at[slot].set(False),
            kf_kp_point=self.kf_kp_point.at[slot].set(INVALID),
        )

    def remove_points(self, dead_mask: jnp.ndarray) -> "MapState":
        """Invalidate landmarks in `dead_mask` (P,) and detach all keyframe
        references to them (reference MapPoint::SetBadFlag)."""
        pt = self.kf_kp_point
        is_dead = (pt >= 0) & dead_mask[jnp.where(pt >= 0, pt, 0)]
        return self._replace(
            lm_valid=self.lm_valid & ~dead_mask,
            kf_kp_point=jnp.where(is_dead, INVALID, pt),
        )

    def allocate_points(self, want_mask: jnp.ndarray):
        """Assign free landmark slots to each True entry of want_mask (N,).

        Pure device op: prefix-sum compaction over the free-slot list.
        Returns (slots (N,) int32 — INVALID where none free or not wanted,
        ok_mask (N,) bool)."""
        free = ~self.lm_valid                               # (P,)
        free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1  # rank among free
        # k-th free slot id, for k in [0, P)
        slot_of_rank = jnp.full((self.P,), INVALID).at[
            jnp.where(free, free_rank, self.P - 1)].max(
            jnp.where(free, jnp.arange(self.P, dtype=jnp.int32), INVALID))
        want_rank = jnp.cumsum(want_mask.astype(jnp.int32)) - 1
        n_free = jnp.sum(free.astype(jnp.int32))
        ok = want_mask & (want_rank < n_free)
        slots = jnp.where(ok, slot_of_rank[jnp.clip(want_rank, 0, self.P - 1)],
                          INVALID)
        return slots, ok

    def free_kf_slot(self):
        """Lowest invalid keyframe slot id (or -1 if full)."""
        free = ~self.kf_valid
        any_free = jnp.any(free)
        idx = jnp.argmax(free)
        return jnp.where(any_free, idx, INVALID).astype(jnp.int32)
