"""Per-frame feature record (functional Frame).

Equivalent of reference src/Frame.cc (include/Frame.h:43-237): ORB features,
undistorted keypoints, stereo right-coordinates / RGB-D pseudo-stereo depth,
and the frame's landmark associations `point_ids` (the reference's
mvpMapPoints). The 64x48 search grid (reference Frame.cc:245) is not needed:
windowed searches are dense masked matrix ops (see ops/matching.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import camera as cam_ops
from ..ops.camera import Camera
from ..ops.orb import OrbFeatures

INVALID = jnp.int32(-1)


class Frame(NamedTuple):
    pose7: jnp.ndarray      # (7,) Tcw
    uvr: jnp.ndarray        # (F, 3) undistorted u, v, u_right (<0 => mono)
    uv_raw: jnp.ndarray     # (F, 2) raw (distorted) pixel coords
    octave: jnp.ndarray     # (F,) int32
    angle: jnp.ndarray      # (F,)
    response: jnp.ndarray   # (F,)
    desc: jnp.ndarray       # (F, 32) uint8
    valid: jnp.ndarray      # (F,) bool
    point_ids: jnp.ndarray  # (F,) int32 landmark id or -1
    depth: jnp.ndarray      # (F,) z depth (<=0 => unknown)

    @property
    def F(self):
        return self.uvr.shape[0]


def scale_invsigma2(octave: jnp.ndarray, scale_factor: float) -> jnp.ndarray:
    """1 / sigma^2(octave) — information weights (reference mvInvLevelSigma2,
    src/ORBextractor.cc ctor / Frame usage in Optimizer.cc:334)."""
    sigma2 = scale_factor ** (2.0 * octave.astype(jnp.float32))
    return 1.0 / sigma2


def frame_from_features(cam: Camera, feats: OrbFeatures,
                        depth_lookup=None) -> Frame:
    """Build a Frame from extractor output.

    depth_lookup: optional (F,) depths sampled at keypoint locations (RGB-D
    path, reference Frame::ComputeStereoFromRGBD src/Frame.cc:704) or
    produced by the stereo matcher (reference ComputeStereoMatches
    src/Frame.cc:527). ur = u - bf/d for valid depths."""
    uv_und = cam_ops.undistort_pixels(cam, feats.uv)
    n = feats.uv.shape[0]
    if depth_lookup is None:
        ur = jnp.full((n,), -1.0)
        depth = jnp.full((n,), -1.0)
    else:
        depth = depth_lookup
        ok = depth > 0
        ur = jnp.where(ok, uv_und[:, 0] - cam.bf / jnp.where(ok, depth, 1.0),
                       -1.0)
    uvr = jnp.concatenate([uv_und, ur[:, None]], axis=-1)
    return Frame(
        pose7=jnp.zeros((7,), uvr.dtype).at[0].set(1.0),
        uvr=uvr,
        uv_raw=feats.uv,
        octave=feats.octave,
        angle=feats.angle,
        response=feats.response,
        desc=feats.desc,
        valid=feats.valid,
        point_ids=jnp.full((n,), INVALID),
        depth=depth,
    )


def compact_frame(frame: Frame, priority: jnp.ndarray, out_cap: int):
    """Select `out_cap` features from a larger-capacity frame, keeping
    priority rows first, then highest response. Used by the monocular
    initializer, whose 2x-feature extraction (reference Tracking.cc:131-134
    mpIniORBextractor = 2 * nFeatures) must be reduced to the map's feature
    capacity before keyframe insertion.

    Returns (frame_out (out_cap rows), sel (out_cap,) source rows,
    inv (F_in,) source row -> output row or -1)."""
    F_in = frame.F
    key = (priority.astype(jnp.float32) * 1e6
           + frame.response.astype(jnp.float32))
    key = jnp.where(frame.valid, key, -1.0)
    order = jnp.argsort(-key)
    sel = order[:out_cap]
    inv = jnp.full((F_in,), INVALID).at[sel].set(
        jnp.arange(out_cap, dtype=jnp.int32))
    out = Frame(
        pose7=frame.pose7,
        uvr=frame.uvr[sel], uv_raw=frame.uv_raw[sel],
        octave=frame.octave[sel], angle=frame.angle[sel],
        response=frame.response[sel], desc=frame.desc[sel],
        valid=frame.valid[sel], point_ids=frame.point_ids[sel],
        depth=frame.depth[sel])
    return out, sel, inv


def sample_depth_at(depth_map: jnp.ndarray, uv: jnp.ndarray,
                    depth_factor: float = 1.0,
                    edge_rel_tol: float = 0.08) -> jnp.ndarray:
    """Nearest-neighbor depth lookup at raw keypoint coords (RGB-D).

    Keypoints sit on corners, and corners sit on depth discontinuities: a
    1-px rounding of the keypoint position can land the depth sample on the
    WRONG SIDE of an object boundary — a measurement that is wrong by meters,
    not noise (reference Frame::ComputeStereoFromRGBD, src/Frame.cc:705-729,
    samples blindly; TUM depth edges are smeared enough to survive that).
    Reject the sample when the valid depths in the 3x3 neighborhood disagree
    by more than edge_rel_tol relative spread — the feature keeps its 2D
    (mono) observation and simply contributes no depth."""
    H, W = depth_map.shape
    x = jnp.clip(jnp.round(uv[:, 0]), 0, W - 1).astype(jnp.int32)
    y = jnp.clip(jnp.round(uv[:, 1]), 0, H - 1).astype(jnp.int32)
    dm = depth_map.astype(jnp.float32)
    d = dm[y, x] * depth_factor
    # 3x3 neighborhood min/max over VALID (>0) depths
    offs = jnp.array([-1, 0, 1])
    yy = jnp.clip(y[:, None, None] + offs[None, :, None], 0, H - 1)
    xx = jnp.clip(x[:, None, None] + offs[None, None, :], 0, W - 1)
    nb = dm.reshape(-1)[(yy * W + xx).reshape(len(x), 9)] * depth_factor
    nb_valid = nb > 0
    nb_min = jnp.min(jnp.where(nb_valid, nb, jnp.inf), axis=1)
    nb_max = jnp.max(jnp.where(nb_valid, nb, -jnp.inf), axis=1)
    flat = (nb_max - nb_min) <= edge_rel_tol * jnp.maximum(nb_min, 1e-6)
    return jnp.where((d > 0) & flat, d, -1.0)
