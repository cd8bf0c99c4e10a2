"""Stereo matching: left-right ORB correspondence with SAD subpixel refine.

Functional equivalent of reference Frame::ComputeStereoMatches
(src/Frame.cc:527-702): per left keypoint, search right keypoints in the
same row band (tolerance scaled by octave), pick the best Hamming match
within the valid disparity range, then refine the right u-coordinate by an
11x11 SAD window slid +-5 px with parabola subpixel interpolation.

TPU-first: the row-band candidate structure is a dense mask over the full
(F_left x F_right) Hamming matrix (one MXU matmul); SAD refinement gathers
all windows at once and the +-5 slide is a vectorized stack. The reference
slides on the matched keypoint's pyramid level; we slide on level 0 with
coordinates scaled back, which avoids carrying the pyramid (accuracy within
the same subpixel regime for the scales involved).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import matching
from .camera import Camera
from .orb import OrbFeatures

SAD_HALF = 5          # 11x11 window (reference uses w=5, Frame.cc:617)
SLIDE = 5             # +-5 px slide (reference L=5, Frame.cc:622)


def stereo_match(cam: Camera, feats_l: OrbFeatures, feats_r: OrbFeatures,
                 img_l: jnp.ndarray, img_r: jnp.ndarray,
                 scale_factor: float = 1.2, min_z: float = 0.1):
    """Returns (ur (F,), depth (F,)) for left features; -1 where unmatched."""
    F = feats_l.uv.shape[0]
    bits_l = matching.unpack_desc(feats_l.desc)
    bits_r = matching.unpack_desc(feats_r.desc)
    dmat = matching.hamming_matrix(bits_l, bits_r)

    sig = scale_factor ** feats_l.octave.astype(jnp.float32)
    row_tol = 2.0 * sig
    dv = jnp.abs(feats_l.uv[:, None, 1] - feats_r.uv[None, :, 1])
    row_ok = dv <= row_tol[:, None]
    # disparity range: [minD=0+, maxD=bf/minZ]
    max_d = cam.bf / min_z
    disp = feats_l.uv[:, None, 0] - feats_r.uv[None, :, 0]
    d_ok = (disp > 0.1) & (disp < max_d)
    oct_ok = matching.octave_range_mask(feats_l.octave, feats_r.octave)
    mask = row_ok & d_ok & oct_ok & feats_l.valid[:, None] & feats_r.valid[None, :]
    best, d1, _ = matching.masked_best2(dmat, mask)
    good = d1 <= matching.TH_HIGH
    safe = jnp.where(good, best, 0)
    u_r0 = feats_r.uv[safe, 0]

    # --- SAD subpixel refinement around u_r0 on level-0 images ---
    H, W = img_l.shape
    il = img_l.astype(jnp.float32)
    ir = img_r.astype(jnp.float32)

    def gather_patch(img, cx, cy):
        """(F, 11, 11) patches centered at (cx, cy), clamped."""
        oy = jnp.arange(-SAD_HALF, SAD_HALF + 1)
        ox = jnp.arange(-SAD_HALF, SAD_HALF + 1)
        yy = jnp.clip(cy[:, None, None] + oy[None, :, None], 0, H - 1)
        xx = jnp.clip(cx[:, None, None] + ox[None, None, :], 0, W - 1)
        return img.reshape(-1)[(yy * W + xx).astype(jnp.int32)]

    cxl = jnp.round(feats_l.uv[:, 0]).astype(jnp.int32)
    cyl = jnp.round(feats_l.uv[:, 1]).astype(jnp.int32)
    patch_l = gather_patch(il, cxl, cyl)
    # normalize by center intensity (reference divides by center pixel)
    patch_l = patch_l - patch_l[:, SAD_HALF:SAD_HALF + 1, SAD_HALF:SAD_HALF + 1]

    cxr0 = jnp.round(u_r0).astype(jnp.int32)
    sads = []
    for s in range(-SLIDE, SLIDE + 1):
        patch_r = gather_patch(ir, cxr0 + s, cyl)
        patch_r = patch_r - patch_r[:, SAD_HALF:SAD_HALF + 1,
                                    SAD_HALF:SAD_HALF + 1]
        sads.append(jnp.sum(jnp.abs(patch_l - patch_r), axis=(1, 2)))
    sad = jnp.stack(sads, axis=1)                      # (F, 11)
    best_s = jnp.argmin(sad, axis=1)
    # the reference DISCARDS matches whose SAD minimum sits on the slide
    # boundary (Frame.cc:659-660: bestincR==-L || bestincR==L -> continue):
    # the true minimum is outside the window, so the parabola is invalid
    interior = (best_s > 0) & (best_s < 2 * SLIDE)
    ctr = jnp.clip(best_s, 1, 2 * SLIDE - 1)
    # parabola subpixel (reference Frame.cc:664-672)
    y0 = jnp.take_along_axis(sad, (ctr - 1)[:, None], 1)[:, 0]
    y1 = jnp.take_along_axis(sad, ctr[:, None], 1)[:, 0]
    y2 = jnp.take_along_axis(sad, (ctr + 1)[:, None], 1)[:, 0]
    denom = jnp.maximum(y0 + y2 - 2 * y1, 1e-6)
    delta = 0.5 * (y0 - y2) / denom
    # reference rejects |delta| > 1 (Frame.cc:668-669) instead of clamping
    delta_ok = jnp.abs(delta) <= 1.0
    u_ref = cxr0.astype(jnp.float32) + (ctr - SLIDE).astype(jnp.float32) + delta

    # Disparity of the IMAGE CONTENT at the SAD window center. The left
    # window is centered on the integer cxl, so the refined right position
    # u_ref estimates (cxl - d); using the keypoint's subpixel u_l here
    # would fold frac(u_l) (up to 0.5 px) into the disparity.
    disparity = cxl.astype(jnp.float32) - u_ref
    ok = good & interior & delta_ok & (disparity > 0.01) & (disparity < max_d)
    # median-SAD outlier filter (reference Frame.cc:690-701): matches whose
    # best SAD exceeds 1.5 * 1.4 * median are wrong-correspondence outliers
    # (these are exactly the huge-disparity -> tiny-depth landmarks that
    # would otherwise poison stereo initialization)
    sad_best = y1
    med = jnp.nanmedian(jnp.where(ok, sad_best, jnp.nan))
    sad_ok = sad_best <= 1.5 * 1.4 * jnp.where(jnp.isnan(med), jnp.inf, med)
    ok = ok & sad_ok
    depth = jnp.where(ok, cam.bf / jnp.maximum(disparity, 1e-6), -1.0)
    # u_r consistent with the keypoint's subpixel u: ur = u_l - d, so the
    # tracking residual u - bf/z - ur is zero at the measured depth
    ur = jnp.where(ok, feats_l.uv[:, 0] - disparity, -1.0)
    return ur, depth


def stereo_depth_for_features(cam: Camera, img_l, img_r, feats_l: OrbFeatures,
                              scale_factor: float = 1.2,
                              extractor=None, n_levels: int = 8):
    """Convenience wrapper: extract right features and match. The right
    extractor reuses the left's configuration (pass n_levels to match the
    left pyramid — a mismatched right pyramid detects the same physical
    corners at different octaves and the octave-band gate then drops them)."""
    from .orb import OrbExtractor
    if extractor is None:
        # cache one right-image extractor per (shape, capacity, pyramid)
        key = (img_r.shape, feats_l.uv.shape[0], scale_factor, n_levels)
        cache = stereo_depth_for_features.__dict__.setdefault('_cache', {})
        if key not in cache:
            n = feats_l.uv.shape[0]
            cache[key] = OrbExtractor(n_features=n, scale_factor=scale_factor,
                                      n_levels=n_levels)
        extractor = cache[key]
    feats_r = extractor(img_r)
    _, depth = stereo_match(cam, feats_l, feats_r, img_l, img_r, scale_factor)
    return depth
