"""Stereo path: row-band matcher subpixel accuracy + full STEREO-sensor
end-to-end tracking (VERDICT r3 missing #4: the stereo path had zero
tests). Reference semantics: Frame::ComputeStereoMatches
(src/Frame.cc:527-702), Tracking::StereoInitialization."""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam2_e_tpu.ops.camera import Camera
from orb_slam2_e_tpu.ops.orb import OrbExtractor
from orb_slam2_e_tpu.ops import stereo as stereo_ops
from orb_slam2_e_tpu.models.system import (SlamSystem, SystemConfig, Sensor,
                                           TrackState)
from orb_slam2_e_tpu.utils.synthetic import SyntheticScene, orbit_trajectory
from orb_slam2_e_tpu.utils.trajectory import ate_rmse

FX, FY, CX_, CY_ = 400.0, 400.0, 240.0, 180.0
W, H = 480, 360
BF = 40.0                      # baseline * fx -> baseline 0.1 m


def _stereo_pair(scene, R, t):
    """Left + right renders; right camera displaced by the baseline along
    the camera x-axis (x_r = R X + t - [b, 0, 0])."""
    b = BF / FX
    img_l = scene.render(R, t)
    img_r = scene.render(R, t + np.array([-b, 0, 0], np.float32))
    return img_l, img_r


def test_stereo_match_subpixel_accuracy():
    """Matched features must recover disparity within a fraction of a
    pixel of ground truth bf/z (reference's SAD+parabola regime)."""
    scene = SyntheticScene(n_points=400, seed=3, width=W, height=H,
                           fx=FX, fy=FY, cx=CX_, cy=CY_)
    R = np.eye(3, dtype=np.float32)
    t = np.zeros(3, np.float32)
    img_l, img_r = _stereo_pair(scene, R, t)
    gt_depth = scene.depth_map(R, t)

    cam = Camera.create(fx=FX, fy=FY, cx=CX_, cy=CY_, bf=BF,
                        width=W, height=H)
    ex = OrbExtractor(n_features=600, n_levels=4)
    fl = ex(jnp.asarray(img_l, jnp.float32))
    fr = ex(jnp.asarray(img_r, jnp.float32))
    ur, depth = stereo_ops.stereo_match(cam, fl, fr,
                                        jnp.asarray(img_l, jnp.float32),
                                        jnp.asarray(img_r, jnp.float32))
    uv = np.asarray(fl.uv)
    depth = np.asarray(depth)
    ok = np.asarray(fl.valid) & (depth > 0)
    xs = np.clip(np.round(uv[:, 0]).astype(int), 0, W - 1)
    ys = np.clip(np.round(uv[:, 1]).astype(int), 0, H - 1)
    z_gt = gt_depth[ys, xs]
    ok &= z_gt > 0
    assert ok.sum() > 100, ok.sum()
    disp_est = BF / depth[ok]
    disp_gt = BF / z_gt[ok]
    err = np.abs(disp_est - disp_gt)
    # median under 0.3 px (subpixel), and the bulk under 1 px
    assert np.median(err) < 0.3, np.median(err)
    assert (err < 1.0).mean() > 0.8, (err < 1.0).mean()


def test_stereo_depth_matches_gt_metrically():
    """bf/disparity must give metric depth (not just ordering)."""
    scene = SyntheticScene(n_points=400, seed=4, width=W, height=H,
                           fx=FX, fy=FY, cx=CX_, cy=CY_)
    R = np.eye(3, dtype=np.float32)
    t = np.zeros(3, np.float32)
    img_l, img_r = _stereo_pair(scene, R, t)
    gt_depth = scene.depth_map(R, t)
    cam = Camera.create(fx=FX, fy=FY, cx=CX_, cy=CY_, bf=BF,
                        width=W, height=H)
    ex = OrbExtractor(n_features=600, n_levels=4)
    fl = ex(jnp.asarray(img_l, jnp.float32))
    depth = np.asarray(stereo_ops.stereo_depth_for_features(
        cam, jnp.asarray(img_l, jnp.float32), jnp.asarray(img_r, jnp.float32),
        fl))
    uv = np.asarray(fl.uv)
    ok = np.asarray(fl.valid) & (depth > 0)
    xs = np.clip(np.round(uv[:, 0]).astype(int), 0, W - 1)
    ys = np.clip(np.round(uv[:, 1]).astype(int), 0, H - 1)
    z_gt = gt_depth[ys, xs]
    ok &= z_gt > 0
    rel = np.abs(depth[ok] - z_gt[ok]) / z_gt[ok]
    assert np.median(rel) < 0.05, np.median(rel)


@pytest.fixture(scope="module")
def stereo_run():
    scene = SyntheticScene(n_points=500, seed=2, width=W, height=H,
                           fx=FX, fy=FY, cx=CX_, cy=CY_)
    poses, centers = orbit_trajectory(n_frames=10, radius=0.9, forward=0.04)
    cam = Camera.create(fx=FX, fy=FY, cx=CX_, cy=CY_, bf=BF,
                        width=W, height=H)
    cfg = SystemConfig(max_keyframes=32, max_points=8192, n_features=600,
                       n_levels=4, max_frames_between_kf=4)
    sysm = SlamSystem(cam, cfg, Sensor.STEREO)
    tracked = 0
    for k, (R, t) in enumerate(poses):
        img_l, img_r = _stereo_pair(scene, R, t)
        out = sysm.track_stereo(img_l, img_r, k / 30.0)
        tracked += out is not None
    sysm.shutdown()
    return sysm, centers, tracked, len(poses)


def test_e2e_stereo_tracks(stereo_run):
    sysm, centers, tracked, n = stereo_run
    # stereo initializes on the first frame — every frame should track
    assert tracked >= n - 1, (tracked, n)
    assert sysm.get_tracking_state() == TrackState.OK


def test_e2e_stereo_metric_scale(stereo_run):
    """Stereo landmarks carry metric scale: SE3-aligned ATE (no scale
    correction) must be small, like the RGB-D path."""
    sysm, centers, tracked, n = stereo_run
    ts, Rwc, twc = sysm.get_trajectory()
    gt = centers[-len(twc):]
    err = ate_rmse(twc, gt, with_scale=False)
    assert err < 0.08, err
