"""End-to-end RGB-D odometry + map save/load + relocalization round trip."""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam2_e_tpu.ops.camera import Camera
from orb_slam2_e_tpu.models.system import SlamSystem, SystemConfig, Sensor, TrackState
from orb_slam2_e_tpu.utils.synthetic import SyntheticScene, orbit_trajectory
from orb_slam2_e_tpu.utils.trajectory import ate_rmse


@pytest.fixture(scope="module")
def rgbd_run():
    scene = SyntheticScene(n_points=500, seed=2, width=480, height=360,
                           fx=400, fy=400, cx=240, cy=180)
    poses, centers = orbit_trajectory(n_frames=12, radius=0.9, forward=0.04)
    cam = Camera.create(fx=400, fy=400, cx=240, cy=180, bf=40.0,
                        width=480, height=360)
    cfg = SystemConfig(max_keyframes=32, max_points=8192, n_features=600,
                       n_levels=4, max_frames_between_kf=4)
    sys = SlamSystem(cam, cfg, Sensor.RGBD)
    tracked = 0
    for k, (R, t) in enumerate(poses):
        img = scene.render(R, t)
        depth = scene.depth_map(R, t)
        out = sys.track_rgbd(img, depth, k / 30.0)
        tracked += out is not None
    return sys, centers, tracked, len(poses)


def test_rgbd_tracks_all_frames(rgbd_run):
    sys, centers, tracked, n = rgbd_run
    # RGB-D initializes on the first frame — every frame should track
    assert tracked >= n - 1
    assert sys.get_tracking_state() == TrackState.OK


def test_rgbd_metric_scale(rgbd_run):
    """Depth-initialized map points give METRIC scale: ATE without scale
    alignment must be small (monocular can't do this)."""
    sys, centers, tracked, n = rgbd_run
    ts, Rwc, twc = sys.get_trajectory()
    gt = centers[-len(twc):]
    err = ate_rmse(twc, gt, with_scale=False)
    assert err < 0.08, err


def test_map_save_load_roundtrip(rgbd_run, tmp_path):
    sys, *_ = rgbd_run
    p = tmp_path / "map.npz"
    sys.save_map(p)
    from orb_slam2_e_tpu.utils import map_io
    state2, extra = map_io.load_map(p)
    np.testing.assert_array_equal(np.asarray(sys.map.kf_valid),
                                  np.asarray(state2.kf_valid))
    np.testing.assert_allclose(np.asarray(sys.map.lm_xyz),
                               np.asarray(state2.lm_xyz))
    assert int(extra["n_keyframes"]) == sys.n_keyframes


def test_map_load_v1_migration(rgbd_run, tmp_path):
    """A v1 checkpoint (no kf_seq/next_seq/lm_first_seq) must load with
    those fields synthesized, not raise (ADVICE r4)."""
    sys, *_ = rgbd_run
    p = tmp_path / "map_v1.npz"
    sys.save_map(p)
    data = dict(np.load(p))
    data["format_version"] = np.asarray(1)
    for k in ("map_kf_seq", "map_next_seq", "map_lm_first_seq"):
        data.pop(k, None)
    np.savez_compressed(p, **data)
    from orb_slam2_e_tpu.utils import map_io
    state2, extra = map_io.load_map(p)
    kfv = np.asarray(state2.kf_valid)
    seq = np.asarray(state2.kf_seq)
    assert (seq[kfv] >= 0).all()
    assert int(state2.next_seq) == kfv.sum()
    assert np.asarray(state2.lm_first_seq).shape == \
        np.asarray(state2.lm_valid).shape


def test_pointcloud_export(rgbd_run, tmp_path):
    sys, *_ = rgbd_run
    from orb_slam2_e_tpu.utils import map_io
    p = tmp_path / "cloud.txt"
    map_io.export_pointcloud_txt(p, sys.map)
    lines = p.read_text().splitlines()
    assert len(lines) == int(sys.map.n_points())
