"""End-to-end monocular odometry on a synthetic scene with exact ground
truth — the integration test the reference lacks (SURVEY.md §4: dataset
drivers are its only end-to-end validation)."""

import numpy as np
import pytest

from orb_slam2_e_tpu.ops.camera import Camera
from orb_slam2_e_tpu.models.system import SlamSystem, SystemConfig, Sensor, TrackState
from orb_slam2_e_tpu.utils.synthetic import SyntheticScene, orbit_trajectory
from orb_slam2_e_tpu.utils.trajectory import ate_rmse


@pytest.fixture(scope="module")
def mono_run():
    scene = SyntheticScene(n_points=500, seed=1, width=480, height=360,
                           fx=400, fy=400, cx=240, cy=180)
    poses, centers = orbit_trajectory(n_frames=14, radius=1.0, forward=0.04)
    cam = Camera.create(fx=400, fy=400, cx=240, cy=180, width=480, height=360)
    cfg = SystemConfig(max_keyframes=32, max_points=8192, n_features=600,
                       n_levels=4, max_frames_between_kf=4,
                       min_init_matches=80)
    sys = SlamSystem(cam, cfg, Sensor.MONOCULAR)
    tracked = []
    for k, (R, t) in enumerate(poses):
        img = scene.render(R, t)
        out = sys.track_monocular(img, k / 30.0)
        tracked.append(out is not None)
    return sys, centers, tracked, len(poses)


def test_initializes_and_tracks(mono_run):
    """Two-view init latency is data-dependent (the clear-winner +
    parallax gates reject small baselines, exactly as the reference
    Initializer does) — the invariant is: init happens with frames to
    spare, and once initialized every later frame tracks."""
    sys, centers, tracked, n = mono_run
    assert sys.get_tracking_state() == TrackState.OK
    first = tracked.index(True)
    assert first <= n - 6, f"initialized too late (frame {first})"
    assert all(tracked[first:]), tracked


def test_map_grows(mono_run):
    sys, *_ = mono_run
    assert int(sys.map.n_keyframes()) >= 3
    assert int(sys.map.n_points()) > 200


def test_trajectory_accuracy(mono_run):
    sys, centers, tracked, n = mono_run
    ts, Rwc, twc = sys.get_trajectory()
    assert len(twc) >= 6
    # compare against the ground-truth centers of the tracked frames
    # (mono is up-to-scale: Umeyama with scale)
    gt = centers[-len(twc):]
    err = ate_rmse(twc, gt, with_scale=True)
    # trajectory span is ~1.0m; demand <=10cm ATE (current: ~0.07;
    # tightening tracked as an accuracy TODO)
    assert err < 0.10, err


def test_keyframe_trajectory_save(mono_run, tmp_path):
    sys, *_ = mono_run
    p = tmp_path / "kf.txt"
    sys.save_keyframe_trajectory_tum(p)
    assert len(p.read_text().splitlines()) == int(sys.map.n_keyframes())
