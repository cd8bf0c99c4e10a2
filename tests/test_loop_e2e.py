"""End-to-end loop closure through the full SlamSystem ladder: detection
(group consistency) -> Sim3 (fix_scale for RGB-D) -> verify_sim3 ladder ->
correction + SearchAndFuse -> essential graph -> chunked global BA. The
reference validates this only operationally (SURVEY.md §4); VERDICT r4
next #2 requires the positive path PROVEN in the fast tier.

The camera travels a circle (frac > 1 closes the loop and keeps going) in
a cylindrical band scene; the revisit triggers detection against the
start-of-circle keyframes."""

import numpy as np
import pytest

from orb_slam2_e_tpu.ops.camera import Camera
from orb_slam2_e_tpu.models.system import SlamSystem, SystemConfig, Sensor
from orb_slam2_e_tpu.utils.synthetic import make_ring_scene, \
    circle_trajectory
from orb_slam2_e_tpu.utils.trajectory import ate_rmse

FX = 260.0
W, H = 480, 360


def run_circle_rgbd(loop_closing: bool, n_frames=96):
    scene = make_ring_scene(n_points=1000, seed=2, ring_radius=9.0,
                            width=W, height=H, fx=FX, fy=FX,
                            cx=240, cy=180)
    poses, centers = circle_trajectory(n_frames=n_frames, radius=2.0,
                                       frac=1.1)
    cam = Camera.create(fx=FX, fy=FX, cx=240, cy=180, bf=40.0,
                        width=W, height=H)
    cfg = SystemConfig(max_keyframes=64, max_points=8192, n_features=600,
                       n_levels=4, max_frames_between_kf=4,
                       loop_closing=loop_closing)
    sys = SlamSystem(cam, cfg, Sensor.RGBD)
    for k, (R, t) in enumerate(poses):
        sys.track_rgbd(scene.render(R, t), scene.depth_map(R, t), k / 30.0)
    ts, Rwc, twc = sys.get_trajectory()
    gt = centers[-len(twc):]
    ate = ate_rmse(twc, gt, with_scale=False) if len(twc) > 3 else np.inf
    return sys, ate, len(twc)


@pytest.mark.e2e
def test_loop_closes_rgbd():
    """FAST-tier positive path: the detector + Sim3 + verify ladder +
    correction must fire at the seam and the metric trajectory stay
    tight after the correction (map surgery must not corrupt it)."""
    sys_on, ate_on, n_on = run_circle_rgbd(loop_closing=True)
    assert sys_on.stats["loops_closed"] >= 1, sys_on.stats
    assert n_on >= 90, n_on
    assert ate_on < 0.10, ate_on


@pytest.mark.slow
@pytest.mark.e2e
def test_loop_improves_ate_vs_no_closing():
    sys_on, ate_on, n_on = run_circle_rgbd(loop_closing=True)
    assert sys_on.stats["loops_closed"] >= 1, sys_on.stats
    sys_off, ate_off, n_off = run_circle_rgbd(loop_closing=False)
    # closing the loop must not hurt; on a drifted circle it should help
    assert ate_on <= ate_off * 1.10 + 0.01, (ate_on, ate_off)
