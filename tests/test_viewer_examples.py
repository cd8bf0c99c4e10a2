"""Headless viewer renders + dataset-driver smoke tests (on a synthetic
TUM-format dataset written to disk)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def small_run():
    from orb_slam2_e_tpu.ops.camera import Camera
    from orb_slam2_e_tpu.models.system import SlamSystem, SystemConfig, Sensor
    from orb_slam2_e_tpu.utils.synthetic import SyntheticScene, orbit_trajectory
    scene = SyntheticScene(n_points=400, seed=3, width=320, height=240,
                           fx=260, fy=260, cx=160, cy=120)
    poses, centers = orbit_trajectory(n_frames=8, radius=0.8, forward=0.05)
    cam = Camera.create(fx=260, fy=260, cx=160, cy=120, bf=26.0,
                        width=320, height=240)
    cfg = SystemConfig(max_keyframes=16, max_points=4096, n_features=300,
                       n_levels=3, max_frames_between_kf=3)
    sys = SlamSystem(cam, cfg, Sensor.RGBD)
    imgs = []
    for k, (R, t) in enumerate(poses):
        img = scene.render(R, t)
        sys.track_rgbd(img, scene.depth_map(R, t), k / 30.0)
        imgs.append(img)
    return sys, imgs


def test_draw_frame(small_run, tmp_path):
    from orb_slam2_e_tpu.models import viewer
    sys, imgs = small_run
    out = viewer.draw_frame(imgs[-1], sys.last_frame,
                            state_text=sys.state.name)
    assert out.shape == (240, 320, 3) and out.dtype == np.uint8
    viewer.save_png(tmp_path / "frame.png", out)
    assert (tmp_path / "frame.png").stat().st_size > 1000


def test_draw_map(small_run, tmp_path):
    from orb_slam2_e_tpu.models import viewer
    sys, _ = small_run
    viewer.draw_map(sys.map, tmp_path / "map.png")
    assert (tmp_path / "map.png").stat().st_size > 5000


def test_draw_frame_with_fem_mesh(small_run):
    from orb_slam2_e_tpu.models import viewer
    from orb_slam2_e_tpu.ops import fem
    import jax.numpy as jnp
    sys, imgs = small_run
    pid = np.asarray(sys.last_frame.point_ids)
    ok = pid >= 0
    pts = np.asarray(sys.map.lm_xyz)[pid[ok]]
    uv = np.asarray(sys.last_frame.uvr)[ok][:, :2]
    mesh = fem.build_mesh(pts, uv, el_type=1, max_nodes=2048, max_elems=2048)
    if mesh is None:
        pytest.skip("not enough tracked points for a mesh")
    ke = fem.element_stiffness_batch(mesh)
    forces = fem.nodal_forces(mesh, ke,
                              fem.node_positions(mesh, jnp.asarray(pts)))
    out = viewer.draw_frame(imgs[-1], sys.last_frame, "FEA", mesh=mesh,
                            forces=forces, cam=sys.cam)
    assert out.shape == (240, 320, 3)


def test_mono_tum_driver(tmp_path, small_run):
    """Write a synthetic TUM-format sequence + settings yaml; run the driver
    main() end to end (reference Examples/Monocular/mono_tum.cc shape)."""
    import cv2
    import sys as _sys
    from orb_slam2_e_tpu.utils.synthetic import SyntheticScene, orbit_trajectory
    scene = SyntheticScene(n_points=400, seed=4, width=320, height=240,
                           fx=260, fy=260, cx=160, cy=120)
    poses, _ = orbit_trajectory(n_frames=8, radius=0.9, forward=0.05)
    seq = tmp_path / "seq"
    (seq / "rgb").mkdir(parents=True)
    lines = []
    for k, (R, t) in enumerate(poses):
        img = scene.render(R, t).astype(np.uint8)
        name = f"rgb/{k:04d}.png"
        cv2.imwrite(str(seq / name), img)
        lines.append(f"{k/30.0:.6f} {name}")
    (seq / "rgb.txt").write_text("\n".join(lines) + "\n")
    settings = tmp_path / "settings.yaml"
    settings.write_text("""%YAML:1.0
Camera.fx: 260.0
Camera.fy: 260.0
Camera.cx: 160.0
Camera.cy: 120.0
Camera.fps: 30.0
Camera.width: 320
Camera.height: 240
ORBextractor.nFeatures: 300
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 3
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
""")
    import runpy
    out = tmp_path / "kf.txt"
    argv = ["mono_tum.py", str(settings), str(seq), str(out)]
    old = _sys.argv
    try:
        _sys.argv = argv
        runpy.run_path("examples/mono_tum.py", run_name="__main__")
    finally:
        _sys.argv = old
    assert out.exists()


def test_reloc_kpi_counters():
    from orb_slam2_e_tpu.utils.stats import RelocKpi
    kpi = RelocKpi(2)
    kpi.on_reloc_success(10)
    kpi.on_frame_tracked(11)
    kpi.on_frame_tracked(12)   # held 2 frames -> TP
    assert kpi.tp == 1
    kpi.on_reloc_success(20)
    kpi.on_frame_lost(21)      # lost early -> FP
    assert kpi.fp == 1
    kpi.on_reloc_fail()        # FN
    assert kpi.fn == 1
    assert abs(kpi.precision - 0.5) < 1e-9
    assert abs(kpi.recall - 0.5) < 1e-9


def test_statistics_logger(tmp_path):
    from orb_slam2_e_tpu.utils.stats import Statistics
    st = Statistics(tmp_path / "stats.txt", columns=["a", "b", "t"])
    st.add("a", 1)
    st.add("b", 2.5)
    st.start_chrono("t")
    st.stop_chrono("t")
    st.new_line()
    st.add("a", 3)
    st.new_line()
    lines = (tmp_path / "stats.txt").read_text().splitlines()
    assert lines[0] == "a\tb\tt"
    assert lines[1].startswith("1\t2.5\t")
    assert st.sma("a") == 2.0
