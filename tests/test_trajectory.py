import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2_e_tpu.ops import lie
from orb_slam2_e_tpu.utils import trajectory as traj


def _random_traj(n=50, seed=0):
    rng = np.random.RandomState(seed)
    R = [np.eye(3)]
    t = [np.zeros(3)]
    for _ in range(n - 1):
        dR = np.asarray(lie.so3_exp(jnp.asarray(rng.randn(3) * 0.02)))
        R.append(R[-1] @ dR)
        t.append(t[-1] + R[-1] @ (rng.randn(3) * 0.05 + [0.1, 0, 0]))
    return np.stack(R), np.stack(t)


def test_tum_save_load_roundtrip(tmp_path):
    R, t = _random_traj()
    ts = np.arange(len(R)) * 0.033
    p = tmp_path / "traj.txt"
    traj.save_tum(p, ts, R, t)
    ts2, t2, q2 = traj.load_tum(p)
    np.testing.assert_allclose(ts, ts2, atol=1e-5)
    np.testing.assert_allclose(t, t2, atol=1e-6)
    R2 = np.asarray(lie.mat_from_quat(jnp.asarray(q2)))
    np.testing.assert_allclose(R, R2, atol=1e-5)


def test_kitti_save(tmp_path):
    R, t = _random_traj(10)
    p = tmp_path / "kitti.txt"
    traj.save_kitti(p, R, t)
    rows = [[float(x) for x in line.split()] for line in p.read_text().splitlines()]
    a = np.asarray(rows).reshape(10, 3, 4)
    np.testing.assert_allclose(a[:, :, :3], R, atol=1e-7)
    np.testing.assert_allclose(a[:, :, 3], t, atol=1e-7)


def test_umeyama_recovers_similarity():
    rng = np.random.RandomState(1)
    x = rng.randn(100, 3)
    R_true = np.asarray(lie.so3_exp(jnp.asarray([0.2, -0.4, 0.9])))
    s_true, t_true = 2.5, np.array([1.0, -2.0, 0.5])
    y = s_true * (R_true @ x.T).T + t_true
    s, R, t = traj.umeyama_alignment(x, y)
    np.testing.assert_allclose(s, s_true, rtol=1e-6)
    np.testing.assert_allclose(R, R_true, atol=1e-6)
    np.testing.assert_allclose(t, t_true, atol=1e-6)


def test_ate_zero_for_aligned():
    R, t = _random_traj()
    # scaled/rotated copy should align to ~0 error
    R_a = np.asarray(lie.so3_exp(jnp.asarray([0.1, 0.2, -0.3])))
    t2 = 3.0 * (R_a @ t.T).T + np.array([5, 5, 5.0])
    assert traj.ate_rmse(t2, t) < 1e-6


def test_ate_nonzero_for_noise():
    R, t = _random_traj()
    t_noisy = t + np.random.RandomState(2).randn(*t.shape) * 0.1
    err = traj.ate_rmse(t_noisy, t, with_scale=False)
    assert 0.05 < err < 0.4


def test_settings_loader(tmp_path):
    from orb_slam2_e_tpu.utils.config import load_settings, camera_from_settings
    y = tmp_path / "s.yaml"
    y.write_text("""%YAML:1.0
Camera.fx: 517.3
Camera.fy: 516.5
Camera.cx: 318.6
Camera.cy: 255.3
Camera.k1: 0.26
Camera.k2: -0.95
Camera.p1: -0.005
Camera.p2: 0.002
Camera.k3: 1.16
Camera.fps: 30.0
Camera.RGB: 1
ORBextractor.nFeatures: 1200
ORBextractor.scaleFactor: 1.1
ORBextractor.nLevels: 6
ORBextractor.iniThFAST: 24
ORBextractor.minThFAST: 7
RelocParam.bTestAllFrames: 1
RelocParam.nPrecisionFrames: 3
RelocParam.nElType: 2
""")
    s = load_settings(y)
    assert s.fx == 517.3 and s.orb.n_features == 1200
    assert s.orb.n_levels == 6 and s.orb.ini_th_fast == 24
    assert s.orb_ini.n_features == 2400  # mono init doubles features
    assert s.reloc.test_all_frames and s.reloc.n_precision_frames == 3
    assert s.reloc.el_type == 2
    cam = camera_from_settings(s)
    assert abs(float(cam.fx) - 517.3) < 1e-3
