import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2_e_tpu.ops import lie, pose_opt
from orb_slam2_e_tpu.ops.camera import Camera


def make_scene(n=200, seed=0, stereo=False, noise=0.5, outlier_frac=0.0):
    rng = np.random.RandomState(seed)
    cam = Camera.create(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                        bf=40.0 if stereo else 0.0)
    xyz = rng.uniform([-2, -2, 3], [2, 2, 8], (n, 3)).astype(np.float32)
    xi_true = np.asarray([0.05, -0.03, 0.02, 0.1, -0.2, 0.05], np.float32)
    R, t = lie.se3_exp(jnp.asarray(xi_true))
    xc = np.asarray(lie.se3_apply(R, t, jnp.asarray(xyz)))
    u = 500 * xc[:, 0] / xc[:, 2] + 320
    v = 500 * xc[:, 1] / xc[:, 2] + 240
    ur = u - 40.0 / xc[:, 2] if stereo else np.full(n, -1.0)
    uvr = np.stack([u, v, ur], -1).astype(np.float32)
    uvr[:, :2] += rng.randn(n, 2) * noise
    n_out = int(n * outlier_frac)
    if n_out:
        idx = rng.choice(n, n_out, replace=False)
        uvr[idx, :2] += rng.uniform(20, 80, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    CAP = 512
    pad = CAP - n
    uvr_p = np.concatenate([uvr, np.tile([[0.0, 0.0, -1.0]], (pad, 1))]).astype(np.float32)
    xyz_p = np.concatenate([xyz, np.ones((pad, 3), np.float32)])
    valid = np.zeros(CAP, bool); valid[:n] = True
    obs = pose_opt.PoseObs(
        uvr=jnp.asarray(uvr_p), xyz=jnp.asarray(xyz_p),
        inv_sigma2=jnp.ones(CAP), valid=jnp.asarray(valid))
    return cam, (np.asarray(R), np.asarray(t)), obs, xi_true


def test_jacobian_matches_autodiff():
    cam, (R, t), obs, _ = make_scene(20, stereo=True)
    R, t = jnp.asarray(R), jnp.asarray(t)

    def res_of_xi(xi, i):
        dR, dt = lie.se3_exp(xi)
        Rn, tn = lie.se3_compose(dR, dt, R, t)
        r, _ = pose_opt.project_residual(cam, Rn, tn, obs.xyz[i], obs.uvr[i])
        return r

    _, xc = pose_opt.project_residual(cam, R, t, obs.xyz, obs.uvr)
    J = pose_opt.pose_jacobian(cam, xc, obs.uvr[..., 2] >= 0)
    for i in range(5):
        J_ad = jax.jacobian(res_of_xi)(jnp.zeros(6), i)
        np.testing.assert_allclose(np.asarray(J[i]), np.asarray(J_ad),
                                   rtol=1e-3, atol=1e-3)


def test_converges_from_perturbed_start():
    cam, (R_true, t_true), obs, _ = make_scene(200, noise=0.3)
    dR, dt = lie.se3_exp(jnp.asarray([0.03, -0.02, 0.04, 0.1, 0.1, -0.15]))
    R0, t0 = lie.se3_compose(dR, dt, jnp.asarray(R_true), jnp.asarray(t_true))
    R, t, inlier, n_in = pose_opt.pose_optimize_jit(cam, R0, t0, obs)
    assert int(n_in) > 150
    err_t = np.linalg.norm(np.asarray(t) - t_true)
    err_R = np.linalg.norm(np.asarray(lie.so3_log(R @ jnp.asarray(R_true).T)))
    assert err_t < 0.01, err_t
    assert err_R < 0.005, err_R


def test_rejects_outliers():
    cam, (R_true, t_true), obs, _ = make_scene(300, noise=0.3, outlier_frac=0.3)
    dR, dt = lie.se3_exp(jnp.asarray([0.02, 0.01, -0.02, 0.05, -0.05, 0.1]))
    R0, t0 = lie.se3_compose(dR, dt, jnp.asarray(R_true), jnp.asarray(t_true))
    R, t, inlier, n_in = pose_opt.pose_optimize_jit(cam, R0, t0, obs)
    # ~70% inliers expected
    assert 150 < int(n_in) < 250
    err_t = np.linalg.norm(np.asarray(t) - t_true)
    assert err_t < 0.02, err_t


def test_stereo_edges():
    cam, (R_true, t_true), obs, _ = make_scene(150, stereo=True, noise=0.2)
    dR, dt = lie.se3_exp(jnp.asarray([0.02, -0.01, 0.02, -0.1, 0.08, 0.05]))
    R0, t0 = lie.se3_compose(dR, dt, jnp.asarray(R_true), jnp.asarray(t_true))
    R, t, inlier, n_in = pose_opt.pose_optimize_jit(cam, R0, t0, obs)
    assert int(n_in) > 120
    assert np.linalg.norm(np.asarray(t) - t_true) < 0.01


def test_respects_valid_mask():
    cam, (R_true, t_true), obs, _ = make_scene(100, noise=0.2)
    # invalidate half; corrupt those measurements wildly
    valid = np.asarray(obs.valid).copy()
    valid[50:] = False
    uvr = np.asarray(obs.uvr).copy()
    uvr[50:100, :2] += 500.0
    obs = obs._replace(uvr=jnp.asarray(uvr), valid=jnp.asarray(valid))
    R0, t0 = jnp.asarray(R_true), jnp.asarray(t_true)
    R, t, inlier, n_in = pose_opt.pose_optimize_jit(cam, R0, t0, obs)
    assert int(n_in) <= 50
    assert np.linalg.norm(np.asarray(t) - t_true) < 0.01
    assert not np.asarray(inlier)[50:].any()
