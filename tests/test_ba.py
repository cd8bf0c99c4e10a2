import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2_e_tpu.ops import lie, ba
from orb_slam2_e_tpu.ops.camera import Camera


def make_ba_problem(n_cams=6, n_pts=120, seed=0, noise=0.3, stereo=False,
                    pose_pert=0.02, point_pert=0.05, n_fixed=2):
    """Synthetic BA: cameras on an arc looking at a point cloud."""
    rng = np.random.RandomState(seed)
    cam = Camera.create(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                        bf=40.0 if stereo else 0.0)
    pts_true = rng.uniform([-3, -3, 4], [3, 3, 10], (n_pts, 3)).astype(np.float32)
    poses_true = []
    for i in range(n_cams):
        w = np.array([0.0, 0.02 * i, 0.0], np.float32)
        t = np.array([0.3 * i, 0.0, 0.0], np.float32)
        R = np.asarray(lie.so3_exp(jnp.asarray(w)))
        poses_true.append((R, -R @ t))  # camera at position t
    obs_cam, obs_point, obs_uvr = [], [], []
    for c, (R, t) in enumerate(poses_true):
        xc = (R @ pts_true.T).T + t
        z = xc[:, 2]
        u = 500 * xc[:, 0] / z + 320 + rng.randn(n_pts) * noise
        v = 500 * xc[:, 1] / z + 240 + rng.randn(n_pts) * noise
        ur = (u - 40.0 / z) if stereo else np.full(n_pts, -1.0)
        vis = (z > 0.1) & (u > 0) & (u < 640) & (v > 0) & (v < 480)
        for p in np.where(vis)[0]:
            obs_cam.append(c)
            obs_point.append(p)
            obs_uvr.append([u[p], v[p], ur[p]])
    # pad observations to a fixed capacity so every test reuses one compile
    O_CAP = 1024
    O = len(obs_cam)
    assert O <= O_CAP, O
    pad = O_CAP - O
    obs_cam += [0] * pad
    obs_point += [0] * pad
    obs_uvr += [[0.0, 0.0, -1.0]] * pad
    obs_valid = np.zeros(O_CAP, bool)
    obs_valid[:O] = True
    O = O_CAP
    # perturb initial state (keep fixed cameras exact)
    pose7_init = []
    for c, (R, t) in enumerate(poses_true):
        if c < n_fixed:
            pose7_init.append(np.asarray(lie.pose7_pack(jnp.asarray(R), jnp.asarray(t))))
        else:
            dR, dt = lie.se3_exp(jnp.asarray(
                rng.randn(6).astype(np.float32) * pose_pert))
            Rn, tn = lie.se3_compose(dR, dt, jnp.asarray(R), jnp.asarray(t))
            pose7_init.append(np.asarray(lie.pose7_pack(Rn, tn)))
    pts_init = pts_true + rng.randn(n_pts, 3).astype(np.float32) * point_pert
    prob = ba.BAProblem(
        cam_pose7=jnp.asarray(np.stack(pose7_init)),
        cam_free=jnp.asarray(np.arange(n_cams) >= n_fixed),
        points=jnp.asarray(pts_init),
        point_valid=jnp.ones(n_pts, bool),
        obs_cam=jnp.asarray(obs_cam, jnp.int32),
        obs_point=jnp.asarray(obs_point, jnp.int32),
        obs_uvr=jnp.asarray(np.asarray(obs_uvr, np.float32)),
        obs_inv_sigma2=jnp.ones(O),
        obs_valid=jnp.asarray(obs_valid),
    )
    return cam, prob, poses_true, pts_true


def _pose_errors(pose7, poses_true):
    errs_t, errs_r = [], []
    R, t = lie.pose7_unpack(pose7)
    for c, (Rt, tt) in enumerate(poses_true):
        errs_t.append(np.linalg.norm(np.asarray(t[c]) - tt))
        dR = np.asarray(R[c]) @ Rt.T
        errs_r.append(np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(dR)))))
    return np.asarray(errs_t), np.asarray(errs_r)


def test_dense_schur_reduces_error():
    cam, prob, poses_true, pts_true = make_ba_problem()
    et0, er0 = _pose_errors(prob.cam_pose7, poses_true)
    res = ba.ba_solve_jit(cam, prob)
    et1, er1 = _pose_errors(res.cam_pose7, poses_true)
    assert et1.max() < 0.01, (et0.max(), et1.max())
    assert er1.max() < 0.005
    pt_err = np.linalg.norm(np.asarray(res.points) - pts_true, axis=1)
    assert np.median(pt_err) < 0.02
    valid = np.asarray(prob.obs_valid)
    assert np.asarray(res.obs_inlier)[valid].mean() > 0.95


def test_dense_schur_fixed_cameras_unchanged():
    cam, prob, poses_true, _ = make_ba_problem(n_fixed=2)
    res = ba.ba_solve_jit(cam, prob)
    np.testing.assert_allclose(np.asarray(res.cam_pose7[:2]),
                               np.asarray(prob.cam_pose7[:2]), atol=1e-6)


def test_dense_schur_with_outliers():
    cam, prob, poses_true, pts_true = make_ba_problem(seed=1)
    # corrupt 10% of observations
    rng = np.random.RandomState(2)
    uvr = np.asarray(prob.obs_uvr).copy()
    n_out = len(uvr) // 10
    idx = rng.choice(len(uvr), n_out, replace=False)
    uvr[idx, :2] += rng.uniform(20, 60, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    prob = prob._replace(obs_uvr=jnp.asarray(uvr))
    res = ba.ba_solve_jit(cam, prob)
    et1, _ = _pose_errors(res.cam_pose7, poses_true)
    assert et1.max() < 0.02
    inl = np.asarray(res.obs_inlier)
    assert inl[idx].mean() < 0.2  # corrupted obs flagged as outliers


def test_stereo_ba():
    cam, prob, poses_true, pts_true = make_ba_problem(stereo=True, seed=3)
    res = ba.ba_solve_jit(cam, prob)
    et1, _ = _pose_errors(res.cam_pose7, poses_true)
    assert et1.max() < 0.01


def test_pcg_matches_dense():
    cam, prob, poses_true, pts_true = make_ba_problem(seed=4)
    res_d = ba.ba_solve_jit(cam, prob)
    res_p = ba.ba_solve_pcg_jit(cam, prob, n_outer=15, cg_iters=40)
    et_d, _ = _pose_errors(res_d.cam_pose7, poses_true)
    et_p, _ = _pose_errors(res_p.cam_pose7, poses_true)
    assert et_p.max() < 0.015, (et_d.max(), et_p.max())


def test_masked_points_not_moved():
    cam, prob, *_ = make_ba_problem(seed=5)
    pv = np.ones(prob.points.shape[0], bool)
    pv[:10] = False
    prob = prob._replace(point_valid=jnp.asarray(pv))
    res = ba.ba_solve_jit(cam, prob)
    np.testing.assert_allclose(np.asarray(res.points[:10]),
                               np.asarray(prob.points[:10]), atol=1e-6)
