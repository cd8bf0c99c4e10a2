import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2_e_tpu.ops import lie, twoview


def make_pair(n=150, seed=0, planar=False, noise=0.3, outlier_frac=0.1):
    rng = np.random.RandomState(seed)
    K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]], np.float32)
    if planar:
        xy = rng.uniform(-2, 2, (n, 2))
        X = np.concatenate([xy, np.full((n, 1), 5.0)], 1)  # z=5 plane
    else:
        X = rng.uniform([-2, -2, 3], [2, 2, 9], (n, 3))
    R = np.asarray(lie.so3_exp(jnp.asarray([0.02, -0.15, 0.03])))
    t = np.array([0.4, 0.05, 0.02])

    def proj(P, Rm=np.eye(3), tm=np.zeros(3)):
        Xc = (Rm @ P.T).T + tm
        return np.stack([500 * Xc[:, 0] / Xc[:, 2] + 320,
                         500 * Xc[:, 1] / Xc[:, 2] + 240], 1), Xc[:, 2]

    uv1, z1 = proj(X)
    uv2, z2 = proj(X, R, t)
    uv1 += rng.randn(n, 2) * noise
    uv2 += rng.randn(n, 2) * noise
    n_out = int(n * outlier_frac)
    if n_out:
        idx = rng.choice(n, n_out, replace=False)
        uv2[idx] += rng.uniform(15, 60, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    valid = (z1 > 0) & (z2 > 0)
    return (jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32),
            jnp.asarray(valid), jnp.asarray(K), R, t, X)


def test_triangulate_linear_exact():
    uv1, uv2, valid, K, R, t, X = make_pair(50, noise=0.0, outlier_frac=0.0)
    P1 = np.asarray(K) @ np.hstack([np.eye(3), np.zeros((3, 1))])
    P2 = np.asarray(K) @ np.hstack([R, t[:, None]])
    Xt = np.asarray(twoview.triangulate_linear(
        jnp.asarray(P1, jnp.float32), jnp.asarray(P2, jnp.float32), uv1, uv2))
    np.testing.assert_allclose(Xt, X, atol=2e-2)


def test_ransac_fundamental_inliers():
    uv1, uv2, valid, K, R, t, X = make_pair(200, outlier_frac=0.2)
    F, score, inl = twoview.ransac_fundamental(
        jax.random.PRNGKey(0), uv1, uv2, valid)
    inl = np.asarray(inl)
    assert inl.sum() > 120
    # epipolar constraint holds for inliers
    E_true = np.asarray(lie.so3_hat(jnp.asarray(t / np.linalg.norm(t)))) @ R
    F_true = np.linalg.inv(np.asarray(K)).T @ E_true @ np.linalg.inv(np.asarray(K))
    Fn = np.asarray(F) / np.linalg.norm(F)
    Ft = F_true / np.linalg.norm(F_true)
    align = abs((Fn * Ft).sum())
    assert align > 0.95, align


def test_ransac_homography_planar():
    uv1, uv2, valid, K, R, t, X = make_pair(200, planar=True, outlier_frac=0.15)
    H, score, inl = twoview.ransac_homography(
        jax.random.PRNGKey(1), uv1, uv2, valid)
    assert np.asarray(inl).sum() > 120


def test_model_selection():
    # general scene -> F; planar scene -> H
    uv1, uv2, valid, K, *_ = make_pair(200, planar=False, outlier_frac=0.05)
    res = twoview.initialize_two_view(jax.random.PRNGKey(2), uv1, uv2, valid, K)
    assert not bool(res.used_homography)
    uv1, uv2, valid, K, *_ = make_pair(200, planar=True, outlier_frac=0.05)
    res = twoview.initialize_two_view(jax.random.PRNGKey(3), uv1, uv2, valid, K)
    assert bool(res.used_homography)


def test_initialize_general_scene_pose():
    uv1, uv2, valid, K, R_true, t_true, X = make_pair(
        250, noise=0.2, outlier_frac=0.1, seed=4)
    res = twoview.initialize_two_view(jax.random.PRNGKey(4), uv1, uv2, valid, K)
    assert bool(res.success)
    # translation direction (scale-free) must match
    t_est = np.asarray(res.t)
    cos = abs(t_est @ t_true / (np.linalg.norm(t_est) * np.linalg.norm(t_true)))
    assert cos > 0.995, cos
    dR = np.asarray(res.R) @ R_true.T
    ang = np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(dR))))
    assert ang < 0.01, ang
    # triangulated points match scaled truth
    good = np.asarray(res.good)
    assert good.sum() > 150
    scale = np.median(np.asarray(res.points)[good][:, 2] / X[good][:, 2])
    err = np.linalg.norm(np.asarray(res.points)[good] / scale - X[good], axis=1)
    assert np.median(err) < 0.1, np.median(err)
    assert (err < 0.5).mean() > 0.9


def test_initialize_planar_scene_pose():
    uv1, uv2, valid, K, R_true, t_true, X = make_pair(
        250, planar=True, noise=0.2, outlier_frac=0.05, seed=5)
    res = twoview.initialize_two_view(jax.random.PRNGKey(5), uv1, uv2, valid, K)
    assert bool(res.success)
    t_est = np.asarray(res.t)
    cos = abs(t_est @ t_true / (np.linalg.norm(t_est) * np.linalg.norm(t_true)))
    assert cos > 0.99, cos


def test_initialize_rejects_pure_rotation():
    # no translation -> no parallax -> must not succeed
    rng = np.random.RandomState(6)
    K = jnp.asarray([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]], jnp.float32)
    X = rng.uniform([-2, -2, 3], [2, 2, 9], (200, 3))
    R = np.asarray(lie.so3_exp(jnp.asarray([0.0, -0.1, 0.02])))
    uv1 = np.stack([500 * X[:, 0] / X[:, 2] + 320,
                    500 * X[:, 1] / X[:, 2] + 240], 1)
    Xc2 = (R @ X.T).T
    uv2 = np.stack([500 * Xc2[:, 0] / Xc2[:, 2] + 320,
                    500 * Xc2[:, 1] / Xc2[:, 2] + 240], 1)
    uv1 += rng.randn(200, 2) * 0.3
    uv2 += rng.randn(200, 2) * 0.3
    res = twoview.initialize_two_view(
        jax.random.PRNGKey(6), jnp.asarray(uv1, jnp.float32),
        jnp.asarray(uv2, jnp.float32), jnp.ones(200, bool), K)
    assert not bool(res.success)
