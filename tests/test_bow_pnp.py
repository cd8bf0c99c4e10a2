import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orb_slam2_e_tpu.ops import bow, pnp, lie


@pytest.fixture(scope="module")
def small_vocab():
    rng = np.random.RandomState(0)
    # 4 well-separated descriptor "places" + noise
    protos = rng.randint(0, 256, (40, 32)).astype(np.uint8)
    corpus = []
    for p in protos:
        for _ in range(50):
            d = p.copy()
            flips = rng.choice(32, 3, replace=False)
            d[flips] ^= rng.randint(1, 255, 3).astype(np.uint8)
            corpus.append(d)
    corpus = np.stack(corpus)
    return bow.train_vocabulary(corpus, k=6, L=3, iters=4), protos


def perturb(rng, d, n_bytes=2):
    d = d.copy()
    flips = rng.choice(32, n_bytes, replace=False)
    d[flips] ^= rng.randint(1, 255, n_bytes).astype(np.uint8)
    return d


def test_transform_stability(small_vocab):
    """Slightly perturbed descriptors should usually map to the same word."""
    voc, protos = small_vocab
    rng = np.random.RandomState(1)
    base = np.stack([protos[i % len(protos)] for i in range(64)])
    pert = np.stack([perturb(rng, d, 1) for d in base])
    w1, _ = bow.transform(voc, jnp.asarray(base), jnp.ones(64, bool))
    w2, _ = bow.transform(voc, jnp.asarray(pert), jnp.ones(64, bool))
    agree = (np.asarray(w1) == np.asarray(w2)).mean()
    assert agree > 0.6, agree


def test_bow_similarity_ranking(small_vocab):
    """A query built from place A's descriptors scores its own place higher
    than a different place."""
    voc, protos = small_vocab
    rng = np.random.RandomState(2)

    def doc(proto_ids, n=60):
        descs = np.stack([perturb(rng, protos[i]) for i in
                          rng.choice(proto_ids, n)])
        w, _ = bow.transform(voc, jnp.asarray(descs), jnp.ones(n, bool))
        return bow.bow_vector(voc, w, jnp.ones(n, bool))

    placeA = doc(np.arange(0, 10))
    placeB = doc(np.arange(10, 20))
    queryA = doc(np.arange(0, 10))
    db = jnp.stack([placeA, placeB])
    scores = np.asarray(bow.l1_score(db, queryA))
    assert scores[0] > scores[1] + 0.05, scores


def test_bow_vector_normalized(small_vocab):
    voc, protos = small_vocab
    rng = np.random.RandomState(3)
    descs = np.stack([perturb(rng, protos[i % 40]) for i in range(50)])
    w, _ = bow.transform(voc, jnp.asarray(descs), jnp.ones(50, bool))
    v = bow.bow_vector(voc, w, jnp.ones(50, bool))
    assert abs(float(jnp.sum(jnp.abs(v))) - 1.0) < 1e-5


def _pnp_scene(n=100, seed=0, noise=0.5, outlier_frac=0.2):
    rng = np.random.RandomState(seed)
    K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]], np.float32)
    xyz = rng.uniform([-3, -3, 3], [3, 3, 9], (n, 3)).astype(np.float32)
    R_true = np.asarray(lie.so3_exp(jnp.asarray([0.2, -0.3, 0.1])))
    t_true = np.asarray([0.3, -0.2, 0.5], dtype=np.float32)
    xc = (R_true @ xyz.T).T + t_true
    uv = np.stack([500 * xc[:, 0] / xc[:, 2] + 320,
                   500 * xc[:, 1] / xc[:, 2] + 240], 1)
    uv += rng.randn(n, 2) * noise
    n_out = int(n * outlier_frac)
    idx = rng.choice(n, n_out, replace=False)
    uv[idx] += rng.uniform(30, 100, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    return (jnp.asarray(xyz), jnp.asarray(uv, jnp.float32), jnp.asarray(K),
            R_true, t_true, idx)


def test_pnp_dlt_exact():
    xyz, uv, K, R_true, t_true, _ = _pnp_scene(20, noise=0.0, outlier_frac=0.0)
    Kinv = np.linalg.inv(np.asarray(K))
    uv_n = (np.concatenate([np.asarray(uv), np.ones((20, 1))], 1) @ Kinv.T)[:, :2]
    R, t = pnp.pnp_dlt(xyz, jnp.asarray(uv_n, jnp.float32))
    np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-3)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=5e-3)


def test_ransac_pnp_with_outliers():
    xyz, uv, K, R_true, t_true, out_idx = _pnp_scene(150, outlier_frac=0.3,
                                                     seed=1)
    res = pnp.ransac_pnp_jit(jax.random.PRNGKey(0), xyz, uv,
                             jnp.ones(150, bool), K)
    assert int(res.n_inliers[0]) > 80
    R, t = np.asarray(res.R[0]), np.asarray(res.t[0])
    ang = np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(R @ R_true.T))))
    assert ang < 0.02, ang
    assert np.linalg.norm(t - t_true) < 0.05
    inl = np.asarray(res.inliers_best)
    assert inl[out_idx].mean() < 0.2
