import numpy as np
import jax.numpy as jnp

from orb_slam2_e_tpu.ops import matching as m


def rand_desc(rng, n):
    return rng.randint(0, 256, (n, 32)).astype(np.uint8)


def test_unpack_desc():
    packed = np.asarray([[0b00000001] + [0] * 31], np.uint8)
    bits = np.asarray(m.unpack_desc(jnp.asarray(packed)))
    assert bits.shape == (1, 256)
    assert bits[0, 0] == 1 and bits[0, 1:].sum() == 0


def test_hamming_matrix_matches_numpy():
    rng = np.random.RandomState(0)
    a, b = rand_desc(rng, 20), rand_desc(rng, 30)
    D = np.asarray(m.hamming_matrix(m.unpack_desc(jnp.asarray(a)),
                                    m.unpack_desc(jnp.asarray(b))))
    ref = np.zeros((20, 30), np.int32)
    for i in range(20):
        for j in range(30):
            ref[i, j] = np.unpackbits(a[i] ^ b[j]).sum()
    np.testing.assert_array_equal(D, ref)


def test_hamming_identity_zero():
    rng = np.random.RandomState(1)
    a = m.unpack_desc(jnp.asarray(rand_desc(rng, 10)))
    D = np.asarray(m.hamming_matrix(a, a))
    assert np.diag(D).sum() == 0
    assert (D >= 0).all()


def test_masked_best2():
    dist = jnp.asarray([[5, 3, 9], [1, 2, 3]], jnp.int32)
    mask = jnp.asarray([[True, True, True], [False, True, True]])
    idx, d1, d2 = m.masked_best2(dist, mask)
    assert list(np.asarray(idx)) == [1, 1]
    assert list(np.asarray(d1)) == [3, 2]
    assert list(np.asarray(d2)) == [5, 3]


def test_masked_best2_no_candidates():
    dist = jnp.zeros((2, 3), jnp.int32)
    mask = jnp.zeros((2, 3), bool)
    idx, d1, d2 = m.masked_best2(dist, mask)
    assert (np.asarray(d1) == int(m.BIG)).all()


def test_mutual_filter():
    best_ab = jnp.asarray([0, 1, 2])
    best_ba = jnp.asarray([0, 2, 2])
    keep = np.asarray(m.mutual_filter(best_ab, best_ba))
    assert list(keep) == [True, False, True]


def test_rotation_consistency():
    n = 100
    rng = np.random.RandomState(2)
    ang_a = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
    ang_b = ang_a - 0.3  # consistent rotation
    # corrupt 10 pairs with random offsets
    bad = rng.choice(n, 10, replace=False)
    ang_b_c = ang_b.copy()
    ang_b_c[bad] += rng.uniform(1.0, 3.0, 10)
    keep = np.asarray(m.rotation_consistency_mask(
        jnp.asarray(ang_a), jnp.asarray(ang_b_c), jnp.ones(n, bool)))
    good = np.setdiff1d(np.arange(n), bad)
    assert keep[good].mean() > 0.95
    assert keep[bad].mean() < 0.5


def test_search_windowed_recovers_shifted_matches():
    rng = np.random.RandomState(3)
    n = 50
    desc = rand_desc(rng, n)
    uv_a = rng.uniform(50, 400, (n, 2)).astype(np.float32)
    uv_b = uv_a + rng.uniform(-3, 3, (n, 2)).astype(np.float32)
    perm = rng.permutation(n)
    bits_a = m.unpack_desc(jnp.asarray(desc))
    bits_b = m.unpack_desc(jnp.asarray(desc[perm]))
    idx, dist = m.search_windowed(
        bits_a, bits_b, jnp.asarray(uv_a), jnp.asarray(uv_b[perm]),
        jnp.ones(n, bool), jnp.ones(n, bool), radius=10.0, max_dist=10)
    idx = np.asarray(idx)
    expect = np.argsort(perm)  # position of i in perm
    assert (idx == expect).mean() > 0.95


def test_resolve_duplicates():
    match_idx = jnp.asarray([2, 2, 1, -1])
    dist = jnp.asarray([5, 3, 7, 0], jnp.int32)
    out = np.asarray(m.resolve_duplicates(match_idx, dist, 4))
    assert out[1] == 2 and out[0] == -1  # query 1 wins train 2
    assert out[2] == 1 and out[3] == -1


def test_octave_range_mask():
    pred = jnp.asarray([2, 0])
    kp = jnp.asarray([0, 1, 2, 3])
    mask = np.asarray(m.octave_range_mask(pred, kp))
    assert list(mask[0]) == [False, True, True, True]
    assert list(mask[1]) == [True, True, False, False]
