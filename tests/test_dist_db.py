"""Sharded BoW-database query == single-device query (virtual CPU mesh;
degrades to 1 shard on patched-jax single-TPU environments, still
exercising the shard_map + all_gather path)."""

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2_e_tpu.models import kf_database as kdb
from orb_slam2_e_tpu.parallel import dist_ba, dist_db

N_DEV = min(8, len(jax.devices()))


def _mk(K=48, W=128, seed=3):
    rng = np.random.RandomState(seed)
    vecs = rng.rand(K, W).astype(np.float32)
    vecs /= vecs.sum(1, keepdims=True)
    filled = rng.rand(K) < 0.8
    vecs[~filled] = 0.0
    q = rng.rand(W).astype(np.float32)
    q /= q.sum()
    return jnp.asarray(vecs), jnp.asarray(filled), jnp.asarray(q)


def test_sharded_query_matches_single_device():
    vecs, filled, q = _mk()
    db = kdb.BowDatabase(vecs=vecs, filled=filled)
    ref_i, ref_s = kdb.detect_relocalization_candidates(db, q, 5)

    mesh = dist_ba.make_mesh(N_DEV, axis='kf')
    pv, pf = dist_db.pad_rows(vecs, filled, N_DEV)
    got_i, got_s = dist_db.sharded_query(mesh, pv, pf, q, 5)
    np.testing.assert_allclose(np.sort(np.asarray(got_s)),
                               np.sort(np.asarray(ref_s)), atol=1e-6)
    assert set(np.asarray(got_i).tolist()) == set(np.asarray(ref_i).tolist())


def test_sharded_query_exclusion():
    vecs, filled, q = _mk(seed=4)
    K = vecs.shape[0]
    excl = np.zeros(K, bool)
    # exclude the unsharded winner; it must disappear from the results
    db = kdb.BowDatabase(vecs=vecs, filled=filled)
    ref_i, _ = kdb.detect_relocalization_candidates(db, q, 1)
    excl[int(ref_i[0])] = True

    mesh = dist_ba.make_mesh(N_DEV, axis='kf')
    pv, pf = dist_db.pad_rows(vecs, filled, N_DEV)
    pe = jnp.concatenate([jnp.asarray(excl),
                          jnp.zeros(pv.shape[0] - K, bool)])
    got_i, _ = dist_db.sharded_query(mesh, pv, pf, q, 5, exclude_mask=pe)
    assert int(ref_i[0]) not in np.asarray(got_i).tolist()
