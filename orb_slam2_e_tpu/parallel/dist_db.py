"""Sharded keyframe-recognition database queries over a device mesh.

At production map scale the BoW database is a (K, W) tf-idf matrix with
K ~ 10^4 keyframes and W ~ 10^4-10^6 words — too large (and too
bandwidth-hungry at query rate) for one chip once the vocabulary is
realistic. The reference's inverted file (KeyFrameDatabase.cc:40-46) is a
pointer structure on one CPU; the TPU equivalent shards the keyframe rows
across the mesh and runs every query as a per-device matvec + local top-k,
combined with ONE all_gather of (n_dev, n) candidates over the ICI.

The merge is exact: global top-n of a union of per-shard top-n is the
top-n of the full score vector (each shard surfaces at least its own
global winners).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .dist_ba import shard_map
from ..ops import bow


def pad_rows(vecs, filled, n_dev: int):
    """Pad K to a multiple of n_dev so the row shard is even."""
    K = vecs.shape[0]
    pad = (-K) % n_dev
    if pad:
        vecs = jnp.concatenate(
            [vecs, jnp.zeros((pad, vecs.shape[1]), vecs.dtype)])
        filled = jnp.concatenate([filled, jnp.zeros((pad,), bool)])
    return vecs, filled


def sharded_query(mesh: Mesh, vecs, filled, q, n_candidates: int = 5,
                  exclude_mask=None):
    """Top-n keyframe slots by L1 BoW similarity, keyframe-sharded.

    vecs: (K, W) sharded over mesh axis 'kf' (K % n_dev == 0 — pad_rows);
    q: (W,) replicated; exclude_mask: optional (K,) bool, True = skip
    (reference DetectLoopCandidates' covisible exclusion,
    src/KeyFrameDatabase.cc:76-190).
    Returns (slots (n,), scores (n,)) replicated on every device."""
    K = vecs.shape[0]
    n_dev = mesh.shape['kf']
    excl = (jnp.zeros((K,), bool) if exclude_mask is None
            else exclude_mask)

    def local(vecs_l, filled_l, excl_l, q):
        rows = vecs_l.shape[0]
        s = jnp.where(filled_l & ~excl_l, bow.l1_score(vecs_l, q), -1.0)
        k = min(n_candidates, rows)
        top_s, top_i = jax.lax.top_k(s, k)
        base = jax.lax.axis_index('kf') * rows
        top_i = top_i + base                     # shard-local -> global slot
        # one ICI collective: every device sees all shards' candidates
        all_s = jax.lax.all_gather(top_s, 'kf').reshape(-1)
        all_i = jax.lax.all_gather(top_i, 'kf').reshape(-1)
        best_s, pos = jax.lax.top_k(all_s, n_candidates)
        return all_i[pos], best_s

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P('kf', None), P('kf'), P('kf'), P()),
        out_specs=(P(), P()))
    return fn(vecs, filled, excl, q)
