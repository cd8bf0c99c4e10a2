"""Keyframe recognition database: per-keyframe BoW vectors + batched scoring.

Equivalent of reference src/KeyFrameDatabase.cc (include/KeyFrameDatabase.h:
46-58): add/erase keyframes, DetectLoopCandidates (excluding covisible
keyframes, with a minimum-score gate), DetectRelocalizationCandidates.

TPU-first: the inverted file (word -> keyframe list) becomes a dense
(K, W) tf-idf matrix; every query is one matvec over all keyframes at once
(the reference's shared-word counting + 0.8*maxCommonWords + accumulated
covisibility-group scoring collapses into plain top-k over scores, with the
covisibility-exclusion mask applied directly).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import bow
from ..ops.bow import Vocabulary


class BowDatabase(NamedTuple):
    vecs: jnp.ndarray     # (K, W) L1-normalized tf-idf rows
    filled: jnp.ndarray   # (K,) bool

    @staticmethod
    def create(max_keyframes: int, n_words: int) -> "BowDatabase":
        return BowDatabase(vecs=jnp.zeros((max_keyframes, n_words)),
                           filled=jnp.zeros((max_keyframes,), bool))

    def add(self, slot, vec) -> "BowDatabase":
        """Reference KeyFrameDatabase::add."""
        return BowDatabase(vecs=self.vecs.at[slot].set(vec),
                           filled=self.filled.at[slot].set(True))

    def erase(self, slot) -> "BowDatabase":
        """Reference KeyFrameDatabase::erase."""
        return BowDatabase(vecs=self.vecs.at[slot].set(0.0),
                           filled=self.filled.at[slot].set(False))


@jax.jit
def query_scores(db: BowDatabase, q: jnp.ndarray) -> jnp.ndarray:
    """(K,) L1 similarity of q against every stored keyframe."""
    return jnp.where(db.filled, bow.l1_score(db.vecs, q), -1.0)


@partial(jax.jit, static_argnums=(2,))
def detect_relocalization_candidates(db: BowDatabase, q: jnp.ndarray,
                                     n_candidates: int = 5):
    """Reference KeyFrameDatabase::DetectRelocalizationCandidates
    (src/KeyFrameDatabase.cc:192-309): no exclusion, ranked by score."""
    scores = query_scores(db, q)
    top_s, top_k = jax.lax.top_k(scores, n_candidates)
    return top_k, top_s


@jax.jit
def detect_loop_candidates_full(db: BowDatabase, q: jnp.ndarray, state, kf):
    """Single-dispatch loop-candidate query: computes the covisibility
    exclusion set and the min-score gate on device, then ranks
    (fuses the whole reference DetectLoop preamble, LoopClosing.cc:103-150).

    Also returns each candidate's covisibility GROUP membership (5, K)
    (candidate + its covisible keyframes) for the host-side group
    consistency check (reference vConsistentGroups, LoopClosing.cc:150-225)."""
    covis = state.covisibility_row(kf)
    scores = query_scores(db, q)
    covis_mask = (covis >= 15) & state.kf_valid
    min_score = jnp.min(jnp.where(covis_mask, scores, jnp.inf))
    min_score = jnp.where(jnp.isfinite(min_score),
                          jnp.maximum(min_score, 0.01), 0.05)
    exclude = (covis > 0) | ~state.kf_valid
    exclude = exclude.at[kf].set(True)
    s = jnp.where(exclude, -1.0, scores)
    s = jnp.where(s >= min_score, s, -1.0)
    top_s, top_k = jax.lax.top_k(s, 5)
    # candidate groups: one covisibility row per candidate
    grp = jax.vmap(state.covisibility_row)(top_k) > 0        # (5, K)
    K = grp.shape[1]
    grp = grp | (jax.nn.one_hot(top_k, K, dtype=jnp.int32) > 0)
    return top_k, top_s, grp


