"""Bag-of-binary-words place recognition: vocabulary tree + tf-idf scoring.

TPU-native equivalent of the bundled DBoW2 (reference Thirdparty/DBoW2/,
TemplatedVocabulary.h:135-162 transform, ScoringObject.cpp L1 scoring) and
ORBVocabulary (reference include/ORBVocabulary.h:30-31).

Redesign, not a port:
- The vocabulary is trained on OUR descriptors (the reference's ORBvoc.txt
  blob targets OpenCV's BRIEF table and isn't shipped anyway): hierarchical
  k-medians over binary descriptors, stored as flat arrays
  (node centers (N, 256) int8, children (N, k) int32).
- `transform` descends all features through the tree level-by-level in one
  batched program: at each level a (F, k) Hamming block picks the child —
  k Hamming distances are one small matmul per level.
- A bag-of-words vector is a dense (W,) tf vector (W = k^L words, ~10^4);
  database scoring against K keyframes is a single (K, W) @ (W,) matvec on
  the MXU — replacing DBoW2's inverted-file walk
  (reference src/KeyFrameDatabase.cc:76-190).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from . import matching


class Vocabulary(NamedTuple):
    """Flat hierarchical vocabulary. Level l occupies nodes
    [ (k^l - 1)/(k-1), (k^(l+1) - 1)/(k-1) ); leaves are the last level."""
    node_bits: jnp.ndarray   # (N_nodes, 256) int8 centers in {0, 1}
    k: int                   # branching factor
    L: int                   # depth (leaf level)
    idf: jnp.ndarray         # (W,) inverse document frequency weights

    @property
    def n_words(self):
        return self.k ** self.L


def _level_offset(k: int, l: int) -> int:
    """Index of the first node at level l (root children = level 1 at 0)."""
    return (k ** l - k) // (k - 1) if k > 1 else 0


def train_vocabulary(descriptors: np.ndarray, k: int = 10, L: int = 4,
                     iters: int = 8, seed: int = 0) -> Vocabulary:
    """Hierarchical binary k-medians (host-side, offline — the reference
    vocabulary was likewise trained offline, Dependencies.md DBoW2 notes).

    descriptors: (N, 32) uint8 packed."""
    rng = np.random.RandomState(seed)
    bits = np.unpackbits(descriptors, axis=1, bitorder='little')  # (N, 256)

    def kmedians(data, k):
        if len(data) == 0:
            return np.zeros((k, bits.shape[1]), np.uint8)
        init = data[rng.choice(len(data), min(k, len(data)), replace=False)]
        centers = np.zeros((k, data.shape[1]), np.uint8)
        centers[:len(init)] = init
        for _ in range(iters):
            d = (data[:, None, :] != centers[None, :, :]).sum(-1)  # (N, k)
            a = d.argmin(1)
            for j in range(k):
                sel = data[a == j]
                if len(sel):
                    centers[j] = (sel.mean(0) > 0.5).astype(np.uint8)
        d = (data[:, None, :] != centers[None, :, :]).sum(-1)
        return centers, d.argmin(1)

    # breadth-first split
    n_internal_levels = L
    all_nodes = []
    assignments = [np.zeros(len(bits), np.int64)]  # cluster id per level
    for l in range(n_internal_levels):
        n_clusters = k ** l
        next_assign = np.zeros(len(bits), np.int64)
        level_nodes = np.zeros((n_clusters * k, bits.shape[1]), np.uint8)
        for c in range(n_clusters):
            sel = assignments[-1] == c
            data = bits[sel]
            if len(data) >= 1:
                centers, a = kmedians(data, k)
                level_nodes[c * k:(c + 1) * k] = centers
                next_assign[sel] = c * k + a
            # empty cluster: zero centers (dead branch)
        all_nodes.append(level_nodes)
        assignments.append(next_assign)
    node_bits = np.concatenate(all_nodes, axis=0).astype(np.int8)

    # idf from training corpus treated as one pseudo-document per 500 desc
    W = k ** L
    word_of = assignments[-1]
    n_docs = max(len(bits) // 500, 1)
    df = np.zeros(W)
    for d0 in range(n_docs):
        words = np.unique(word_of[d0 * 500:(d0 + 1) * 500])
        df[words] += 1
    idf = np.log(n_docs / np.maximum(df, 1.0)) + 1e-3
    return Vocabulary(node_bits=jnp.asarray(node_bits), k=k, L=L,
                      idf=jnp.asarray(idf, jnp.float32))


def transform(voc: Vocabulary, desc_packed: jnp.ndarray,
              valid: jnp.ndarray) -> jnp.ndarray:
    """Descend the tree: (F, 32) packed descriptors -> (F,) word ids.

    Batched level-wise descent (reference TemplatedVocabulary::transform)."""
    bits = matching.unpack_desc(desc_packed)          # (F, 256) int8
    F = bits.shape[0]
    node = jnp.zeros((F,), jnp.int32)                 # cluster id at level l
    for l in range(voc.L):
        base = _level_offset(voc.k, l + 1)
        child_ids = base + node[:, None] * voc.k + jnp.arange(voc.k)[None, :]
        centers = voc.node_bits[child_ids]            # (F, k, 256)
        d = jnp.sum(jnp.abs(centers - bits[:, None, :].astype(jnp.int8)),
                    axis=-1)                          # (F, k)
        node = node * voc.k + jnp.argmin(d, axis=-1).astype(jnp.int32)
    return jnp.where(valid, node, 0), valid


def bow_vector(voc: Vocabulary, words: jnp.ndarray,
               valid: jnp.ndarray) -> jnp.ndarray:
    """(F,) word ids -> L1-normalized tf-idf vector (W,)
    (reference BowVector::addWeight + normalize(L1))."""
    W = voc.n_words
    tf = jnp.zeros((W,), jnp.float32).at[
        jnp.where(valid, words, 0)].add(valid.astype(jnp.float32))
    v = tf * voc.idf
    return v / jnp.maximum(jnp.sum(jnp.abs(v)), 1e-9)


def l1_score(db: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """DBoW2 L1 similarity between normalized vectors:
    s = 1 - 0.5 * |v1 - v2|_1, batched over database rows (K, W) x (W,).
    Computed as sum of elementwise min for nonneg vectors:
    |a-b| = a + b - 2 min(a,b); with |a|=|b|=1 -> s = sum min(a,b)... kept
    explicit for clarity (reference ScoringObject.cpp L1Scoring)."""
    return 1.0 - 0.5 * jnp.sum(jnp.abs(db - q[None, :]), axis=-1)


def vocabulary_to_arrays(voc: Vocabulary) -> dict:
    """Flatten for npz checkpointing (reference ships its vocabulary as a
    text file, ORBvoc.txt — here it rides in the map checkpoint)."""
    return {
        "voc_node_bits": np.asarray(voc.node_bits),
        "voc_k": np.asarray(voc.k),
        "voc_L": np.asarray(voc.L),
        "voc_idf": np.asarray(voc.idf),
    }


def vocabulary_from_arrays(d: dict) -> "Vocabulary | None":
    if "voc_node_bits" not in d:
        return None
    return Vocabulary(node_bits=jnp.asarray(d["voc_node_bits"]),
                      k=int(d["voc_k"]), L=int(d["voc_L"]),
                      idf=jnp.asarray(d["voc_idf"]))


def save_vocabulary(path, voc: Vocabulary):
    np.savez_compressed(path, **vocabulary_to_arrays(voc))


def load_vocabulary(path) -> "Vocabulary | None":
    return vocabulary_from_arrays(dict(np.load(path)))
