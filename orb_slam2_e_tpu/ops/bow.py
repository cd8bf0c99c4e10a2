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


_POPCNT = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                        axis=1).sum(1).astype(np.uint8)


def _hamming_packed(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N, 32) x (M, 32) packed uint8 -> (N, M) int32 Hamming distances
    via XOR + popcount lookup (host-side trainer hot loop)."""
    x = a[:, None, :] ^ b[None, :, :]
    return _POPCNT[x].sum(-1, dtype=np.int32)


def train_vocabulary(descriptors: np.ndarray, k: int = 10, L: int = 4,
                     iters: int = 8, seed: int = 0,
                     doc_ids: np.ndarray = None,
                     verbose: bool = False) -> Vocabulary:
    """Hierarchical binary k-medians (host-side, offline — the reference
    vocabulary was likewise trained offline from a large image corpus;
    reference include/ORBVocabulary.h:30 uses k=10, L=6).

    descriptors: (N, 32) uint8 packed. Works packed throughout (XOR +
    popcount), so corpora of 10^5-10^6 descriptors train in minutes.
    doc_ids: optional (N,) int document id per descriptor (source image)
    for proper idf; defaults to one pseudo-document per 500 descriptors."""
    rng = np.random.RandomState(seed)
    packed = np.ascontiguousarray(descriptors, dtype=np.uint8)
    N = len(packed)

    def majority(data):
        """Bitwise-majority center of packed rows -> packed row."""
        bits = np.unpackbits(data, axis=1, bitorder='little')
        return np.packbits(bits.mean(0) > 0.5, bitorder='little')

    def kmedians(data, k):
        init = data[rng.choice(len(data), min(k, len(data)), replace=False)]
        centers = np.zeros((k, 32), np.uint8)
        centers[:len(init)] = init
        a = None
        for _ in range(iters):
            d = _hamming_packed(data, centers)
            a_new = d.argmin(1)
            if a is not None and (a_new == a).all():
                break
            a = a_new
            for j in range(k):
                sel = data[a == j]
                if len(sel):
                    centers[j] = majority(sel)
        d = _hamming_packed(data, centers)
        return centers, d.argmin(1)

    all_nodes = []
    assign = np.zeros(N, np.int64)       # cluster id at the current level
    for l in range(L):
        n_clusters = k ** l
        next_assign = np.zeros(N, np.int64)
        level_nodes = np.zeros((n_clusters * k, 32), np.uint8)
        order = np.argsort(assign, kind='stable')
        bounds = np.searchsorted(assign[order], np.arange(n_clusters + 1))
        for c in range(n_clusters):
            sel = order[bounds[c]:bounds[c + 1]]
            if len(sel) >= 1:
                centers, a = kmedians(packed[sel], k)
                level_nodes[c * k:(c + 1) * k] = centers
                next_assign[sel] = c * k + a
            # empty cluster: zero centers (dead branch)
        all_nodes.append(level_nodes)
        assign = next_assign
        if verbose:
            print(f"  vocab level {l + 1}/{L}: "
                  f"{len(np.unique(assign))} live clusters")
    node_packed = np.concatenate(all_nodes, axis=0)
    node_bits = np.unpackbits(node_packed, axis=1,
                              bitorder='little').astype(np.int8)

    # idf over training documents (reference TemplatedVocabulary::create
    # weights words by inverse document frequency)
    W = k ** L
    if doc_ids is None:
        doc_ids = np.arange(N) // 500
    docs, doc_idx = np.unique(doc_ids, return_inverse=True)
    n_docs = max(len(docs), 1)
    df = np.zeros(W)
    pairs = np.unique(np.stack([doc_idx, assign]), axis=1)
    np.add.at(df, pairs[1], 1.0)
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
    text file, ORBvoc.txt — here it rides in the map checkpoint / a small
    npz artifact). Node centers are stored bit-packed (32 B/node)."""
    packed = np.packbits(np.asarray(voc.node_bits).astype(np.uint8),
                         axis=1, bitorder='little')
    return {
        "voc_nodes_packed": packed,
        "voc_k": np.asarray(voc.k),
        "voc_L": np.asarray(voc.L),
        "voc_idf": np.asarray(voc.idf),
    }


def vocabulary_from_arrays(d: dict) -> "Vocabulary | None":
    if "voc_nodes_packed" in d:
        bits = np.unpackbits(np.asarray(d["voc_nodes_packed"]), axis=1,
                             bitorder='little').astype(np.int8)
    elif "voc_node_bits" in d:       # legacy unpacked checkpoints
        bits = np.asarray(d["voc_node_bits"], np.int8)
    else:
        return None
    return Vocabulary(node_bits=jnp.asarray(bits),
                      k=int(d["voc_k"]), L=int(d["voc_L"]),
                      idf=jnp.asarray(d["voc_idf"]))


def save_vocabulary(path, voc: Vocabulary):
    np.savez_compressed(path, **vocabulary_to_arrays(voc))


def load_vocabulary(path) -> "Vocabulary | None":
    return vocabulary_from_arrays(dict(np.load(path)))
