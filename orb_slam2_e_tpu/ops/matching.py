"""Binary descriptor matching as dense masked matrix ops.

Functional equivalent of the reference's ORBmatcher (reference
src/ORBmatcher.cc): all search variants reduce to (a) a Hamming distance
matrix, (b) a candidate mask (projection window / BoW node / epipolar band),
(c) best+second-best reduction with ratio test, (d) rotation-consistency
histogram filtering.

TPU-first design: Hamming distance between bit-unpacked descriptors a, b in
{0,1}^256 is  |a| + |b| - 2 a.b  — so a full NxM distance matrix is a single
int8 matmul on the MXU, replacing the reference's per-cell grid walks
(reference src/Frame.cc:245 AssignFeaturesToGrid + GetFeaturesInArea). Masks
replace early-exit branches.

Matching thresholds mirror the reference (src/ORBmatcher.cc:37-40):
TH_HIGH=95, TH_LOW=45, TH_RELOC=60 (E-addition), HISTO_LENGTH=30.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

TH_HIGH = 95
TH_LOW = 45
TH_RELOC = 60          # E-addition for full-map reloc search
HISTO_LENGTH = 30
INVALID = jnp.int32(-1)

_BIT_WEIGHTS = np.asarray([1, 2, 4, 8, 16, 32, 64, 128], dtype=np.uint8)


def unpack_desc(packed: jnp.ndarray) -> jnp.ndarray:
    """(N, 32) uint8 -> (N, 256) int8 in {0, 1} (bit i of byte j -> col 8j+i)."""
    bits = (packed[..., :, None] >> jnp.arange(8, dtype=jnp.uint8)) & 1
    return bits.reshape(packed.shape[0], -1).astype(jnp.int8)


def hamming_matrix(bits_a: jnp.ndarray, bits_b: jnp.ndarray) -> jnp.ndarray:
    """(Na, 256) x (Nb, 256) {0,1} int8 -> (Na, Nb) int32 Hamming distances.

    Ham(a,b) = |a| + |b| - 2 a.b ; the a.b term is an MXU int8 matmul.
    Equivalent role to reference ORBmatcher::DescriptorDistance
    (src/ORBmatcher.cc:1848, popcount) batched over all pairs."""
    dot = jax.lax.dot_general(
        bits_a, bits_b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    na = jnp.sum(bits_a.astype(jnp.int32), axis=1)
    nb = jnp.sum(bits_b.astype(jnp.int32), axis=1)
    return na[:, None] + nb[None, :] - 2 * dot


def hamming_pairs(bits_a: jnp.ndarray, bits_b: jnp.ndarray) -> jnp.ndarray:
    """Row-wise Hamming distance for aligned pairs: (N, 256), (N, 256) -> (N,)."""
    return jnp.sum(jnp.abs(bits_a.astype(jnp.int32) - bits_b.astype(jnp.int32)),
                   axis=-1)


BIG = jnp.int32(10 ** 6)


def masked_best2(dist: jnp.ndarray, mask: jnp.ndarray):
    """Per-row best and second-best over masked columns.

    dist: (Na, Nb) int32; mask: (Na, Nb) bool (True = candidate).
    Returns (best_idx (Na,), best_d (Na,), second_d (Na,)); best_d == BIG
    where no candidate."""
    d = jnp.where(mask, dist, BIG)
    neg, idx2 = jax.lax.top_k(-d, 2)          # top-2 smallest distances
    best_idx = idx2[:, 0]
    best_d = -neg[:, 0]
    second_d = -neg[:, 1]
    return best_idx, best_d, second_d


def mutual_filter(best_ab: jnp.ndarray, best_ba: jnp.ndarray) -> jnp.ndarray:
    """Cross-check: keep a->b only if b->a maps back. (Na,), (Nb,) -> (Na,) bool."""
    nb = best_ba.shape[0]
    ok = (best_ab >= 0) & (best_ab < nb)
    back = jnp.where(ok, best_ba[jnp.clip(best_ab, 0, nb - 1)], -2)
    return ok & (back == jnp.arange(best_ab.shape[0]))


def rotation_consistency_mask(angle_a: jnp.ndarray, angle_b: jnp.ndarray,
                              pair_valid: jnp.ndarray,
                              min_pairs: int = 8) -> jnp.ndarray:
    """Keep only matches whose angle difference falls in the 3 most popular
    of 30 bins (reference ORBmatcher::ComputeThreeMaxima,
    src/ORBmatcher.cc:1778-1820 and rotation histogram usage at :606+).

    angle_a/angle_b: radians per match pair (aligned arrays). With fewer
    than min_pairs valid pairs the histogram carries no signal (top-3-bins
    of a near-empty histogram would drop valid matches arbitrarily) and the
    mask passes through unchanged."""
    diff = (angle_a - angle_b) % (2 * np.pi)             # [0, 2pi)
    bin_f = diff * (HISTO_LENGTH / (2 * np.pi))
    bins = jnp.clip(bin_f.astype(jnp.int32), 0, HISTO_LENGTH - 1)
    hist = jnp.zeros((HISTO_LENGTH,), jnp.int32).at[bins].add(
        pair_valid.astype(jnp.int32))
    top3_counts, top3_bins = jax.lax.top_k(hist, 3)
    # reference drops bins 2/3 if count < 0.1 * max (src/ORBmatcher.cc:1806-1817)
    keep_bin = top3_counts >= jnp.maximum(
        (0.1 * top3_counts[0]).astype(jnp.int32), 1)
    allowed = jnp.zeros((HISTO_LENGTH,), bool).at[top3_bins].max(keep_bin)
    enough = jnp.sum(pair_valid) >= min_pairs
    return pair_valid & (allowed[bins] | ~enough)


def window_mask(uv_query: jnp.ndarray, uv_train: jnp.ndarray,
                radius) -> jnp.ndarray:
    """(Na, 2), (Nb, 2) -> (Na, Nb) bool: train kp within radius of query pos.

    radius may be scalar or (Na,) per-query (scale-dependent windows, as in
    reference SearchByProjection th*scaleFactor^octave)."""
    r = jnp.asarray(radius)
    if r.ndim == 1:
        r = r[:, None]
    du = jnp.abs(uv_query[:, None, 0] - uv_train[None, :, 0])
    dv = jnp.abs(uv_query[:, None, 1] - uv_train[None, :, 1])
    return (du <= r) & (dv <= r)


def octave_range_mask(pred_octave: jnp.ndarray, kp_octave: jnp.ndarray,
                      lo_off: int = -1, hi_off: int = 1) -> jnp.ndarray:
    """(Na,), (Nb,) -> (Na, Nb): kp octave within [pred+lo, pred+hi]
    (reference SearchByProjection level window, src/ORBmatcher.cc:84-90)."""
    lo = pred_octave[:, None] + lo_off
    hi = pred_octave[:, None] + hi_off
    return (kp_octave[None, :] >= lo) & (kp_octave[None, :] <= hi)


def search_windowed(bits_a, bits_b, uv_a, uv_b, valid_a, valid_b,
                    radius, max_dist: int = TH_LOW, ratio: float = 0.9,
                    extra_mask=None, angles=None):
    """Generic windowed search a->b: returns (match_idx (Na,) int32, dist (Na,)).

    Covers reference SearchForInitialization (src/ORBmatcher.cc:606: window,
    ratio 0.9, rotation check) and the projection searches when the window
    mask is built from projections."""
    dist = hamming_matrix(bits_a, bits_b)
    mask = window_mask(uv_a, uv_b, radius)
    mask &= valid_a[:, None] & valid_b[None, :]
    if extra_mask is not None:
        mask &= extra_mask
    best_idx, d1, d2 = masked_best2(dist, mask)
    ok = (d1 <= max_dist) & (d1.astype(jnp.float32) < ratio * d2.astype(jnp.float32))
    if angles is not None:
        ang_a, ang_b = angles
        ok = rotation_consistency_mask(
            ang_a, ang_b[jnp.clip(best_idx, 0, bits_b.shape[0] - 1)], ok)
    return jnp.where(ok, best_idx, INVALID), jnp.where(ok, d1, BIG)


def resolve_duplicates(match_idx: jnp.ndarray, dist: jnp.ndarray,
                       n_train: int) -> jnp.ndarray:
    """Enforce injectivity: if several queries match the same train index,
    keep only the smallest distance (reference keeps best and erases the
    previous match, e.g. src/ORBmatcher.cc:1529+ last-frame search)."""
    safe = jnp.clip(match_idx, 0, n_train - 1)
    valid = match_idx >= 0
    best_per_train = jnp.full((n_train,), BIG).at[safe].min(
        jnp.where(valid, dist, BIG))
    keep = valid & (dist <= best_per_train[safe])
    # tie-break equal distances by query index: keep lowest query idx
    qidx = jnp.arange(match_idx.shape[0])
    first_q = jnp.full((n_train,), match_idx.shape[0]).at[safe].min(
        jnp.where(keep, qidx, match_idx.shape[0]))
    keep &= first_q[safe] == qidx
    return jnp.where(keep, match_idx, INVALID)
