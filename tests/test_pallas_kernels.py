"""Pallas frontend kernel vs. the XLA reference formulation."""

import functools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from orb_slam2_e_tpu.ops import orb
from orb_slam2_e_tpu.ops import pallas_kernels as pk


def _xla_score_nms(img, th_high, th_low):
    score = orb.fast_score_map(img, th_high, th_low)
    neigh = [orb._shift2d(score, dx, dy)
             for dx in (-1, 0, 1) for dy in (-1, 0, 1)
             if not (dx == 0 and dy == 0)]
    is_max = functools.reduce(jnp.logical_and,
                              [score >= n for n in neigh])
    return jnp.where(is_max, score, 0.0)


@pytest.mark.skipif(not pk.tpu_available(), reason="needs TPU for pallas")
def test_fast_nms_blur_matches_xla():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randint(0, 255, (480, 640)).astype(np.float32))
    th_high, th_low = 20.0, 7.0
    score_pl, blur_pl = pk.fast_nms_blur(img, th_high, th_low)
    score_x = _xla_score_nms(img, th_high, th_low)
    blur_x = orb.gaussian_blur7(img)

    b = orb.EDGE_THRESHOLD
    sp = np.asarray(score_pl)[b:-b, b:-b]
    sx = np.asarray(score_x)[b:-b, b:-b]
    # identical corner set and identical scores away from the border
    np.testing.assert_allclose(sp, sx, rtol=1e-5, atol=1e-3)
    bp = np.asarray(blur_pl)[b:-b, b:-b]
    bx = np.asarray(blur_x)[b:-b, b:-b]
    np.testing.assert_allclose(bp, bx, rtol=1e-5, atol=1e-2)


@pytest.mark.skipif(not pk.tpu_available(), reason="needs TPU for pallas")
def test_extractor_pallas_path_consistent():
    """The extractor with the pallas frontend finds the same keypoints."""
    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.randint(0, 255, (240, 320)).astype(np.float32))
    ex_ref = orb.OrbExtractor(n_features=300, n_levels=2, use_pallas=False)
    ex_pl = orb.OrbExtractor(n_features=300, n_levels=2, use_pallas=True)
    f_ref = ex_ref(img)
    f_pl = ex_pl(img)
    n_ref = int(f_ref.valid.sum())
    n_pl = int(f_pl.valid.sum())
    assert n_pl >= 0.95 * n_ref
    # keypoint sets agree (order may differ within equal scores)
    uv_ref = {tuple(map(float, u)) for u, v in
              zip(np.asarray(f_ref.uv), np.asarray(f_ref.valid)) if v}
    uv_pl = {tuple(map(float, u)) for u, v in
             zip(np.asarray(f_pl.uv), np.asarray(f_pl.valid)) if v}
    inter = len(uv_ref & uv_pl)
    assert inter >= 0.9 * max(n_ref, 1)
