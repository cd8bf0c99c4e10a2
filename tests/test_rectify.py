"""Stereo rectification map + remap correctness."""

import numpy as np
import jax.numpy as jnp

from orb_slam2_e_tpu.utils.rectify import rectify_map, remap_bilinear


def test_identity_map():
    K = np.array([[400.0, 0, 160], [0, 400, 120], [0, 0, 1]])
    D = np.zeros(5)
    R = np.eye(3)
    P = K.copy()
    mp = rectify_map(K, D, R, P, width=320, height=240)
    u, v = np.meshgrid(np.arange(320), np.arange(240))
    np.testing.assert_allclose(mp[..., 0], u, atol=1e-4)
    np.testing.assert_allclose(mp[..., 1], v, atol=1e-4)


def test_remap_identity_roundtrip():
    rng = np.random.RandomState(0)
    img = rng.rand(240, 320).astype(np.float32) * 255
    K = np.array([[400.0, 0, 160], [0, 400, 120], [0, 0, 1]])
    mp = rectify_map(K, np.zeros(4), np.eye(3), K, 320, 240)
    out = np.asarray(remap_bilinear(jnp.asarray(img), jnp.asarray(mp)))
    np.testing.assert_allclose(out, img, atol=1e-2)


def test_distortion_consistency():
    """Map through K,D then verify the distortion model forward-projects a
    rectified pixel to the mapped source location."""
    K = np.array([[458.654, 0, 367.215], [0, 457.296, 248.375], [0, 0, 1]])
    D = np.array([-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05])
    P = np.array([[435.2, 0, 367.45, 0], [0, 435.2, 252.2, 0], [0, 0, 1, 0]])
    R = np.eye(3)
    mp = rectify_map(K, D, R, P, width=752, height=480)
    # center pixel of P should map near the principal point of K
    cx, cy = 367, 252
    assert abs(mp[cy, cx, 0] - K[0, 2]) < 5.0
    assert abs(mp[cy, cx, 1] - K[1, 2]) < 5.0
    assert np.isfinite(mp).all()
