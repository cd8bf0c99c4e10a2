"""Stereo rectification (EuRoC-style raw stereo pairs).

Equivalent of the reference's use of cv::initUndistortRectifyMap + cv::remap
in Examples/Stereo/stereo_euroc.cc:59-115: the YAML carries per-camera
K (3x3 intrinsics), D (radtan distortion), R (rectifying rotation) and
P (rectified projection); both images are warped onto the common rectified
pinhole before the SLAM pipeline sees them.

The map computation is host-side numpy (once per run); the per-frame remap
is a jitted bilinear gather so it fuses into the on-device frontend.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def rectify_map(K: np.ndarray, D: np.ndarray, R: np.ndarray, P: np.ndarray,
                width: int, height: int) -> np.ndarray:
    """Build the (H, W, 2) map of source pixel coords (x, y) for each
    rectified destination pixel — the same math as OpenCV
    initUndistortRectifyMap (pinhole + radtan).

    K/D: original intrinsics + distortion (k1 k2 p1 p2 [k3]);
    R: rectifying rotation; P: 3x4 (or 3x3) new projection.
    """
    K = np.asarray(K, np.float64)
    D = np.asarray(D, np.float64).ravel()
    k1, k2, p1, p2 = D[0], D[1], D[2], D[3]
    k3 = D[4] if D.size > 4 else 0.0
    R = np.asarray(R, np.float64)
    P = np.asarray(P, np.float64)
    Pinv = np.linalg.inv(P[:3, :3])
    A = R.T @ Pinv                    # rectified pixel -> original cam ray

    u, v = np.meshgrid(np.arange(width), np.arange(height))
    ones = np.ones_like(u, np.float64)
    rays = np.stack([u, v, ones], -1) @ A.T           # (H, W, 3)
    x = rays[..., 0] / rays[..., 2]
    y = rays[..., 1] / rays[..., 2]
    r2 = x * x + y * y
    rad = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * rad + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * rad + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    map_x = K[0, 0] * xd + K[0, 2]
    map_y = K[1, 1] * yd + K[1, 2]
    return np.stack([map_x, map_y], -1).astype(np.float32)


@jax.jit
def remap_bilinear(img: jnp.ndarray, mp: jnp.ndarray) -> jnp.ndarray:
    """cv::remap(INTER_LINEAR, BORDER_CONSTANT=0): img (H, W) f32,
    mp (H, W, 2) source (x, y) -> rectified (H, W) f32."""
    H, W = img.shape
    x = mp[..., 0]
    y = mp[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def at(yy, xx):
        inb = (xx >= 0) & (xx < W) & (yy >= 0) & (yy < H)
        val = img[jnp.clip(yy, 0, H - 1), jnp.clip(xx, 0, W - 1)]
        return jnp.where(inb, val, 0.0)

    v00 = at(y0i, x0i)
    v01 = at(y0i, x0i + 1)
    v10 = at(y0i + 1, x0i)
    v11 = at(y0i + 1, x0i + 1)
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
            + fy * ((1 - fx) * v10 + fx * v11))


class StereoRectifier:
    """Precomputed left/right rectification for a raw stereo rig."""

    def __init__(self, K_l, D_l, R_l, P_l, K_r, D_r, R_r, P_r,
                 width: int, height: int):
        self.map_l = jnp.asarray(rectify_map(K_l, D_l, R_l, P_l,
                                             width, height))
        self.map_r = jnp.asarray(rectify_map(K_r, D_r, R_r, P_r,
                                             width, height))

    def __call__(self, img_left, img_right):
        l = remap_bilinear(jnp.asarray(img_left, jnp.float32), self.map_l)
        r = remap_bilinear(jnp.asarray(img_right, jnp.float32), self.map_r)
        return l, r
