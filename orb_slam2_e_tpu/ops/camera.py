"""Pinhole camera model with Brown-Conrady distortion + stereo helpers.

Covers the reference's camera handling: calibration parsed from YAML
(reference src/Tracking.cc:53-79: Camera.fx/fy/cx/cy, k1,k2,p1,p2,k3, bf),
keypoint undistortion (reference src/Frame.cc:419 UndistortKeyPoints via
cv::undistortPoints), projection / frustum checks (reference
src/Frame.cc:284 isInFrustum), and stereo right-coordinate ur = u - bf/z
(reference src/Frame.cc:704 ComputeStereoFromRGBD).

All functions broadcast over leading dims and are jit-safe.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Camera(NamedTuple):
    """Calibration pytree. All fields are scalar arrays (traced under jit)."""
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    k1: jnp.ndarray
    k2: jnp.ndarray
    p1: jnp.ndarray
    p2: jnp.ndarray
    k3: jnp.ndarray
    bf: jnp.ndarray      # stereo baseline * fx (0 for monocular)
    width: jnp.ndarray   # image width in px (float)
    height: jnp.ndarray  # image height in px (float)

    @staticmethod
    def create(fx, fy, cx, cy, k1=0.0, k2=0.0, p1=0.0, p2=0.0, k3=0.0,
               bf=0.0, width=640, height=480, dtype=jnp.float32):
        a = lambda v: jnp.asarray(v, dtype)
        return Camera(a(fx), a(fy), a(cx), a(cy), a(k1), a(k2), a(p1), a(p2),
                      a(k3), a(bf), a(width), a(height))

    @property
    def K(self):
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack([
            jnp.stack([self.fx, z, self.cx], -1),
            jnp.stack([z, self.fy, self.cy], -1),
            jnp.stack([z, z, o], -1)], -2)

    @property
    def baseline(self):
        return self.bf / self.fx


def distort_normalized(cam: Camera, xn: jnp.ndarray) -> jnp.ndarray:
    """Apply Brown-Conrady distortion to normalized coords (..., 2)."""
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (cam.k1 + r2 * (cam.k2 + r2 * cam.k3))
    xd = x * radial + 2.0 * cam.p1 * x * y + cam.p2 * (r2 + 2.0 * x * x)
    yd = y * radial + cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_normalized(cam: Camera, xd: jnp.ndarray, iters: int = 8) -> jnp.ndarray:
    """Invert distortion by fixed-point iteration (matches cv::undistortPoints'
    iterative scheme with a static iteration count)."""
    x = xd
    for _ in range(iters):
        xx, yy = x[..., 0], x[..., 1]
        r2 = xx * xx + yy * yy
        radial = 1.0 + r2 * (cam.k1 + r2 * (cam.k2 + r2 * cam.k3))
        dx = 2.0 * cam.p1 * xx * yy + cam.p2 * (r2 + 2.0 * xx * xx)
        dy = cam.p1 * (r2 + 2.0 * yy * yy) + 2.0 * cam.p2 * xx * yy
        x = jnp.stack([(xd[..., 0] - dx) / radial, (xd[..., 1] - dy) / radial],
                      axis=-1)
    return x


def pixel_to_normalized(cam: Camera, uv: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([(uv[..., 0] - cam.cx) / cam.fx,
                      (uv[..., 1] - cam.cy) / cam.fy], axis=-1)


def normalized_to_pixel(cam: Camera, xn: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([xn[..., 0] * cam.fx + cam.cx,
                      xn[..., 1] * cam.fy + cam.cy], axis=-1)


def undistort_pixels(cam: Camera, uv: jnp.ndarray) -> jnp.ndarray:
    """Distorted pixel coords -> ideal (undistorted) pixel coords.

    Parity: Frame::UndistortKeyPoints (reference src/Frame.cc:419)."""
    return normalized_to_pixel(cam, undistort_normalized(cam, pixel_to_normalized(cam, uv)))


def project(cam: Camera, xc: jnp.ndarray, distort: bool = False):
    """Camera-frame points (..., 3) -> pixel (..., 2), plus depth (...,).

    The SLAM pipeline works on undistorted keypoints, so `distort=False` is
    the default (projection compares against undistorted measurements, as in
    reference src/Optimizer.cc project paths). `distort=True` reproduces the
    viewer's overlay projection (reference src/FrameDrawer.cc DistortMapPoint).
    """
    z = xc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    xn = xc[..., :2] / zs[..., None]
    if distort:
        xn = distort_normalized(cam, xn)
    return normalized_to_pixel(cam, xn), z


def project_stereo(cam: Camera, xc: jnp.ndarray):
    """-> (u, v, ur) (..., 3) and depth. ur = u - bf / z
    (reference src/Frame.cc:704-725)."""
    uv, z = project(cam, xc)
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    ur = uv[..., 0] - cam.bf / zs
    return jnp.concatenate([uv, ur[..., None]], axis=-1), z


def backproject(cam: Camera, uv: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Undistorted pixel + depth -> camera-frame 3D point
    (reference src/Frame.cc:727 UnprojectStereo)."""
    x = (uv[..., 0] - cam.cx) / cam.fx * z
    y = (uv[..., 1] - cam.cy) / cam.fy * z
    return jnp.stack([x, y, z], axis=-1)


def in_image(cam: Camera, uv: jnp.ndarray, margin: float = 0.0) -> jnp.ndarray:
    """Bounds check against the (undistorted) image rectangle."""
    return ((uv[..., 0] >= margin) & (uv[..., 0] < cam.width - margin)
            & (uv[..., 1] >= margin) & (uv[..., 1] < cam.height - margin))
