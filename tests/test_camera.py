import jax
import jax.numpy as jnp
import numpy as np

from orb_slam2_e_tpu.ops import camera as cam_ops
from orb_slam2_e_tpu.ops.camera import Camera


def tum1_camera():
    # TUM1 calibration values (reference Examples/Monocular/TUM1.yaml schema)
    return Camera.create(fx=517.306408, fy=516.469215, cx=318.643040,
                         cy=255.313989, k1=0.262383, k2=-0.953104,
                         p1=-0.005358, p2=0.002628, k3=1.163314,
                         width=640, height=480)


def test_project_backproject_roundtrip():
    cam = tum1_camera()
    key = jax.random.PRNGKey(0)
    z = jax.random.uniform(key, (100,), minval=0.5, maxval=5.0)
    uv = jax.random.uniform(key, (100, 2), minval=50.0, maxval=400.0)
    xc = cam_ops.backproject(cam, uv, z)
    uv2, z2 = cam_ops.project(cam, xc)
    np.testing.assert_allclose(np.asarray(uv), np.asarray(uv2), atol=1e-3)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z2), atol=1e-5)


def test_distort_undistort_roundtrip():
    cam = tum1_camera()
    key = jax.random.PRNGKey(1)
    xn = jax.random.uniform(key, (200, 2), minval=-0.3, maxval=0.3)
    xd = cam_ops.distort_normalized(cam, xn)
    xn2 = cam_ops.undistort_normalized(cam, xd)
    np.testing.assert_allclose(np.asarray(xn), np.asarray(xn2), atol=1e-5)


def test_undistort_matches_opencv():
    cv2 = __import__('cv2')
    cam = tum1_camera()
    pts = np.random.RandomState(3).uniform([100, 100], [540, 380],
                                           (50, 2)).astype(np.float64)
    K = np.asarray(cam.K)
    dist = np.array([0.262383, -0.953104, -0.005358, 0.002628, 1.163314])
    cv_out = cv2.undistortPoints(pts.reshape(-1, 1, 2), K, dist, P=K).reshape(-1, 2)
    ours = np.asarray(cam_ops.undistort_pixels(cam, jnp.asarray(pts, jnp.float32)))
    np.testing.assert_allclose(ours, cv_out, atol=0.05)  # px, f32 vs f64


def test_stereo_ur():
    cam = Camera.create(fx=718.856, fy=718.856, cx=607.19, cy=185.21,
                        bf=386.1448, width=1241, height=376)
    xc = jnp.array([[1.0, 0.5, 10.0]])
    uvr, z = cam_ops.project_stereo(cam, xc)
    u = float(uvr[0, 0])
    ur = float(uvr[0, 2])
    disparity = u - ur
    np.testing.assert_allclose(disparity, 386.1448 / 10.0, rtol=1e-5)


def test_in_image():
    cam = tum1_camera()
    uv = jnp.array([[0.0, 0.0], [639.9, 479.9], [-1.0, 5.0], [640.0, 100.0]])
    m = np.asarray(cam_ops.in_image(cam, uv))
    assert list(m) == [True, True, False, False]
