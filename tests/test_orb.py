import numpy as np
import jax.numpy as jnp

from orb_slam2_e_tpu.ops import orb


def synth_corner_image(h=200, w=240, seed=0, n_squares=20):
    """Random bright squares on dark background -> strong corners."""
    rng = np.random.RandomState(seed)
    img = np.full((h, w), 30, np.float32)
    corners = []
    for _ in range(n_squares):
        y = rng.randint(30, h - 60)
        x = rng.randint(30, w - 60)
        s = rng.randint(12, 25)
        img[y:y + s, x:x + s] = 220
        corners += [(x, y), (x + s - 1, y), (x, y + s - 1), (x + s - 1, y + s - 1)]
    return img, np.asarray(corners, np.float32)


def test_level_quotas():
    q = orb.level_quotas(1000, 1.2, 8)
    assert len(q) == 8 and sum(q) == 1000
    assert q[0] > q[1] > q[7] > 0  # geometric decay


def test_fast_detects_square_corners():
    img, corners = synth_corner_image()
    uv, score, valid = orb.detect_level(jnp.asarray(img), 200, 20.0, 7.0)
    uv = np.asarray(uv)[np.asarray(valid)]
    assert len(uv) >= 10
    # each detection should be near a true corner (within cell+nms slack)
    d = np.linalg.norm(uv[:, None] - corners[None], axis=-1).min(axis=1)
    assert np.median(d) < 3.0


def test_fast_flat_image_no_detections():
    img = jnp.full((100, 100), 128.0)
    uv, score, valid = orb.detect_level(img, 50, 20.0, 7.0)
    assert not bool(np.asarray(valid).any())


def test_orientation_gradient():
    # bright half-plane to the right -> centroid along +x -> angle ~ 0
    img = np.zeros((64, 64), np.float32)
    img[:, 32:] = 200
    ang = orb.compute_orientations(jnp.asarray(img), jnp.asarray([[32.0, 32.0]]))
    assert abs(float(ang[0])) < 0.1
    # bright below -> angle ~ +pi/2 (y down)
    img2 = np.zeros((64, 64), np.float32)
    img2[32:, :] = 200
    ang2 = orb.compute_orientations(jnp.asarray(img2), jnp.asarray([[32.0, 32.0]]))
    assert abs(float(ang2[0]) - np.pi / 2) < 0.1


def test_orientation_moment_maps_match_gather_path():
    """The dense cumsum-chord moment maps must agree with the direct
    709-gather IC-angle for interior keypoints (same disc, same moments)."""
    rng = np.random.RandomState(7)
    img = jnp.asarray(rng.rand(96, 128).astype(np.float32) * 255)
    uv = jnp.asarray(rng.uniform(20, 75, (40, 2)).astype(np.float32))
    ref = np.asarray(orb.compute_orientations(img, uv))
    m10, m01 = orb.orientation_moment_maps(img)
    fast = np.asarray(orb.orientations_from_maps(m10, m01, uv))
    d = np.abs(fast - ref)
    d = np.minimum(d, 2 * np.pi - d)
    assert d.max() < 1e-3, d.max()


def test_descriptor_rotation_invariance():
    """Descriptor of a rotated patch with steered angle should be close to
    the original (steered BRIEF property)."""
    import scipy.ndimage as ndi
    rng = np.random.RandomState(1)
    img = ndi.gaussian_filter(rng.rand(96, 96).astype(np.float32) * 255, 3)
    uv = jnp.asarray([[48.0, 48.0]])
    a0 = orb.compute_orientations(jnp.asarray(img), uv)
    d0 = orb.compute_descriptors(orb.gaussian_blur7(jnp.asarray(img)), uv, a0)

    deg = 30.0
    img_r = ndi.rotate(img, -deg, reshape=False, order=1)  # image rotates content by -deg
    a1 = orb.compute_orientations(jnp.asarray(img_r), uv)
    d1 = orb.compute_descriptors(orb.gaussian_blur7(jnp.asarray(img_r)), uv, a1)

    ham = np.unpackbits(np.asarray(d0) ^ np.asarray(d1)).sum()
    assert ham < 80  # well below random (128)


def test_descriptor_distinct_for_different_points():
    rng = np.random.RandomState(2)
    img = jnp.asarray(rng.rand(128, 128).astype(np.float32) * 255)
    uv = jnp.asarray([[40.0, 40.0], [90.0, 80.0]])
    ang = orb.compute_orientations(img, uv)
    d = np.asarray(orb.compute_descriptors(orb.gaussian_blur7(img), uv, ang))
    ham = np.unpackbits(d[0] ^ d[1]).sum()
    assert ham > 60  # near-random distance for unrelated patches


def test_extractor_end_to_end():
    img, _ = synth_corner_image(h=240, w=320, n_squares=40)
    ext = orb.OrbExtractor(n_features=500, scale_factor=1.2, n_levels=4)
    feats = ext(jnp.asarray(img))
    assert feats.capacity == sum(ext.quotas)
    v = np.asarray(feats.valid)
    assert v.sum() > 50
    uv = np.asarray(feats.uv)[v]
    assert uv[:, 0].max() < 320 and uv[:, 1].max() < 240
    assert np.asarray(feats.desc).shape == (feats.capacity, 32)
    # multiple levels fire
    assert len(np.unique(np.asarray(feats.octave)[v])) >= 2
    # valid slots have sane responses
    assert np.asarray(feats.response)[v].min() >= 0


def test_extractor_jit_cache():
    img, _ = synth_corner_image(h=120, w=160, n_squares=10)
    ext = orb.OrbExtractor(n_features=200, n_levels=3)
    f1 = ext(jnp.asarray(img))
    f2 = ext(jnp.asarray(img) + 0.0)
    np.testing.assert_array_equal(np.asarray(f1.uv), np.asarray(f2.uv))
