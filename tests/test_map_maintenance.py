"""MapPoint maintenance: distinctive descriptors + normal/depth refresh
(reference MapPoint::ComputeDistinctiveDescriptors / UpdateNormalAndDepth,
called from LocalMapping.cc:161-165 and after fusion :584-595)."""

import numpy as np
import jax.numpy as jnp

from orb_slam2_e_tpu.ops import lie
from orb_slam2_e_tpu.models.map_state import MapState
from orb_slam2_e_tpu.models.local_mapping import MappingConfig, \
    refresh_landmarks


def _add_kf(state, slot, R, t, kp_pt, desc, octave=None):
    F = state.F
    n = len(kp_pt)
    kp_uvr = np.full((F, 3), -1.0, np.float32)
    kp_uvr[:n, :2] = 100.0
    kp_ok = np.zeros(F, bool)
    kp_ok[:n] = kp_pt >= 0
    kp_point = np.full(F, -1, np.int32)
    kp_point[:n] = kp_pt
    d = np.zeros((F, 32), np.uint8)
    d[:n] = desc
    octv = np.zeros(F, np.int32)
    if octave is not None:
        octv[:n] = octave
    return state.add_keyframe(
        slot, lie.pose7_pack(jnp.asarray(R), jnp.asarray(t)), slot, 0.0,
        jnp.asarray(kp_uvr), jnp.asarray(octv), jnp.zeros(F),
        jnp.asarray(kp_ok), jnp.asarray(d), jnp.asarray(kp_point))


def test_distinctive_descriptor_is_median_minimizer():
    """3 KFs observe landmark 0 with different descriptors; after refresh
    lm_desc must equal the observation minimizing the median Hamming
    distance to the others — NOT the birth descriptor."""
    F = 16
    state = MapState.create(max_keyframes=4, max_features=F, max_points=32)
    # three observation descriptors: two similar (a, a'), one outlier (b)
    a = np.zeros(32, np.uint8)
    a2 = a.copy()
    a2[0] = 0b1           # Hamming 1 from a
    b = np.full(32, 255, np.uint8)   # Hamming ~255 from both
    birth = np.full(32, 0b1010, np.uint8)
    state = state._replace(
        lm_xyz=state.lm_xyz.at[0].set(jnp.asarray([0.0, 0.0, 5.0])),
        lm_valid=state.lm_valid.at[0].set(True),
        lm_desc=state.lm_desc.at[0].set(jnp.asarray(birth)),
    )
    eye = np.eye(3, dtype=np.float32)
    state = _add_kf(state, 0, eye, np.zeros(3, np.float32),
                    np.array([0]), a[None])
    state = _add_kf(state, 1, eye, np.array([0.1, 0, 0], np.float32),
                    np.array([0]), a2[None])
    state = _add_kf(state, 2, eye, np.array([-0.1, 0, 0], np.float32),
                    np.array([0]), b[None])
    cfg = MappingConfig(ba_points=32, n_neighbors=3)
    out = refresh_landmarks(cfg, state, jnp.int32(2))
    got = np.asarray(out.lm_desc[0])
    # median dist: a -> med(1, 255)->1... (N=3: sorted [0,1,255], median idx
    # (3-1)//2 = 1 -> 1); a2 -> 1; b -> 255. Winner: a or a2, never birth/b.
    assert (got == a).all() or (got == a2).all(), got[:4]
    assert not (got == birth).all()
    assert not (got == b).all()


def test_normal_and_depth_refresh():
    """Normal becomes the mean viewing direction over the observing KFs and
    distance bounds follow the first observation's octave/distance."""
    F = 16
    state = MapState.create(max_keyframes=4, max_features=F, max_points=32)
    X = np.array([0.0, 0.0, 4.0], np.float32)
    state = state._replace(
        lm_xyz=state.lm_xyz.at[0].set(jnp.asarray(X)),
        lm_valid=state.lm_valid.at[0].set(True),
        lm_normal=state.lm_normal.at[0].set(jnp.asarray([1.0, 0, 0])),
    )
    eye = np.eye(3, dtype=np.float32)
    d0 = np.zeros((1, 32), np.uint8)
    # cameras at (+-1, 0, 0) both looking at the point
    state = _add_kf(state, 0, eye, np.array([-1.0, 0, 0], np.float32),
                    np.array([0]), d0, octave=np.array([2]))
    state = _add_kf(state, 1, eye, np.array([1.0, 0, 0], np.float32),
                    np.array([0]), d0)
    cfg = MappingConfig(ba_points=32, n_neighbors=3, scale_factor=1.2,
                        n_levels=8)
    out = refresh_landmarks(cfg, state, jnp.int32(1))
    normal = np.asarray(out.lm_normal[0])
    # camera centers are (1,0,0) and (-1,0,0); rays to X average to ~+z
    assert normal[2] > 0.95, normal
    # depth bounds from observation 0 (octave 2): dist = |X - (1,0,0)|
    dist = np.linalg.norm(X - np.array([1.0, 0, 0]))
    assert np.isclose(float(out.lm_max_dist[0]), dist * 1.2 ** 2, rtol=1e-4)
    assert np.isclose(float(out.lm_min_dist[0]),
                      dist * 1.2 ** 2 / 1.2 ** 7, rtol=1e-4)


def test_refresh_skips_single_observation():
    """Landmarks with < 2 observations keep their birth attributes."""
    F = 16
    state = MapState.create(max_keyframes=4, max_features=F, max_points=32)
    birth = np.full(32, 7, np.uint8)
    state = state._replace(
        lm_xyz=state.lm_xyz.at[0].set(jnp.asarray([0.0, 0.0, 5.0])),
        lm_valid=state.lm_valid.at[0].set(True),
        lm_desc=state.lm_desc.at[0].set(jnp.asarray(birth)),
    )
    other = np.ones((1, 32), np.uint8)
    state = _add_kf(state, 0, np.eye(3, dtype=np.float32),
                    np.zeros(3, np.float32), np.array([0]), other)
    cfg = MappingConfig(ba_points=32, n_neighbors=3)
    out = refresh_landmarks(cfg, state, jnp.int32(0))
    assert (np.asarray(out.lm_desc[0]) == birth).all()
