"""Localization-only visual-odometry mode (reference Tracking::mbVO).

The reference spawns temporary MapPoints from last-frame depth in
localization mode (src/Tracking.cc:1160-1222) so tracking survives outside
the mapped region; mbVO = fewer than 10 real map matches
(src/Tracking.cc:1280) and the local map is skipped while it holds
(src/Tracking.cc:478-485). These tests drive `track_frame_loc` directly
with constructed frames: once with an empty map (pure VO rescue), once with
bound landmarks (normal localization path, vo off)."""

import numpy as np
import jax
import jax.numpy as jnp

from orb_slam2_e_tpu.ops.camera import Camera
from orb_slam2_e_tpu.ops import lie
from orb_slam2_e_tpu.models.map_state import MapState
from orb_slam2_e_tpu.models.frame import Frame
from orb_slam2_e_tpu.models import tracking as T

FX = FY = 300.0
CX, CY = 160.0, 120.0
BF = 30.0
N = 256


def _cam():
    return Camera.create(fx=FX, fy=FY, cx=CX, cy=CY, bf=BF,
                         width=320, height=240)


def _cfg():
    return T.TrackConfig(n_levels=4, local_points_cap=512, local_kf_cap=8)


def _scene(seed=0, n=N):
    rng = np.random.RandomState(seed)
    xyz = np.stack([rng.uniform(-1.5, 1.5, n), rng.uniform(-1.1, 1.1, n),
                    rng.uniform(2.0, 5.0, n)], 1).astype(np.float32)
    desc = rng.randint(0, 256, (n, 32)).astype(np.uint8)
    return xyz, desc


def _frame(xyz_w, desc, R, t, with_depth=True):
    xc = xyz_w @ R.T + t
    z = xc[:, 2]
    u = FX * xc[:, 0] / z + CX
    v = FY * xc[:, 1] / z + CY
    ok = (z > 0.1) & (u >= 1) & (u < 319) & (v >= 1) & (v < 239)
    ur = u - BF / z if with_depth else np.full_like(u, -1.0)
    depth = z if with_depth else np.full_like(z, -1.0)
    return Frame(
        pose7=lie.pose7_pack(jnp.asarray(R), jnp.asarray(t)),
        uvr=jnp.asarray(np.stack([u, v, ur], 1), jnp.float32),
        uv_raw=jnp.asarray(np.stack([u, v], 1), jnp.float32),
        octave=jnp.zeros((len(u),), jnp.int32),
        angle=jnp.zeros((len(u),), jnp.float32),
        response=jnp.ones((len(u),), jnp.float32),
        desc=jnp.asarray(desc),
        valid=jnp.asarray(ok),
        point_ids=jnp.full((len(u),), -1, jnp.int32),
        depth=jnp.asarray(depth, jnp.float32))


def _poses():
    R0 = np.eye(3, dtype=np.float32)
    t0 = np.zeros(3, np.float32)
    R1 = np.eye(3, dtype=np.float32)
    t1 = np.array([0.03, -0.01, 0.02], np.float32)
    return R0, t0, R1, t1


def test_vo_rescues_with_empty_map():
    """No landmarks at all: tracking must continue purely on temporary VO
    points from last-frame depth, with the vo flag raised."""
    cam, cfg = _cam(), _cfg()
    xyz, desc = _scene()
    state = MapState.create(8, N, 1024)
    R0, t0, R1, t1 = _poses()
    last = _frame(xyz, desc, R0, t0)
    cur = _frame(xyz, desc, R1, t1)
    vel = lie.pose7_pack(jnp.asarray(R1), jnp.asarray(t1))  # exact delta
    f_out, vel_new, flags = T.track_frame_loc(
        cam, cfg, state, cur, last, vel, jnp.bool_(True), jnp.int32(0))
    flags = np.asarray(flags)
    assert flags[0] == 1, flags          # ok
    assert flags[4] == 1, flags          # vo mode (no real map matches)
    assert flags[5] > 20, flags          # plenty of VO inliers
    R_est, t_est = lie.pose7_unpack(f_out.pose7)
    assert np.linalg.norm(np.asarray(t_est) - t1) < 0.02
    ang = np.linalg.norm(np.asarray(lie.so3_log(
        jnp.asarray(np.asarray(R_est) @ R1.T))))
    assert ang < 0.01


def test_vo_off_when_map_points_tracked():
    """With enough real landmark bindings the vo flag stays down and the
    normal localization path (local-map gate) decides."""
    cam, cfg = _cam(), _cfg()
    xyz, desc = _scene()
    state = MapState.create(8, N, 1024)
    n_lm = 60
    state = state._replace(
        lm_xyz=state.lm_xyz.at[:n_lm].set(jnp.asarray(xyz[:n_lm])),
        lm_valid=state.lm_valid.at[:n_lm].set(True),
        lm_desc=state.lm_desc.at[:n_lm].set(jnp.asarray(desc[:n_lm])),
        lm_max_dist=state.lm_max_dist.at[:n_lm].set(100.0),
    )
    R0, t0, R1, t1 = _poses()
    last = _frame(xyz, desc, R0, t0)
    last = last._replace(point_ids=last.point_ids.at[:n_lm].set(
        jnp.arange(n_lm, dtype=jnp.int32)))
    cur = _frame(xyz, desc, R1, t1)
    vel = lie.pose7_pack(jnp.asarray(R1), jnp.asarray(t1))
    f_out, vel_new, flags = T.track_frame_loc(
        cam, cfg, state, cur, last, vel, jnp.bool_(True), jnp.int32(0))
    flags = np.asarray(flags)
    assert flags[4] == 0, flags          # vo OFF: map is visible
    assert flags[0] == 1, flags          # bound landmarks carry the track
    R_est, t_est = lie.pose7_unpack(f_out.pose7)
    assert np.linalg.norm(np.asarray(t_est) - t1) < 0.02


def test_vo_mono_no_depth_fails_gracefully():
    """Monocular localization (no depth): no VO points can exist, so with an
    empty map the step reports not-ok rather than fabricating a track."""
    cam, cfg = _cam(), _cfg()
    xyz, desc = _scene()
    state = MapState.create(8, N, 1024)
    R0, t0, R1, t1 = _poses()
    last = _frame(xyz, desc, R0, t0, with_depth=False)
    cur = _frame(xyz, desc, R1, t1, with_depth=False)
    vel = lie.pose7_pack(jnp.asarray(R1), jnp.asarray(t1))
    _, _, flags = T.track_frame_loc(
        cam, cfg, state, cur, last, vel, jnp.bool_(True), jnp.int32(0))
    flags = np.asarray(flags)
    assert flags[0] == 0, flags
