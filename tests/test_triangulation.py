"""Unit test for the vmapped triangulation stage (reference
LocalMapping::CreateNewMapPoints, src/LocalMapping.cc:243-520): two
covisible keyframes with unbound matching features must yield new landmarks
at the true 3D positions, bound in BOTH keyframes, one landmark per
feature (no duplicate creation across neighbors)."""

import numpy as np
import jax.numpy as jnp

from orb_slam2_e_tpu.ops.camera import Camera
from orb_slam2_e_tpu.ops import lie
from orb_slam2_e_tpu.models.map_state import MapState
from orb_slam2_e_tpu.models.local_mapping import (MappingConfig,
                                                  triangulate_with_neighbors)

FX = FY = 300.0
CX, CY = 160.0, 120.0
F = 64
N_BOUND = 12     # pre-existing shared landmarks (covisibility >= 15 gate)
N_NEW = 28


def _project(xyz, R, t):
    xc = xyz @ R.T + t
    u = FX * xc[:, 0] / xc[:, 2] + CX
    v = FY * xc[:, 1] / xc[:, 2] + CY
    return np.stack([u, v, np.full_like(u, -1.0)], 1).astype(np.float32)


def test_triangulate_creates_points_bound_in_both_kfs():
    rng = np.random.RandomState(5)
    cam = Camera.create(fx=FX, fy=FY, cx=CX, cy=CY, width=320, height=240)
    n = N_BOUND + N_NEW
    xyz = np.stack([rng.uniform(-1.2, 1.2, n), rng.uniform(-0.8, 0.8, n),
                    rng.uniform(4.0, 6.0, n)], 1).astype(np.float32)
    desc = rng.randint(0, 256, (n, 32)).astype(np.uint8)
    R = np.eye(3, dtype=np.float32)
    t0 = np.zeros(3, np.float32)
    t1 = np.array([-0.3, 0.0, 0.0], np.float32)   # camera 1 right of cam 0

    state = MapState.create(max_keyframes=8, max_features=F, max_points=256)
    # pre-bind the first N_BOUND points as landmarks in both keyframes
    state = state._replace(
        lm_xyz=state.lm_xyz.at[:N_BOUND].set(jnp.asarray(xyz[:N_BOUND])),
        lm_valid=state.lm_valid.at[:N_BOUND].set(True),
        lm_desc=state.lm_desc.at[:N_BOUND].set(jnp.asarray(desc[:N_BOUND])))

    kp_point = np.full(F, -1, np.int32)
    kp_point[:N_BOUND] = np.arange(N_BOUND)
    kp_valid = np.zeros(F, bool)
    kp_valid[:n] = True
    pad = np.zeros((F - n, 3), np.float32)
    dpad = np.zeros((F - n, 32), np.uint8)
    for slot, t in ((0, t0), (1, t1)):
        state = state.add_keyframe(
            jnp.int32(slot), lie.pose7_pack(jnp.asarray(R), jnp.asarray(t)),
            jnp.int32(slot), jnp.float32(slot / 30.0),
            jnp.asarray(np.concatenate([_project(xyz, R, t), pad])),
            jnp.zeros(F, jnp.int32), jnp.zeros(F),
            jnp.asarray(kp_valid), jnp.asarray(np.concatenate([desc, dpad])),
            jnp.asarray(kp_point))

    cfg = MappingConfig(n_neighbors=4, ba_points=256)
    out, n_created = triangulate_with_neighbors(cam, cfg, state,
                                                jnp.int32(1))
    n_created = int(n_created)
    assert n_created >= N_NEW - 2, n_created

    # every triangulated landmark sits near its true position
    pt1 = np.asarray(out.kf_kp_point[1])
    pt0 = np.asarray(out.kf_kp_point[0])
    lm = np.asarray(out.lm_xyz)
    hits = 0
    for f in range(N_BOUND, n):
        pid = pt1[f]
        if pid < 0:
            continue
        assert np.linalg.norm(lm[pid] - xyz[f]) < 0.05, (f, lm[pid], xyz[f])
        assert pt0[f] == pid          # bound in the neighbor too
        hits += 1
    assert hits >= N_NEW - 2

    # no duplicate landmarks: each new feature got a distinct slot
    new_ids = pt1[N_BOUND:n]
    new_ids = new_ids[new_ids >= 0]
    assert len(set(new_ids.tolist())) == len(new_ids)
