"""Keyframe lifecycle: monotonic sequence ids, landmark culling windows
after slot recycling, and scale-aware redundancy culling.

VERDICT r3 #7: slots are storage, kf_seq is identity — after a cull, a new
keyframe may occupy a LOWER slot than older keyframes, and every
newer/older comparison must still be correct. Reference semantics:
KeyFrame::mnId (monotone), MapPointCulling 2-3-KF window
(src/LocalMapping.cc:170-241), KeyFrameCulling same-or-finer-scale
redundancy (src/LocalMapping.cc:700-763)."""

import numpy as np
import jax.numpy as jnp

from orb_slam2_e_tpu.ops import lie
from orb_slam2_e_tpu.models.map_state import MapState
from orb_slam2_e_tpu.models.local_mapping import (
    MappingConfig, cull_map_points, cull_keyframes)


def _add_kf(state, slot, t, kp_pt=(), octave=()):
    F = state.F
    n = len(kp_pt)
    kp_uvr = np.full((F, 3), -1.0, np.float32)
    kp_uvr[:n, :2] = 100.0
    kp_ok = np.zeros(F, bool)
    kp_ok[:n] = True
    kp_point = np.full(F, -1, np.int32)
    kp_point[:n] = kp_pt
    octv = np.zeros(F, np.int32)
    octv[:n] = octave if len(octave) else 0
    pose = lie.pose7_pack(jnp.eye(3), jnp.asarray(t, jnp.float32))
    return state.add_keyframe(
        slot, pose, slot, 0.0, jnp.asarray(kp_uvr), jnp.asarray(octv),
        jnp.zeros(F), jnp.asarray(kp_ok), jnp.zeros((F, 32), jnp.uint8),
        jnp.asarray(kp_point))


def _birth(state, pid, xyz, first_seq):
    return state._replace(
        lm_xyz=state.lm_xyz.at[pid].set(jnp.asarray(xyz, jnp.float32)),
        lm_valid=state.lm_valid.at[pid].set(True),
        lm_first_seq=state.lm_first_seq.at[pid].set(jnp.int32(first_seq)),
    )


def test_kf_seq_monotone_after_slot_reuse():
    state = MapState.create(max_keyframes=8, max_features=16, max_points=64)
    for s in range(4):
        state = _add_kf(state, s, [0.1 * s, 0, 0])
    assert [int(x) for x in state.kf_seq[:4]] == [0, 1, 2, 3]
    state = state.remove_keyframe(jnp.int32(1))
    # next free slot is the recycled one...
    slot = int(state.free_kf_slot())
    assert slot == 1
    state = _add_kf(state, slot, [0.9, 0, 0])
    # ...but its sequence id is strictly newer than every other keyframe
    assert int(state.kf_seq[1]) == 4
    assert int(state.next_seq) == 5


def test_cull_window_uses_seq_not_slot():
    """Current KF sits in a RECYCLED low slot; the 2-3-KF age window must
    still behave as if it were the newest keyframe."""
    state = MapState.create(max_keyframes=8, max_features=16, max_points=64)
    # seq 0..4 in slots 0..4, then cull slot 1 and insert seq 5 into it
    for s in range(5):
        state = _add_kf(state, s, [0.1 * s, 0, 0])
    state = state.remove_keyframe(jnp.int32(1))
    cur = int(state.free_kf_slot())          # slot 1, seq 5
    # landmark A: born at seq 3, observed only once -> age 2 >= 2, culled
    state = _birth(state, 0, [0, 0, 5.0], first_seq=3)
    # landmark B: born at seq 0 -> age 5 > 3, grandfathered, kept
    state = _birth(state, 1, [1, 0, 5.0], first_seq=0)
    state = _add_kf(state, cur, [0.5, 0, 0], kp_pt=[0, 1])
    cfg = MappingConfig(cull_obs_th=2)
    out, n = cull_map_points(cfg, state, jnp.int32(cur))
    # slot arithmetic would compute age = 1 - 3 = -2 for A and keep it
    assert not bool(out.lm_valid[0]), "A must be culled (seq age 2)"
    assert bool(out.lm_valid[1]), "B must be grandfathered (seq age 5)"
    assert int(n) == 1


def _redundancy_scene(other_octave: int):
    """Candidate KF (slot 1) observes ONLY 8 shared points at octave 0;
    current KF (slot 2) and three more KFs (3, 4, 5) observe them at
    `other_octave` PLUS 8 unique points each (so the observers themselves
    are never >= 90% redundant)."""
    state = MapState.create(max_keyframes=8, max_features=32, max_points=64)
    shared = list(range(8))
    state = _add_kf(state, 0, [0, 0, 0])                      # origin anchor
    nxt = 8
    for p in shared:
        state = _birth(state, p, [p * 0.1, 0, 5.0], first_seq=0)
    state = _add_kf(state, 1, [0.1, 0, 0], kp_pt=shared,
                    octave=[0] * 8)                            # candidate
    for s in (2, 3, 4, 5):                                    # 2 = current
        uniq = list(range(nxt, nxt + 8))
        nxt += 8
        for p in uniq:
            state = _birth(state, p, [p * 0.05, 0.5, 6.0], first_seq=0)
        state = _add_kf(state, s, [0.1 * s, 0, 0], kp_pt=shared + uniq,
                        octave=[other_octave] * 8 + [0] * 8)
    return state


def test_cull_keyframes_scale_aware():
    cfg = MappingConfig(n_levels=8)
    # others observe at the SAME scale -> candidate is redundant -> culled;
    # the observers each keep 8 unique points (ratio 0.5) -> no 2nd victim
    state = _redundancy_scene(other_octave=0)
    out, victims = cull_keyframes(cfg, state, jnp.int32(2))
    assert int(victims[0]) == 1
    assert not bool(out.kf_valid[1])
    assert int(victims[1]) < 0
    # others observe 3 octaves COARSER -> their observations do not count
    # as redundant at the candidate's finer scale -> no cull at all
    state = _redundancy_scene(other_octave=3)
    out, victims = cull_keyframes(cfg, state, jnp.int32(2))
    assert int(victims[0]) < 0 and int(victims[1]) < 0


def test_cull_keyframes_two_victims_sequential_evidence():
    """Two fully-redundant covisible KFs: both may go in one pass, but only
    because the second round re-counts after the first removal; with only
    4 observers total, removing one leaves 3 others -> still redundant."""
    state = MapState.create(max_keyframes=8, max_features=16, max_points=64)
    pts = list(range(8))
    state = _add_kf(state, 0, [0, 0, 0])
    for p in pts:
        state = _birth(state, p, [p * 0.1, 0, 5.0], first_seq=0)
    for s in (1, 2, 3, 4, 5):
        state = _add_kf(state, s, [0.1 * s, 0, 0], kp_pt=pts,
                        octave=[0] * 8)
    cfg = MappingConfig(n_levels=8)
    out, victims = cull_keyframes(cfg, state, jnp.int32(2))
    v = sorted(int(x) for x in victims)
    # 5 observers per point: after removing one, 4 remain -> second victim
    # still has >= 3 other same-scale observers -> also culled
    assert v[0] >= 0 and v[1] >= 0 and v[0] != v[1]
    assert not bool(out.kf_valid[v[0]]) and not bool(out.kf_valid[v[1]])
    # current KF and origin are never victims
    assert 2 not in v and 0 not in v
