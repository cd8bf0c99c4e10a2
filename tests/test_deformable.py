"""Non-rigid (FEM-regularized) pose optimization — the E centerpiece.

Scenario modeled on the reference's deformable relocalization evaluation
(SURVEY.md §3.3/§3.4, BASELINE.md reloc inliers rigid vs non-rigid): a map
is built on an undeformed surface; the surface then deforms; relocalizing
rigidly leaves many reprojection outliers, while the non-rigid optimization
moves the landmarks (paying FEM strain energy) and recovers more inliers.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orb_slam2_e_tpu.ops import lie
from orb_slam2_e_tpu.ops.camera import Camera
from orb_slam2_e_tpu.models.map_state import MapState
from orb_slam2_e_tpu.models.frame import Frame
from orb_slam2_e_tpu.models.tracking import TrackConfig, optimize_frame_pose
from orb_slam2_e_tpu.models import deformable as DEF


def build_deformed_problem(n_grid=9, defmag=0.15, seed=0, noise=0.3):
    """Map: grid surface at z=5 observed by 2 KFs. Frame observes the
    DEFORMED surface from a known pose."""
    rng = np.random.RandomState(seed)
    cam = Camera.create(fx=400.0, fy=400.0, cx=240.0, cy=180.0,
                        width=480, height=360)
    F = 128
    n = n_grid * n_grid
    xs, ys = np.meshgrid(np.linspace(-1.5, 1.5, n_grid),
                         np.linspace(-1.2, 1.2, n_grid))
    pts = np.stack([xs.ravel(), ys.ravel(), np.full(n, 5.0)], 1).astype(np.float32)
    # deformed surface: smooth multi-modal warp (a single centered bump can
    # be absorbed almost entirely by a rigid pose change; a rippled surface
    # cannot)
    pts_def = pts.copy()
    pts_def[:, 2] += defmag * (np.sin(2.3 * pts[:, 0]) *
                               np.cos(1.7 * pts[:, 1]))

    state = MapState.create(max_keyframes=8, max_features=F, max_points=256)

    def project(R, t, X):
        xc = (R @ X.T).T + t
        return np.stack([400 * xc[:, 0] / xc[:, 2] + 240,
                         400 * xc[:, 1] / xc[:, 2] + 180], 1), xc[:, 2]

    # two keyframes observing the UNDEFORMED map
    kf_poses = [(np.eye(3, dtype=np.float32), np.zeros(3, np.float32))]
    R1 = np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.1, 0.0])),
                    dtype=np.float32)
    kf_poses.append((R1, np.asarray([-0.3, 0, 0], np.float32)))

    state = state._replace(
        lm_xyz=state.lm_xyz.at[:n].set(jnp.asarray(pts)),
        lm_valid=state.lm_valid.at[:n].set(True),
    )
    for s, (R, t) in enumerate(kf_poses):
        uv, z = project(R, t, pts)
        uvr = np.concatenate([uv, np.full((n, 1), -1.0)], 1).astype(np.float32)
        kp_uvr = np.zeros((F, 3), np.float32)
        kp_uvr[:n] = uvr
        kp_pt = np.full(F, -1, np.int32)
        kp_pt[:n] = np.arange(n)
        kp_ok = np.zeros(F, bool)
        kp_ok[:n] = True
        state = state.add_keyframe(
            s, lie.pose7_pack(jnp.asarray(R), jnp.asarray(t)), s, 0.0,
            jnp.asarray(kp_uvr), jnp.zeros(F, jnp.int32), jnp.zeros(F),
            jnp.asarray(kp_ok), jnp.zeros((F, 32), jnp.uint8),
            jnp.asarray(kp_pt))

    # the query frame sees the DEFORMED surface from a known pose
    R_f = np.asarray(lie.so3_exp(jnp.asarray([0.02, -0.05, 0.01])),
                     dtype=np.float32)
    t_f = np.asarray([0.1, 0.05, -0.1], np.float32)
    uv_f, z_f = project(R_f, t_f, pts_def)
    uv_f += rng.randn(n, 2) * noise
    kp_uvr = np.zeros((F, 3), np.float32)
    kp_uvr[:n, :2] = uv_f
    kp_uvr[:, 2] = -1.0
    pid = np.full(F, -1, np.int32)
    pid[:n] = np.arange(n)
    ok = np.zeros(F, bool)
    ok[:n] = True
    frame = Frame(
        pose7=lie.pose7_pack(jnp.asarray(R_f), jnp.asarray(t_f)),
        uvr=jnp.asarray(kp_uvr), uv_raw=jnp.asarray(kp_uvr[:, :2]),
        octave=jnp.zeros(F, jnp.int32), angle=jnp.zeros(F),
        response=jnp.zeros(F), desc=jnp.zeros((F, 32), jnp.uint8),
        valid=jnp.asarray(ok), point_ids=jnp.asarray(pid),
        depth=jnp.full(F, -1.0))
    return cam, state, frame, pts, pts_def, (R_f, t_f)


@pytest.mark.parametrize("el_type", [1, 2])
def test_nr_beats_rigid_on_deformed_map(el_type):
    cam, state, frame, pts, pts_def, (R_f, t_f) = build_deformed_problem(
        defmag=0.25)
    cfg = TrackConfig(n_levels=4)
    # rigid: optimize pose only against the undeformed map
    frame_r, n_rigid = optimize_frame_pose(cam, cfg, state, frame)
    # non-rigid: pose + points with FEM regularization
    nr = DEF.NRConfig(el_type=el_type, pts_cap=128, obs_cap=1024,
                      n_fixed_kfs=4, mesh_nodes=1024, mesh_elems=1024)
    frame_nr, state_nr, n_nr, ran = DEF.pose_optimization_nr(
        cam, cfg, nr, state, frame)
    assert ran
    # the E result: non-rigid recovers more inliers on the deformed map
    # (reference StatsReloc nGoodR 18-58 -> nGoodNR 46-130)
    assert int(n_nr) > int(n_rigid), (int(n_nr), int(n_rigid))
    n = len(pts)
    assert int(n_nr) >= 0.8 * n


def test_nr_moves_landmarks_toward_deformed():
    cam, state, frame, pts, pts_def, _ = build_deformed_problem(defmag=0.25)
    cfg = TrackConfig(n_levels=4)
    nr = DEF.NRConfig(el_type=1, pts_cap=128, obs_cap=1024, n_fixed_kfs=4,
                      mesh_nodes=1024, mesh_elems=1024)
    _, state_nr, n_nr, ran = DEF.pose_optimization_nr(cam, cfg, nr, state,
                                                      frame)
    assert ran
    n = len(pts)
    moved = np.asarray(state_nr.lm_xyz[:n])
    # landmarks must actually move (the map deforms — reference writes back
    # SetWorldPos for ALL moved points, Optimizer.cc:797-809) ...
    assert np.linalg.norm(moved - pts, axis=1).mean() > 1e-3
    # ... and the reprojection error against the DEFORMED observations (the
    # optimization objective) must drop vs keeping the rigid map
    from orb_slam2_e_tpu.ops import camera as cam_ops
    R_f, t_f = lie.pose7_unpack(frame.pose7)
    uv_obs = np.asarray(frame.uvr[:n, :2])

    def reproj_err(P):
        uv, z = cam_ops.project(cam, lie.se3_apply(R_f, t_f, jnp.asarray(P)))
        return np.linalg.norm(np.asarray(uv) - uv_obs, axis=1).mean()

    assert reproj_err(moved) < reproj_err(pts)
    # rigidity flags updated
    assert (np.asarray(state_nr.lm_rigid[:n]) == 2).all()


def test_nr_pose_recovery_on_rigid_scene():
    """With NO deformation, NR must not harm: pose error stays small and
    strain energy keeps landmarks near their map positions."""
    cam, state, frame, pts, pts_def, (R_f, t_f) = build_deformed_problem(
        defmag=0.0, noise=0.2)
    cfg = TrackConfig(n_levels=4)
    nr = DEF.NRConfig(el_type=1, pts_cap=128, obs_cap=1024, n_fixed_kfs=4,
                      mesh_nodes=1024, mesh_elems=1024)
    frame_nr, state_nr, n_nr, ran = DEF.pose_optimization_nr(
        cam, cfg, nr, state, frame)
    assert ran
    n = len(pts)
    assert int(n_nr) >= 0.9 * n
    R, t = lie.pose7_unpack(frame_nr.pose7)
    assert np.linalg.norm(np.asarray(t) - t_f) < 0.05
    drift = np.linalg.norm(np.asarray(state_nr.lm_xyz[:n]) - pts, axis=1)
    assert np.median(drift) < 0.05


def test_mode2_propagates_to_untracked():
    """Mode-2: untracked in-frustum landmarks follow the elastic deformation
    of the tracked surface (reference FEA2::Compute(2)/ComputeNewDisplacement
    path, Optimizer.cc:812-828 — shipped disabled upstream)."""
    cam, state, frame, pts, pts_def, _ = build_deformed_problem(defmag=0.25)
    n = len(pts)
    # untrack the odd-index points: frame loses those bindings
    pid = np.asarray(frame.point_ids).copy()
    untracked_rows = np.arange(1, n, 2)
    pid[untracked_rows] = -1
    valid = np.asarray(frame.valid).copy()
    valid[untracked_rows] = False
    frame = frame._replace(point_ids=jnp.asarray(pid),
                           valid=jnp.asarray(valid))
    cfg = TrackConfig(n_levels=4)
    nr = DEF.NRConfig(el_type=1, pts_cap=128, obs_cap=1024, n_fixed_kfs=4,
                      mesh_nodes=1024, mesh_elems=1024, mode2=True,
                      mode2_cap=256)
    _, state_nr, n_nr, ran = DEF.pose_optimization_nr(cam, cfg, nr, state,
                                                      frame)
    assert ran
    moved = np.asarray(state_nr.lm_xyz[:n])
    un_ids = np.arange(1, n, 2)
    d_un = np.linalg.norm(moved[un_ids] - pts[un_ids], axis=1)
    # untracked landmarks moved (deformation propagated) ...
    assert d_un.mean() > 1e-4, d_un.mean()
    # ... and the propagated z-displacement correlates with the true
    # deformation field (elastic interpolation of the tracked neighbors)
    dz = moved[un_ids, 2] - pts[un_ids, 2]
    dz_true = pts_def[un_ids, 2] - pts[un_ids, 2]
    corr = np.corrcoef(dz, dz_true)[0, 1]
    assert corr > 0.3, corr
    # flagged non-rigid
    assert (np.asarray(state_nr.lm_rigid)[un_ids] == 2).all()
