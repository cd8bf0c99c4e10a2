"""Non-rigid pose optimization: FEM-regularized relocalization.

Functional equivalent of reference Optimizer::PoseOptimizationNR
(src/Optimizer.cc:478-834, SURVEY.md §3.4), the deformable-SLAM centerpiece:
optimize the frame pose AND the tracked landmark positions (the map is
allowed to deform), with reprojection edges to the frame and to every
observing keyframe (all keyframes fixed), while each LM trial's
accept/reject cost is augmented with the FEM strain energy of the current
landmark displacements:

    tempChi = w_rE * reprojChi2 + w_sE * nsE      (w_rE = 1, w_sE = 5;
                                                   2 on the first trial —
    reference optimization_algorithm_levenberg.cpp:184-198)

Pipeline per relocalization attempt (reference Optimizer.cc:719-788):
mesh build (host Delaunay, ops/fem.build_mesh) -> batched element stiffness
-> 4 x 10 LM iterations with strain-energy-augmented cost -> outlier
reclassification -> write back pose + moved landmarks.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import lie, ba, fem
from ..ops.camera import Camera
from ..ops import camera as cam_ops
from .frame import Frame, scale_invsigma2
from .map_state import MapState, INVALID
from .tracking import TrackConfig


class NRConfig(NamedTuple):
    el_type: int = 1          # RelocParam.nElType: 1 = C3D6, 2 = C3D8
    n_fixed_kfs: int = 8      # observing keyframes included (fixed)
    obs_cap: int = 8192
    pts_cap: int = 1024       # tracked landmark capacity (= frame F typically)
    mesh_nodes: int = 4096
    mesh_elems: int = 4096
    w_se: float = fem.W_SE
    mode2: bool = False       # propagate deformation to untracked in-frustum
                              # landmarks (the reference's mode-2 path,
                              # Optimizer.cc:812-828 / FEA2 Compute(2) —
                              # shipped disabled there too)
    mode2_cap: int = 1024     # untracked landmark capacity for mode 2


@functools.partial(jax.jit, static_argnames=('cfg', 'nr'))
def _gather_problem(cam: Camera, cfg: TrackConfig, nr: NRConfig,
                    state: MapState, frame: Frame):
    """Build the BA problem: camera 0 = frame (free), cameras 1.. = top
    observing keyframes (fixed); points = the frame's tracked landmarks
    (reference Optimizer.cc:500-709: frame vertex free, KF vertices fixed,
    point vertices FREE). Returns (prob, lm_ids, lm_rows_valid)."""
    pid = frame.point_ids
    okp = (pid >= 0) & frame.valid
    P_cap = nr.pts_cap
    (rows,) = jnp.nonzero(okp, size=P_cap, fill_value=0)
    # fill slots alias row 0 (which may itself be valid) — mark padding by
    # position, not by looking up okp
    row_ok = jnp.arange(P_cap) < jnp.sum(okp)
    lm_ids = jnp.where(row_ok, pid[rows], 0)
    # which KFs observe these landmarks — vote and take top n_fixed_kfs
    marker = jnp.zeros((state.P,), jnp.int32).at[lm_ids].max(
        row_ok.astype(jnp.int32))
    kf_pt = jnp.where(state.kf_kp_valid, state.kf_kp_point, 0)
    hits = marker[kf_pt] * (state.kf_kp_point >= 0) * state.kf_kp_valid
    votes = jnp.sum(hits, axis=1) * state.kf_valid
    top_v, top_k = jax.lax.top_k(votes, nr.n_fixed_kfs)
    kf_ok = top_v > 0

    # observations from frame (camera 0)
    inv_sig_f = scale_invsigma2(frame.octave[rows], cfg.scale_factor)
    o1_cam = jnp.zeros((P_cap,), jnp.int32)
    o1_pt = jnp.arange(P_cap, dtype=jnp.int32)
    o1_uvr = frame.uvr[rows]
    o1_ok = row_ok

    # observations from fixed KFs
    p_row = jnp.full((state.P,), INVALID).at[lm_ids].max(
        jnp.where(row_ok, jnp.arange(P_cap, dtype=jnp.int32), INVALID))
    kp_pt = state.kf_kp_point[top_k]                       # (Nk, F)
    kp_ok = state.kf_kp_valid[top_k] & (kp_pt >= 0) & kf_ok[:, None]
    prow = p_row[jnp.where(kp_pt >= 0, kp_pt, 0)]
    o_ok = kp_ok & (prow >= 0)
    flat_ok = o_ok.reshape(-1)
    (sel,) = jnp.nonzero(flat_ok, size=nr.obs_cap - P_cap, fill_value=0)
    live = jnp.arange(nr.obs_cap - P_cap) < jnp.sum(flat_ok)
    o2_cam = (sel // state.F + 1).astype(jnp.int32)
    o2_pt = prow.reshape(-1)[sel]
    o2_uvr = state.kf_kp_uvr[top_k].reshape(-1, 3)[sel]
    o2_sig = scale_invsigma2(
        state.kf_kp_octave[top_k].reshape(-1)[sel], cfg.scale_factor)

    prob = ba.BAProblem(
        cam_pose7=jnp.concatenate([frame.pose7[None], state.kf_pose7[top_k]]),
        cam_free=jnp.zeros((1 + nr.n_fixed_kfs,), bool).at[0].set(True),
        points=state.lm_xyz[lm_ids],
        point_valid=row_ok,
        obs_cam=jnp.concatenate([o1_cam, o2_cam]),
        obs_point=jnp.concatenate([o1_pt, jnp.where(live, o2_pt, 0)]),
        obs_uvr=jnp.concatenate([o1_uvr, o2_uvr]),
        obs_inv_sigma2=jnp.concatenate([inv_sig_f, o2_sig]),
        obs_valid=jnp.concatenate([o1_ok, live]),
    )
    return prob, rows, lm_ids, row_ok


@functools.partial(jax.jit, static_argnames=('el_type',))
def _ba_solve_nr(cam: Camera, prob: ba.BAProblem, mesh: fem.FemMesh,
                 parent_map, w_se, el_type: int = 1):
    """Strain-energy-augmented BA, compiled once per mesh capacity.

    Element stiffness is computed INSIDE the jit: eager
    element_stiffness_batch dispatched dozens of small ops over the
    remote-TPU tunnel per reloc attempt (VERDICT r4 weak #5 — timeNR was
    ~4.9 s/attempt, dominated by exactly this host-driven churn).
    el_type is static (element_stiffness_batch branches on it in Python)."""
    mesh = mesh._replace(el_type=el_type)
    ke_all = fem.element_stiffness_batch(mesh)

    def extra_cost(pts):
        tracked = pts[parent_map]
        node_pos = fem.node_positions(mesh, tracked)
        return w_se * fem.strain_energy(mesh, ke_all, node_pos)

    return ba.ba_solve(cam, prob, iters_phase1=10, iters_phase2=10,
                       extra_cost_fn=extra_cost)


@jax.jit
def _project_points(cam: Camera, pose7, pts):
    R, t = lie.pose7_unpack(pose7)
    return cam_ops.project(cam, lie.se3_apply(R, t, pts))[0]


@functools.partial(jax.jit, static_argnames=('el_type',))
def _mode2_solve(mesh: fem.FemMesh, d_pin, fixed, el_type: int = 1):
    """Mode-2 elastic propagation in ONE device dispatch: element
    stiffness + b = -K d_pin + constrained Jacobi-CG equilibrium."""
    mesh = mesh._replace(el_type=el_type)
    ke_all = fem.element_stiffness_batch(mesh)
    b = -fem.stiffness_matvec(mesh, ke_all, d_pin)
    return fem.solve_displacement(mesh, ke_all, b, fixed, iters=64)


def pose_optimization_nr(cam: Camera, cfg: TrackConfig, nr: NRConfig,
                         state: MapState, frame: Frame,
                         return_prop: bool = False):
    """Run the FEM-regularized pose+points optimization.

    Host orchestration: gathers the problem, builds the mesh (Delaunay on
    the frame projections), then runs the jitted strain-augmented BA.
    Returns (frame', state', n_good, ok); with return_prop=True a 5th
    element carries the mode-2 propagation closure (or None) so the caller
    can defer the expensive untracked-landmark propagation until the NR
    result actually WINS a stage — running it on losing branches was a
    large share of the 4.9 s/attempt r4 latency."""
    prob, rows, lm_ids, row_ok = _gather_problem(cam, cfg, nr, state, frame)
    # ONE packed device->host transfer for everything the host meshing
    # needs (each device_get over the tunnel costs a full ~23 ms RTT)
    uv_d = _project_points(cam, frame.pose7, prob.points)
    pts_np, ok_np, uv_np = jax.device_get((prob.points, row_ok, uv_d))
    n_pts = int(ok_np.sum())
    if n_pts < 12:
        return ((frame, state, 0, False, None) if return_prop
                else (frame, state, 0, False))
    idx_real = np.where(ok_np)[0]
    mesh = fem.build_mesh(pts_np[idx_real], uv_np[idx_real],
                          el_type=nr.el_type, max_nodes=nr.mesh_nodes,
                          max_elems=nr.mesh_elems)
    if mesh is None:
        return ((frame, state, 0, False, None) if return_prop
                else (frame, state, 0, False))
    # map mesh parent indices (into idx_real order) -> problem point rows,
    # padded to pts_cap so every reloc attempt reuses one compilation
    pm = np.zeros((nr.pts_cap,), np.int32)
    pm[:len(idx_real)] = idx_real
    parent_map = jnp.asarray(pm)

    res = _ba_solve_nr(cam, prob, mesh, parent_map, jnp.float32(nr.w_se),
                       el_type=mesh.el_type)
    inl = res.obs_inlier[:nr.pts_cap]
    n_good = int(jnp.sum(inl))
    # write back: frame pose + moved landmark positions; unbind the frame's
    # OUTLIER associations so subsequent widened projection searches can
    # rebind those features (reference nulls mvbOutlier entries right after
    # each dual optimization stage, Tracking.cc:1990-1993)
    drop_rows = jnp.where(row_ok & ~inl, rows, frame.F)
    frame = frame._replace(
        pose7=res.cam_pose7[0],
        point_ids=frame.point_ids.at[drop_rows].set(INVALID, mode='drop'))
    from ..ops.scatter import masked_set
    moved = row_ok
    state = state._replace(
        lm_xyz=masked_set(state.lm_xyz, lm_ids, moved, res.points),
        lm_rigid=masked_set(state.lm_rigid, lm_ids, moved, jnp.int8(2)))
    prop = None
    if nr.mode2:
        f_cap, s_cap = frame, state

        def prop(st=s_cap):
            return propagate_untracked(cam, nr, st, f_cap, lm_ids, row_ok,
                                       pts_np, np.asarray(res.points))
        if not return_prop:
            state = prop()
            prop = None
    if return_prop:
        return frame, state, n_good, True, prop
    return frame, state, n_good, True


def propagate_untracked(cam: Camera, nr: NRConfig, state: MapState,
                        frame: Frame, lm_ids, row_ok,
                        old_pts: np.ndarray, new_pts: np.ndarray):
    """Mode-2 deformation propagation (reference FEA2::Compute(2) +
    ComputeNewDisplacement, FEA2.cc:1914-1917; caller Optimizer.cc:812-828):
    untracked in-frustum landmarks are joined with the tracked set into one
    mesh; tracked node displacements (from the NR optimization) act as
    Dirichlet data and the elastic equilibrium K a = 0 (with those
    constraints) moves the untracked nodes.

    The reference inverts the dense K (FEA2.cc:1661); here it is a
    Jacobi-CG on the matrix-free operator (ops/fem.solve_displacement)."""
    # ONE packed device->host transfer for all the host-side set algebra
    R, t = lie.pose7_unpack(frame.pose7)
    uv_all, z_all = cam_ops.project(cam, lie.se3_apply(R, t, state.lm_xyz))
    (ok_np, lm_ids_np, uv_np, z_np, lmv_np, lm_xyz_np) = jax.device_get(
        (row_ok, lm_ids, uv_all, z_all, state.lm_valid, state.lm_xyz))
    tracked_ids = lm_ids_np[ok_np]
    d_tracked = (new_pts - old_pts)[ok_np]                 # (Nt, 3)
    # untracked in-frustum landmarks
    W, H = float(cam.width), float(cam.height)
    in_img = ((z_np > 0.05) & (uv_np[:, 0] >= 0) & (uv_np[:, 0] < W)
              & (uv_np[:, 1] >= 0) & (uv_np[:, 1] < H))
    untracked = lmv_np & in_img
    untracked[tracked_ids] = False
    un_ids = np.where(untracked)[0]
    if len(un_ids) > nr.mode2_cap:
        # keep the untracked landmarks NEAREST the tracked surface — those
        # are the ones the elastic propagation is meaningful for (native
        # grid-hash KNN, the PCL KdTree stand-in; orb_slam2_e_tpu/native)
        tracked_xyz = np.ascontiguousarray(old_pts[ok_np], np.float32)
        un_xyz = lm_xyz_np[un_ids].astype(np.float32)
        from ..native import knn as native_knn
        span = float(np.ptp(tracked_xyz, axis=0).max()) + 1e-6
        nb = native_knn(tracked_xyz, un_xyz, k=1, cell=span / 8)
        if nb is not None:
            safe = np.clip(nb[:, 0], 0, len(tracked_xyz) - 1)
            d = np.linalg.norm(un_xyz - tracked_xyz[safe], axis=1)
            d[nb[:, 0] < 0] = np.inf
            un_ids = un_ids[np.argsort(d)[:nr.mode2_cap]]
        else:
            un_ids = un_ids[:nr.mode2_cap]
    if len(un_ids) < 4:
        return state
    union_ids = np.concatenate([tracked_ids, un_ids])
    pts_u = lm_xyz_np[union_ids].copy()
    pts_u[:len(tracked_ids)] = old_pts[ok_np]   # mesh in the REFERENCE config
    uv_u = uv_np[union_ids]
    mesh = fem.build_mesh(pts_u, uv_u, el_type=1,
                          max_nodes=2 * nr.mesh_nodes,
                          max_elems=2 * nr.mesh_elems)
    if mesh is None:
        return state
    M = mesh.u0.shape[0]
    half = M // 2
    n_union = len(union_ids)
    n_tracked = len(tracked_ids)
    # Pin BOTH layers of the tracked columns at the tracked displacement
    # (the reference's Set_uf moves layer-2 rigidly with layer-1,
    # FEA2.cc:1732-1796 — pinning layer-2 at zero would put the tracked
    # columns in artificial shear and flip the sign of the propagated
    # field); both layers of the untracked columns are free.
    fixed = np.ones((M,), bool)
    fixed[n_tracked:n_union] = False
    fixed[half + n_tracked:half + n_union] = False
    d_pin = np.zeros((M, 3), np.float32)
    d_pin[:n_tracked] = d_tracked
    d_pin[half:half + n_tracked] = d_tracked
    # one fused device dispatch: element stiffness + K.d_pin + Jacobi-CG
    a = np.asarray(_mode2_solve(mesh, jnp.asarray(d_pin),
                                jnp.asarray(fixed), el_type=mesh.el_type))
    disp_un = a[n_tracked:n_union]
    new_xyz = lm_xyz_np.copy()
    new_xyz[un_ids] = new_xyz[un_ids] + disp_un
    return state._replace(
        lm_xyz=jnp.asarray(new_xyz),
        lm_rigid=state.lm_rigid.at[jnp.asarray(un_ids)].set(jnp.int8(2)))


def set_rigidity_flags(state: MapState, frame: Frame,
                       rigid: bool) -> MapState:
    """Tag the frame's tracked landmarks rigid / non-rigid (E-addition,
    reference Tracking::SetRigidityFlag, src/Tracking.cc:2242-2268)."""
    from ..ops.scatter import masked_set
    pid = frame.point_ids
    okp = (pid >= 0) & frame.valid
    flag = jnp.int8(1 if rigid else 2)
    return state._replace(
        lm_rigid=masked_set(state.lm_rigid, pid, okp, flag))
