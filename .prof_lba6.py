import time, functools, numpy as np, jax, jax.numpy as jnp
from orb_slam2_e_tpu.ops.camera import Camera
from orb_slam2_e_tpu.models.system import SlamSystem, SystemConfig, Sensor
from orb_slam2_e_tpu.models import local_mapping as LMOD
from orb_slam2_e_tpu.ops import ba, lie, scatter
from orb_slam2_e_tpu.models.frame import scale_invsigma2
from orb_slam2_e_tpu.models.map_state import INVALID
from orb_slam2_e_tpu.utils.synthetic import SyntheticScene, orbit_trajectory

W, H = 640, 480
scene = SyntheticScene(n_points=600, seed=1, width=W, height=H, fx=500,
                       fy=500, cx=W/2, cy=H/2)
poses, centers = orbit_trajectory(n_frames=30, radius=1.2, forward=0.05)
images = [scene.render(R, t) for R, t in poses]
cam = Camera.create(fx=500, fy=500, cx=W/2, cy=H/2, width=W, height=H)
cfg = SystemConfig(max_keyframes=64, max_points=16384, n_features=1000,
                   n_levels=8, max_frames_between_kf=6,
                   min_init_matches=80, loop_closing=False)
sysm = SlamSystem(cam, cfg, Sensor.MONOCULAR)
for k, img in enumerate(images):
    sysm.track_monocular(img, k / 30.0)
mcfg = sysm.map_cfg
st0 = sysm.map
kf = jnp.int32(max(sysm.last_kf_slot, 0))


def timeit(name, fn, n=6):
    jax.block_until_ready(fn(0.0))
    t0 = time.perf_counter()
    for i in range(n):
        r = fn(float(i + 1) * 1e-7)
    jax.block_until_ready(r)
    print(f"{name:40s} {(time.perf_counter()-t0)/n*1000:8.2f} ms", flush=True)


def extract_window(state, kf):
    """The window-extraction prefix of local_ba (everything before ba_solve)."""
    cfg = mcfg
    covis = state.covisibility_row(kf)
    free_w, free_ids = jax.lax.top_k(covis, min(cfg.ba_cams - 1,
                                                covis.shape[0]))
    free_mask = jnp.zeros((state.K,), bool).at[free_ids].max(free_w >= 15)
    free_mask = free_mask.at[kf].set(True)
    in_free = free_mask[:, None] & state.kf_kp_valid & (state.kf_kp_point >= 0)
    lm_mask = jnp.zeros((state.P,), bool).at[
        jnp.where(in_free, state.kf_kp_point, 0)].max(in_free)
    lm_mask &= state.lm_valid
    (pids,) = jnp.nonzero(lm_mask, size=cfg.ba_points, fill_value=0)
    p_ok = jnp.arange(cfg.ba_points) < jnp.sum(lm_mask)
    sees_local = jnp.zeros((state.P,), bool).at[
        jnp.where(p_ok, pids, 0)].max(p_ok)
    kf_sees = jnp.any(
        sees_local[jnp.where(state.kf_kp_point >= 0, state.kf_kp_point, 0)]
        & (state.kf_kp_point >= 0) & state.kf_kp_valid, axis=1)
    fixed_mask = kf_sees & state.kf_valid & ~free_mask
    (fixed_ids,) = jnp.nonzero(fixed_mask, size=cfg.ba_fixed, fill_value=0)
    fix_ok = jnp.arange(cfg.ba_fixed) < jnp.sum(fixed_mask)
    (free_idsc,) = jnp.nonzero(free_mask, size=cfg.ba_cams, fill_value=0)
    free_ok = jnp.arange(cfg.ba_cams) < jnp.sum(free_mask)
    cam_ids = jnp.concatenate([free_idsc, fixed_ids])
    cam_ok = jnp.concatenate([free_ok, fix_ok])
    cam_free = jnp.concatenate([free_ok, jnp.zeros_like(fix_ok)])
    cam_free &= cam_ids != 0
    p_row = jnp.full((state.P,), INVALID).at[
        jnp.where(p_ok, pids, 0)].max(
        jnp.where(p_ok, jnp.arange(cfg.ba_points, dtype=jnp.int32), INVALID))
    kp_pt = state.kf_kp_point[cam_ids]
    kp_ok = state.kf_kp_valid[cam_ids] & (kp_pt >= 0) & cam_ok[:, None]
    prow = p_row[jnp.where(kp_pt >= 0, kp_pt, 0)]
    o_ok = kp_ok & (prow >= 0)
    flat_ok = o_ok.reshape(-1)
    (o_sel,) = jnp.nonzero(flat_ok, size=cfg.ba_obs, fill_value=0)
    o_live = jnp.arange(cfg.ba_obs) < jnp.sum(flat_ok)
    o_cam = (o_sel // state.F).astype(jnp.int32)
    o_feat = o_sel % state.F
    o_point = prow.reshape(-1)[o_sel]
    uvr = state.kf_kp_uvr[cam_ids].reshape(-1, 3)[o_sel]
    octv = state.kf_kp_octave[cam_ids].reshape(-1)[o_sel]
    prob = ba.BAProblem(
        cam_pose7=state.kf_pose7[cam_ids], cam_free=cam_free,
        points=state.lm_xyz[pids], point_valid=p_ok,
        obs_cam=o_cam, obs_point=jnp.where(o_live, o_point, 0),
        obs_uvr=uvr, obs_inv_sigma2=scale_invsigma2(octv, cfg.scale_factor),
        obs_valid=o_live)
    return prob, cam_ids, cam_ok, cam_free, pids, p_ok, o_cam, o_feat, o_live


ex_jit = jax.jit(extract_window)
timeit("window extraction only",
       lambda s: ex_jit(st0._replace(lm_xyz=st0.lm_xyz + s), kf)[0].points)

prob = jax.block_until_ready(ex_jit(st0, kf))[0]
solve_jit = jax.jit(functools.partial(ba.ba_solve, iters_phase1=mcfg.ba_iters1,
                                      iters_phase2=mcfg.ba_iters2))
timeit("ba_solve 4+6 (fixed prob)",
       lambda s: solve_jit(cam, prob._replace(
           points=prob.points + s)).cam_pose7)
timeit("local_ba full",
       lambda s: LMOD.local_ba(cam, mcfg,
                               st0._replace(lm_xyz=st0.lm_xyz + s), kf)[1])
