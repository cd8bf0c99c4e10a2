import time, functools, numpy as np, jax, jax.numpy as jnp
from orb_slam2_e_tpu.ops.camera import Camera
from orb_slam2_e_tpu.models.system import SlamSystem, SystemConfig, Sensor
from orb_slam2_e_tpu.models import local_mapping as LMOD
from orb_slam2_e_tpu.ops import ba
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
N = 8


def chain_time(name, fn_chained, n_chain=N):
    """fn_chained: jitted fn(state_like) -> state_like, data-dependent.
    Time N chained executions inside ONE outer loop (device-bound), sync
    once. Defeats replay caches AND loop hoisting."""
    r = jax.block_until_ready(fn_chained(st0.lm_xyz))  # compile
    t0 = time.perf_counter()
    x = st0.lm_xyz
    for _ in range(n_chain):
        x = fn_chained(x)
    jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / n_chain * 1000
    print(f"{name:44s} {dt:8.2f} ms", flush=True)


# chained local_ba: output xyz feeds next call
@jax.jit
def lba_chain(xyz):
    st = st0._replace(lm_xyz=xyz)
    st2, cost, clip = LMOD.local_ba(cam, mcfg, st, kf)
    return st2.lm_xyz

chain_time("local_ba (chained)", lba_chain)


# chained ba_solve on extracted problem
from importlib import import_module
ex = import_module("types")
# rebuild extraction inline (same as local_ba prefix) once:
probe = {}

@jax.jit
def extract(xyz):
    st = st0._replace(lm_xyz=xyz)
    # reuse local_ba internals by monkey timing: call with ba 0 iters?
    return st

# simpler: time ba_solve chained via points feedback using a fixed problem
C, P, O = 32, 4096, 12288
rng = np.random.RandomState(0)
pts = rng.uniform([-3, -3, 4], [3, 3, 10], (P, 3)).astype(np.float32)
pose7 = np.tile(np.asarray([1, 0, 0, 0, 0, 0, 0], np.float32), (C, 1))
pose7[:, 4] = np.linspace(0, 1.0, C)
obs_cam = rng.randint(0, C, O)
obs_point = rng.randint(0, P, O)
xc = pts[obs_point] + pose7[obs_cam][:, 4:7]
uv = np.stack([500 * xc[:, 0] / xc[:, 2] + 320,
               500 * xc[:, 1] / xc[:, 2] + 240,
               np.full(O, -1.0)], 1).astype(np.float32)
prob0 = ba.BAProblem(
    cam_pose7=jnp.asarray(pose7), cam_free=jnp.asarray(np.arange(C) > 0),
    points=jnp.asarray(pts), point_valid=jnp.ones(P, bool),
    obs_cam=jnp.asarray(obs_cam, jnp.int32),
    obs_point=jnp.asarray(obs_point, jnp.int32),
    obs_uvr=jnp.asarray(uv), obs_inv_sigma2=jnp.ones(O),
    obs_valid=jnp.ones(O, bool))


@jax.jit
def solve_chain(xyz):
    res = ba.ba_solve(cam, prob0._replace(points=xyz[:P] * 0.999 + 0.001
                                          * prob0.points),
                      iters_phase1=4, iters_phase2=6)
    out = jnp.zeros_like(xyz)
    return out.at[:P].set(res.points)

chain_time("ba_solve 4+6 dense prob (chained)", solve_chain)


@jax.jit
def solve_chain_s(xyz):
    res = ba.ba_solve(cam, prob0._replace(points=xyz[:P] * 0.999 + 0.001
                                          * prob0.points),
                      iters_phase1=1, iters_phase2=1)
    out = jnp.zeros_like(xyz)
    return out.at[:P].set(res.points)

chain_time("ba_solve 1+1 dense prob (chained)", solve_chain_s)
