import time, numpy as np, jax, jax.numpy as jnp
from orb_slam2_e_tpu.ops.camera import Camera
from orb_slam2_e_tpu.ops import ba, lie

rng = np.random.RandomState(0)
C, P, O = 64, 8192, 24576
cam = Camera.create(fx=500., fy=500., cx=320., cy=240., width=640., height=480.)
pts = rng.uniform([-3,-3,4],[3,3,10],(P,3)).astype(np.float32)
pose7 = np.tile(np.asarray([1,0,0,0,0,0,0],np.float32),(C,1))
pose7[:,4] = np.linspace(0,1.0,C)
pose7[:,5] = np.linspace(0,0.3,C)
obs_cam = rng.randint(0,C,O); obs_point = rng.randint(0,P,O)
xc = pts[obs_point] + pose7[obs_cam][:,4:7]
uv = np.stack([500*xc[:,0]/xc[:,2]+320, 500*xc[:,1]/xc[:,2]+240, np.full(O,-1.0)],1).astype(np.float32)
uv[:, :2] += rng.normal(0, 0.5, (O,2))
# perturb geometry so there is something to optimize
pts_n = pts + rng.normal(0, 0.05, (P,3)).astype(np.float32)
pose7_n = pose7.copy(); pose7_n[:,4:7] += rng.normal(0,0.02,(C,3)).astype(np.float32)
prob = ba.BAProblem(
    cam_pose7=jnp.asarray(pose7_n), cam_free=jnp.asarray(np.arange(C)>0),
    points=jnp.asarray(pts_n), point_valid=jnp.ones(P,bool),
    obs_cam=jnp.asarray(obs_cam,jnp.int32), obs_point=jnp.asarray(obs_point,jnp.int32),
    obs_uvr=jnp.asarray(uv), obs_inv_sigma2=jnp.ones(O), obs_valid=jnp.ones(O,bool))

def timeit(name, fn, n=5):
    r = jax.block_until_ready(fn())
    t0=time.perf_counter()
    for _ in range(n): r = fn()
    jax.block_until_ready(r)
    print(f"{name:34s} {(time.perf_counter()-t0)/n*1000:8.2f} ms  cost={float(r.final_cost):.4f}", flush=True)

timeit("ba_solve dense (5+10)", lambda: ba.ba_solve_jit(cam, prob))
timeit("ba_solve_pcg (15 outer, 30 cg)", lambda: ba.ba_solve_pcg_jit(cam, prob, n_outer=15, cg_iters=30))
timeit("ba_solve_pcg (15 outer, 12 cg)", lambda: ba.ba_solve_pcg_jit(cam, prob, n_outer=15, cg_iters=12))
timeit("ba_solve_pcg (8 outer, 12 cg)", lambda: ba.ba_solve_pcg_jit(cam, prob, n_outer=8, cg_iters=12))
