"""Distributed bundle adjustment over a TPU device mesh.

The reference has NO distributed computing (SURVEY.md §2.4: 3 threads +
mutexes on one CPU). This module is the scale-out story the TPU build adds:
observations are sharded across devices; each device reduces its landmark
and camera partial blocks locally and `psum` over the ICI combines them —
the Schur-complement reduction of SURVEY.md §5:

  - per-device: residuals/Jacobians for its observation shard, partial
    Hpp (P, 3, 3), Hcc (C, 6, 6), gradients, and the two halves of the
    matrix-free Schur product S.x
  - psum over the mesh: exact global normal equations
  - every device then runs the identical PCG + LM update (replicated state)

Because observations reference landmarks/cameras by index and scatters are
additive, sharding the observation axis gives exact equality with the
single-device solve — verified by tests on a virtual 8-device CPU mesh.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map as _shard_map       # jax >= 0.8
except ImportError:                               # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map
import inspect as _inspect

# jax 0.9 renamed check_rep -> check_vma; disable replication checking under
# either name (outputs become replicated only through explicit psum).
_CHECK_KW = ('check_vma' if 'check_vma'
             in _inspect.signature(_shard_map).parameters else 'check_rep')


def shard_map(f, *, mesh, in_specs, out_specs):
    return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                      **{_CHECK_KW: False})

from ..ops import ba
from ..ops.camera import Camera


def make_mesh(n_devices: int | None = None, axis: str = 'obs') -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def pad_problem(prob: ba.BAProblem, n_shards: int) -> ba.BAProblem:
    """Pad the observation axis to a multiple of the shard count."""
    O = prob.obs_cam.shape[0]
    O_pad = -(-O // n_shards) * n_shards
    if O_pad == O:
        return prob
    pad = O_pad - O

    def padded(x, fill=0):
        return jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)])

    return prob._replace(
        obs_cam=padded(prob.obs_cam),
        obs_point=padded(prob.obs_point),
        obs_uvr=padded(prob.obs_uvr),
        obs_inv_sigma2=padded(prob.obs_inv_sigma2),
        obs_valid=padded(prob.obs_valid, False),
    )


def distributed_ba(cam: Camera, prob: ba.BAProblem, mesh: Mesh,
                   n_outer: int = 10, cg_iters: int = 30,
                   axis: str = 'obs') -> ba.BAResult:
    """Run ba_solve_pcg with observations sharded over `mesh`.

    Camera poses / landmark positions are replicated; observation arrays are
    sharded along the first axis; all reductions go through psum over ICI.
    """
    n_shards = mesh.devices.size
    prob = pad_problem(prob, n_shards)

    rep = P()
    shard = P(axis)
    in_specs = ba.BAProblem(
        cam_pose7=rep, cam_free=rep, points=rep, point_valid=rep,
        obs_cam=shard, obs_point=shard, obs_uvr=shard,
        obs_inv_sigma2=shard, obs_valid=shard)
    cam_spec = jax.tree.map(lambda _: rep, cam)
    out_spec = ba.BAResult(cam_pose7=rep, points=rep, obs_inlier=shard,
                           final_cost=rep)

    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(cam_spec, in_specs), out_specs=out_spec)
    def run(cam_l, prob_l):
        psum = lambda v: jax.lax.psum(v, axis)
        return ba.ba_solve_pcg(cam_l, prob_l, n_outer=n_outer,
                               cg_iters=cg_iters, psum=psum)

    return jax.jit(run)(cam, prob)


def dryrun_training_step(n_devices: int, n_cams: int = 8, n_pts: int = 64,
                         n_obs: int = 256):
    """Tiny-shape distributed BA step over an n_devices mesh — the
    multi-chip compile/execute validation path (driver `dryrun_multichip`).
    Returns the BAResult (already synced)."""
    rng = np.random.RandomState(0)
    from ..ops import lie
    cam = Camera.create(fx=300.0, fy=300.0, cx=128.0, cy=96.0)
    pts = rng.uniform([-2, -2, 4], [2, 2, 8], (n_pts, 3)).astype(np.float32)
    pose7 = np.tile(np.asarray([1, 0, 0, 0, 0, 0, 0], np.float32),
                    (n_cams, 1))
    pose7[:, 4] = np.linspace(0, 0.5, n_cams)
    obs_cam = rng.randint(0, n_cams, n_obs)
    obs_point = rng.randint(0, n_pts, n_obs)
    xc = pts[obs_point] + pose7[obs_cam][:, 4:7]
    uv = np.stack([300 * xc[:, 0] / xc[:, 2] + 128,
                   300 * xc[:, 1] / xc[:, 2] + 96,
                   np.full(n_obs, -1.0)], 1).astype(np.float32)
    prob = ba.BAProblem(
        cam_pose7=jnp.asarray(pose7),
        cam_free=jnp.asarray(np.arange(n_cams) > 0),
        points=jnp.asarray(pts),
        point_valid=jnp.ones(n_pts, bool),
        obs_cam=jnp.asarray(obs_cam, jnp.int32),
        obs_point=jnp.asarray(obs_point, jnp.int32),
        obs_uvr=jnp.asarray(uv),
        obs_inv_sigma2=jnp.ones(n_obs),
        obs_valid=jnp.ones(n_obs, bool),
    )
    mesh = make_mesh(n_devices)
    res = distributed_ba(cam, prob, mesh, n_outer=2, cg_iters=5)
    jax.block_until_ready(res.cam_pose7)
    return res
