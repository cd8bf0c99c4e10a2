"""Essential-graph optimization: Gauss-Newton over Sim(3) keyframe poses.

Equivalent of reference Optimizer::OptimizeEssentialGraph (src/Optimizer.cc:
1165-1428): Sim3 vertices per keyframe, Sim3 edges over loop edges, spanning
tree, and strong-covisibility edges (weight >= 100), followed by SE3
recovery [R, t/s].

TPU-first: residuals/Jacobians for all edges are computed batched with
forward-mode autodiff and scattered into a dense (7K, 7K) system — for the
keyframe counts this framework targets per ring (K <= few hundred) a dense
Cholesky beats sparse bookkeeping on the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import lie


def _sim3_err(xi_i, xi_j, Si8, Sj8, Mij8):
    """Edge residual: log( Mij^-1 * (exp(xi_i) Si) * (exp(xi_j) Sj)^-1 ).

    Mij is the measured relative Sim3 Si * Sj^-1 at graph-build time."""
    Ri, ti, si = lie.sim8_unpack(Si8)
    Rj, tj, sj = lie.sim8_unpack(Sj8)
    dRi, dti, dsi = lie.sim3_exp(xi_i)
    dRj, dtj, dsj = lie.sim3_exp(xi_j)
    Ri, ti, si = lie.sim3_compose(dRi, dti, dsi, Ri, ti, si)
    Rj, tj, sj = lie.sim3_compose(dRj, dtj, dsj, Rj, tj, sj)
    Rji, tji, sji = lie.sim3_inverse(Rj, tj, sj)
    Rr, tr, sr = lie.sim3_compose(Ri, ti, si, Rji, tji, sji)   # Si * Sj^-1
    Rm, tm, sm = lie.sim8_unpack(Mij8)
    Rmi, tmi, smi = lie.sim3_inverse(Rm, tm, sm)
    Re, te, se = lie.sim3_compose(Rmi, tmi, smi, Rr, tr, sr)
    return lie.sim3_log(Re, te, se)


@functools.partial(jax.jit, static_argnames=('n_iters',))
def optimize_pose_graph(sim8: jnp.ndarray, kf_valid: jnp.ndarray,
                        fixed: jnp.ndarray, edges_i: jnp.ndarray,
                        edges_j: jnp.ndarray, meas8: jnp.ndarray,
                        edge_valid: jnp.ndarray, n_iters: int = 20):
    """Gauss-Newton on the Sim3 pose graph.

    sim8: (K, 8) initial/corrected keyframe Sim3 (Scw); fixed: (K,) bool
    (the loop keyframe is fixed, reference Optimizer.cc:1190-1230);
    edges_*: (E,) endpoints; meas8: (E, 8) relative measurements Si*Sj^-1.
    Returns optimized (K, 8)."""
    K = sim8.shape[0]

    err_fn = jax.vmap(_sim3_err, in_axes=(0, 0, 0, 0, 0))
    jac_fn = jax.vmap(jax.jacfwd(_sim3_err, argnums=(0, 1)),
                      in_axes=(0, 0, 0, 0, 0))

    w = edge_valid.astype(jnp.float32)

    def edge_cost(cur8):
        zeros = jnp.zeros((edges_i.shape[0], 7))
        r = err_fn(zeros, zeros, cur8[edges_i], cur8[edges_j], meas8)
        return jnp.sum(r * r * w[:, None])

    def lm_iter(carry, _):
        # Levenberg-Marquardt with accept/reject: pure Gauss-Newton here is
        # unstable at the optimum — the gradient is ~f32 noise, and the
        # near-singular solve amplifies it into a large step that throws the
        # graph away from the solution (observed cost oscillation 1e-6<->13).
        # Mirrors the reference's LM in optimization_algorithm_levenberg.cpp.
        cur8, lam = carry
        zeros = jnp.zeros((edges_i.shape[0], 7))
        Si8 = cur8[edges_i]
        Sj8 = cur8[edges_j]
        r = err_fn(zeros, zeros, Si8, Sj8, meas8)            # (E, 7)
        Ji, Jj = jac_fn(zeros, zeros, Si8, Sj8, meas8)       # (E, 7, 7) x2
        H = jnp.zeros((K, K, 7, 7))
        g = jnp.zeros((K, 7))
        wJi = Ji * w[:, None, None]
        wJj = Jj * w[:, None, None]
        H = H.at[edges_i, edges_i].add(jnp.einsum('eij,eik->ejk', wJi, Ji))
        H = H.at[edges_j, edges_j].add(jnp.einsum('eij,eik->ejk', wJj, Jj))
        H = H.at[edges_i, edges_j].add(jnp.einsum('eij,eik->ejk', wJi, Jj))
        H = H.at[edges_j, edges_i].add(jnp.einsum('eij,eik->ejk', wJj, Ji))
        g = g.at[edges_i].add(jnp.einsum('eij,ei->ej', wJi, r))
        g = g.at[edges_j].add(jnp.einsum('eij,ei->ej', wJj, r))
        free = (kf_valid & ~fixed).astype(jnp.float32)
        Hf = H * free[:, None, None, None] * free[None, :, None, None]
        idx = jnp.arange(K)
        Hf = Hf.at[idx, idx].add(
            (1.0 - free)[:, None, None] * jnp.eye(7)
            + lam * jnp.eye(7))
        gf = g * free[:, None]
        Hd = Hf.transpose(0, 2, 1, 3).reshape(7 * K, 7 * K)
        dx = jnp.linalg.solve(Hd, -gf.reshape(-1)).reshape(K, 7)
        dx = dx * free[:, None]
        R, t, s = lie.sim8_unpack(cur8)
        dR, dt, ds = lie.sim3_exp(dx)
        cand8 = lie.sim8_pack(*lie.sim3_compose(dR, dt, ds, R, t, s))
        cost_cur = jnp.sum(r * r * w[:, None])
        cost_new = edge_cost(cand8)
        accept = cost_new < cost_cur
        next8 = jnp.where(accept, cand8, cur8)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-6),
                        jnp.minimum(lam * 10.0, 1e4))
        return (next8, lam), cost_cur

    (out8, _), costs = jax.lax.scan(
        lm_iter, (sim8, jnp.float32(1e-6)), None, length=n_iters)
    return out8, costs


def sim3_to_se3(sim8: jnp.ndarray):
    """Recover SE3 pose [R | t/s] from optimized Sim3
    (reference Optimizer.cc:1390-1400)."""
    R, t, s = lie.sim8_unpack(sim8)
    return lie.pose7_pack(R, t / s[..., None])


def build_relative_measurements(sim8_i, sim8_j):
    """Mij = Si * Sj^-1 for edge construction."""
    Ri, ti, si = lie.sim8_unpack(sim8_i)
    Rj, tj, sj = lie.sim8_unpack(sim8_j)
    Rji, tji, sji = lie.sim3_inverse(Rj, tj, sj)
    return lie.sim8_pack(*lie.sim3_compose(Ri, ti, si, Rji, tji, sji))
