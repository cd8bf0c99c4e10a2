"""Trajectory export/import in TUM and KITTI formats + ATE/RPE evaluation.

Parity targets:
- TUM format `t x y z qx qy qz qw` with camera-to-world pose
  (reference src/System.cc:336-410 SaveTrajectoryTUM /
   SaveKeyFrameTrajectoryTUM).
- KITTI format: 3x4 row-major camera-to-world matrix per line
  (reference src/System.cc:439-486 SaveTrajectoryKITTI).
- ATE RMSE after SE(3)/Sim(3) Umeyama alignment (the external evaluation
  protocol the reference README points to; SURVEY.md §6).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def save_tum(path, timestamps, R_wc, t_wc):
    """Write TUM trajectory: `time tx ty tz qx qy qz qw` per row.

    R_wc/t_wc: (N,3,3)/(N,3) camera-to-world poses (inverse of tracking Tcw,
    as in reference src/System.cc:380-385)."""
    from ..ops import lie
    import jax.numpy as jnp
    q = np.asarray(lie.quat_from_mat(jnp.asarray(R_wc)))  # (N,4) wxyz
    t = np.asarray(t_wc)
    with open(path, 'w') as f:
        for i, ts in enumerate(timestamps):
            f.write(f"{ts:.6f} {t[i,0]:.7f} {t[i,1]:.7f} {t[i,2]:.7f} "
                    f"{q[i,1]:.7f} {q[i,2]:.7f} {q[i,3]:.7f} {q[i,0]:.7f}\n")


def save_kitti(path, R_wc, t_wc):
    """Write KITTI trajectory: 12 numbers = 3x4 [R|t] row-major per line."""
    R = np.asarray(R_wc)
    t = np.asarray(t_wc)
    with open(path, 'w') as f:
        for i in range(len(R)):
            P = np.hstack([R[i], t[i][:, None]]).reshape(-1)
            f.write(" ".join(f"{v:.9e}" for v in P) + "\n")


def load_tum(path):
    """-> (timestamps (N,), t_wc (N,3), q_wxyz (N,4))."""
    rows = []
    for line in Path(path).read_text().splitlines():
        line = line.strip()
        if not line or line.startswith('#'):
            continue
        v = [float(x) for x in line.split()]
        rows.append(v[:8])
    a = np.asarray(rows)
    ts, t = a[:, 0], a[:, 1:4]
    q = np.stack([a[:, 7], a[:, 4], a[:, 5], a[:, 6]], axis=1)  # -> wxyz
    return ts, t, q


def umeyama_alignment(x: np.ndarray, y: np.ndarray, with_scale: bool = True):
    """Least-squares similarity y ≈ s R x + t over (N,3) point sets.

    Closed-form Umeyama/Horn — the same solution family as the reference's
    Sim3Solver::ComputeSim3 (reference src/Sim3Solver.cc, Horn 1987)."""
    mu_x = x.mean(axis=0)
    mu_y = y.mean(axis=0)
    xc, yc = x - mu_x, y - mu_y
    cov = yc.T @ xc / len(x)
    U, d, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    var_x = (xc ** 2).sum() / len(x)
    s = float(np.trace(np.diag(d) @ S) / var_x) if with_scale else 1.0
    t = mu_y - s * R @ mu_x
    return s, R, t


def ate_rmse(est_t: np.ndarray, gt_t: np.ndarray, with_scale: bool = True) -> float:
    """Absolute trajectory error RMSE after Umeyama alignment (meters)."""
    s, R, t = umeyama_alignment(est_t, gt_t, with_scale)
    aligned = (s * (R @ est_t.T)).T + t
    return float(np.sqrt(((aligned - gt_t) ** 2).sum(axis=1).mean()))


def rpe_rmse(R_est, t_est, R_gt, t_gt, delta: int = 1):
    """Relative pose error RMSE (translation, meters) over frame pairs."""
    errs = []
    n = len(t_est)
    for i in range(n - delta):
        # relative motions
        dR_e = R_est[i].T @ R_est[i + delta]
        dt_e = R_est[i].T @ (t_est[i + delta] - t_est[i])
        dR_g = R_gt[i].T @ R_gt[i + delta]
        dt_g = R_gt[i].T @ (t_gt[i + delta] - t_gt[i])
        e_t = dR_g.T @ (dt_e - dt_g)
        errs.append(e_t @ e_t)
    return float(np.sqrt(np.mean(errs))) if errs else 0.0
