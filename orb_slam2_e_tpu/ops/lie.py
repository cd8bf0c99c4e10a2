"""SO(3) / SE(3) / Sim(3) Lie-group operations, batched and jit-friendly.

TPU-native replacement for the reference's L0 math layer:
g2o::SE3Quat (reference Thirdparty/g2o/g2o/types/se3quat.h) and g2o::Sim3
(reference Thirdparty/g2o/g2o/types/sim3.h), plus Converter.cc's cv::Mat /
Eigen / quaternion conversions (reference include/Converter.h:35-52).

Conventions
-----------
- Rotations are (..., 3, 3) matrices on the compute path (MXU-friendly);
  quaternions (..., 4) in (w, x, y, z) order are the storage/IO format.
- SE(3) tangent vectors are (..., 6) laid out as [omega(3), upsilon(3)]
  (rotation first, like g2o's SE3Quat::exp ordering).
- Sim(3) tangent vectors are (..., 7): [omega(3), upsilon(3), sigma].
- Poses follow the reference's Tcw convention: x_cam = R @ x_world + t.

All functions broadcast over leading batch dimensions and are differentiable;
small-angle branches use `jnp.where` (no data-dependent control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def _stack33(rows):
    """Build (..., 3, 3) from a nested 3x3 list of (...,) scalars."""
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


# ---------------------------------------------------------------------------
# SO(3)
# ---------------------------------------------------------------------------

def so3_hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of (..., 3) -> (..., 3, 3).

    Parity: LocalMapping::SkewSymmetricMatrix (reference src/LocalMapping.cc:766).
    """
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return _stack33([[z, -wz, wy], [wz, z, -wx], [-wy, wx, z]])


def so3_vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of so3_hat: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues' formula exp: so(3) -> SO(3).

    Numerically safe AND autodiff-safe near 0: the `small` branch is chosen
    on theta^2 before any sqrt, so no infinite sqrt-gradient leaks through
    `jnp.where` (needed by BA tests that autodiff at xi = 0)."""
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < 1e-10
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    W = so3_hat(w)
    W2 = W @ W
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Log map SO(3) -> so(3). Safe for angles in [0, pi), and
    autodiff-safe at the identity (pose-graph GN differentiates through
    this): branch selection happens on pre-sqrt/pre-arccos quantities with
    sanitized inputs so no inf gradient leaks through `jnp.where`."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    w_vee = so3_vee(R - jnp.swapaxes(R, -1, -2)) * 0.5  # = sin(theta) * axis
    sin2 = jnp.sum(w_vee * w_vee, axis=-1)
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    near_pi = cos_t < -0.99                      # theta > ~3.0 rad
    small = (sin2 < 1e-12) & ~near_pi            # near identity
    safe_cos = jnp.where(small, 0.0, jnp.clip(cos_t, -0.9999999, 0.9999999))
    theta = jnp.arccos(safe_cos)                 # correct for generic+near-pi
    sin_t = jnp.sqrt(jnp.where(sin2 < 1e-12, 1.0, sin2))
    # theta/sin(theta); Taylor near identity: theta^2 ~ 3 - trace
    scale = jnp.where(small, 1.0 + (3.0 - trace) / 6.0, theta / sin_t)
    w = w_vee * scale[..., None]
    # Near theta == pi, sin(theta) ~ 0: recover axis from diag(R) instead.
    # R = I + 2*axis axis^T - ... => axis_i^2 = (R_ii + 1) / 2
    axis_abs = jnp.sqrt(jnp.maximum((jnp.stack(
        [R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1) + 1.0) * 0.5, 0.0))
    # Fix signs using off-diagonal sums (axis_i*axis_j = (Rij+Rji)/4)
    sx = jnp.ones_like(axis_abs[..., 0])
    sy = jnp.where(R[..., 0, 1] + R[..., 1, 0] >= 0, 1.0, -1.0)
    sz = jnp.where(R[..., 0, 2] + R[..., 2, 0] >= 0, 1.0, -1.0)
    axis_pi = axis_abs * jnp.stack([sx, sy, sz], axis=-1)
    axis_pi = axis_pi / jnp.maximum(jnp.linalg.norm(axis_pi, axis=-1, keepdims=True), _EPS)
    return jnp.where(near_pi[..., None], axis_pi * theta[..., None], w)


def so3_left_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian V of SO(3): exp([w] + v) translation coupling matrix."""
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < 1e-10
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    W = so3_hat(w)
    W2 = W @ W
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (theta - jnp.sin(theta)) / (theta2_safe * theta))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + b[..., None, None] * W + c[..., None, None] * W2


def so3_left_jacobian_inv(w: jnp.ndarray) -> jnp.ndarray:
    """Inverse left Jacobian of SO(3)."""
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < 1e-10
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    W = so3_hat(w)
    W2 = W @ W
    half_t = theta * 0.5
    # (1/theta^2) * (1 - theta*cos(t/2)/(2 sin(t/2))) with Taylor 1/12.
    sin_half = jnp.where(small, 1.0, jnp.sin(half_t))
    cot_term = jnp.where(
        small, 1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half_t * jnp.cos(half_t) / sin_half) / theta2_safe)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + cot_term[..., None, None] * W2


# ---------------------------------------------------------------------------
# Quaternions (w, x, y, z)
# ---------------------------------------------------------------------------

def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    # Canonical hemisphere: w >= 0.
    return jnp.where(q[..., :1] < 0, -q, q)


def quat_mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    w1, x1, y1, z1 = [q1[..., i] for i in range(4)]
    w2, x2, y2, z2 = [q2[..., i] for i in range(4)]
    return jnp.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], axis=-1)


def mat_from_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (..., 4) (w,x,y,z) -> rotation matrix (..., 3, 3)."""
    w, x, y, z = [q[..., i] for i in range(4)]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return _stack33([
        [1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)],
        [2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)],
        [2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)],
    ])


def quat_from_mat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> unit quaternion (w,x,y,z), branch-free Shepperd."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # Four candidate constructions; pick the numerically largest pivot.
    qw = jnp.sqrt(jnp.maximum(1.0 + tr, 0.0)) * 0.5
    q0 = jnp.stack([qw,
                    (m21 - m12) / jnp.maximum(4 * qw, _EPS),
                    (m02 - m20) / jnp.maximum(4 * qw, _EPS),
                    (m10 - m01) / jnp.maximum(4 * qw, _EPS)], axis=-1)
    qx = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 0.0)) * 0.5
    q1 = jnp.stack([(m21 - m12) / jnp.maximum(4 * qx, _EPS), qx,
                    (m01 + m10) / jnp.maximum(4 * qx, _EPS),
                    (m02 + m20) / jnp.maximum(4 * qx, _EPS)], axis=-1)
    qy = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 0.0)) * 0.5
    q2 = jnp.stack([(m02 - m20) / jnp.maximum(4 * qy, _EPS),
                    (m01 + m10) / jnp.maximum(4 * qy, _EPS), qy,
                    (m12 + m21) / jnp.maximum(4 * qy, _EPS)], axis=-1)
    qz = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 0.0)) * 0.5
    q3 = jnp.stack([(m10 - m01) / jnp.maximum(4 * qz, _EPS),
                    (m02 + m20) / jnp.maximum(4 * qz, _EPS),
                    (m12 + m21) / jnp.maximum(4 * qz, _EPS), qz], axis=-1)
    cands = jnp.stack([q0, q1, q2, q3], axis=-2)          # (..., 4cand, 4)
    piv = jnp.stack([tr, m00 - m11 - m22, -m00 + m11 - m22, -m00 - m11 + m22],
                    axis=-1)
    best = jnp.argmax(piv, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1),
                            axis=-2)[..., 0, :]
    return quat_normalize(q)


# ---------------------------------------------------------------------------
# SE(3): dict-free (R, t) pair helpers + packed (..., 7) pool format
# ---------------------------------------------------------------------------

def se3_exp(xi: jnp.ndarray):
    """Tangent (..., 6) [omega, upsilon] -> (R, t)."""
    w, v = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    V = so3_left_jacobian(w)
    t = jnp.einsum('...ij,...j->...i', V, v)
    return R, t


def se3_log(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(R, t) -> tangent (..., 6) [omega, upsilon]."""
    w = so3_log(R)
    Vinv = so3_left_jacobian_inv(w)
    v = jnp.einsum('...ij,...j->...i', Vinv, t)
    return jnp.concatenate([w, v], axis=-1)


def se3_inverse(R: jnp.ndarray, t: jnp.ndarray):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum('...ij,...j->...i', Rt, t)


def se3_compose(R1, t1, R2, t2):
    """T1 * T2: apply T2 first."""
    return R1 @ R2, jnp.einsum('...ij,...j->...i', R1, t2) + t1


def se3_apply(R, t, p):
    """Transform points p (..., 3) (broadcasts over point batches)."""
    return jnp.einsum('...ij,...j->...i', R, p) + t


def se3_to_mat4(R, t):
    bottom = jnp.zeros(R.shape[:-2] + (1, 4), R.dtype).at[..., 0, 3].set(1.0)
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_from_mat4(T):
    return T[..., :3, :3], T[..., :3, 3]


# Packed (..., 7) = [qw qx qy qz tx ty tz] — the keyframe-pool storage format.

def pose7_pack(R, t):
    return jnp.concatenate([quat_from_mat(R), t], axis=-1)


def pose7_unpack(p7):
    return mat_from_quat(quat_normalize(p7[..., :4])), p7[..., 4:]


def pose7_identity(shape=(), dtype=jnp.float32):
    p = jnp.zeros(tuple(shape) + (7,), dtype)
    return p.at[..., 0].set(1.0)


# ---------------------------------------------------------------------------
# Sim(3)  (reference Thirdparty/g2o/g2o/types/sim3.h — new derivation)
# ---------------------------------------------------------------------------

def sim3_exp(xi: jnp.ndarray):
    """Tangent (..., 7) [omega, upsilon, sigma] -> (R, t, s)."""
    w, v, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    R = so3_exp(w)
    s = jnp.exp(sigma)
    theta2 = jnp.sum(w * w, axis=-1)
    small_t = theta2 < 1e-10
    theta = jnp.sqrt(jnp.where(small_t, 1.0, theta2))
    W = so3_hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)

    # W(sigma, theta) such that t = W @ v  (Strasdat's Sim3 exp).
    small_s = jnp.abs(sigma) < 1e-5
    sig_safe = jnp.where(small_s, 1.0, sigma)
    th_safe = theta

    A_ss = jnp.where(small_t, 0.5, (1 - jnp.cos(theta)) / th_safe**2)           # sigma~0
    B_ss = jnp.where(small_t, 1.0 / 6.0, (theta - jnp.sin(theta)) / th_safe**3)
    C_ss = jnp.ones_like(theta)

    C_gen = jnp.where(small_s, 1.0, (s - 1.0) / sig_safe)
    # General closed form (both non-small):
    a = s * jnp.sin(theta)
    b = s * jnp.cos(theta)
    c2 = th_safe**2 + sig_safe**2
    A_gen = (a * sig_safe + (1.0 - b) * th_safe) / (th_safe * c2)
    B_gen = (C_gen - ((b - 1.0) * sig_safe + a * th_safe) / c2) / th_safe**2
    # theta small, sigma general (limit theta->0):
    A_t0 = jnp.where(small_s, 0.5, ((sig_safe - 1.0) * s + 1.0) / sig_safe**2)
    B_t0 = jnp.where(small_s, 1.0 / 6.0,
                     (s * (0.5 * sig_safe**2 - sig_safe + 1.0) - 1.0) / sig_safe**3)

    A = jnp.where(small_s & small_t, 0.5,
        jnp.where(small_s, A_ss,
        jnp.where(small_t, A_t0, A_gen)))
    B = jnp.where(small_s & small_t, 1.0 / 6.0,
        jnp.where(small_s, B_ss,
        jnp.where(small_t, B_t0, B_gen)))
    C = jnp.where(small_s, C_ss, C_gen)

    Wmat = C[..., None, None] * eye + A[..., None, None] * W + B[..., None, None] * W2
    t = jnp.einsum('...ij,...j->...i', Wmat, v)
    return R, t, s


def sim3_log(R, t, s):
    """(R, t, s) -> tangent (..., 7). Inverts sim3_exp via linear solve on W."""
    w = so3_log(R)
    sigma = jnp.log(s)
    # Rebuild W(sigma, theta) and solve W v = t.
    Wmat = _sim3_W(w, sigma, R.dtype)
    v = jnp.linalg.solve(Wmat, t[..., None])[..., 0]
    return jnp.concatenate([w, v, sigma[..., None]], axis=-1)


def _sim3_W(w, sigma, dtype):
    xi = jnp.concatenate([w, jnp.zeros_like(w), sigma[..., None]], axis=-1)
    # Reuse sim3_exp's W by passing unit basis vectors: W = [W e1, W e2, W e3].
    cols = []
    for i in range(3):
        e = jnp.zeros_like(w).at[..., i].set(1.0)
        xi_e = jnp.concatenate([w, e, sigma[..., None]], axis=-1)
        _, te, _ = sim3_exp(xi_e)
        cols.append(te)
    return jnp.stack(cols, axis=-1)


def sim3_apply(R, t, s, p):
    return s[..., None] * jnp.einsum('...ij,...j->...i', R, p) + t


def sim3_inverse(R, t, s):
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / s
    return Rt, -s_inv[..., None] * jnp.einsum('...ij,...j->...i', Rt, t), s_inv


def sim3_compose(R1, t1, s1, R2, t2, s2):
    """S1 * S2 (apply S2 first): (s1 R1)(s2 R2 x + t2) + t1."""
    return (R1 @ R2,
            s1[..., None] * jnp.einsum('...ij,...j->...i', R1, t2) + t1,
            s1 * s2)


# Packed (..., 8) = [qw qx qy qz tx ty tz s] — Sim3 pool storage.

def sim8_pack(R, t, s):
    return jnp.concatenate([quat_from_mat(R), t, s[..., None]], axis=-1)


def sim8_unpack(p8):
    return mat_from_quat(quat_normalize(p8[..., :4])), p8[..., 4:7], p8[..., 7]
