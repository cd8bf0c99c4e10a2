"""Pallas TPU kernels for the per-frame frontend hot path.

The ORB frontend (reference src/ORBextractor.cc: FAST detection
ComputeKeyPointsOctTree :765, Gaussian blur + descriptors :1042-1113) is the
single hottest per-frame compute. The XLA formulation in ops/orb.py builds a
(16, H, W) ring stack plus 9 sliding-window minima and 8 NMS shifts — many
HBM-sized intermediates. This module fuses the whole pixel-wise stage into
ONE Pallas kernel per pyramid level:

    image  --(single HBM read)-->  [FAST-9/16 arc score
                                    + high/low threshold bonus
                                    + 3x3 non-max suppression
                                    + 7x7 sigma=2 Gaussian blur]
           --(single HBM write each)--> score map, blurred image

Design notes (see /opt/skills/guides/pallas_guide.md):
- The padded image lives in VMEM in full (SLAM frames are ~1-2 MB in f32;
  VMEM is ~16 MB). The grid walks row strips. Mosaic requires ref loads to
  start at sublane/lane tile boundaries, so each strip loads ONE aligned
  superblock (row offset i*T, full width) and every +/-3 shifted view is a
  static slice of that loaded value (vector ops, no misaligned memory
  access).
- The circular 9-of-16 window minimum is computed with a log-step
  min-tree (m2/m4/m8), 4 elementwise ops per ring position instead of 9.
- Bright and dark arcs share the tree: dark strength is -min_s(max-window)
  over the same diffs.
- All ops are VPU elementwise on (T+2, Wp+2) f32 tiles; the MXU stages of
  the frontend (Hamming matching) are separate int8 matmuls.

The kernel computes scores on a lane-aligned padded canvas and the caller
crops; the 19-px EDGE_THRESHOLD border mask (applied downstream) swallows
all halo artifacts.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# FAST ring (same Bresenham radius-3 circle as ops/orb.py / reference FAST)
_RING = (
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
)
_PADR = 8      # row padding: >= 4-px halo, aligned to the f32 sublane tile
_PADC = 128    # col padding: >= 4-px halo, aligned to the lane tile
_ARC = 9       # FAST-9

_G7 = None


def _g7():
    global _G7
    if _G7 is None:
        x = np.arange(-3, 4, dtype=np.float64)
        k = np.exp(-0.5 * (x / 2.0) ** 2)
        _G7 = (k / k.sum()).astype(np.float32)
    return _G7


def _fast_blur_kernel(img_ref, score_ref, blur_ref, *, T, Wp, th_high,
                      th_low, g7):
    """One row strip: score + blur for canvas rows [i*T, i*T + T).

    img_ref: (HP + 2*_PADR, Wp + 2*_PADC) padded image, full array in VMEM.
    Canvas pixel (y, x) lives at img_ref[_PADR + y, _PADC + x].
    """
    i = pl.program_id(0)
    # aligned superblock: rows [i*T, i*T + T + 2*_PADR), all columns
    blk = img_ref[pl.ds(i * T, T + 2 * _PADR), :]

    # score region is (T+2, Wp+2): 1-px apron for NMS. Its pixel (y, x)
    # corresponds to blk[_PADR - 1 + y, _PADC - 1 + x].
    Ts, Ws = T + 2, Wp + 2

    def win(dy, dx):
        r0 = _PADR - 1 + dy
        c0 = _PADC - 1 + dx
        return jax.lax.slice(blk, (r0, c0), (r0 + Ts, c0 + Ws))

    c = win(0, 0)
    d = [win(dy, dx) - c for (dx, dy) in _RING]

    # log-step circular window reduce over _ARC=9 consecutive positions
    def win9(vals, op):
        m2 = [op(vals[k], vals[(k + 1) % 16]) for k in range(16)]
        m4 = [op(m2[k], m2[(k + 2) % 16]) for k in range(16)]
        m8 = [op(m4[k], m4[(k + 4) % 16]) for k in range(16)]
        return [op(m8[k], vals[(k + 8) % 16]) for k in range(16)]

    wmin = win9(d, jnp.minimum)
    v_bright = functools.reduce(jnp.maximum, wmin)     # max_s min_arc d
    wmax = win9(d, jnp.maximum)
    v_dark = -functools.reduce(jnp.minimum, wmax)      # max_s min_arc (-d)
    v = jnp.maximum(v_bright, v_dark)
    s = jnp.where(v > th_low, v, 0.0) + jnp.where(v > th_high, 1e4, 0.0)

    # 3x3 non-max suppression over the apron
    center = jax.lax.slice(s, (1, 1), (1 + T, 1 + Wp))
    is_max = None
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            if dx == 1 and dy == 1:
                continue
            ge = center >= jax.lax.slice(s, (dy, dx), (dy + T, dx + Wp))
            is_max = ge if is_max is None else (is_max & ge)
    score_ref[:] = jnp.where(is_max, center, 0.0)

    # 7x7 separable Gaussian blur (sigma=2) for rows [i*T, i*T + T)
    acc = None
    for ky in range(7):
        r0 = _PADR - 3 + ky
        row = jax.lax.slice(blk, (r0, _PADC - 3), (r0 + T, _PADC - 3 + Wp + 6))
        acc = row * g7[ky] if acc is None else acc + row * g7[ky]
    out = None
    for kx in range(7):
        part = jax.lax.slice(acc, (0, kx), (T, kx + Wp)) * g7[kx]
        out = part if out is None else out + part
    blur_ref[:] = out


@functools.partial(jax.jit, static_argnames=('th_high', 'th_low', 'strip'))
def fast_nms_blur(img: jnp.ndarray, th_high: float, th_low: float,
                  strip: int = 32):
    """Fused FAST-9/16 score (+threshold bonus) -> 3x3 NMS, and 7x7 blur.

    img: (H, W) float32. Returns (score (H, W), blur (H, W)). Semantics match
    ops.orb.fast_score_map + NMS and ops.orb.gaussian_blur7 (edge-replicated
    borders; the downstream EDGE_THRESHOLD mask hides halo differences).
    """
    H, W = img.shape
    T = strip
    HP = -(-H // T) * T
    Wp = -(-W // 128) * 128
    img_p = jnp.pad(
        img.astype(jnp.float32),
        ((_PADR, _PADR + HP - H), (_PADC, _PADC + Wp - W)),
        mode='edge')
    g7 = tuple(float(x) for x in _g7())
    kern = functools.partial(_fast_blur_kernel, T=T, Wp=Wp,
                             th_high=float(th_high), th_low=float(th_low),
                             g7=g7)
    score, blur = pl.pallas_call(
        kern,
        grid=(HP // T,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((T, Wp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, Wp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((HP, Wp), jnp.float32),
            jax.ShapeDtypeStruct((HP, Wp), jnp.float32),
        ),
    )(img_p)
    return score[:H, :W], blur[:H, :W]


def tpu_available() -> bool:
    try:
        return jax.default_backend() == 'tpu'
    except Exception:
        return False
