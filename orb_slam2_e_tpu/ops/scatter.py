"""Masked scatter helpers.

The SoA map state is updated with fixed-capacity index arrays where a mask
marks live rows. The naive idiom

    arr.at[jnp.where(ok, idx, 0)].set(jnp.where(ok, val, arr[idx0]))

is WRONG under duplicates: masked rows write the *old* value at slot 0 (or
wherever they alias), and XLA scatter applies duplicate updates in an
unspecified order — a real update to the aliased slot can be silently
reverted. `masked_set` routes masked rows to an out-of-range index and
drops them at the hardware scatter level instead.
"""

from __future__ import annotations

import jax.numpy as jnp


def masked_set(arr: jnp.ndarray, idx: jnp.ndarray, ok: jnp.ndarray,
               val) -> jnp.ndarray:
    """arr.at[idx[ok]] = val[ok], without aliasing hazards.

    idx: (N,) int; ok: (N,) bool; val: (N, ...) or broadcastable."""
    cap = arr.shape[0]
    safe_idx = jnp.where(ok, idx, cap)          # cap = out of range
    val = jnp.broadcast_to(val, (idx.shape[0],) + arr.shape[1:]).astype(
        arr.dtype)
    return arr.at[safe_idx].set(val, mode='drop')
