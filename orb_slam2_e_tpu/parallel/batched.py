"""Batched multi-sequence tracking: B independent camera streams tracked in
lock-step with ONE device dispatch per step.

The reference is a single-stream CPU system; a TPU chip's throughput story
is batch: the whole per-frame tracking program (pyramid + FAST + descriptors
+ projection matching + pose LM) is vmapped over a batch of sequences, so
the MXU/VPU see B images worth of work per dispatch and the host-sync
latency is amortized B-fold. This is the "many sequences in parallel"
utilization mode of SURVEY.md §7 M6 — e.g. multi-endoscope serving or
dataset-scale offline processing.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.camera import Camera
from ..ops.orb import OrbExtractor
from ..models.frame import Frame, frame_from_features
from ..models.map_state import MapState
from ..models import tracking as T


class BatchedTracker:
    """Lock-step tracker over B sequences against per-lane maps
    (localization mode: no keyframe insertion inside the batch loop)."""

    def __init__(self, cam: Camera, cfg, map_states, n_features=1000,
                 scale_factor=1.2, n_levels=8):
        self.cam = cam
        self.cfg = cfg
        self.extractor = OrbExtractor(n_features, scale_factor, n_levels)
        # stack per-lane maps: tree of (B, ...) arrays
        self.state = jax.tree.map(lambda *xs: jnp.stack(xs), *map_states)
        self.B = len(map_states)

        ext = self.extractor

        # donate the lane state: the per-lane map pools update in place on
        # device instead of being copied every step
        @functools.partial(jax.jit, donate_argnums=(0, 2, 3))
        def step(state, images, last_frames, vels, have_vel, ref_kfs):
            def one(state_i, img, last, vel, hv, rk):
                feats = ext._extract(img)
                frame = frame_from_features(cam, feats)
                return T.track_frame_fused(cam, cfg, state_i, frame, last,
                                           vel, hv, rk)

            return jax.vmap(one)(state, images, last_frames, vels,
                                 have_vel, ref_kfs)

        self._step = step
        self.last_frames = None
        self.vels = jnp.tile(jnp.asarray([1, 0, 0, 0, 0, 0, 0.]),
                             (self.B, 1))
        self.have_vel = jnp.zeros((self.B,), bool)

    def bootstrap(self, frames):
        """Provide initial per-lane frames (e.g. from the map-building run)."""
        self.last_frames = jax.tree.map(lambda *xs: jnp.stack(xs), *frames)

    def step(self, images, ref_kfs):
        """images: (B, H, W); returns (ok (B,), n_inliers (B,))."""
        state, frames, vels, flags = self._step(
            self.state, images, self.last_frames, self.vels, self.have_vel,
            ref_kfs)
        self.state = state
        self.vels = vels                        # computed on device
        ok = flags[:, 0].astype(bool)
        self.have_vel = ok
        self.last_frames = frames
        return ok, flags[:, 1]
