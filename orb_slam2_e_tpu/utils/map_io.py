"""Map serialization: save/load the full MapState (+ BoW database).

Replaces the reference's experimental binary map dump — raw `fwrite` of
mutex-bearing C++ objects plus observation index arrays (reference
src/System.cc:488-634 SaveMap, src/Tracking.cc:2271-2619 LoadMap /
BuildLoadedMap, partially commented out) — with a robust npz checkpoint of
the SoA pools. Because the map IS arrays, save/load is lossless and needs
no graph rebuilding.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import jax.numpy as jnp

from ..models.map_state import MapState

FORMAT_VERSION = 3   # v2: + kf_seq / next_seq / lm_first_seq (VERDICT r3 #7)
                     # v3: + lm_angle (rotation-consistency histograms)


def save_map(path, state: MapState, extra: dict | None = None):
    """Write the complete map to an .npz checkpoint."""
    arrays = {f"map_{k}": np.asarray(v) for k, v in state._asdict().items()}
    arrays["format_version"] = np.asarray(FORMAT_VERSION)
    if extra:
        for k, v in extra.items():
            arrays[f"extra_{k}"] = np.asarray(v)
    np.savez_compressed(path, **arrays)


def load_map(path) -> tuple[MapState, dict]:
    """Load a map checkpoint -> (MapState, extra_dict)."""
    data = np.load(path)
    ver = int(data["format_version"])
    if ver > FORMAT_VERSION:
        raise ValueError(f"map checkpoint version {ver} > {FORMAT_VERSION}")
    fields = {}
    for k in MapState._fields:
        if f"map_{k}" in data.files:
            fields[k] = jnp.asarray(data[f"map_{k}"])
    if ver == 1:
        # v1 -> v2 migration (ADVICE r4): synthesize the monotonic keyframe
        # sequence ids / landmark birth ids that v2 added, instead of
        # hard-rejecting old checkpoints. Slot order was insertion order
        # before compaction existed, so it is a faithful kf_seq backfill.
        kf_valid = np.asarray(fields["kf_valid"])
        kf_seq = np.where(kf_valid, np.arange(len(kf_valid)), -1)
        fields.setdefault("kf_seq", jnp.asarray(kf_seq.astype(np.int32)))
        fields.setdefault("next_seq",
                          jnp.asarray(np.int32(kf_valid.sum())))
        fields.setdefault(
            "lm_first_seq",
            jnp.zeros(np.asarray(fields["lm_valid"]).shape, jnp.int32))
    if ver < 3:
        # v3 added lm_angle; zero is a safe backfill (the histogram then
        # votes on -frame_angle, still a single consistent rotation bin)
        fields.setdefault(
            "lm_angle",
            jnp.zeros(np.asarray(fields["lm_valid"]).shape, jnp.float32))
    missing = [k for k in MapState._fields if k not in fields]
    if missing:
        raise ValueError(f"map checkpoint missing fields: {missing}")
    extra = {k[6:]: data[k] for k in data.files if k.startswith("extra_")}
    return MapState(**fields), extra


def export_pointcloud_txt(path, state: MapState):
    """Plain-text xyz dump of valid landmarks (the reference also writes a
    3D point text dump next to the binary map, System.cc:595-634)."""
    ok = np.asarray(state.lm_valid)
    xyz = np.asarray(state.lm_xyz)[ok]
    with open(path, "w") as f:
        for p in xyz:
            f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
