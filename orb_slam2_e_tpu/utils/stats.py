"""Metrics / stage-timing logger.

Equivalent of the reference's Statistics class (reference
include/Statistics.h:42-107, src/Statistics.cc): a tab-separated metric
writer with per-purpose column headers, chrono helpers, and simple moving
averages; Tracking writes a per-relocalization row to `StatsReloc.txt`
(reference src/Tracking.cc:178-183). Plus the relocalization
precision/recall KPI protocol (reference Tracking.cc:488-525).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Optional


RELOC_COLUMNS = [
    # Column semantics mirror reference output/evaluation/StatsReloc.txt
    # (header: KF_candidates, Inliers_PnP_R, Time_PnP_R, ..., then a
    # [nGoodR timeR nGoodD timeD] quadruple appended per attempted stage —
    # reference src/Tracking.cc:1716-2099 pStatsReloc->AddValue sequence).
    # Here the three stage quadruples get fixed columns (S1/S2/S3) so every
    # row has the same arity.
    "Frame", "KF_candidates", "Inliers_PnP_R", "Time_PnP_R",
    "nGoodR_S1", "timeR_S1", "nGoodNR_S1", "timeNR_S1",
    "nGoodR_S2", "timeR_S2", "nGoodNR_S2", "timeNR_S2",
    "nGoodR_S3", "timeR_S3", "nGoodNR_S3", "timeNR_S3",
    "Stage", "Accepted",
]


class Statistics:
    """Tab-separated metric logger (reference Statistics(file))."""

    def __init__(self, path: Optional[str] = None, columns=None):
        self.path = Path(path) if path else None
        self.columns = columns or []
        self.row = {}
        self._chronos = {}
        self._sma = {}
        if self.path and self.columns:
            with open(self.path, 'w') as f:
                f.write("\t".join(self.columns) + "\n")

    # ---- value API (reference AddValue/AddValueFl/AddText) ----
    def add(self, key, value):
        self.row[key] = value
        self._sma.setdefault(key, []).append(
            value if isinstance(value, (int, float)) else 0.0)

    def new_line(self):
        """Flush the current row (reference NewLine)."""
        if self.path:
            with open(self.path, 'a') as f:
                f.write("\t".join(str(self.row.get(c, "")) for c in
                                  (self.columns or self.row.keys())) + "\n")
        self.row = {}

    # ---- chrono API (reference StartChrono/StopChrono) ----
    def start_chrono(self, name):
        self._chronos[name] = time.perf_counter()

    def stop_chrono(self, name):
        dt = time.perf_counter() - self._chronos.pop(name, time.perf_counter())
        self.add(name, round(dt, 6))
        return dt

    # ---- aggregation (reference SMA helpers) ----
    def sma(self, key, window: int = 10):
        vals = self._sma.get(key, [])[-window:]
        return sum(vals) / len(vals) if vals else 0.0


class RelocKpi:
    """Relocalization precision/recall protocol (E-addition, reference
    Tracking.cc:488-525): after a successful reloc, if tracking survives
    `n_precision_frames` the attempt counts as TP; losing earlier is FP;
    a lost frame with no attempt is FN.
    Pr = TP/(TP+FP); Rc = TP/(TP+FN)."""

    def __init__(self, n_precision_frames: int = 2):
        self.n_precision = n_precision_frames
        self.tp = 0
        self.fp = 0
        self.fn = 0
        self._pending = None   # frame id of last successful reloc

    def on_reloc_success(self, frame_id: int):
        self._pending = frame_id

    def on_reloc_fail(self):
        self.fn += 1

    def on_frame_tracked(self, frame_id: int) -> bool:
        """Returns True when this frame registers a TP (track held for
        n_precision frames after the last reloc) — the reference forces
        bOK=false exactly at that moment under bTestAllFrames
        (reference Tracking.cc:497-501)."""
        if self._pending is not None and \
                frame_id - self._pending >= self.n_precision:
            self.tp += 1
            self._pending = None
            return True
        return False

    def on_frame_lost(self, frame_id: int):
        if self._pending is not None:
            self.fp += 1
            self._pending = None

    @property
    def precision(self):
        d = self.tp + self.fp
        return self.tp / d if d else 0.0

    @property
    def recall(self):
        d = self.tp + self.fn
        return self.tp / d if d else 0.0
