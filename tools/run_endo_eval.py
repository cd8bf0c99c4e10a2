#!/usr/bin/env python3
"""Deformable relocalization KPI evaluation on the endo proxy sequences.

Reproduces the reference's E evaluation protocol (reference
Tracking.cc:488-525, roslaunch/sHamlyn01.yaml): build a map on the
at-rest sequence, then run the BREATHING sequence in localization mode
with RelocParam.bTestAllFrames so every frame exercises relocalization,
and report the TP/FP/FN precision/recall KPI.

Usage: python tools/run_endo_eval.py [--frames 240] [--amp 0.12]
"""

from __future__ import annotations

import argparse
import json
import re
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def sh(*args):
    print("+", " ".join(str(a) for a in args), flush=True)
    r = subprocess.run([sys.executable, *map(str, args)], cwd=ROOT,
                       capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-3000:])
        print(r.stderr[-3000:])
        raise RuntimeError(f"rc={r.returncode}")
    return r.stdout


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=240)
    ap.add_argument("--amp", type=float, default=0.12)
    args = ap.parse_args()

    d_map = ROOT / "data" / "proxy_endo_map"
    d_rel = ROOT / "data" / "proxy_endo_reloc"
    for d, phase, extra in ((d_map, "map", []),
                            (d_rel, "reloc", ["--amp", args.amp])):
        if not (d / "rgb.txt").exists():
            sh(ROOT / "tools" / "make_proxy_endo.py", d, "--phase", phase,
               "--frames", args.frames, *extra)

    evald = ROOT / "eval"
    evald.mkdir(exist_ok=True)

    # phase 1: map building — same settings but WITHOUT the KPI forcing
    settings_map = d_map / "settings_build.yaml"
    base = (d_map / "settings.yaml").read_text()
    settings_map.write_text(base.replace("RelocParam.bTestAllFrames: 1",
                                         "RelocParam.bTestAllFrames: 0"))
    map_npz = evald / "endo_map.npz"
    out = sh(ROOT / "examples" / "mono_deformable.py", settings_map, d_map,
             "--save-map", map_npz)
    print(out[-600:])

    # phase 2: localization-mode reloc KPI on the deforming sequence
    stats = evald / "StatsReloc_endo.txt"
    out = sh(ROOT / "examples" / "mono_deformable.py",
             d_rel / "settings.yaml", d_rel,
             "--load-map", map_npz, "--stats", stats)
    print(out[-600:])
    m = re.search(r"reloc KPI: TP=(\d+) FP=(\d+) FN=(\d+) "
                  r"precision=([\d.]+) recall=([\d.]+)", out)
    if not m:
        raise RuntimeError("KPI line not found in driver output")
    kpi = dict(tp=int(m[1]), fp=int(m[2]), fn=int(m[3]),
               precision=float(m[4]), recall=float(m[5]),
               amp=args.amp, frames=args.frames)
    (evald / "ENDO_KPI.json").write_text(json.dumps(kpi, indent=2) + "\n")
    print(json.dumps(kpi))


if __name__ == "__main__":
    main()
