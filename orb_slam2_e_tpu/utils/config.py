"""Settings loader for the reference's YAML schema.

Parses the same cv::FileStorage YAML files the reference consumes
(reference src/Tracking.cc:53-183 reads Camera.*, ORBextractor.*, ThDepth,
DepthMapFactor, RelocParam.*, Viewer.*; e.g. Examples/Monocular/TUM1.yaml,
roslaunch/sHamlyn01.yaml), so existing dataset configs work unmodified.

cv::FileStorage YAML files begin with a `%YAML:1.0` directive that standard
YAML parsers reject — it is stripped here.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional

import yaml


@dataclasses.dataclass
class OrbParams:
    """ORBextractor.* keys (reference src/Tracking.cc:119-138)."""
    n_features: int = 1000
    scale_factor: float = 1.2
    n_levels: int = 8
    ini_th_fast: int = 20
    min_th_fast: int = 7


@dataclasses.dataclass
class RelocParams:
    """RelocParam.* keys — E-addition (reference src/Tracking.cc:162-175)."""
    test_all_frames: bool = False
    n_precision_frames: int = 2
    use_inverse: bool = False
    el_type: int = 1          # 1 = C3D6 prisms, 2 = C3D8 hexahedra


@dataclasses.dataclass
class Settings:
    # Camera.* (reference src/Tracking.cc:53-117)
    fx: float = 500.0
    fy: float = 500.0
    cx: float = 320.0
    cy: float = 240.0
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    k3: float = 0.0
    fps: float = 30.0
    rgb: bool = True
    bf: float = 0.0
    width: int = 640
    height: int = 480
    th_depth: float = 35.0          # ThDepth: close/far stereo point gate
    depth_map_factor: float = 1.0   # DepthMapFactor: RGB-D depth scaling
    orb: OrbParams = dataclasses.field(default_factory=OrbParams)
    orb_ini: Optional[OrbParams] = None  # mono init uses 2x features (Tracking.cc:131-134)
    reloc: RelocParams = dataclasses.field(default_factory=RelocParams)
    viewer: dict = dataclasses.field(default_factory=dict)
    stats_reloc: Optional[str] = None    # Output.StatsReloc log path

    def __post_init__(self):
        if self.orb_ini is None:
            self.orb_ini = dataclasses.replace(self.orb,
                                               n_features=2 * self.orb.n_features)


def _get(d: dict, key: str, default):
    v = d.get(key, default)
    return type(default)(v) if v is not None else default


class _CvLoader(yaml.SafeLoader):
    """SafeLoader that understands cv::FileStorage's !!opencv-matrix nodes
    (used by the reference's stereo EuRoC config for LEFT.K/D/R/P etc.,
    Examples/Stereo/EuRoC.yaml)."""


def _opencv_matrix(loader, node):
    import numpy as np
    m = loader.construct_mapping(node, deep=True)
    return np.asarray(m["data"], dtype=np.float64).reshape(
        int(m["rows"]), int(m["cols"]))


_CvLoader.add_constructor("tag:yaml.org,2002:opencv-matrix", _opencv_matrix)
_CvLoader.add_constructor("!!opencv-matrix", _opencv_matrix)


def load_raw(path: str | Path) -> dict:
    """Raw key->value dict of a cv::FileStorage YAML (matrices as numpy)."""
    text = Path(path).read_text()
    if text.startswith('%YAML'):
        text = text.split('\n', 1)[1]
    return yaml.load(text, Loader=_CvLoader) or {}


def stereo_rectifier_from_settings(path: str | Path):
    """Build a StereoRectifier from the LEFT.*/RIGHT.* blocks of a stereo
    config (reference stereo_euroc.cc:59-105 reads the same keys)."""
    d = load_raw(path)
    from .rectify import StereoRectifier
    need = ["LEFT.K", "LEFT.D", "LEFT.R", "LEFT.P",
            "RIGHT.K", "RIGHT.D", "RIGHT.R", "RIGHT.P",
            "LEFT.width", "LEFT.height"]
    if any(k not in d for k in need):
        return None
    return StereoRectifier(
        d["LEFT.K"], d["LEFT.D"], d["LEFT.R"], d["LEFT.P"],
        d["RIGHT.K"], d["RIGHT.D"], d["RIGHT.R"], d["RIGHT.P"],
        int(d["LEFT.width"]), int(d["LEFT.height"]))


def load_settings(path: str | Path) -> Settings:
    text = Path(path).read_text()
    if text.startswith('%YAML'):
        text = text.split('\n', 1)[1]
    d = yaml.load(text, Loader=_CvLoader) or {}

    orb = OrbParams(
        n_features=int(_get(d, 'ORBextractor.nFeatures', 1000)),
        scale_factor=float(_get(d, 'ORBextractor.scaleFactor', 1.2)),
        n_levels=int(_get(d, 'ORBextractor.nLevels', 8)),
        ini_th_fast=int(_get(d, 'ORBextractor.iniThFAST', 20)),
        min_th_fast=int(_get(d, 'ORBextractor.minThFAST', 7)),
    )
    reloc = RelocParams(
        test_all_frames=bool(int(_get(d, 'RelocParam.bTestAllFrames', 0))),
        n_precision_frames=int(_get(d, 'RelocParam.nPrecisionFrames', 2)),
        use_inverse=bool(int(_get(d, 'RelocParam.bUseInverse', 0))),
        el_type=int(_get(d, 'RelocParam.nElType', 1)),
    )
    return Settings(
        fx=float(_get(d, 'Camera.fx', 500.0)),
        fy=float(_get(d, 'Camera.fy', 500.0)),
        cx=float(_get(d, 'Camera.cx', 320.0)),
        cy=float(_get(d, 'Camera.cy', 240.0)),
        k1=float(_get(d, 'Camera.k1', 0.0)),
        k2=float(_get(d, 'Camera.k2', 0.0)),
        p1=float(_get(d, 'Camera.p1', 0.0)),
        p2=float(_get(d, 'Camera.p2', 0.0)),
        k3=float(_get(d, 'Camera.k3', 0.0)),
        fps=float(_get(d, 'Camera.fps', 30.0)),
        rgb=bool(int(_get(d, 'Camera.RGB', 1))),
        bf=float(_get(d, 'Camera.bf', 0.0)),
        width=int(_get(d, 'Camera.width', 640)),
        height=int(_get(d, 'Camera.height', 480)),
        th_depth=float(_get(d, 'ThDepth', 35.0)),
        depth_map_factor=float(_get(d, 'DepthMapFactor', 1.0)),
        orb=orb,
        reloc=reloc,
        viewer={k: v for k, v in d.items() if k.startswith('Viewer.')},
        stats_reloc=d.get('Output.StatsReloc'),
    )


def camera_from_settings(s: Settings):
    from ..ops.camera import Camera
    return Camera.create(s.fx, s.fy, s.cx, s.cy, s.k1, s.k2, s.p1, s.p2, s.k3,
                         s.bf, s.width, s.height)
