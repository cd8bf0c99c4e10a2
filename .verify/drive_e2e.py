import sys as _sys
from pathlib import Path as _P
_sys.path.insert(0, str(_P(__file__).resolve().parents[1]))
"""Verify: drive the SlamSystem end-to-end on synthetic data (both the
pipelined and synchronous frame loops), check tracking + map growth."""
import time
import numpy as np
from orb_slam2_e_tpu.ops.camera import Camera
from orb_slam2_e_tpu.models.system import SlamSystem, SystemConfig, Sensor, TrackState
from orb_slam2_e_tpu.utils.synthetic import SyntheticScene, orbit_trajectory
from orb_slam2_e_tpu.utils.trajectory import ate_rmse

scene = SyntheticScene(n_points=400, seed=1, width=320, height=240,
                       fx=260, fy=260, cx=160, cy=120)
poses, centers = orbit_trajectory(n_frames=12, radius=1.2, forward=0.05)
cam = Camera.create(fx=260, fy=260, cx=160, cy=120, width=320, height=240)
imgs = [scene.render(R, t) for R, t in poses]

for pipeline in (True, False):
    t0 = time.time()
    sysm = SlamSystem(cam, SystemConfig(max_keyframes=16, max_points=4096,
                                        n_features=400, n_levels=4,
                                        min_init_matches=50,
                                        pipeline=pipeline), Sensor.MONOCULAR)
    for k, img in enumerate(imgs):
        sysm.track_monocular(img, k / 30.0)
    sysm._drain_pending()
    ts, Rwc, twc = sysm.get_trajectory()
    err = ate_rmse(twc, centers[-len(twc):], with_scale=True) if len(twc) >= 4 else float('nan')
    print(f"pipeline={pipeline}: state={sysm.state.name} kfs={int(sysm.map.n_keyframes())} "
          f"pts={int(sysm.map.n_points())} tracked={len(twc)}/12 ate={err:.3f} "
          f"stats={sysm.stats} ({time.time()-t0:.0f}s)", flush=True)
    assert sysm.state == TrackState.OK
    assert len(twc) >= 8
    assert err < 0.15, err
print("VERIFY OK")
