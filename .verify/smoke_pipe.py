import sys as _sys
from pathlib import Path as _P
_sys.path.insert(0, str(_P(__file__).resolve().parents[1]))
import time, faulthandler
faulthandler.dump_traceback_later(1300, exit=True)
import numpy as np
from orb_slam2_e_tpu.ops.camera import Camera
from orb_slam2_e_tpu.models.system import SlamSystem, SystemConfig, Sensor
from orb_slam2_e_tpu.utils.synthetic import SyntheticScene, orbit_trajectory
scene = SyntheticScene(n_points=400, seed=1, width=320, height=240,
                       fx=260, fy=260, cx=160, cy=120)
poses, centers = orbit_trajectory(n_frames=10, radius=1.2, forward=0.05)
cam = Camera.create(fx=260, fy=260, cx=160, cy=120, width=320, height=240)
imgs = [scene.render(R, t) for R, t in poses]
t0 = time.time()
sysm = SlamSystem(cam, SystemConfig(max_keyframes=16, max_points=4096,
                                    n_features=400, n_levels=4,
                                    min_init_matches=50,
                                    pipeline=True), Sensor.MONOCULAR)
print("ctor", time.time()-t0, flush=True)
for k, img in enumerate(imgs):
    t1 = time.time()
    sysm.track_monocular(img, k / 30.0)
    print(f"frame {k}: {time.time()-t1:.1f}s state={sysm.state.name}", flush=True)
sysm._drain_pending()
ts, Rwc, twc = sysm.get_trajectory()
print("total", time.time()-t0, "kfs", int(sysm.map.n_keyframes()),
      "pts", int(sysm.map.n_points()), "tracked", len(twc), flush=True)
