"""Verify drive: e2e synthetic SLAM + forced relocalization (exercises the
refit path added to ops/pnp.ransac_pnp)."""
from orb_slam2_e_tpu.ops.camera import Camera
from orb_slam2_e_tpu.models.system import SlamSystem, SystemConfig, Sensor, \
    TrackState
from orb_slam2_e_tpu.utils.synthetic import SyntheticScene, orbit_trajectory

scene = SyntheticScene(n_points=400, seed=1, width=320, height=240,
                       fx=260, fy=260, cx=160, cy=120)
poses, _ = orbit_trajectory(n_frames=14, radius=1.2, forward=0.05)
cam = Camera.create(fx=260, fy=260, cx=160, cy=120, width=320, height=240)
sysm = SlamSystem(cam, SystemConfig(max_keyframes=16, max_points=4096,
                                    n_features=400, n_levels=4,
                                    min_init_matches=50), Sensor.MONOCULAR)
for k, (R, t) in enumerate(poses):
    sysm.track_monocular(scene.render(R, t), k / 30.0)
sysm._drain_pending()
print("state:", sysm.state, "KFs:", sysm.n_keyframes,
      "pts:", int(sysm.map.n_points()), "stats:", sysm.stats)
assert sysm.state == TrackState.OK
assert sysm.n_keyframes >= 2

# force LOST, then feed a frame matching an early keyframe view -> reloc
sysm.state = TrackState.LOST
sysm.velocity7 = None
R0, t0 = poses[2]
sysm.track_monocular(scene.render(R0, t0), 99.0)
sysm._drain_pending()
print("after forced-lost frame: state:", sysm.state,
      "relocs:", sysm.stats["relocs"])
assert sysm.stats["relocs"] >= 1, "relocalization did not fire"
print("VERIFY OK")
