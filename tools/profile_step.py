"""Per-stage device timing of the tracking hot path.

Run on the TPU (single-tenant — don't run concurrently with tests/bench):
    python tools/profile_step.py
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def med_ms(fn, n=10):
    import jax
    jax.block_until_ready(fn())   # warm / compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from orb_slam2_e_tpu.ops.camera import Camera
    from orb_slam2_e_tpu.ops import orb as orb_mod
    from orb_slam2_e_tpu.models.system import SlamSystem, SystemConfig, \
        Sensor
    from orb_slam2_e_tpu.models import tracking as T
    from orb_slam2_e_tpu.utils.synthetic import SyntheticScene, \
        orbit_trajectory

    W, H = 640, 480
    scene = SyntheticScene(n_points=600, seed=1, width=W, height=H,
                           fx=500, fy=500, cx=W / 2, cy=H / 2)
    poses, _ = orbit_trajectory(n_frames=20, radius=1.2, forward=0.03)
    images = [scene.render(R, t) for R, t in poses]
    cam = Camera.create(fx=500, fy=500, cx=W / 2, cy=H / 2, width=W,
                        height=H)
    cfg = SystemConfig(max_keyframes=64, max_points=16384, n_features=1000,
                       n_levels=8, max_frames_between_kf=6,
                       min_init_matches=80, loop_closing=False)
    sysm = SlamSystem(cam, cfg, Sensor.MONOCULAR)
    for k, img in enumerate(images):
        sysm.track_monocular(img, k / 30.0)
    sysm._drain_pending()
    img = jnp.asarray(images[-1])
    print(f"map: {int(sysm.map.n_keyframes())} KFs "
          f"{int(sysm.map.n_points())} pts")

    ext = sysm.extractor
    print(f"extract (pallas={ext.use_pallas}): "
          f"{med_ms(lambda: ext(img).desc):7.2f} ms")

    # extractor stage internals at level 0
    img0 = img.astype(jnp.float32)
    from orb_slam2_e_tpu.ops import pallas_kernels as pk
    if ext.use_pallas:
        fnb = jax.jit(lambda im: pk.fast_nms_blur(im, 20.0, 7.0))
        print(f"  fast_nms_blur L0:  {med_ms(lambda: fnb(img0)[0]):7.2f} ms")
    score = jax.jit(lambda im: orb_mod.fast_score_map(im, 20.0, 7.0))
    print(f"  fast_score L0 xla: {med_ms(lambda: score(img0)):7.2f} ms")
    feats = ext(img)
    orient = jax.jit(orb_mod.compute_orientations)
    uv0 = feats.uv[:250] / 1.0
    print(f"  orientations(250): {med_ms(lambda: orient(img0, uv0)):7.2f} ms")
    blur = jax.jit(orb_mod.gaussian_blur7)
    img_b = blur(img0)
    desc = jax.jit(orb_mod.compute_descriptors)
    ang0 = feats.angle[:250]
    print(f"  descriptors(250):  {med_ms(lambda: desc(img_b, uv0, ang0)):7.2f} ms")
    print(f"  blur L0:           {med_ms(lambda: blur(img0)):7.2f} ms")
    rsz = jax.jit(lambda im: jax.image.resize(
        im, (400, 533), method='bilinear'))
    print(f"  resize L1:         {med_ms(lambda: rsz(img0)):7.2f} ms")

    # tracking stages on the real map
    frame = sysm._mk_frame_mono(img)
    tcfg = sysm.track_cfg
    st = sysm.map
    lf = sysm.last_frame
    import functools
    tmm = functools.partial(T.track_motion_model, cam, tcfg)
    print(f"track_motion_model:  "
          f"{med_ms(jax.jit(lambda: tmm(st, frame, lf, lf.pose7)[0].pose7)):7.2f} ms")
    trk = functools.partial(T.track_reference_keyframe, cam, tcfg)
    print(f"track_ref_kf:        "
          f"{med_ms(jax.jit(lambda: trk(st, frame, jnp.int32(0), lf.pose7)[0].pose7)):7.2f} ms")
    tlm = functools.partial(T.track_local_map, cam, tcfg)
    print(f"track_local_map:     "
          f"{med_ms(jax.jit(lambda: tlm(st, frame)[0].pose7)):7.2f} ms")

    def full_step():
        _, _, _, flags = T.track_frame_fused(
            cam, tcfg, st, frame, lf, lf.pose7, jnp.bool_(True),
            jnp.int32(0))
        return flags
    print(f"track_frame_fused:   {med_ms(jax.jit(full_step)):7.2f} ms")

    # insert + mapping pass
    ins = sysm._insert_and_map
    def insert():
        m, f, packed = ins(st, frame, jnp.int32(999), jnp.float32(1.0),
                           jnp.int32(0), do_ba=True, do_cull_kf=True)
        return packed
    print(f"insert_and_map(BA):  {med_ms(insert, n=5):7.2f} ms")

    # mapping-pass sub-stages (each jitted standalone on the same state)
    from orb_slam2_e_tpu.models import local_mapping as LMM
    mcfg = sysm.map_cfg
    kf = jnp.int32(max(sysm.last_kf_slot, 1))
    sub = [
        ("cull_map_points", lambda: LMM.cull_map_points(mcfg, st, kf)[0].lm_valid),
        ("triangulate", lambda: LMM.triangulate_with_neighbors(
            cam, mcfg, st, kf)[0].lm_xyz),
        ("fuse_neighbors", lambda: LMM.fuse_neighbors(
            cam, mcfg, st, kf)[0].lm_valid),
        ("refresh_landmarks", lambda: LMM.refresh_landmarks(
            mcfg, st, kf).lm_desc),
        ("local_ba", lambda: LMM.local_ba(cam, mcfg, st, kf)[0].kf_pose7),
        ("cull_keyframes", lambda: LMM.cull_keyframes(mcfg, st, kf)[0].kf_valid),
    ]
    for name, fn in sub:
        print(f"  {name:18s} {med_ms(fn, n=5):7.2f} ms")


if __name__ == "__main__":
    main()
