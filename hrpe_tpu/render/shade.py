"""Host-side shaded mesh rendering (numpy z-buffer rasterizer).

Counterpart of the reference's textured/phong visualization renders —
pyrender offscreen scenes (lib/utils/urdf_robot.py:311-422, vis.py:379)
and the pytorch3d HardPhongShader (lib/utils/mesh_renderer.py:164-179).
Those are sanity-check visuals off the training path, so a software
rasterizer is the right tool on a TPU host: no GL/EGL, no CUDA, exact
same camera model as the rest of the framework (K-projection of
camera-frame vertices).

Lambert + ambient shading with a headlight (light along +z toward the
scene), per-face flat normals, z-buffered. Meshes come from
render.mesh.RobotMesh posed by the framework's own FK.
"""

from __future__ import annotations

import numpy as np


def render_phong(
    verts: np.ndarray,
    faces: np.ndarray,
    K: np.ndarray,
    hw: tuple,
    light_dir=(0.0, 0.0, 1.0),
    ambient: float = 0.35,
    diffuse: float = 0.65,
    color=(0.72, 0.72, 0.78),
    background: np.ndarray | None = None,
):
    """Rasterize camera-frame triangles with flat Lambert shading.

    verts: (V, 3) camera-frame; faces: (F, 3) int; K: (3, 3) intrinsics;
    hw: (H, W). background: optional (H, W, 3) uint8. Returns (H, W, 3)
    uint8 image and the (H, W) depth buffer (inf where empty).
    """
    H, W = hw
    verts = np.asarray(verts, np.float64)
    faces = np.asarray(faces, np.int64)
    K = np.asarray(K, np.float64)

    img = (
        np.asarray(background, np.float64).copy()
        if background is not None
        else np.zeros((H, W, 3), np.float64)
    )
    zbuf = np.full((H, W), np.inf)

    # keep faces whose 3 vertices are in front of the camera
    z = verts[:, 2]
    tri_ok = np.all(z[faces] > 1e-6, axis=1)
    faces = faces[tri_ok]
    if len(faces) == 0:
        return img.astype(np.uint8), zbuf

    proj = verts @ K.T
    uv = proj[:, :2] / np.maximum(proj[:, 2:3], 1e-9)  # (V, 2) pixels

    tv = verts[faces]  # (F, 3, 3)
    n = np.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0])
    nn = n / np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)
    L = np.asarray(light_dir, np.float64)
    L = L / np.linalg.norm(L)
    lam = np.abs(nn @ L)  # double-sided lighting
    shade = np.clip(ambient + diffuse * lam, 0.0, 1.0)  # (F,)
    base = np.asarray(color, np.float64) * 255.0

    # far-to-near painter order reduces z-buffer churn; z-test is exact
    depth_f = tv[:, :, 2].mean(1)
    order = np.argsort(-depth_f)

    t_uv = uv[faces]  # (F, 3, 2)
    for fi in order:
        p = t_uv[fi]  # (3, 2)
        x0 = max(int(np.floor(p[:, 0].min())), 0)
        x1 = min(int(np.ceil(p[:, 0].max())) + 1, W)
        y0 = max(int(np.floor(p[:, 1].min())), 0)
        y1 = min(int(np.ceil(p[:, 1].max())) + 1, H)
        if x0 >= x1 or y0 >= y1:
            continue
        xs = np.arange(x0, x1) + 0.5
        ys = np.arange(y0, y1) + 0.5
        gx, gy = np.meshgrid(xs, ys)
        # barycentric coordinates
        v0 = p[1] - p[0]
        v1 = p[2] - p[0]
        den = v0[0] * v1[1] - v1[0] * v0[1]
        if abs(den) < 1e-12:
            continue
        dx = gx - p[0, 0]
        dy = gy - p[0, 1]
        b1 = (dx * v1[1] - v1[0] * dy) / den
        b2 = (v0[0] * dy - dx * v0[1]) / den
        b0 = 1.0 - b1 - b2
        inside = (b0 >= 0) & (b1 >= 0) & (b2 >= 0)
        if not inside.any():
            continue
        # perspective-correct depth via 1/z interpolation
        zf = tv[fi, :, 2]
        inv_z = b0 / zf[0] + b1 / zf[1] + b2 / zf[2]
        depth = 1.0 / np.maximum(inv_z, 1e-12)
        tile_z = zbuf[y0:y1, x0:x1]
        win = inside & (depth < tile_z)
        if not win.any():
            continue
        tile_z[win] = depth[win]
        zbuf[y0:y1, x0:x1] = tile_z
        tile = img[y0:y1, x0:x1]
        tile[win] = base * shade[fi]
        img[y0:y1, x0:x1] = tile

    return np.clip(img, 0, 255).astype(np.uint8), zbuf


def save_shaded_render(
    path: str,
    robot_mesh,
    pose,
    base2cam,
    K,
    hw: tuple,
    background: np.ndarray | None = None,
):
    """Pose the robot with the framework FK and write a shaded PNG.

    robot_mesh: render.mesh.RobotMesh; pose: (dof,) joint angles;
    base2cam: (4, 4); K: (3, 3); hw: (H, W). The visualization twin of
    ref urdf_robot.py:311-422's pyrender scene.
    """
    import numpy as _np
    from PIL import Image

    verts = _np.asarray(
        robot_mesh.posed_verts(
            _np.asarray(pose, _np.float32)[None],
            _np.asarray(base2cam, _np.float32)[None],
        )[0]
    )
    img, _ = render_phong(
        verts, _np.asarray(robot_mesh.faces), K, hw, background=background
    )
    Image.fromarray(img).save(path)
    return img
