"""SMPL mesh overlay renderer (software z-buffer rasterizer).

Equivalent of `utils/smpl_renderer.py` (taconite/IntrinsicAvatar, a
pyrender-based overlay used by preprocessing to verify pose fits).  pyrender
is not available in minimal environments, so this is a small numpy
rasterizer: perspective projection, back-face culling, z-buffered barycentric
fill, Lambertian shading, alpha-blended overlay.
"""

from __future__ import annotations

import numpy as np


def rasterize_mesh(verts, faces, K, w2c, H, W, light_dir=(0.3, 0.5, 0.8)):
    """Rasterize a triangle mesh.

    Args:
      verts: ``[V, 3]`` world space; faces ``[F, 3]`` int; K ``[3,3]``;
      w2c ``[4,4]``.
    Returns ``(shade [H, W], depth [H, W], mask [H, W])``.
    """
    verts = np.asarray(verts, np.float64)
    v_cam = verts @ w2c[:3, :3].T + w2c[:3, 3]
    z = v_cam[:, 2]
    uv = (v_cam @ K.T)
    uv = uv[:, :2] / np.maximum(uv[:, 2:3], 1e-9)

    tri = np.asarray(faces, np.int64)
    p = uv[tri]                                  # [F, 3, 2]
    tz = z[tri]                                  # [F, 3]

    # face normals (camera space) for shading + culling
    e1 = v_cam[tri[:, 1]] - v_cam[tri[:, 0]]
    e2 = v_cam[tri[:, 2]] - v_cam[tri[:, 0]]
    n = np.cross(e1, e2)
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    ld = np.asarray(light_dir, np.float64)
    ld /= np.linalg.norm(ld)
    shade_f = 0.25 + 0.75 * np.abs(n @ ld)

    depth = np.full((H, W), np.inf)
    shade = np.zeros((H, W))
    front = tz.min(1) > 1e-6
    order = np.argsort(-tz.mean(1))              # rough far-to-near
    for fi in order:
        if not front[fi]:
            continue
        tp = p[fi]
        x0, y0 = np.floor(tp.min(0)).astype(int)
        x1, y1 = np.ceil(tp.max(0)).astype(int) + 1
        x0, y0 = max(x0, 0), max(y0, 0)
        x1, y1 = min(x1, W), min(y1, H)
        if x0 >= x1 or y0 >= y1:
            continue
        xs, ys = np.meshgrid(np.arange(x0, x1) + 0.5,
                             np.arange(y0, y1) + 0.5)
        a, b, c = tp
        det = (b[0] - a[0]) * (c[1] - a[1]) - (c[0] - a[0]) * (b[1] - a[1])
        if abs(det) < 1e-12:
            continue
        w0 = ((b[0] - xs) * (c[1] - ys) - (c[0] - xs) * (b[1] - ys)) / det
        w1 = ((c[0] - xs) * (a[1] - ys) - (a[0] - xs) * (c[1] - ys)) / det
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        if not inside.any():
            continue
        zi = w0 * tz[fi, 0] + w1 * tz[fi, 1] + w2 * tz[fi, 2]
        sub_d = depth[y0:y1, x0:x1]
        upd = inside & (zi < sub_d)
        sub_d[upd] = zi[upd]
        shade[y0:y1, x0:x1][upd] = shade_f[fi]
    mask = np.isfinite(depth)
    return shade, np.where(mask, depth, 0.0), mask


def overlay_smpl(image, verts, faces, K, w2c, alpha=0.6,
                 color=(0.4, 0.7, 1.0)):
    """Alpha-blend a shaded SMPL mesh over an RGB image (floats in [0,1])."""
    H, W = image.shape[:2]
    shade, _, mask = rasterize_mesh(verts, faces, K, w2c, H, W)
    out = np.asarray(image, np.float32).copy()
    col = shade[..., None] * np.asarray(color, np.float32)
    out[mask] = (1 - alpha) * out[mask] + alpha * col[mask]
    return out
