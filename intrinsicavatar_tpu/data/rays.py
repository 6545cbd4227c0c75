"""Pinhole ray generation (host-side numpy).

Covers the role of the reference's ray construction
(`datasets/peoplesnapshot.py:19-33` in taconite/IntrinsicAvatar): pixel
grid at integer coordinates, back-projected through the intrinsics and
rotated into world space.  Implemented here as a single batched
linear-system solve (no explicit ``K^-1``) over column-stacked
homogeneous pixels.
"""

from __future__ import annotations

import numpy as np


def make_rays(K: np.ndarray, c2w: np.ndarray, H: int, W: int):
    """World-space ``(origins, directions)``, each ``[H, W, 3]`` f32.

    Back-projects every pixel center (integer-coordinate convention, to
    match the reference dataset) by solving ``K @ d_cam = pixel`` for
    all pixels at once, then rotates into world space and normalizes.
    """
    v, u = np.mgrid[0:H, 0:W].astype(np.float64)
    pix = np.stack([u.ravel(), v.ravel(), np.ones(H * W)])       # [3, HW]
    d_cam = np.linalg.solve(np.asarray(K, np.float64), pix)      # [3, HW]
    d_world = np.asarray(c2w[:3, :3], np.float64) @ d_cam        # [3, HW]
    d_world /= np.linalg.norm(d_world, axis=0, keepdims=True)
    directions = d_world.T.reshape(H, W, 3).astype(np.float32)
    origins = np.broadcast_to(
        np.asarray(c2w[:3, 3], np.float32), (H, W, 3)).copy()
    return origins, directions


def near_far_from_transl(transl: np.ndarray, n: int):
    """Scene bounds from the camera-to-pelvis distance: ``|transl| ∓ 1``
    (semantics of `datasets/peoplesnapshot.py:156-164`)."""
    dist = float(np.linalg.norm(np.asarray(transl, np.float64)))
    near = np.full((n,), dist - 1.0, np.float32)
    return near, near + 2.0
