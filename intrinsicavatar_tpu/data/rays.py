"""Pinhole ray generation (host-side numpy).

Equivalent of ``make_rays``/``get_ray_directions``
(`datasets/peoplesnapshot.py:19-33` in taconite/IntrinsicAvatar): pixel
centers at integer coordinates, world rays via K^-1 then c2w rotation.
"""

from __future__ import annotations

import numpy as np


def get_ray_directions(H: int, W: int) -> np.ndarray:
    x, y = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
    return np.stack([x, y, np.ones_like(x)], axis=-1)


def make_rays(K: np.ndarray, c2w: np.ndarray, H: int, W: int):
    """Returns world-space ``(rays_o, rays_d)`` of shape ``[H, W, 3]``."""
    xy = get_ray_directions(H, W).reshape(-1, 3).astype(np.float32)
    d_c = xy @ np.linalg.inv(K).T
    d_w = d_c @ c2w[:3, :3].T
    d_w = d_w / np.linalg.norm(d_w, axis=1, keepdims=True)
    o_w = np.tile(c2w[:3, 3], (len(d_w), 1))
    return (o_w.reshape(H, W, 3).astype(np.float32),
            d_w.reshape(H, W, 3).astype(np.float32))


def near_far_from_transl(transl: np.ndarray, n: int):
    """near/far = |transl| -+ 1 (`datasets/peoplesnapshot.py:156-164`)."""
    dist = float(np.sqrt(np.square(transl).sum()))
    return (np.full((n,), dist - 1.0, np.float32),
            np.full((n,), dist + 1.0, np.float32))
