"""Image/video/mesh output writers.

Equivalent of ``SaverMixin`` (`utils/mixins.py:17-239` in
taconite/IntrinsicAvatar): rgb/grayscale image writers, image grids, HDR
(EXR when OpenEXR is present, .npy fallback), npy/npz dumps, mp4/gif
sequences, OBJ meshes.
"""

from __future__ import annotations

import os

import numpy as np


def _to_u8(img):
    return (np.clip(np.asarray(img), 0.0, 1.0) * 255).astype(np.uint8)


def save_rgb_image(path, img):
    """``img [H, W, 3]`` floats in [0, 1]."""
    import imageio.v2 as imageio

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    imageio.imwrite(path, _to_u8(img))


def save_grayscale_image(path, img, cmap=None, data_range=(0, 1)):
    import imageio.v2 as imageio

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    x = (np.asarray(img, np.float32) - data_range[0]) / (
        data_range[1] - data_range[0])
    imageio.imwrite(path, _to_u8(np.repeat(x[..., None], 3, -1)))


def save_image_grid(path, imgs, ncols=None):
    """Tile ``[H, W, 3]`` float images into one PNG row/grid."""
    imgs = [np.asarray(i) for i in imgs]
    H = max(i.shape[0] for i in imgs)
    W = max(i.shape[1] for i in imgs)
    padded = []
    for i in imgs:
        if i.ndim == 2:
            i = np.repeat(i[..., None], 3, -1)
        c = np.zeros((H, W, 3), np.float32)
        c[: i.shape[0], : i.shape[1]] = i[..., :3]
        padded.append(c)
    n = len(padded)
    ncols = ncols or n
    nrows = (n + ncols - 1) // ncols
    grid = np.zeros((nrows * H, ncols * W, 3), np.float32)
    for k, img in enumerate(padded):
        r, c = divmod(k, ncols)
        grid[r * H:(r + 1) * H, c * W:(c + 1) * W] = img
    save_rgb_image(path, grid)


def save_hdr(path, img):
    """HDR image: EXR if an imageio backend supports it, else Radiance
    ``.hdr`` (RGBE — the format of the reference's relighting HDRIs),
    else raw ``.npy``."""
    img = np.asarray(img, np.float32)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        import imageio.v2 as imageio
    except Exception:
        imageio = None
    if imageio is not None:
        try:
            imageio.imwrite(path, img)
            return path
        except Exception:
            pass
        try:
            alt = os.path.splitext(path)[0] + ".hdr"
            imageio.imwrite(alt, img)
            return alt
        except Exception:
            pass
    alt = os.path.splitext(path)[0] + ".npy"
    np.save(alt, img)
    return alt


def save_video(path, frames, fps=30):
    import imageio.v2 as imageio

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with imageio.get_writer(path, fps=fps) as w:
        for f in frames:
            w.append_data(_to_u8(f))


def save_npz(path, **arrays):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **{k: np.asarray(v) for k, v in arrays.items()})
