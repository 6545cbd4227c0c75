"""Evaluation metrics: PSNR, SSIM, LPIPS (optional), normal angular error.

Equivalents of `systems/criterions.py` (taconite/IntrinsicAvatar): masked
PSNR, bbox-cropped SSIM (Gaussian-window, matching skimage defaults
``gaussian_weights=True, sigma=1.5, use_sample_covariance=False``),
bbox-cropped LPIPS (optional — requires the ``lpips`` package, absent in
minimal environments), mean angular normal error in degrees.
"""

from __future__ import annotations

import numpy as np


def masked_psnr(pred: np.ndarray, gt: np.ndarray,
                mask: np.ndarray | None = None) -> float:
    """PSNR over masked pixels (`systems/criterions.py:43`)."""
    pred = np.asarray(pred, np.float64)
    gt = np.asarray(gt, np.float64)
    if mask is not None:
        m = np.asarray(mask, bool).reshape(-1)
        pred = pred.reshape(-1, pred.shape[-1])[m]
        gt = gt.reshape(-1, gt.shape[-1])[m]
    mse = np.mean((pred - gt) ** 2)
    return float(-10.0 * np.log10(np.maximum(mse, 1e-12)))


def bbox_of_mask(mask: np.ndarray):
    ys, xs = np.where(np.asarray(mask) > 0)
    if len(ys) == 0:
        return 0, mask.shape[0], 0, mask.shape[1]
    return ys.min(), ys.max() + 1, xs.min(), xs.max() + 1


def _gaussian_window(size=11, sigma=1.5):
    x = np.arange(size) - size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    g /= g.sum()
    return np.outer(g, g)


def ssim(img0: np.ndarray, img1: np.ndarray, data_range: float = 1.0) -> float:
    """Gaussian-window SSIM over an image pair ``[H, W, C]``.

    Matches skimage's ``structural_similarity(..., gaussian_weights=True,
    sigma=1.5, use_sample_covariance=False)`` — the configuration used by
    the reference (`systems/criterions.py:83`).
    """
    from scipy.signal import fftconvolve

    img0 = np.asarray(img0, np.float64)
    img1 = np.asarray(img1, np.float64)
    if img0.ndim == 2:
        img0 = img0[..., None]
        img1 = img1[..., None]
    win = _gaussian_window(11, 1.5)
    C1 = (0.01 * data_range) ** 2
    C2 = (0.03 * data_range) ** 2

    def filt(x):
        return np.stack([
            fftconvolve(x[..., c], win, mode="valid")
            for c in range(x.shape[-1])
        ], -1)

    mu0, mu1 = filt(img0), filt(img1)
    mu00, mu11, mu01 = mu0 * mu0, mu1 * mu1, mu0 * mu1
    s00 = filt(img0 * img0) - mu00
    s11 = filt(img1 * img1) - mu11
    s01 = filt(img0 * img1) - mu01
    num = (2 * mu01 + C1) * (2 * s01 + C2)
    den = (mu00 + mu11 + C1) * (s00 + s11 + C2)
    return float(np.mean(num / den))


def cropped_ssim(pred, gt, mask) -> float:
    """SSIM over the tight bbox of ``mask`` (`systems/criterions.py:83`)."""
    y0, y1, x0, x1 = bbox_of_mask(mask)
    return ssim(pred[y0:y1, x0:x1], gt[y0:y1, x0:x1])


def lpips_fn():
    """Returns a LPIPS(VGG) callable or None if unavailable in this env.

    Preference order: the pure-JAX implementation (weights npz via
    ``INTRINSICAVATAR_LPIPS_WEIGHTS``, see utils/lpips_jax.py), then the
    torch ``lpips`` package; None when neither has weights (documented
    protocol deviation — BASELINE.md)."""
    try:
        from intrinsicavatar_tpu.utils import lpips_jax
        jf = lpips_jax.lpips_fn()
        if jf is not None:
            def compute_jax(pred, gt, mask=None):
                if mask is not None:
                    y0, y1, x0, x1 = bbox_of_mask(mask)
                    pred, gt = pred[y0:y1, x0:x1], gt[y0:y1, x0:x1]
                return jf(pred, gt)

            return compute_jax
    except Exception:
        pass
    try:
        import lpips as _lpips
        import torch

        net = _lpips.LPIPS(net="vgg")

        def compute(pred, gt, mask=None):
            if mask is not None:
                y0, y1, x0, x1 = bbox_of_mask(mask)
                pred, gt = pred[y0:y1, x0:x1], gt[y0:y1, x0:x1]
            to_t = lambda x: torch.from_numpy(
                np.asarray(x, np.float32).transpose(2, 0, 1)[None] * 2 - 1)
            with torch.no_grad():
                return float(net(to_t(pred), to_t(gt)))

        return compute
    except Exception:
        return None


def normal_angular_error_deg(pred: np.ndarray, gt: np.ndarray,
                             mask: np.ndarray | None = None) -> float:
    """Mean angular error between unit normal maps, degrees
    (`systems/criterions.py:58`)."""
    pred = np.asarray(pred, np.float64)
    gt = np.asarray(gt, np.float64)
    pred = pred / np.maximum(np.linalg.norm(pred, axis=-1, keepdims=True),
                             1e-6)
    gt = gt / np.maximum(np.linalg.norm(gt, axis=-1, keepdims=True), 1e-6)
    cos = np.clip(np.sum(pred * gt, -1), -1.0, 1.0)
    ang = np.degrees(np.arccos(cos))
    if mask is not None:
        ang = ang[np.asarray(mask, bool)]
    return float(np.mean(ang))


def albedo_aligned_metrics(pred_albedo, gt_albedo, mask):
    """Channel-aligned albedo PSNR (+ the rescale factors).

    The reference aligns predicted albedo to GT with per-channel
    least-squares scales before computing metrics
    (`models/utils.py:268-277`, `systems/intrinsic_avatar.py:598-611`).
    """
    m = np.asarray(mask, bool).reshape(-1)
    p = np.asarray(pred_albedo).reshape(-1, 3)[m]
    g = np.asarray(gt_albedo).reshape(-1, 3)[m]
    scale = (g * p).sum(0) / np.maximum((p * p).sum(0), 1e-12)
    aligned = np.clip(np.asarray(pred_albedo) * scale, 0.0, 1.0)
    return masked_psnr(aligned.reshape(-1, 3)[m], g), scale
