"""Novel-view-synthesis metrics: PSNR / SSIM / depth RMSE.

Equivalents of the reference NVS evaluation
(mmdet3d/evaluation/metrics/Indoor_NVS.py + nerf_utils/
save_rendered_img.py:17-45, which uses skimage SSIM with
data_range=255 on uint8-rounded images).  Implemented in numpy with the
standard Gaussian-window SSIM (Wang et al.) to stay dependency-light.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def psnr(pred: np.ndarray, gt: np.ndarray, data_range: float = 1.0) -> float:
    """Peak signal-to-noise ratio (images in [0, data_range])."""
    mse = float(np.mean((np.asarray(pred, np.float64)
                         - np.asarray(gt, np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range**2 / mse))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    k = np.outer(g, g)
    return k / k.sum()


def _filter2(img: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    from scipy.signal import convolve2d

    return convolve2d(img, kernel, mode="valid")


def ssim(pred: np.ndarray, gt: np.ndarray, data_range: float = 1.0) -> float:
    """Mean SSIM over channels (Gaussian 11x11 window, K1/K2 defaults)."""
    pred = np.asarray(pred, np.float64)
    gt = np.asarray(gt, np.float64)
    if pred.ndim == 2:
        pred = pred[..., None]
        gt = gt[..., None]
    k = _gaussian_kernel()
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    vals = []
    for c in range(pred.shape[-1]):
        x, y = pred[..., c], gt[..., c]
        mu_x = _filter2(x, k)
        mu_y = _filter2(y, k)
        sxx = _filter2(x * x, k) - mu_x**2
        syy = _filter2(y * y, k) - mu_y**2
        sxy = _filter2(x * y, k) - mu_x * mu_y
        s = ((2 * mu_x * mu_y + c1) * (2 * sxy + c2)
             / ((mu_x**2 + mu_y**2 + c1) * (sxx + syy + c2)))
        vals.append(float(s.mean()))
    return float(np.mean(vals))


def depth_rmse(pred: np.ndarray, gt: np.ndarray,
               mask: Optional[np.ndarray] = None) -> float:
    """RMSE over valid (gt > 0) pixels (Indoor_NVS depth protocol)."""
    pred = np.asarray(pred, np.float64)
    gt = np.asarray(gt, np.float64)
    if mask is None:
        mask = gt > 0
    if not np.any(mask):
        return 0.0
    return float(np.sqrt(np.mean((pred[mask] - gt[mask]) ** 2)))
