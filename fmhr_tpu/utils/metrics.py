"""Image quality metrics: PSNR (standard + reference formula), SSIM.

The reference's PSNR uses non-standard constants — `28*log10` and MSE
renormalized by the mask area (`/root/reference/neural_render.py:32-39`).
We provide standard PSNR as the headline metric and `psnr_reference` for
parity comparisons (BASELINE.md note). SSIM is implemented here (skimage
isn't in the image) following the standard Wang et al. formulation with
the same defaults skimage uses for floats (gaussian_weights=False,
win_size=7, K1=0.01, K2=0.03).
"""

from __future__ import annotations

import math

import numpy as np


def psnr(img1: np.ndarray, img2: np.ndarray, data_range: float = 1.0) -> float:
    """Standard PSNR in dB."""
    img1 = np.asarray(img1, np.float64)
    img2 = np.asarray(img2, np.float64)
    mse = float(np.mean((img1 - img2) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * math.log10(data_range ** 2 / mse)


def psnr_reference(img1: np.ndarray, img2: np.ndarray, mask: np.ndarray) -> float:
    """The reference's formula, bug-for-bug (`neural_render.py:32-39`):
    mask-renormalized MSE and a 28 (not 20) multiplier."""
    img1 = np.asarray(img1, np.float64)
    img2 = np.asarray(img2, np.float64)
    mse = np.mean((img1 - img2) ** 2) * (img2.shape[0] * img2.shape[1]) / mask.sum()
    if mse == 0:
        return float("inf")
    return 28 * math.log10(1.0 / math.sqrt(mse))


def _uniform_filter(img: np.ndarray, size: int) -> np.ndarray:
    """Separable box filter with 'reflect' boundary, any trailing dims."""
    pad = size // 2
    out = img.astype(np.float64)
    for axis in (0, 1):
        p = [(0, 0)] * out.ndim
        p[axis] = (pad, pad)
        padded = np.pad(out, p, mode="reflect")
        c = np.cumsum(padded, axis=axis)
        zeros = np.zeros_like(np.take(c, [0], axis=axis))
        c = np.concatenate([zeros, c], axis=axis)
        hi = np.take(c, np.arange(size, size + out.shape[axis]), axis=axis)
        lo = np.take(c, np.arange(0, out.shape[axis]), axis=axis)
        out = (hi - lo) / size
    return out


def ssim(
    img1: np.ndarray,
    img2: np.ndarray,
    data_range: float = 1.0,
    win_size: int = 7,
    K1: float = 0.01,
    K2: float = 0.03,
) -> float:
    """Mean SSIM over the image; channels averaged (channel_axis=2 style,
    parity with the eval call at `neural_render.py:307`)."""
    img1 = np.asarray(img1, np.float64)
    img2 = np.asarray(img2, np.float64)
    if img1.ndim == 2:
        img1, img2 = img1[..., None], img2[..., None]

    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    NP = win_size ** 2
    cov_norm = NP / (NP - 1)

    ux = _uniform_filter(img1, win_size)
    uy = _uniform_filter(img2, win_size)
    uxx = _uniform_filter(img1 * img1, win_size)
    uyy = _uniform_filter(img2 * img2, win_size)
    uxy = _uniform_filter(img1 * img2, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    num = (2 * ux * uy + C1) * (2 * vxy + C2)
    den = (ux ** 2 + uy ** 2 + C1) * (vx + vy + C2)
    s = num / den
    pad = (win_size - 1) // 2
    s = s[pad:-pad or None, pad:-pad or None]
    return float(s.mean())
