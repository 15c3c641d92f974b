"""Image losses and metrics (jnp).

Parity targets: utils/loss_utils.py (l1 :17-18, ssim :23-63) and
utils/image_utils.py (mse/psnr :14-19). SSIM uses the reference's exact
formulation: 11×11 Gaussian window (σ=1.5), per-channel depthwise conv with
zero padding of window//2, constants C1=0.01², C2=0.03².
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(pred, target):
    return jnp.abs(pred - target).mean()


def l2_loss(pred, target):
    return ((pred - target) ** 2).mean()


def mse(img1, img2):
    """Per-image MSE over flattened pixels; inputs [..., C, H, W] → [..., 1]."""
    flat = ((img1 - img2) ** 2).reshape(img1.shape[:-3] + (-1,))
    return flat.mean(axis=-1, keepdims=True)


def psnr(img1, img2):
    """Per-image PSNR (flattened-batch convention of the reference)."""
    return 20 * jnp.log10(1.0 / jnp.sqrt(mse(img1, img2)))


@lru_cache(maxsize=8)
def _gaussian_taps(window_size: int, sigma: float) -> np.ndarray:
    g = np.array([math.exp(-((x - window_size // 2) ** 2) / (2 * sigma**2))
                  for x in range(window_size)], dtype=np.float32)
    return g / g.sum()


@lru_cache(maxsize=8)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    g = _gaussian_taps(window_size, sigma)
    return np.outer(g, g)


def _blur1d(x, taps: np.ndarray, axis: int):
    """'Same' 1-D correlation with zero padding along ``axis``.

    Written as window_size static shifted multiply-adds instead of an XLA
    convolution: a 1-channel conv_general_dilated cannot use the MXU and
    lowered to ~340 ms per SSIM fwd+bwd at 504x378 on TPU; the shift form
    fuses into elementwise VPU code (<1 ms) and is exact f32.
    """
    k = len(taps)
    r = k // 2
    pad = [(0, 0)] * x.ndim
    pad[axis] = (r, r)
    xp = jnp.pad(x, pad)
    n = x.shape[axis]
    out = None
    for i in range(k):
        term = jax.lax.slice_in_dim(xp, i, i + n, axis=axis) * taps[i]
        out = term if out is None else out + term
    return out


def _depthwise_conv(img, window):
    """img [C, H, W], separable window [k, k] → per-channel 'same' conv with
    zero padding, computed as two 1-D tap passes (see :func:`_blur1d`).

    The 1-D taps are recovered from the window actually passed
    (window = outer(g, g) with g ≥ 0 ⇒ g = sqrt(diag(window))), so a caller
    supplying a different sigma gets that sigma. The reference convolves the
    2-D window in one conv2d (loss_utils.py:27-41); the separable form is
    the same operator up to f32 summation order (allclose, not bitwise)."""
    taps = np.sqrt(np.maximum(np.diagonal(np.asarray(window)), 0.0))
    return _blur1d(_blur1d(img, taps, axis=-1), taps, axis=-2)


def ssim(img1, img2, window_size: int = 11):
    """Mean SSIM over [C, H, W] images in [0, 1], reference-exact."""
    taps = _gaussian_taps(window_size, 1.5)
    # one stacked blur for all five maps — a single fused elementwise chain
    stack = jnp.stack([img1, img2, img1 * img1, img2 * img2, img1 * img2])
    blurred = _blur1d(_blur1d(stack, taps, axis=-1), taps, axis=-2)
    mu1, mu2, m11, m22, m12 = (blurred[i] for i in range(5))
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = m11 - mu1_sq
    sigma2_sq = m22 - mu2_sq
    sigma12 = m12 - mu1_mu2
    C1, C2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2))
    return ssim_map.mean()


def dssim_l1_loss(pred, target, lambda_dssim: float = 0.2):
    """The training loss: (1-λ)·L1 + λ·(1-SSIM), train.py:99-101."""
    return (1.0 - lambda_dssim) * l1_loss(pred, target) + lambda_dssim * (1.0 - ssim(pred, target))
