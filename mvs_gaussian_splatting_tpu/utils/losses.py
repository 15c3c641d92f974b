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
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    g = np.array([math.exp(-((x - window_size // 2) ** 2) / (2 * sigma**2))
                  for x in range(window_size)], dtype=np.float32)
    g = g / g.sum()
    return np.outer(g, g)


def _depthwise_conv(img, window):
    """img [C, H, W], window [k, k] → per-channel 'same' conv with zero pad."""
    k = window.shape[0]
    kernel = jnp.asarray(window)[None, None, :, :]  # [1, 1, k, k]
    out = jax.lax.conv_general_dilated(
        img[:, None, :, :],  # treat channels as batch → depthwise
        kernel,
        window_strides=(1, 1),
        padding=[(k // 2, k // 2), (k // 2, k // 2)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out[:, 0, :, :]


def ssim(img1, img2, window_size: int = 11):
    """Mean SSIM over [C, H, W] images in [0, 1], reference-exact."""
    window = _gaussian_window(window_size, 1.5)
    mu1 = _depthwise_conv(img1, window)
    mu2 = _depthwise_conv(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise_conv(img1 * img1, window) - mu1_sq
    sigma2_sq = _depthwise_conv(img2 * img2, window) - mu2_sq
    sigma12 = _depthwise_conv(img1 * img2, window) - mu1_mu2
    C1, C2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2))
    return ssim_map.mean()


def dssim_l1_loss(pred, target, lambda_dssim: float = 0.2):
    """The training loss: (1-λ)·L1 + λ·(1-SSIM), train.py:99-101."""
    return (1.0 - lambda_dssim) * l1_loss(pred, target) + lambda_dssim * (1.0 - ssim(pred, target))
