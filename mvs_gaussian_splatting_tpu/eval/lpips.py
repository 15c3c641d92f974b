"""LPIPS perceptual metric (VGG16 backbone) in jnp.

Replaces lpipsPyTorch/ (modules/lpips.py:8-36, networks.py:12-96): normalized
feature-space L2 distances through VGG16 conv stacks, averaged with learned
linear heads. The reference downloads torchvision weights at runtime
(modules/utils.py:11-30); this environment has no network egress, so weights
must be provided as an .npz via $LPIPS_WEIGHTS_NPZ (keys: conv layer kernels
``features.<i>.weight``/``.bias`` in torchvision layout plus ``lin<k>`` head
weights). Without weights, constructing LPIPS raises and metrics degrade to
SSIM/PSNR-only (eval/metrics.py handles this).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv structure: (out_channels, layers-per-block); LPIPS taps the
# activations after each block's last ReLU (before pooling).
_VGG16_CFG = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class LPIPS:
    def __init__(self, weights_path: str | None = None):
        weights_path = weights_path or os.environ.get("LPIPS_WEIGHTS_NPZ", "")
        if not weights_path or not os.path.exists(weights_path):
            raise FileNotFoundError(
                "LPIPS weights unavailable (set LPIPS_WEIGHTS_NPZ to a "
                "converted torchvision VGG16 + linear-head .npz)")
        data = np.load(weights_path)
        self.convs = []       # list of blocks; each block: list of (W, b)
        idx = 0
        for out_c, n_layers in _VGG16_CFG:
            block = []
            for _ in range(n_layers):
                w = jnp.asarray(data[f"features.{idx}.weight"])  # [O, I, 3, 3]
                b = jnp.asarray(data[f"features.{idx}.bias"])
                block.append((w, b))
                idx += 2      # conv + relu
            idx += 1          # pool
            self.convs.append(block)
        self.lins = [jnp.asarray(data[f"lin{i}"]).reshape(-1)
                     for i in range(len(_VGG16_CFG))]
        self._fn = jax.jit(self._distance)

    def _features(self, x):
        """x [3, H, W] in [0,1] → list of per-block activations."""
        x = (x * 2.0 - 1.0 - jnp.asarray(_SHIFT)[:, None, None]) / \
            jnp.asarray(_SCALE)[:, None, None]
        h = x[None]
        feats = []
        for bi, block in enumerate(self.convs):
            for (w, b) in block:
                h = jax.lax.conv_general_dilated(
                    h, w, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NCHW", "OIHW", "NCHW")) + b[None, :, None, None]
                h = jax.nn.relu(h)
            feats.append(h)
            if bi < len(self.convs) - 1:
                h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                          (1, 1, 2, 2), (1, 1, 2, 2), "VALID")
        return feats

    def _distance(self, img1, img2):
        f1, f2 = self._features(img1), self._features(img2)
        total = 0.0
        for a, b, lin in zip(f1, f2, self.lins):
            a = a / jnp.sqrt((a * a).sum(1, keepdims=True) + 1e-10)
            b = b / jnp.sqrt((b * b).sum(1, keepdims=True) + 1e-10)
            d = (a - b) ** 2                       # [1, C, H, W]
            total = total + (d.mean(axis=(2, 3))[0] * lin).sum()
        return total

    def __call__(self, img1, img2) -> jnp.ndarray:
        return self._fn(img1, img2)
