"""SSIM conformance vs the reference's exact torch formulation.

The reference computes SSIM with a 2-D 11x11 Gaussian conv2d per channel
(utils/loss_utils.py:23-63). Our TPU implementation uses the separable 1-D
tap form (utils/losses.py) — same operator up to f32 summation order. This
oracle reimplements the reference formulation in torch (groups=C conv2d of
the outer-product window, zero 'same' padding) and requires tight agreement,
including on the gradient.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from mvs_gaussian_splatting_tpu.utils import losses


def _torch_ssim(img1, img2, window_size=11, sigma=1.5):
    c = img1.shape[0]
    g = torch.tensor([math.exp(-((x - window_size // 2) ** 2)
                               / (2 * sigma ** 2))
                      for x in range(window_size)])
    g = (g / g.sum()).float()
    win = (g[:, None] @ g[None, :]).expand(c, 1, window_size, window_size)
    a, b = img1[None], img2[None]
    pad = window_size // 2

    def conv(x):
        return F.conv2d(x, win, padding=pad, groups=c)

    mu1, mu2 = conv(a), conv(b)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    s1 = conv(a * a) - mu1_sq
    s2 = conv(b * b) - mu2_sq
    s12 = conv(a * b) - mu1_mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * s12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
    return ssim_map.mean()


class TestSSIMOracle:
    def test_value_matches_torch(self):
        rng = np.random.RandomState(0)
        a = rng.rand(3, 41, 57).astype(np.float32)
        b = np.clip(a + rng.randn(3, 41, 57).astype(np.float32) * 0.1, 0, 1)
        ours = float(losses.ssim(jnp.asarray(a), jnp.asarray(b)))
        ref = float(_torch_ssim(torch.tensor(a), torch.tensor(b)))
        assert ours == pytest.approx(ref, abs=2e-6), (ours, ref)

    def test_gradient_matches_torch(self):
        rng = np.random.RandomState(1)
        a = rng.rand(3, 24, 24).astype(np.float32)
        b = rng.rand(3, 24, 24).astype(np.float32)
        g_ours = np.asarray(jax.grad(
            lambda x: losses.ssim(x, jnp.asarray(b)))(jnp.asarray(a)))
        ta = torch.tensor(a, requires_grad=True)
        _torch_ssim(ta, torch.tensor(b)).backward()
        g_ref = ta.grad.numpy()
        np.testing.assert_allclose(g_ours, g_ref, atol=2e-6)

    def test_depthwise_conv_separable_equals_2d(self):
        # _depthwise_conv (two 1-D passes) vs explicit 2-D window conv
        rng = np.random.RandomState(2)
        img = rng.rand(3, 19, 23).astype(np.float32)
        win = losses._gaussian_window(11, 1.5)
        got = np.asarray(losses._depthwise_conv(jnp.asarray(img), win))
        t = F.conv2d(torch.tensor(img)[:, None],
                     torch.tensor(win)[None, None], padding=5)[:, 0].numpy()
        np.testing.assert_allclose(got, t, atol=1e-6)
