"""Generalizable Gaussian prediction from an MVS cost volume (flax).

MVSNeRF/MVSGaussian-style pipeline lowered to XLA: 2D feature CNN on each
input view → plane-sweep variance cost volume in the reference frustum →
3D CNN regularization → per-pixel depth distribution → pixel-aligned Gaussian
prediction heads (position from depth along the ray; rotation/scale/opacity/
color from features). The predicted set renders through the standard
ops.rasterize pipeline, trained end-to-end with the photometric loss.

This is the "MVS" capability named by the repo (SURVEY §0: no cost-volume
code exists in the reference tree; BASELINE.json config #4 targets the DTU
3-view generalizable setting).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .homography import build_cost_volume


class FeatureNet(nn.Module):
    """Small 2D CNN: image [3, H, W] → features [C, H/4, W/4]."""

    dims: Sequence[int] = (16, 32, 32)

    @nn.compact
    def __call__(self, x):
        h = x.transpose(1, 2, 0)[None]                 # NHWC
        h = nn.relu(nn.Conv(self.dims[0], (5, 5), strides=2)(h))
        h = nn.relu(nn.Conv(self.dims[1], (3, 3))(h))
        h = nn.relu(nn.Conv(self.dims[1], (3, 3), strides=2)(h))
        h = nn.Conv(self.dims[2], (3, 3))(h)
        return h[0].transpose(2, 0, 1)                 # [C, H/4, W/4]


class CostRegNet(nn.Module):
    """3D encoder-decoder over the cost volume [D, C, H, W] → [D, G, H, W]."""

    base: int = 8
    out_channels: int = 8

    @nn.compact
    def __call__(self, vol):
        h = vol.transpose(0, 2, 3, 1)[None]            # NDHWC
        c0 = nn.relu(nn.Conv(self.base, (3, 3, 3))(h))
        c1 = nn.relu(nn.Conv(self.base * 2, (3, 3, 3), strides=2)(c0))
        c2 = nn.relu(nn.Conv(self.base * 4, (3, 3, 3), strides=2)(c1))
        u1 = nn.relu(nn.ConvTranspose(self.base * 2, (3, 3, 3), strides=(2, 2, 2))(c2))
        u1 = u1[:, :c1.shape[1], :c1.shape[2], :c1.shape[3]] + c1
        u0 = nn.relu(nn.ConvTranspose(self.base, (3, 3, 3), strides=(2, 2, 2))(u1))
        u0 = u0[:, :c0.shape[1], :c0.shape[2], :c0.shape[3]] + c0
        out = nn.Conv(self.out_channels, (3, 3, 3))(u0)
        return out[0].transpose(0, 3, 1, 2)            # [D, G, H, W]


class GaussianHead(nn.Module):
    """Per-pixel Gaussian attributes from aggregated volume features.

    12 channels: depth offset (1), rotation (4), log-scale (3), opacity
    logit (1), RGB logits (3) — a real per-Gaussian color head (the round-1
    2-channel chroma modulation could not represent view-consistent scene
    color and blocked DTU-style training)."""

    @nn.compact
    def __call__(self, feat):
        # feat [F, H, W] → [H, W, F]
        h = feat.transpose(1, 2, 0)
        h = nn.relu(nn.Dense(64)(h))
        h = nn.relu(nn.Dense(64)(h))
        out = nn.Dense(12)(h)                          # per-pixel attributes
        return out                                     # [H, W, 12]


class MVSGaussianModel(nn.Module):
    """3-view generalizable splatting: views + poses → Gaussian cloud."""

    num_depths: int = 32
    feat_dims: Sequence[int] = (16, 32, 32)

    @nn.compact
    def __call__(self, ref_image, src_images, K_ref, K_srcs, rel_Rs, rel_ts,
                 near: float, far: float):
        """ref_image [3, H, W]; src_images [V, 3, H, W]; K_ref at FEATURE
        resolution (H/4); returns dict of Gaussian arrays (one per feature
        pixel) ready for ops.rasterize, plus the depth map."""
        fnet = FeatureNet(self.feat_dims)
        ref_feat = fnet(ref_image)                     # [C, h, w]
        src_feats = jax.vmap(fnet)(src_images)         # [V, C, h, w]
        c, h, w = ref_feat.shape

        depths = jnp.linspace(near, far, self.num_depths)
        K_ref_inv = jnp.linalg.inv(K_ref)
        vol = build_cost_volume(ref_feat, src_feats, K_ref_inv, K_srcs,
                                rel_Rs, rel_ts, depths, h, w)  # [D, C, h, w]
        reg = CostRegNet()(vol)                        # [D, G, h, w]

        # depth distribution from the first regularized channel
        logits = reg[:, 0]                             # [D, h, w]
        prob = jax.nn.softmax(logits, axis=0)
        depth = (prob * depths[:, None, None]).sum(0)  # [h, w]

        # aggregate features at the expected depth + reference features +
        # the (downsampled) reference colors so the head can anchor its RGB
        # prediction on the observed image
        ref_small = jax.image.resize(ref_image, (3, h, w), "bilinear")
        agg = (prob[:, None] * reg).sum(0)             # [G, h, w]
        head_in = jnp.concatenate([agg, ref_feat, ref_small], axis=0)
        attrs = GaussianHead()(head_in)                # [h, w, 12]

        # pixel-aligned Gaussians: position = ray · (depth + learned offset)
        us = jnp.arange(w, dtype=jnp.float32) + 0.5
        vs = jnp.arange(h, dtype=jnp.float32) + 0.5
        uu, vv = jnp.meshgrid(us, vs)
        rays = jnp.einsum("ij,jhw->ihw", K_ref_inv,
                          jnp.stack([uu, vv, jnp.ones_like(uu)], 0))
        depth_off = 0.1 * jnp.tanh(attrs[..., 0])
        z = jnp.clip(depth + depth_off, near, far)
        xyz_cam = rays * z[None]                       # [3, h, w] (ref cam)

        n = h * w
        xyz = xyz_cam.reshape(3, n).T
        rot = attrs[..., 1:5].reshape(n, 4) + jnp.array([1.0, 0, 0, 0])
        base_scale = (far - near) / self.num_depths
        log_scale = (attrs[..., 5:8].reshape(n, 3)
                     + jnp.log(base_scale))
        opacity = attrs[..., 8:9].reshape(n, 1)
        # direct per-Gaussian RGB, biased toward the observed reference
        # color: logits init near 0 ⇒ color starts at the reference pixel
        # (logit-space residual), then trains freely per Gaussian
        base_rgb = ref_small.reshape(3, n).T
        base_logit = jnp.log(jnp.clip(base_rgb, 1e-3, 1 - 1e-3)
                             / (1 - jnp.clip(base_rgb, 1e-3, 1 - 1e-3)))
        colors = jax.nn.sigmoid(attrs[..., 9:12].reshape(n, 3) + base_logit)

        return {"xyz_cam": xyz, "rotation": rot, "log_scaling": log_scale,
                "opacity_logit": opacity, "colors": colors, "depth": depth}
