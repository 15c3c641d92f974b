"""Plane-sweep homography warping and cost-volume construction.

The MVS front end of the generalizable-splatting branch (the "MVS" in the
repo name — absent from the reference tree, named as a build target by
BASELINE.json config #4): source-view features are warped into the reference
frustum at D fronto-parallel depth planes via differentiable bilinear
sampling; the per-depth variance across views forms the cost volume
(MVSNeRF-style).

All-tensor math, XLA-friendly: the warp is one batched matmul + gather-free
bilinear interpolation; shapes are [V, C, H, W] features and [D] depths.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """img [C, H, W]; x, y [...]: pixel coords → samples [C, ...] (zeros
    outside)."""
    c, h, w = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(xi, yi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xc = jnp.clip(xi, 0, w - 1)
        yc = jnp.clip(yi, 0, h - 1)
        v = img[:, yc, xc]                      # [C, ...]
        return jnp.where(valid[None], v, 0.0)

    out = (tap(x0i, y0i) * ((1 - wx) * (1 - wy))[None]
           + tap(x0i + 1, y0i) * (wx * (1 - wy))[None]
           + tap(x0i, y0i + 1) * ((1 - wx) * wy)[None]
           + tap(x0i + 1, y0i + 1) * (wx * wy)[None])
    return out


def plane_sweep_warp(src_feat: jnp.ndarray, K_ref_inv: jnp.ndarray,
                     K_src: jnp.ndarray, rel_R: jnp.ndarray,
                     rel_t: jnp.ndarray, depths: jnp.ndarray,
                     height: int, width: int) -> jnp.ndarray:
    """Warp one source feature map into the reference frustum.

    src_feat [C, Hs, Ws]; K_ref_inv [3,3]; K_src [3,3]; rel_R/rel_t: ref-cam →
    src-cam rigid transform; depths [D] → warped [D, C, H, W].
    """
    us = jnp.arange(width, dtype=jnp.float32) + 0.5
    vs = jnp.arange(height, dtype=jnp.float32) + 0.5
    uu, vv = jnp.meshgrid(us, vs)                       # [H, W]
    rays = jnp.stack([uu, vv, jnp.ones_like(uu)], 0)    # [3, H, W]
    rays = jnp.einsum("ij,jhw->ihw", K_ref_inv, rays)   # ref-cam dirs

    def warp_depth(d):
        pts = rays * d                                  # [3, H, W] ref-cam
        p_src = (jnp.einsum("ij,jhw->ihw", rel_R, pts)
                 + rel_t[:, None, None])
        p_pix = jnp.einsum("ij,jhw->ihw", K_src, p_src)
        z = jnp.maximum(p_pix[2], 1e-6)
        x = p_pix[0] / z - 0.5
        y = p_pix[1] / z - 0.5
        behind = p_src[2] <= 1e-6
        samp = bilinear_sample(src_feat, x, y)          # [C, H, W]
        return jnp.where(behind[None], 0.0, samp)

    return jax.vmap(warp_depth)(depths)                 # [D, C, H, W]


def build_cost_volume(ref_feat: jnp.ndarray, src_feats: jnp.ndarray,
                      K_ref_inv, K_srcs, rel_Rs, rel_ts, depths,
                      height: int, width: int) -> jnp.ndarray:
    """Variance cost volume over {reference, warped sources}.

    ref_feat [C, H, W]; src_feats [V, C, Hs, Ws]; per-source intrinsics /
    relative poses stacked on axis 0 → volume [D, C, H, W] (variance across
    the V+1 views at each depth).
    """
    warped = jax.vmap(
        lambda f, K, R, t: plane_sweep_warp(f, K_ref_inv, K, R, t, depths,
                                            height, width)
    )(src_feats, K_srcs, rel_Rs, rel_ts)                # [V, D, C, H, W]
    d = depths.shape[0]
    ref = jnp.broadcast_to(ref_feat[None], (d,) + ref_feat.shape)
    all_views = jnp.concatenate([ref[None], warped], axis=0)  # [V+1, D, C, H, W]
    mean = all_views.mean(axis=0)
    var = ((all_views - mean) ** 2).mean(axis=0)
    return var                                           # [D, C, H, W]
