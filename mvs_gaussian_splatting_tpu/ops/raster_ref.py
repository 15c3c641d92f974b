"""Naive per-pixel reference rasterizer (the conformance oracle).

Plays the role the reference's --convert_SHs_python / --convert_cov3D_python
oracles play for the CUDA kernels (arguments/__init__.py:76-77, SURVEY §4):
a slow, obviously-correct, differentiable-by-construction implementation of
the exact compositing semantics of the CUDA renderCUDA loop:

- global front-to-back order by camera depth (stable sort)
- power = −½(a·dx² + c·dy²) − b·dx·dy, skip if power > 0
- alpha = min(0.99, opacity·exp(power)), skip if alpha < 1/255
- terminate (excluding the current Gaussian) when T·(1−alpha) < 1e-4
- out = Σ c·α·T + T_final·bg

O(N·H·W) memory/compute — use only for small scenes and tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .preprocess import Processed


def composite_order(processed: Processed) -> jnp.ndarray:
    """Depth-ascending order over visible Gaussians (invisible sort last)."""
    key = jnp.where(processed.mask, processed.depth, jnp.inf)
    return jnp.argsort(key, stable=True)


def rasterize_reference(processed: Processed, image_width: int, image_height: int,
                        bg_color: jnp.ndarray, return_aux: bool = False,
                        tile_w: int = 16, tile_h: int = 16):
    """Composite all Gaussians against every pixel. Returns [3, H, W] image.

    Applies the CUDA rasterizer's tile-footprint cut: a Gaussian only touches
    pixels whose tile lies inside its radius bbox (getRect semantics) — this
    makes the oracle bit-comparable with the tiled path.

    With return_aux=True also returns dict(final_T [H, W], contrib [H, W]).
    """
    order = composite_order(processed)
    xy = processed.xy[order]          # [N, 2]
    conic = processed.conic[order]    # [N, 3]
    rgb = processed.rgb[order]        # [N, 3]
    opacity = processed.opacity[order]
    valid = processed.mask[order]
    rect_min = processed.rect_min[order]
    rect_max = processed.rect_max[order]

    px = jnp.arange(image_width, dtype=jnp.float32)
    py = jnp.arange(image_height, dtype=jnp.float32)
    dx = xy[:, 0, None, None] - px[None, None, :]   # [N, H→1, W]
    dy = xy[:, 1, None, None] - py[None, :, None]   # [N, H, W→1]
    power = (-0.5 * (conic[:, 0, None, None] * dx * dx
                     + conic[:, 2, None, None] * dy * dy)
             - conic[:, 1, None, None] * dx * dy)   # [N, H, W]

    tile_x = (jnp.arange(image_width) // tile_w).astype(jnp.int32)
    tile_y = (jnp.arange(image_height) // tile_h).astype(jnp.int32)
    in_rect = ((tile_x[None, None, :] >= rect_min[:, 0, None, None])
               & (tile_x[None, None, :] < rect_max[:, 0, None, None])
               & (tile_y[None, :, None] >= rect_min[:, 1, None, None])
               & (tile_y[None, :, None] < rect_max[:, 1, None, None]))

    alpha = jnp.minimum(0.99, opacity[:, None, None] * jnp.exp(power))
    contributes = (valid[:, None, None] & in_rect & (power <= 0.0)
                   & (alpha >= 1.0 / 255.0))
    alpha = jnp.where(contributes, alpha, 0.0)

    # Exclusive transmittance before each Gaussian, then the termination rule:
    # a Gaussian that would push T below 1e-4 is dropped and ends the pixel.
    one_minus = 1.0 - alpha
    ones = jnp.ones_like(one_minus[:1])
    T_excl = jnp.cumprod(jnp.concatenate([ones, one_minus[:-1]], axis=0), axis=0)
    fail = contributes & (T_excl * one_minus < 1e-4)
    done_before = jnp.cumsum(fail.astype(jnp.int32), axis=0) - fail.astype(jnp.int32)
    include = contributes & (done_before == 0) & ~fail

    w = jnp.where(include, alpha * T_excl, 0.0)              # [N, H, W]
    image = jnp.einsum("nhw,nc->chw", w, rgb,
                       precision=jax.lax.Precision.HIGHEST)
    final_T = jnp.prod(jnp.where(include, one_minus, 1.0), axis=0)  # [H, W]
    image = image + final_T[None] * bg_color[:, None, None]

    if return_aux:
        contrib = include.sum(axis=0)
        return image, {"final_T": final_T, "contrib": contrib}
    return image
