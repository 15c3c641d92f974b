"""Real spherical harmonics for view-dependent color, degrees 0-4.

Matches the reference utils/sh_utils.py:26-118 (PlenOctree constants) but is
vectorized jnp and uses the rasterizer's native coefficient layout
``[..., K, 3]`` (K = (deg+1)^2 coefficients, channels last) — the layout the
CUDA rasterizer consumes and the PLY schema stores.
"""

from __future__ import annotations

import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
      -1.0925484305920792, 0.5462742152960396)
C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
      0.3731763325901154, -0.4570457994644658, 1.445305721320277,
      -0.5900435899266435)
C4 = (2.5033429417967046, -1.7701307697799304, 0.9461746957575601,
      -0.6690465435572892, 0.10578554691520431, -0.6690465435572892,
      0.47308734787878004, -1.7701307697799304, 0.6258357354491761)


def sh_basis(deg: int, dirs: jnp.ndarray) -> jnp.ndarray:
    """SH basis values [..., (deg+1)^2] at unit directions [..., 3].

    Static degree → static output width; callers mask higher coefficients to
    zero to emulate the reference's active_sh_degree warmup without recompiling.
    """
    if not (0 <= deg <= 4):
        raise ValueError(f"SH degree must be in [0, 4], got {deg}")
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    one = jnp.ones_like(x)
    basis = [C0 * one]
    if deg > 0:
        basis += [-C1 * y, C1 * z, -C1 * x]
    if deg > 1:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        basis += [C2[0] * xy, C2[1] * yz, C2[2] * (2.0 * zz - xx - yy),
                  C2[3] * xz, C2[4] * (xx - yy)]
    if deg > 2:
        basis += [C3[0] * y * (3 * xx - yy), C3[1] * xy * z,
                  C3[2] * y * (4 * zz - xx - yy),
                  C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
                  C3[4] * x * (4 * zz - xx - yy), C3[5] * z * (xx - yy),
                  C3[6] * x * (xx - 3 * yy)]
    if deg > 3:
        basis += [C4[0] * xy * (xx - yy), C4[1] * yz * (3 * xx - yy),
                  C4[2] * xy * (7 * zz - 1), C4[3] * yz * (7 * zz - 3),
                  C4[4] * (zz * (35 * zz - 30) + 3), C4[5] * xz * (7 * zz - 3),
                  C4[6] * (xx - yy) * (7 * zz - 1), C4[7] * xz * (xx - 3 * yy),
                  C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy))]
    return jnp.stack(basis, axis=-1)


def eval_sh(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH color: sh [..., K, C] (K >= (deg+1)^2), dirs [..., 3] → [..., C]."""
    k = (deg + 1) ** 2
    basis = sh_basis(deg, dirs)  # [..., k]
    import jax
    return jnp.einsum("...k,...kc->...c", basis, sh[..., :k, :],
                      precision=jax.lax.Precision.HIGHEST)


def sh_to_rgb_clamped(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray):
    """The rasterizer's SH→color path: +0.5 offset, clamp at 0.

    Returns (rgb, clamped_mask) — the mask feeds the backward pass (gradients
    through clamped channels are zeroed), matching the CUDA computeColorFromSH.
    """
    rgb = eval_sh(deg, sh, dirs) + 0.5
    clamped = rgb < 0.0
    return jnp.maximum(rgb, 0.0), clamped


def rgb2sh(rgb):
    return (rgb - 0.5) / C0


def sh2rgb(sh):
    return sh * C0 + 0.5
