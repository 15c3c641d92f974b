"""Quaternion / covariance / activation math (jnp, vectorized).

Behavioral parity targets: reference utils/general_utils.py (build_rotation
:78-99, build_scaling_rotation :101-110, strip_symmetric :64-76,
inverse_sigmoid :18-19) and scene/gaussian_model.py setup_functions :27-42.
"""

from __future__ import annotations

import jax.numpy as jnp


def inverse_sigmoid(x):
    return jnp.log(x / (1 - x))


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit-normalize quaternions [..., 4] (w, x, y, z) → rotation matrices [..., 3, 3]."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1)
    row1 = jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1)
    row2 = jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def build_scaling_rotation(s: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """L = R @ diag(s): [..., 3] scales + [..., 4] quats → [..., 3, 3]."""
    R = quat_to_rotmat(q)
    return R * s[..., None, :]


def covariance_from_scaling_rotation(scaling, rotation, scaling_modifier=1.0):
    """Full 3D covariance Σ = L Lᵀ, L = R·diag(mod·s). Returns [..., 3, 3].

    HIGHEST matmul precision: TPU's default bf16 inputs are too coarse for
    geometry (see ops/preprocess.py).
    """
    L = build_scaling_rotation(scaling_modifier * scaling, rotation)
    return (L[..., :, None, :] * L[..., None, :, :]).sum(-1)


def strip_symmetric(cov: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] symmetric → upper-triangle 6-vector in the reference's order
    (xx, xy, xz, yy, yz, zz)."""
    return jnp.stack([cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2],
                      cov[..., 1, 1], cov[..., 1, 2], cov[..., 2, 2]], axis=-1)


def unstrip_symmetric(c6: jnp.ndarray) -> jnp.ndarray:
    """Inverse of strip_symmetric: 6-vector → full symmetric [..., 3, 3]."""
    xx, xy, xz, yy, yz, zz = (c6[..., i] for i in range(6))
    return jnp.stack([
        jnp.stack([xx, xy, xz], -1),
        jnp.stack([xy, yy, yz], -1),
        jnp.stack([xz, yz, zz], -1),
    ], axis=-2)


def normalize(v: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """L2 normalize along axis with torch.nn.functional.normalize's eps clamp."""
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / jnp.maximum(n, eps)


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [3, 3] → unit quaternion [4] (w, x, y, z).

    Branch-free Shepperd-style construction (max-compare over the four
    candidate squared components, jit-safe) — used to express camera-frame
    Gaussian rotations in world frame (mvs/train.py)."""
    t = jnp.trace(R)
    qw2 = jnp.maximum(0.0, 1 + t)
    qx2 = jnp.maximum(0.0, 1 + R[0, 0] - R[1, 1] - R[2, 2])
    qy2 = jnp.maximum(0.0, 1 - R[0, 0] + R[1, 1] - R[2, 2])
    qz2 = jnp.maximum(0.0, 1 - R[0, 0] - R[1, 1] + R[2, 2])
    cands = jnp.stack([
        jnp.stack([qw2, R[2, 1] - R[1, 2], R[0, 2] - R[2, 0],
                   R[1, 0] - R[0, 1]]),
        jnp.stack([R[2, 1] - R[1, 2], qx2, R[0, 1] + R[1, 0],
                   R[2, 0] + R[0, 2]]),
        jnp.stack([R[0, 2] - R[2, 0], R[0, 1] + R[1, 0], qy2,
                   R[1, 2] + R[2, 1]]),
        jnp.stack([R[1, 0] - R[0, 1], R[2, 0] + R[0, 2], R[1, 2] + R[2, 1],
                   qz2]),
    ])                                                   # [4 cand, 4 comp]
    mags = jnp.stack([qw2, qx2, qy2, qz2])
    i = jnp.argmax(mags)
    q = cands[i] / (2.0 * jnp.sqrt(jnp.maximum(mags[i], 1e-12)))
    return q


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product [..., 4] ⊗ [..., 4] (w, x, y, z), broadcasting."""
    aw, ax, ay, az = (a[..., i] for i in range(4))
    bw, bx, by, bz = (b[..., i] for i in range(4))
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], axis=-1)
