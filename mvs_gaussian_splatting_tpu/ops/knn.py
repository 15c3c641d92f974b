"""k-NN mean squared distance for scale initialization.

Replaces the simple-knn CUDA submodule's ``distCUDA2`` (used once at model
init, scene/gaussian_model.py:210-211): mean squared distance from each point
to its 3 nearest neighbors. Chunked O(N²/chunk) jnp top-k — init-time only,
so brute force on the MXU-friendly distance matrix is plenty fast.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mean_sq_dist_to_knn(points: jnp.ndarray, k: int = 3,
                        chunk: int = 4096) -> jnp.ndarray:
    """points [N, 3] → [N] mean of squared distances to the k nearest others."""
    n = points.shape[0]
    pad = (-n) % chunk
    q = jnp.pad(points, ((0, pad), (0, 0)))
    sq = (points * points).sum(-1)  # [N]

    def body(qc):
        # [C, N] squared distances via the expanded form (one matmul).
        d2 = ((qc * qc).sum(-1)[:, None]
              - 2.0 * jnp.dot(qc, points.T,
                              precision=jax.lax.Precision.HIGHEST)
              + sq[None, :])
        # top-(k+1) smallest includes self (distance ~0); drop the smallest.
        neg_top, _ = jax.lax.top_k(-d2, k + 1)
        d2k = -neg_top[:, 1:]
        return jnp.maximum(d2k, 0.0).mean(-1)

    out = jax.lax.map(body, q.reshape(-1, chunk, 3))
    return out.reshape(-1)[:n]
