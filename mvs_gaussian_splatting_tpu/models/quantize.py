"""Codebook quantization for Gaussian attributes (the compression pathway).

The reference vendors VQGAN-style quantizers (quantize.py: MixQuantize :10-194,
GumbelQuantize :200-366, ArgmaxQuantize :371-502 — never imported, but the
north-star config list names "quantize.py compression", SURVEY §2.20). This
module provides the same three quantization mechanisms as pure-functional jnp,
plus a post-training compression driver for Gaussian attribute arrays:

- ``vq``: nearest-code lookup with straight-through gradients and
  commitment/codebook losses (the MixQuantize mechanism).
- ``gumbel``: Gumbel-softmax relaxed code selection with temperature.
- ``argmax``: deterministic straight-through argmax over code logits.

Compression use: fit per-attribute codebooks (f_rest / scaling / rotation) to
a trained model with k-means-style VQ updates; store (codes uint16/uint8 +
codebook) instead of full floats — the dominant memory is f_rest
(45 floats/Gaussian), giving ~10× attribute compression at 256 codes.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class CodebookState(NamedTuple):
    codebook: jnp.ndarray   # [K, D]
    counts: jnp.ndarray     # [K] EMA usage
    sums: jnp.ndarray       # [K, D] EMA sums


def init_codebook(key, num_codes: int, dim: int, data=None) -> CodebookState:
    """Random (or data-sampled) codebook init."""
    if data is not None:
        idx = jax.random.randint(key, (num_codes,), 0, data.shape[0])
        cb = data[idx]
    else:
        cb = jax.random.normal(key, (num_codes, dim)) * 0.1
    return CodebookState(codebook=cb,
                         counts=jnp.ones(num_codes),
                         sums=cb)


def nearest_code(x: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """x [N, D], codebook [K, D] → code indices [N] (one MXU matmul)."""
    d2 = ((x * x).sum(-1, keepdims=True)
          - 2.0 * x @ codebook.T
          + (codebook * codebook).sum(-1)[None, :])
    return jnp.argmin(d2, axis=-1)


def vq_quantize(x: jnp.ndarray, codebook: jnp.ndarray,
                beta: float = 0.25) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Straight-through VQ: returns (quantized, codes, loss).

    loss = ‖sg(x) − e‖² + β·‖x − sg(e)‖² (VQ-VAE commitment form).
    """
    codes = nearest_code(x, codebook)
    e = codebook[codes]
    loss = (((jax.lax.stop_gradient(x) - e) ** 2).mean()
            + beta * ((x - jax.lax.stop_gradient(e)) ** 2).mean())
    quantized = x + jax.lax.stop_gradient(e - x)
    return quantized, codes, loss


def gumbel_quantize(key, logits: jnp.ndarray, codebook: jnp.ndarray,
                    tau: float = 1.0, hard: bool = False):
    """Gumbel-softmax code mixture: logits [N, K] → (quantized [N, D], probs)."""
    g = -jnp.log(-jnp.log(jax.random.uniform(key, logits.shape) + 1e-20) + 1e-20)
    y = jax.nn.softmax((logits + g) / tau, axis=-1)
    if hard:
        idx = jnp.argmax(y, axis=-1)
        y_hard = jax.nn.one_hot(idx, logits.shape[-1], dtype=y.dtype)
        y = y_hard - jax.lax.stop_gradient(y) + y
    return y @ codebook, y


def argmax_quantize(logits: jnp.ndarray, codebook: jnp.ndarray):
    """Deterministic straight-through argmax selection (ArgmaxQuantize)."""
    y_soft = jax.nn.softmax(logits, axis=-1)
    idx = jnp.argmax(y_soft, axis=-1)
    y_hard = jax.nn.one_hot(idx, logits.shape[-1], dtype=y_soft.dtype)
    y = y_hard - jax.lax.stop_gradient(y_soft) + y_soft
    return y @ codebook, idx


def kmeans_update(state: CodebookState, x: jnp.ndarray,
                  decay: float = 0.99, eps: float = 1e-5) -> CodebookState:
    """One EMA k-means step over a batch (codebook fitting)."""
    codes = nearest_code(x, state.codebook)
    onehot = jax.nn.one_hot(codes, state.codebook.shape[0], dtype=x.dtype)
    counts = decay * state.counts + (1 - decay) * onehot.sum(0)
    sums = decay * state.sums + (1 - decay) * (onehot.T @ x)
    codebook = sums / (counts[:, None] + eps)
    return CodebookState(codebook=codebook, counts=counts, sums=sums)


def fit_codebook(key, data: jnp.ndarray, num_codes: int,
                 iters: int = 50, dead_count: float = 1e-3) -> CodebookState:
    """Fit a codebook to [N, D] data with EMA k-means.

    Codes whose EMA assignment count decays below ``dead_count`` (never or
    rarely assigned) are re-seeded to random data points each iteration —
    without this, empty clusters collapse toward the zero vector via
    sums/(counts+eps) and later snap points to spurious near-zero centroids.
    """
    state = init_codebook(key, num_codes, data.shape[-1], data)

    def body(carry, _):
        state, k = carry
        state = kmeans_update(state, data)
        k, sub = jax.random.split(k)
        ridx = jax.random.randint(sub, (num_codes,), 0, data.shape[0])
        dead = state.counts < dead_count
        seed_rows = data[ridx]
        codebook = jnp.where(dead[:, None], seed_rows, state.codebook)
        counts = jnp.where(dead, 1.0, state.counts)
        sums = jnp.where(dead[:, None], seed_rows, state.sums)
        return (CodebookState(codebook=codebook, counts=counts, sums=sums),
                k), None

    (state, _), _ = jax.lax.scan(body, (state, key), None, length=iters)
    return state


def compress_gaussians(key, gaussians: dict, num_codes: int = 256,
                       attributes=("f_rest", "scaling", "rotation")) -> dict:
    """Post-training compression: per-attribute codebooks + uint codes.

    gaussians: compacted raw arrays (models.gaussians.compact). Returns
    {"codes": {attr: [N] int32}, "codebooks": {attr: [K, D]},
     "dequantized": {attr: [N, ...]}, plus untouched attributes}.
    """
    out = {"codes": {}, "codebooks": {}, "dequantized": {}}
    for i, attr in enumerate(attributes):
        x = jnp.asarray(gaussians[attr], jnp.float32)
        flat = x.reshape(x.shape[0], -1)
        state = fit_codebook(jax.random.fold_in(key, i), flat, num_codes)
        codes = nearest_code(flat, state.codebook)
        out["codes"][attr] = codes
        out["codebooks"][attr] = state.codebook
        out["dequantized"][attr] = state.codebook[codes].reshape(x.shape)
    for k, v in gaussians.items():
        if k not in attributes:
            out[k] = v
    return out
