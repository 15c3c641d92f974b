"""Single-image 2D Gaussian splatting fit — the CPU-runnable toy.

Re-creates the capabilities of the vendored OutofAi/2D-Gaussian-Splatting
(2D-Gaussian-Splatting-main/2d_gaussian_splatting.py): fit ~1K anisotropic 2D
Gaussians to one image with L1+D-SSIM loss (λ=0.2, :200-202), alpha-weighted
sum compositing with clamp (:116-121), pruning by alpha < 0.01 (:306-315) and
gradient/size-thresholded split/clone into a fixed-capacity slot pool
(:344-383) — the reference's persistent-mask pool is already the
XLA-friendly fixed-shape pattern, so this is a natural jnp redesign: direct
quadratic-form evaluation on the pixel grid replaces the reference's
kernel-pad + affine_grid/grid_sample pipeline.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.losses import dssim_l1_loss


class Splat2DParams(NamedTuple):
    sigma: jnp.ndarray   # [C, 2] pre-sigmoid scales
    rho: jnp.ndarray     # [C] pre-tanh correlation
    alpha: jnp.ndarray   # [C] logit opacity
    color: jnp.ndarray   # [C, 3] logit color
    xy: jnp.ndarray      # [C, 2] center in [-1, 1] (tanh-activated)


def init_splats(key, capacity: int, n_alive: int):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    params = Splat2DParams(
        sigma=jax.random.uniform(k1, (capacity, 2), minval=-2.0, maxval=-1.0),
        rho=jnp.zeros(capacity),
        alpha=jax.random.uniform(k2, (capacity,), minval=-1.0, maxval=1.0),
        color=jax.random.uniform(k3, (capacity, 3), minval=-1.0, maxval=1.0),
        xy=jax.random.uniform(k4, (capacity, 2), minval=-1.2, maxval=1.2),
    )
    alive = jnp.arange(capacity) < n_alive
    return params, alive


def render_splats2d(params: Splat2DParams, alive, height: int, width: int):
    """Sum-composited image [3, H, W] in [0, 1]."""
    sx = jax.nn.sigmoid(params.sigma[:, 0])
    sy = jax.nn.sigmoid(params.sigma[:, 1])
    rho = jnp.tanh(params.rho)
    a = jax.nn.sigmoid(params.alpha) * alive
    c = jax.nn.sigmoid(params.color)
    cx = jnp.tanh(params.xy[:, 0])
    cy = jnp.tanh(params.xy[:, 1])

    # inverse covariance of [[sx², ρ·sx·sy], [ρ·sx·sy, sy²]]
    det = (sx * sy) ** 2 * (1 - rho**2)
    inv_a = sy**2 / det
    inv_c = sx**2 / det
    inv_b = -rho * sx * sy / det

    ys = jnp.linspace(-1.0, 1.0, height)
    xs = jnp.linspace(-1.0, 1.0, width)
    dx = xs[None, None, :] - cx[:, None, None]     # [C, 1, W]
    dy = ys[None, :, None] - cy[:, None, None]     # [C, H, 1]
    q = (inv_a[:, None, None] * dx * dx + inv_c[:, None, None] * dy * dy
         + 2 * inv_b[:, None, None] * dx * dy)
    g = jnp.exp(-0.5 * q)                          # [C, H, W]
    img = jnp.einsum("nhw,nc,n->chw", g, c, a)
    return jnp.clip(img, 0.0, 1.0)


def _densify(params: Splat2DParams, alive, grads_xy, key, *,
             grad_threshold: float, size_threshold: float):
    """Prune by opacity, then split (large) / clone (small) high-grad splats
    into free slots. Pure function; fixed shapes."""
    capacity = alive.shape[0]
    arange = jnp.arange(capacity)

    opac = jax.nn.sigmoid(params.alpha)
    alive = alive & (opac >= 0.01)

    gnorm = jnp.linalg.norm(grads_xy, axis=-1)
    size = jax.nn.sigmoid(params.sigma).max(axis=-1)
    hot = alive & (gnorm > grad_threshold)
    sel_split = hot & (size > size_threshold)
    sel_clone = hot & ~(size > size_threshold)

    free_idx = jnp.nonzero(~alive, size=capacity, fill_value=capacity)[0]
    n_free = (~alive).sum()

    def scatter_copy(tree, src, dest):
        def f(leaf):
            src_c = jnp.clip(src, 0, capacity - 1)
            return leaf.at[dest].set(leaf[src_c], mode="drop")
        return jax.tree.map(f, tree)

    # clones first
    clone_src = jnp.nonzero(sel_clone, size=capacity, fill_value=capacity)[0]
    n_clone = jnp.minimum(sel_clone.sum(), n_free)
    clone_dest = jnp.where(arange < n_clone, free_idx, capacity)
    params = scatter_copy(params, clone_src, clone_dest)
    alive = alive.at[clone_dest].set(True, mode="drop")

    # splits: shrink parent, copy child into a free slot with jittered center
    split_src = jnp.nonzero(sel_split, size=capacity, fill_value=capacity)[0]
    slot2 = n_clone + arange
    n_split = jnp.minimum(sel_split.sum(), jnp.maximum(n_free - n_clone, 0))
    split_dest = jnp.where(arange < n_split,
                           free_idx[jnp.clip(slot2, 0, capacity - 1)], capacity)
    params = scatter_copy(params, split_src, split_dest)
    jitter = jax.random.normal(key, (capacity, 2)) * 0.02
    shrink = params.sigma - jnp.log(2.0)   # sigmoid-space halving (approx)
    src_ok = jnp.where(arange < sel_split.sum(), split_src, capacity)
    src_c = jnp.clip(src_ok, 0, capacity - 1)
    params = params._replace(
        sigma=params.sigma.at[src_ok].set(shrink[src_c], mode="drop"),
        xy=params.xy.at[split_dest].add(jitter[src_c], mode="drop"),
    )
    params = params._replace(
        sigma=params.sigma.at[split_dest].set(
            shrink[jnp.clip(split_src, 0, capacity - 1)], mode="drop"))
    alive = alive.at[split_dest].set(True, mode="drop")
    return params, alive


def fit_image(target: np.ndarray, *, capacity: int = 5000, n_init: int = 1000,
              epochs: int = 500, lr: float = 0.01,
              densification_interval: int = 100,
              grad_threshold: float = 0.002, size_threshold: float = 0.75,
              lambda_dssim: float = 0.2, seed: int = 0, log_fn=None):
    """Fit 2D Gaussians to target [3, H, W] in [0,1]. Returns
    (params, alive, history dict)."""
    import optax

    height, width = target.shape[1], target.shape[2]
    tgt = jnp.asarray(target, jnp.float32)
    key = jax.random.PRNGKey(seed)
    key, sub = jax.random.split(key)
    params, alive = init_splats(sub, capacity, n_init)
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, alive):
        def loss_fn(p):
            img = render_splats2d(p, alive, height, width)
            return dssim_l1_loss(img, tgt, lambda_dssim)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, grads.xy

    densify = jax.jit(partial(_densify, grad_threshold=grad_threshold,
                              size_threshold=size_threshold))

    history = {"loss": [], "n_alive": []}
    for epoch in range(epochs):
        params, opt_state, loss, gxy = step(params, opt_state, alive)
        if epoch > 0 and epoch % densification_interval == 0:
            key, sub = jax.random.split(key)
            params, alive = densify(params, alive, gxy, sub)
            opt_state = tx.init(params)   # reference re-creates the optimizer
        if epoch % 50 == 0:
            history["loss"].append(float(loss))
            history["n_alive"].append(int(alive.sum()))
            if log_fn:
                log_fn(f"epoch {epoch}: loss {float(loss):.4f} "
                       f"alive {int(alive.sum())}")
    return params, alive, history


def main(argv=None):
    """Script entry mirroring the reference toy's config.yml workflow
    (2d_gaussian_splatting.py:222-238): fit an image, save the render.

    Accepts the reference's config.yml keys (primary_samples,
    backup_samples, num_epochs, densification_interval, learning_rate,
    image_file_name, gradient_threshold, gaussian_threshold, image_size);
    CLI flags override.
    """
    import argparse
    import os

    import numpy as np
    from PIL import Image

    parser = argparse.ArgumentParser(description="2D Gaussian splat fit")
    parser.add_argument("--config", default="", help="reference-format yml")
    parser.add_argument("--image", default="")
    parser.add_argument("--epochs", type=int, default=None)
    parser.add_argument("--out", default="2d_fit.png")
    args = parser.parse_args(argv)

    cfg = {}
    if args.config:
        import yaml
        with open(args.config) as f:
            cfg = yaml.safe_load(f)
    image_path = args.image or cfg.get("image_file_name", "")
    if not image_path:
        parser.error("need --image or image_file_name in --config")
    size = cfg.get("image_size", [256, 256, 3])
    img = Image.open(image_path).convert("RGB").resize((size[1], size[0]))
    target = np.asarray(img, np.float32).transpose(2, 0, 1) / 255.0

    n_init = int(cfg.get("primary_samples", 1000))
    capacity = n_init + int(cfg.get("backup_samples", 4000))
    epochs = args.epochs or int(cfg.get("num_epochs", 500))
    params, alive, history = fit_image(
        target, capacity=capacity, n_init=n_init, epochs=epochs,
        lr=float(cfg.get("learning_rate", 0.01)),
        densification_interval=int(cfg.get("densification_interval", 100)),
        grad_threshold=float(cfg.get("gradient_threshold", 0.002)),
        size_threshold=float(cfg.get("gaussian_threshold", 0.75)),
        log_fn=print)
    out = np.asarray(render_splats2d(params, alive, target.shape[1],
                                     target.shape[2]))
    Image.fromarray((np.clip(out, 0, 1).transpose(1, 2, 0) * 255)
                    .astype(np.uint8)).save(args.out)
    print(f"saved {args.out} (loss history {history['loss'][-1]:.4f}, "
          f"{int(alive.sum())} splats)")


if __name__ == "__main__":
    main()
