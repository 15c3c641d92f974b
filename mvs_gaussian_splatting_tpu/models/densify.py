"""Adaptive density control as pure, jit-safe functions.

Replaces scene/gaussian_model.py densify_and_clone :582-610, densify_and_split
:509-580, densify_and_prune :751-773, reset_opacity :312-315,
add_densification_stats :775-777 and the optimizer surgery :386-507.

Design: all operations are masked scatters over capacity-padded arrays —
clone writes copies into free (dead) slots; split writes child 1 over the
parent slot and child 2 into a free slot (the reference's "add 2, prune
parent" is equivalent up to slot identity); prune just clears alive bits and
zeroes the Adam moments of the cleared slots (the moral equivalent of
_prune_optimizer removing rows). New slots start with zero Adam moments,
matching cat_tensors_to_optimizer's zero-extension.

Reference quirks preserved deliberately:
- densification_postfix zeroes max_radii2D (:507) *before* the screen-size
  prune check reads it (:764), so `big_points_vs` never fires — we reproduce
  that (the check is simply absent) unless cfg.fix_vs_prune is set.
- grads statistic = ‖accumulated NDC-gradient‖/denom with NaN→0 (:752-753).
- world-size prune threshold is 0.1·extent on *post-split* scalings (:765).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.transforms import inverse_sigmoid, quat_to_rotmat
from .gaussians import GaussianAux, GaussianParams


class DensifyConfig(NamedTuple):
    grad_threshold: float = 0.0002
    min_opacity: float = 0.005
    percent_dense: float = 0.01
    symmetric_split: bool = False
    fix_vs_prune: bool = False      # enable the (upstream-broken) screen-size prune
    max_screen_size: float = 20.0


def _scatter_copy(tree, src, dest):
    """tree[dest] = tree[src] for index vectors with out-of-range = drop."""
    def f(leaf):
        src_c = jnp.clip(src, 0, leaf.shape[0] - 1)
        return leaf.at[dest].set(leaf[src_c], mode="drop")
    return jax.tree.map(f, tree)


def _zero_rows(tree, dest):
    def f(leaf):
        return leaf.at[dest].set(jnp.zeros_like(leaf[jnp.clip(dest, 0, leaf.shape[0] - 1)]),
                                 mode="drop")
    return jax.tree.map(f, tree)


def _zero_rows_mask(tree, mask):
    def f(leaf):
        m = mask.reshape((-1,) + (1,) * (leaf.ndim - 1))
        return jnp.where(m, jnp.zeros_like(leaf), leaf)
    return jax.tree.map(f, tree)


def densification_grads(aux: GaussianAux) -> jnp.ndarray:
    """‖viewspace grad‖ statistic with the reference's NaN→0 guard."""
    g = aux.xyz_grad_accum / aux.denom
    return jnp.nan_to_num(g, nan=0.0, posinf=0.0, neginf=0.0)


def densify_and_prune(params: GaussianParams, mu, nu, aux: GaussianAux,
                      key: jax.Array, extent, cfg: DensifyConfig,
                      size_threshold_active) -> tuple:
    """One densification round: clone + split + prune. Static shapes.

    mu/nu: Adam moment trees shaped like params. extent: scalar scene radius.
    size_threshold_active: bool scalar — the train loop passes
    iteration > opacity_reset_interval (train.py:133).

    Returns (params, mu, nu, aux, info) where info carries event counts
    (n_cloned, n_split, n_pruned, n_dropped, n_alive).
    """
    capacity = params.xyz.shape[0]
    arange = jnp.arange(capacity)

    g = densification_grads(aux)
    scal = jnp.exp(params.scaling)
    max_scale = scal.max(axis=1)
    dense_lim = cfg.percent_dense * extent

    hot = aux.alive & (g >= cfg.grad_threshold)
    sel_clone = hot & (max_scale <= dense_lim)
    sel_split = hot & (max_scale > dense_lim)

    free_idx = jnp.nonzero(~aux.alive, size=capacity, fill_value=capacity)[0]
    n_free = (~aux.alive).sum()

    # ---- clone: copy selected rows into the first free slots -------------
    clone_src = jnp.nonzero(sel_clone, size=capacity, fill_value=capacity)[0]
    n_clone_want = sel_clone.sum()
    clone_ok = (arange < n_clone_want) & (arange < n_free)
    clone_dest = jnp.where(clone_ok, free_idx, capacity)
    n_cloned = clone_ok.sum()

    params = _scatter_copy(params, clone_src, clone_dest)
    mu = _zero_rows(mu, clone_dest)
    nu = _zero_rows(nu, clone_dest)
    alive = aux.alive.at[clone_dest].set(True, mode="drop")

    # ---- split: child1 overwrites the parent slot, child2 → free slot ----
    split_src = jnp.nonzero(sel_split, size=capacity, fill_value=capacity)[0]
    n_split_want = sel_split.sum()
    slot2 = n_cloned + arange                       # free-slot index for child2
    split_ok = (arange < n_split_want) & (slot2 < n_free)
    split_dest = jnp.where(split_ok, free_idx[jnp.clip(slot2, 0, capacity - 1)], capacity)
    n_split = split_ok.sum()

    k1, k2 = jax.random.split(key)
    noise1 = jax.random.normal(k1, (capacity, 3)) * scal
    noise2 = (-noise1 if cfg.symmetric_split
              else jax.random.normal(k2, (capacity, 3)) * scal)
    R = quat_to_rotmat(params.rotation)             # [C, 3, 3]
    off1 = jnp.einsum("cij,cj->ci", R, noise1)
    off2 = jnp.einsum("cij,cj->ci", R, noise2)
    new_scaling = jnp.log(scal / 1.6)               # exp-scale / (0.8·N), N=2

    # Child 2 first (copies the *parent* row before child 1 overwrites it).
    params = _scatter_copy(params, split_src, split_dest)
    params = params._replace(
        xyz=params.xyz.at[split_dest].add(
            off2[jnp.clip(split_src, 0, capacity - 1)], mode="drop"),
        scaling=params.scaling.at[split_dest].set(
            new_scaling[jnp.clip(split_src, 0, capacity - 1)], mode="drop"),
    )
    # Child 1 in the parent slot.
    src_ok = jnp.where(arange < n_split_want, split_src, capacity)
    src_ok_c = jnp.clip(src_ok, 0, capacity - 1)
    params = params._replace(
        xyz=params.xyz.at[src_ok].add(off1[src_ok_c], mode="drop"),
        scaling=params.scaling.at[src_ok].set(new_scaling[src_ok_c], mode="drop"),
    )
    mu = _zero_rows(mu, split_dest)
    nu = _zero_rows(nu, split_dest)
    mu = _zero_rows(mu, src_ok)
    nu = _zero_rows(nu, src_ok)
    alive = alive.at[split_dest].set(True, mode="drop")

    n_dropped = (n_clone_want - n_cloned) + (n_split_want - n_split)

    # ---- postfix: reset statistics for every point (reference :505-507) --
    aux = GaussianAux(alive=alive,
                      max_radii2d=jnp.zeros(capacity),
                      xyz_grad_accum=jnp.zeros(capacity),
                      denom=jnp.zeros(capacity))

    # ---- prune ----------------------------------------------------------
    opac = jax.nn.sigmoid(params.opacity[:, 0])
    prune = alive & (opac < cfg.min_opacity)
    big_ws = alive & (jnp.exp(params.scaling).max(axis=1) > 0.1 * extent)
    prune = prune | (size_threshold_active & big_ws)
    if cfg.fix_vs_prune:
        big_vs = alive & (aux.max_radii2d > cfg.max_screen_size)
        prune = prune | (size_threshold_active & big_vs)
    n_pruned = prune.sum()
    alive = alive & ~prune
    mu = _zero_rows_mask(mu, prune)
    nu = _zero_rows_mask(nu, prune)
    aux = aux._replace(alive=alive)

    info = {"n_cloned": n_cloned, "n_split": n_split, "n_pruned": n_pruned,
            "n_dropped": n_dropped, "n_alive": alive.sum()}
    return params, mu, nu, aux, info


def reset_opacity(params: GaussianParams, mu, nu):
    """Clamp opacities to ≤0.01 and zero the opacity Adam moments
    (reference reset_opacity :312-315 + replace_tensor_to_optimizer :386-399)."""
    new_op = inverse_sigmoid(jnp.minimum(jax.nn.sigmoid(params.opacity), 0.01))
    params = params._replace(opacity=new_op)
    mu = mu._replace(opacity=jnp.zeros_like(mu.opacity))
    nu = nu._replace(opacity=jnp.zeros_like(nu.opacity))
    return params, mu, nu


def add_densification_stats(aux: GaussianAux, radii, ndc_grad,
                            visible) -> GaussianAux:
    """Per-iteration stat update (train.py:130-131, gaussian_model.py:775-777).

    radii [C] int32, ndc_grad [C, 2] (gradient w.r.t. the NDC offset),
    visible [C] bool (radii > 0).
    """
    gn = jnp.linalg.norm(ndc_grad[:, :2], axis=-1)
    return aux._replace(
        max_radii2d=jnp.where(visible,
                              jnp.maximum(aux.max_radii2d, radii.astype(jnp.float32)),
                              aux.max_radii2d),
        xyz_grad_accum=aux.xyz_grad_accum + jnp.where(visible, gn, 0.0),
        denom=aux.denom + visible.astype(jnp.float32),
    )
