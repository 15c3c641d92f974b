"""Adaptive density control as pure, jit-safe functions.

Replaces scene/gaussian_model.py densify_and_clone :582-610, densify_and_split
:509-580, densify_and_grow :612-677, densify_and_growsplit :679-749,
densify_and_prune :751-773, reset_opacity :312-315,
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

from typing import NamedTuple, Optional

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


def _clone_into_free(params, mu, nu, alive, sel_clone, free_idx, n_free,
                     offsets=None):
    """Copy selected rows into free slots (optionally displaced by offsets)."""
    capacity = alive.shape[0]
    arange = jnp.arange(capacity)
    src = jnp.nonzero(sel_clone, size=capacity, fill_value=capacity)[0]
    n_want = sel_clone.sum()
    ok = (arange < n_want) & (arange < n_free)
    dest = jnp.where(ok, free_idx, capacity)
    n_done = ok.sum()

    params = _scatter_copy(params, src, dest)
    if offsets is not None:
        src_c = jnp.clip(src, 0, capacity - 1)
        params = params._replace(
            xyz=params.xyz.at[dest].add(offsets[src_c], mode="drop"))
    mu = _zero_rows(mu, dest)
    nu = _zero_rows(nu, dest)
    alive = alive.at[dest].set(True, mode="drop")
    return params, mu, nu, alive, n_done, n_want, dest


def _split_into_free(params, mu, nu, alive, sel_split, key, free_idx, n_free,
                     slot_offset, symmetric_split: bool,
                     split_dist: Optional[jnp.ndarray] = None,
                     scale_div: Optional[jnp.ndarray] = None):
    """Split: child 1 overwrites the parent slot, child 2 → free slot.

    split_dist [C, 3]: deterministic sample = scal·split_dist (learned split
    distance, :522-528); None → gaussian noise·scal. scale_div [C, 1]: the
    scale divisor (2·split_scale when learned, :542-546); None → 0.8·2.
    """
    capacity = alive.shape[0]
    arange = jnp.arange(capacity)
    scal = jnp.exp(params.scaling)

    split_src = jnp.nonzero(sel_split, size=capacity, fill_value=capacity)[0]
    n_want = sel_split.sum()
    slot2 = slot_offset + arange
    ok = (arange < n_want) & (slot2 < n_free)
    dest = jnp.where(ok, free_idx[jnp.clip(slot2, 0, capacity - 1)], capacity)
    n_done = ok.sum()

    if split_dist is not None:
        noise1 = scal * split_dist
        noise2 = -noise1
    else:
        k1, k2 = jax.random.split(key)
        noise1 = jax.random.normal(k1, (capacity, 3)) * scal
        noise2 = (-noise1 if symmetric_split
                  else jax.random.normal(k2, (capacity, 3)) * scal)
    R = quat_to_rotmat(params.rotation)
    hp = jax.lax.Precision.HIGHEST
    off1 = jnp.einsum("cij,cj->ci", R, noise1, precision=hp)
    off2 = jnp.einsum("cij,cj->ci", R, noise2, precision=hp)
    div = scale_div if scale_div is not None else 1.6
    new_scaling = jnp.log(scal / div)

    # Child 2 first (copies the *parent* row before child 1 overwrites it).
    params = _scatter_copy(params, split_src, dest)
    sc = jnp.clip(split_src, 0, capacity - 1)
    params = params._replace(
        xyz=params.xyz.at[dest].add(off2[sc], mode="drop"),
        scaling=params.scaling.at[dest].set(new_scaling[sc], mode="drop"),
    )
    # Only transform parents whose child-2 slot was actually granted —
    # otherwise a capacity-starved round would shrink/displace the parent
    # while never creating the second child.
    src_ok = jnp.where(ok, split_src, capacity)
    src_ok_c = jnp.clip(src_ok, 0, capacity - 1)
    params = params._replace(
        xyz=params.xyz.at[src_ok].add(off1[src_ok_c], mode="drop"),
        scaling=params.scaling.at[src_ok].set(new_scaling[src_ok_c], mode="drop"),
    )
    mu = _zero_rows(mu, dest)
    nu = _zero_rows(nu, dest)
    mu = _zero_rows(mu, src_ok)
    nu = _zero_rows(nu, src_ok)
    alive = alive.at[dest].set(True, mode="drop")
    return params, mu, nu, alive, n_done, n_want


def _postfix_and_prune(params, mu, nu, alive, extent, cfg: DensifyConfig,
                       size_threshold_active):
    capacity = alive.shape[0]
    aux = GaussianAux(alive=alive,
                      max_radii2d=jnp.zeros(capacity),
                      xyz_grad_accum=jnp.zeros(capacity),
                      denom=jnp.zeros(capacity))
    opac = jax.nn.sigmoid(params.opacity[:, 0])
    prune = alive & (opac < cfg.min_opacity)
    big_ws = alive & (jnp.exp(params.scaling).max(axis=1) > 0.1 * extent)
    prune = prune | (size_threshold_active & big_ws)
    # Quarantine any row whose parameters are non-finite (defense in depth on
    # top of optim.scrub_grads — also heals checkpoints poisoned before the
    # round-3 NaN fixes). The reference never needs this because its CUDA
    # kernels cannot emit NaN grads for culled splats.
    finite = None
    for leaf in params:
        if leaf is None:
            continue
        f = jnp.isfinite(leaf).reshape(leaf.shape[0], -1).all(-1)
        finite = f if finite is None else (finite & f)
    prune = prune | (alive & ~finite)
    if cfg.fix_vs_prune:
        big_vs = alive & (aux.max_radii2d > cfg.max_screen_size)
        prune = prune | (size_threshold_active & big_vs)
    n_pruned = prune.sum()
    alive = alive & ~prune
    mu = _zero_rows_mask(mu, prune)
    nu = _zero_rows_mask(nu, prune)
    aux = aux._replace(alive=alive)
    return params, mu, nu, aux, n_pruned


def densify_and_prune(params: GaussianParams, mu, nu, aux: GaussianAux,
                      key: jax.Array, extent, cfg: DensifyConfig,
                      size_threshold_active) -> tuple:
    """One base densification round: clone + split + prune. Static shapes.

    mu/nu: Adam moment trees shaped like params. extent: scalar scene radius.
    size_threshold_active: bool scalar — the train loop passes
    iteration > opacity_reset_interval (train.py:133).

    Returns (params, mu, nu, aux, info) where info carries event counts
    (n_cloned, n_split, n_pruned, n_dropped, n_alive).
    """
    g = densification_grads(aux)
    scal = jnp.exp(params.scaling)
    max_scale = scal.max(axis=1)
    dense_lim = cfg.percent_dense * extent

    hot = aux.alive & (g >= cfg.grad_threshold)
    sel_clone = hot & (max_scale <= dense_lim)
    sel_split = hot & (max_scale > dense_lim)

    free_idx = jnp.nonzero(~aux.alive, size=aux.alive.shape[0],
                           fill_value=aux.alive.shape[0])[0]
    n_free = (~aux.alive).sum()

    params, mu, nu, alive, n_cloned, n_clone_want, _ = _clone_into_free(
        params, mu, nu, aux.alive, sel_clone, free_idx, n_free)
    params, mu, nu, alive, n_split, n_split_want = _split_into_free(
        params, mu, nu, alive, sel_split, key, free_idx, n_free, n_cloned,
        cfg.symmetric_split)

    n_dropped = (n_clone_want - n_cloned) + (n_split_want - n_split)
    params, mu, nu, aux, n_pruned = _postfix_and_prune(
        params, mu, nu, alive, extent, cfg, size_threshold_active)

    info = {"n_cloned": n_cloned, "n_split": n_split, "n_pruned": n_pruned,
            "n_dropped": n_dropped, "n_alive": aux.alive.sum()}
    return params, mu, nu, aux, info


def densify_and_prune_grow(params: GaussianParams, mu, nu, aux: GaussianAux,
                           key: jax.Array, extent, cfg: DensifyConfig,
                           grow_cfg, sphere_dirs, size_threshold_active):
    """The grow-mode densification round (densify_and_prune :755-757):
    densify_and_grow + densify_and_growsplit + prune.

    Grow: every high-grad Gaussian spawns a copy displaced along its learned
    direction (no scale gate, :614-616), re-initializing the original's
    direction params unless prob_notreinit (:645-654). Growsplit: split where
    the candidate set ALSO includes every point grown this round (:690), with
    learned split distance/scale when enabled.
    """
    from .grow import grow_offsets  # local import to avoid cycle

    capacity = params.xyz.shape[0]
    g = densification_grads(aux)
    sel_grow = aux.alive & (g >= cfg.grad_threshold)

    free_idx = jnp.nonzero(~aux.alive, size=capacity, fill_value=capacity)[0]
    n_free = (~aux.alive).sum()

    offsets = jax.lax.stop_gradient(grow_offsets(params, sphere_dirs, grow_cfg))
    k_grow, k_reinit, k_split = jax.random.split(key, 3)
    params, mu, nu, alive, n_grown, n_grow_want, grow_dest = _clone_into_free(
        params, mu, nu, aux.alive, sel_grow, free_idx, n_free, offsets=offsets)

    if not grow_cfg.prob_notreinit:
        selc = sel_grow[:, None]
        if grow_cfg.grow_dir:
            uniform = jnp.full_like(params.dirs_prob, 1.0 / grow_cfg.num_dirs)
            params = params._replace(
                dirs_prob=jnp.where(selc, uniform, params.dirs_prob))
        elif grow_cfg.continous_dir:
            from ..utils.transforms import normalize
            fresh = normalize(jax.random.normal(k_reinit,
                                                params.conti_dirs.shape))
            params = params._replace(
                conti_dirs=jnp.where(selc, fresh, params.conti_dirs))
        if grow_cfg.grow_distance:
            params = params._replace(
                grow_dist=jnp.where(selc, 0.0, params.grow_dist))

    # growsplit: high-grad OR newly-grown, and large (:686-692)
    newly_grown = jnp.zeros(capacity, bool).at[grow_dest].set(True, mode="drop")
    max_scale = jnp.exp(params.scaling).max(axis=1)
    sel_split = (alive & ((g >= cfg.grad_threshold) | newly_grown)
                 & (max_scale > cfg.percent_dense * extent))

    split_dist = None
    scale_div = None
    if grow_cfg.learn_split_distance:
        from .gaussians import get_split_distance
        split_dist = jax.lax.stop_gradient(get_split_distance(params))
        if not grow_cfg.split_notreinit:
            params = params._replace(split_distance=jnp.where(
                sel_split[:, None], 0.0, params.split_distance))
    if grow_cfg.learn_split_scale:
        from .gaussians import get_split_scale
        scale_div = jax.lax.stop_gradient(get_split_scale(params)) * 2.0
        if not grow_cfg.split_notreinit:
            params = params._replace(split_scale=jnp.where(
                sel_split[:, None], 0.0, params.split_scale))

    params, mu, nu, alive, n_split, n_split_want = _split_into_free(
        params, mu, nu, alive, sel_split, k_split, free_idx, n_free, n_grown,
        grow_cfg.symmetric_split, split_dist=split_dist, scale_div=scale_div)

    n_dropped = (n_grow_want - n_grown) + (n_split_want - n_split)
    params, mu, nu, aux, n_pruned = _postfix_and_prune(
        params, mu, nu, alive, extent, cfg, size_threshold_active)
    info = {"n_cloned": n_grown, "n_split": n_split, "n_pruned": n_pruned,
            "n_dropped": n_dropped, "n_alive": aux.alive.sum()}
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
