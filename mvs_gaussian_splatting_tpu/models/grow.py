"""Learnable-densification research features ("grow" fork additions).

Re-creates the fork's contributions on top of base 3DGS (SURVEY §0):

- **Grow directions**: per-Gaussian direction distributions — discrete
  128-way softmax over a Fibonacci sphere with straight-through argmax
  (gaussian_model.py argmax_softmax :360-366) or a continuous unit vector —
  plus learnable grow distances (get_grow_dist :156-157), optimized jointly.
- **Learned split distance/scale** (get_split_distance/:159-165).
- **Commit-time surgery**: densify_and_grow :612-677 (move a copy along the
  learned direction instead of cloning in place; optionally re-init the
  direction params) and densify_and_growsplit :679-749 (split where newly
  grown points are automatically split candidates).
- **Speculative render augmentation** (gaussian_renderer/__init__.py:91-253):
  at render time, candidate grown/split Gaussians are appended so their
  parameters receive gradients before densification commits them. In the
  fixed-capacity design the candidates live in a static speculation block of
  ``spec_size`` slots appended to the activated attribute arrays.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..utils.transforms import normalize, quat_to_rotmat
from .densify import _scatter_copy, _zero_rows, densification_grads
from .gaussians import (GaussianAux, GaussianParams, get_grow_dist,
                        get_split_distance, get_split_scale)


class GrowConfig(NamedTuple):
    grow_dir: bool = False
    continous_dir: bool = False
    grow_distance: bool = False
    learn_split_distance: bool = False
    learn_split_scale: bool = False
    num_dirs: int = 128
    prob_notreinit: bool = False
    split_notreinit: bool = False
    symmetric_split: bool = False


def straight_through_argmax(logits, tau: float = 1.0, axis: int = -1):
    """Hard one-hot forward, softmax gradients (argmax_softmax :360-366)."""
    y_soft = jax.nn.softmax(logits / tau, axis=axis)
    idx = jnp.argmax(y_soft, axis=axis)
    y_hard = jax.nn.one_hot(idx, logits.shape[axis], dtype=logits.dtype)
    return y_hard - jax.lax.stop_gradient(y_soft) + y_soft


def grow_offsets(params: GaussianParams, sphere_dirs: Optional[jnp.ndarray],
                 cfg: GrowConfig) -> jnp.ndarray:
    """Per-Gaussian grow displacement Δxyz [C, 3]:
    direction × max-scale × learned distance (render grow branch :99-111)."""
    if cfg.grow_dir:
        one_hot = straight_through_argmax(params.dirs_prob)
        dirs = jnp.dot(one_hot, sphere_dirs,
                       precision=jax.lax.Precision.HIGHEST)    # [C, 3]
    elif cfg.continous_dir:
        dirs = normalize(params.conti_dirs)
    else:
        raise ValueError("grow_offsets needs grow_dir or continous_dir")
    dist = get_grow_dist(params) if cfg.grow_distance else 1.0
    shift = jnp.exp(params.scaling).max(axis=1, keepdims=True)
    return dirs * shift * dist


def speculative_augment(params: GaussianParams, aux: GaussianAux,
                        grads_stat: jnp.ndarray, sphere_dirs,
                        cfg: GrowConfig, grad_threshold: float,
                        extent, percent_dense: float, spec_size: int,
                        key: Optional[jax.Array] = None):
    """Build the augmented render set: base C Gaussians + up to spec_size
    grown candidates + up to spec_size mirrored split children, with in-place
    split modification of the originals (render :91-185).

    Returns dict of *raw* augmented parameter arrays (xyz, scaling, rotation,
    f_dc, f_rest, opacity) each [C + 2·spec_size, ...] plus ``alive`` mask —
    ready for the activations + preprocess path. Gradients flow to
    dirs_prob/conti_dirs/grow_dist/split_distance/split_scale by construction.
    """
    capacity = params.xyz.shape[0]
    s = spec_size
    has_grow = cfg.grow_dir or cfg.continous_dir

    sel = aux.alive & (grads_stat >= grad_threshold)
    grow_idx = jnp.nonzero(sel, size=s, fill_value=capacity)[0]
    grow_ok = (grow_idx < capacity) if has_grow else jnp.zeros(s, bool)
    gi = jnp.clip(grow_idx, 0, capacity - 1)

    if has_grow:
        offsets = grow_offsets(params, sphere_dirs, cfg)   # [C, 3]
        grown_xyz = params.xyz[gi] + offsets[gi]
    else:
        # learn_split-only branch (render :186-253): no grow candidates.
        grown_xyz = params.xyz[gi]

    def take(leaf):
        return leaf[gi]

    # assemble base + grow block (raw params)
    xyz = jnp.concatenate([params.xyz, grown_xyz], 0)
    scaling = jnp.concatenate([params.scaling, take(params.scaling)], 0)
    rotation = jnp.concatenate([params.rotation, take(params.rotation)], 0)
    f_dc = jnp.concatenate([params.f_dc, take(params.f_dc)], 0)
    f_rest = jnp.concatenate([params.f_rest, take(params.f_rest)], 0)
    opacity = jnp.concatenate([params.opacity, take(params.opacity)], 0)
    alive = jnp.concatenate([aux.alive, grow_ok], 0)

    # split speculation (learned split distance/scale only, render :130-185)
    if cfg.learn_split_distance or cfg.learn_split_scale:
        n_aug = capacity + s
        padded_grad = jnp.concatenate(
            [grads_stat, jnp.full((s,), jnp.inf)], 0)      # new points auto-hot
        scal_aug = jnp.exp(scaling)
        split_sel = (alive & (padded_grad >= grad_threshold)
                     & (scal_aug.max(axis=1) > percent_dense * extent))
        sp_idx = jnp.nonzero(split_sel, size=s, fill_value=n_aug)[0]
        sp_ok = sp_idx < n_aug
        si = jnp.clip(sp_idx, 0, n_aug - 1)

        if cfg.learn_split_distance:
            sd = get_split_distance(params)                # [C, 3]
            sd_aug = jnp.concatenate([sd, sd[gi]], 0)
            samples = scal_aug * sd_aug                    # deterministic
        else:
            if key is None:
                key = jax.random.PRNGKey(0)
            samples = jax.random.normal(key, (n_aug, 3)) * scal_aug
        R = quat_to_rotmat(rotation)
        delta = jnp.einsum("cij,cj->ci", R, samples)       # [n_aug, 3]

        if cfg.learn_split_scale:
            ss = get_split_scale(params)                   # [C, 1]
            ss_aug = jnp.concatenate([ss, ss[gi]], 0)
            shrink = ss_aug * 2.0                          # scale divisor
        else:
            shrink = jnp.full((n_aug, 1), 1.6)
        new_log_scaling = jnp.log(scal_aug / shrink)

        onehot = (jnp.zeros(n_aug).at[si].add(jnp.where(sp_ok, 1.0, 0.0),
                                              mode="drop"))[:, None]
        # in-place: originals shift by +delta and shrink
        xyz = xyz + onehot * delta
        scaling = jnp.where(onehot > 0, new_log_scaling, scaling)
        # mirrored children at −delta
        child_xyz = xyz[si] - 2.0 * delta[si]   # xyz already includes +delta
        xyz = jnp.concatenate([xyz, child_xyz], 0)
        scaling = jnp.concatenate([scaling, new_log_scaling[si]], 0)
        rotation = jnp.concatenate([rotation, rotation[si]], 0)
        f_dc = jnp.concatenate([f_dc, f_dc[si]], 0)
        f_rest = jnp.concatenate([f_rest, f_rest[si]], 0)
        opacity = jnp.concatenate([opacity, opacity[si]], 0)
        alive = jnp.concatenate([alive, sp_ok], 0)
    else:
        pad = lambda a: jnp.concatenate(
            [a, jnp.zeros((s,) + a.shape[1:], a.dtype)], 0)
        xyz, scaling, rotation = pad(xyz), pad(scaling), pad(rotation)
        f_dc, f_rest, opacity = pad(f_dc), pad(f_rest), pad(opacity)
        scaling = scaling.at[capacity + s:].set(-10.0)
        rotation = rotation.at[capacity + s:, 0].set(1.0)
        opacity = opacity.at[capacity + s:].set(-10.0)
        alive = jnp.concatenate([alive, jnp.zeros(s, bool)], 0)

    return {"xyz": xyz, "scaling": scaling, "rotation": rotation,
            "f_dc": f_dc, "f_rest": f_rest, "opacity": opacity,
            "alive": alive, "grow_idx": grow_idx, "grow_ok": grow_ok}


def densify_grow(params: GaussianParams, mu, nu, aux: GaussianAux,
                 sphere_dirs, key: jax.Array, cfg: GrowConfig,
                 grad_threshold: float):
    """Commit-time grow (densify_and_grow :612-677): copy every high-grad
    Gaussian to xyz + learned offset (no scale gate), re-initializing the
    ORIGINAL's direction/distance params unless prob_notreinit."""
    capacity = params.xyz.shape[0]
    arange = jnp.arange(capacity)
    g = densification_grads(aux)
    sel = aux.alive & (g >= grad_threshold)

    offsets = jax.lax.stop_gradient(grow_offsets(params, sphere_dirs, cfg))
    src = jnp.nonzero(sel, size=capacity, fill_value=capacity)[0]
    free_idx = jnp.nonzero(~aux.alive, size=capacity, fill_value=capacity)[0]
    n_free = (~aux.alive).sum()
    n_want = sel.sum()
    ok = (arange < n_want) & (arange < n_free)
    dest = jnp.where(ok, free_idx, capacity)
    n_grown = ok.sum()

    params = _scatter_copy(params, src, dest)
    src_c = jnp.clip(src, 0, capacity - 1)
    params = params._replace(
        xyz=params.xyz.at[dest].set(params.xyz[src_c] + offsets[src_c],
                                    mode="drop"))
    mu = _zero_rows(mu, dest)
    nu = _zero_rows(nu, dest)
    alive = aux.alive.at[dest].set(True, mode="drop")

    if not cfg.prob_notreinit:
        selc = sel[:, None]
        if cfg.grow_dir:
            uniform = jnp.full_like(params.dirs_prob, 1.0 / cfg.num_dirs)
            params = params._replace(
                dirs_prob=jnp.where(selc, uniform, params.dirs_prob))
        elif cfg.continous_dir:
            fresh = normalize(jax.random.normal(key, params.conti_dirs.shape))
            params = params._replace(
                conti_dirs=jnp.where(selc, fresh, params.conti_dirs))
        if cfg.grow_distance:
            params = params._replace(
                grow_dist=jnp.where(selc, 0.0, params.grow_dist))

    aux = aux._replace(alive=alive)
    return params, mu, nu, aux, {"n_grown": n_grown,
                                 "n_dropped": n_want - n_grown}
