"""Per-group Adam with explicit moment pytrees.

Replaces the reference's torch.optim.Adam(param_groups, lr=0.0, eps=1e-15)
setup (scene/gaussian_model.py:240-268) plus the per-step xyz LR schedule
(:271-277). Hand-rolled rather than optax so densification can scatter into
the moment trees directly (models/densify.py) — the moments are just
GaussianParams-shaped pytrees.

Matches torch.optim.Adam semantics: betas (0.9, 0.999), eps added after the
bias-corrected sqrt, per-leaf learning rates. The global step count plays the
role of torch's per-param 'step' (preserved across surgery in the reference,
so a single counter is equivalent).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.gaussians import GaussianParams
from ..utils.schedules import expon_lr


class AdamState(NamedTuple):
    count: jnp.ndarray   # scalar int32
    mu: GaussianParams   # first moments
    nu: GaussianParams   # second moments


def adam_init(params: GaussianParams) -> AdamState:
    # mu and nu must be distinct buffers — sharing one zeros tree breaks
    # donation (same buffer donated twice) in jitted steps.
    return AdamState(count=jnp.zeros((), jnp.int32),
                     mu=jax.tree.map(jnp.zeros_like, params),
                     nu=jax.tree.map(jnp.zeros_like, params))


def group_lrs(opt_cfg, step, spatial_lr_scale,
              params: GaussianParams) -> GaussianParams:
    """The reference's param-group learning rates as a params-shaped tree.

    xyz follows the exponential schedule; f_rest = feature_lr/20
    (gaussian_model.py:245-262). Leaves are None wherever ``params`` has None
    so the two trees share a structure.
    """
    xyz_lr = expon_lr(step,
                      opt_cfg.position_lr_init * spatial_lr_scale,
                      opt_cfg.position_lr_final * spatial_lr_scale,
                      lr_delay_mult=opt_cfg.position_lr_delay_mult,
                      max_steps=opt_cfg.position_lr_max_steps)
    lrs = GaussianParams(
        xyz=xyz_lr,
        f_dc=opt_cfg.feature_lr,
        f_rest=opt_cfg.feature_lr / 20.0,
        scaling=opt_cfg.scaling_lr,
        rotation=opt_cfg.rotation_lr,
        opacity=opt_cfg.opacity_lr,
        dirs_prob=opt_cfg.growdirs_lr,
        conti_dirs=opt_cfg.growdirs_lr,
        grow_dist=opt_cfg.growdistance_lr,
        split_distance=opt_cfg.splitdistance_lr,
        split_scale=opt_cfg.splitscale_lr,
    )
    return GaussianParams(*[
        None if p is None else lr for p, lr in zip(params, lrs)])


def scrub_grads(grads: GaussianParams):
    """Zero the gradients of rows carrying any non-finite value.

    Belt-and-braces numerical containment: the CUDA rasterizer structurally
    emits zero gradients for culled splats, while a traced JAX backward can
    produce inf/NaN for them through masked branches (the 0·inf cotangent
    trap). The renderer sanitizes its own divides (ops/preprocess.py), but
    ONE escaped NaN gradient permanently poisons that row's Adam moments and,
    once the row's params are NaN, its depth key corrupts the global instance
    sort — observed as whole-image render collapse in the round-2 validation
    runs. This guard keeps a pathological row inert (and counted) instead.

    Returns (scrubbed grads, number of rows zeroed) — the count feeds
    StepMetrics.nonfinite_grad_rows so poisoning attempts stay observable.
    """
    leaves = [g for g in jax.tree.leaves(grads)]
    finite = None
    for g in leaves:
        f = jnp.isfinite(g).reshape(g.shape[0], -1).all(-1)
        finite = f if finite is None else (finite & f)
    n_bad = (~finite).sum()
    scrubbed = jax.tree.map(
        lambda g: jnp.where(finite.reshape((-1,) + (1,) * (g.ndim - 1)),
                            g, 0.0), grads)
    return scrubbed, n_bad


def adam_update(grads: GaussianParams, state: AdamState, params: GaussianParams,
                lrs: GaussianParams, alive=None, b1: float = 0.9,
                b2: float = 0.999, eps: float = 1e-15):
    """One Adam step. ``lrs`` is a tree of scalar learning rates.

    ``alive`` optionally masks updates (dead capacity slots receive neither
    moment updates nor parameter changes).
    """
    count = state.count + 1
    c1 = 1.0 - b1 ** count.astype(jnp.float32)
    c2 = 1.0 - b2 ** count.astype(jnp.float32)

    def upd(g, m, v, p, lr):
        m_new = b1 * m + (1 - b1) * g
        v_new = b2 * v + (1 - b2) * (g * g)
        step = lr * (m_new / c1) / (jnp.sqrt(v_new / c2) + eps)
        if alive is not None:
            mask = alive.reshape((-1,) + (1,) * (g.ndim - 1))
            m_new = jnp.where(mask, m_new, m)
            v_new = jnp.where(mask, v_new, v)
            step = jnp.where(mask, step, 0.0)
        return p - step, m_new, v_new

    treedef = jax.tree.structure(params)
    triples = [upd(g, m, v, p, lr) for g, m, v, p, lr in zip(
        jax.tree.leaves(grads), jax.tree.leaves(state.mu),
        jax.tree.leaves(state.nu), jax.tree.leaves(params),
        jax.tree.leaves(lrs))]
    new_params = jax.tree.unflatten(treedef, [t[0] for t in triples])
    new_mu = jax.tree.unflatten(treedef, [t[1] for t in triples])
    new_nu = jax.tree.unflatten(treedef, [t[2] for t in triples])
    return new_params, AdamState(count=count, mu=new_mu, nu=new_nu)
