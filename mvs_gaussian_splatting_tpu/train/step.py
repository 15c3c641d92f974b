"""The jitted training step: render → loss → backward → Adam → stats.

Replaces the body of the reference hot loop (train.py:70-142). One compiled
function per (image size, active SH degree, capacity) triple — SH warmup
causes at most sh_degree recompiles, capacity growth a handful more.

The viewspace-gradient densification statistic comes out of the same backward
pass as the parameter gradients, via the ``ndc_offset`` zero input
(ops/preprocess.py docstring).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.densify import add_densification_stats
from ..models.gaussians import GaussianAux, GaussianParams
from ..ops.rasterize import RasterConfig
from ..ops.render import render
from ..utils.losses import l1_loss, ssim
from .optim import AdamState, adam_update, group_lrs, scrub_grads


class StepMetrics(NamedTuple):
    loss: jnp.ndarray
    l1: jnp.ndarray
    n_visible: jnp.ndarray
    overflow_tiles: jnp.ndarray
    overflow_capacity: jnp.ndarray
    instance_load: jnp.ndarray
    nonfinite_grad_rows: jnp.ndarray   # rows zeroed by optim.scrub_grads
    # visible-prefix compaction feedback (round 4; defaults for step
    # variants that don't run compaction): the camera's measured visible
    # count (sizes the loop's visible_cap bucket) and the visible rows the
    # current cap dropped (grow signal — never silent)
    mask_visible: jnp.ndarray = np.zeros((), np.int32)
    overflow_visible: jnp.ndarray = np.zeros((), np.int32)
    # per-frame tier demand (count of rows needing > tier_budgets[i] slots)
    # — feedback for scene-calibrated tier_fracs (round 5)
    tier_need_counts: jnp.ndarray = np.zeros((0,), np.int32)


def make_train_step(opt_cfg, raster_cfg: RasterConfig, spatial_lr_scale: float):
    """Returns train_step(params, adam, aux, camera, gt, bg, step, do_stats)
    jitted with static (width, height, sh_degree)."""

    @partial(jax.jit,
             static_argnames=("width", "height", "sh_degree", "render_n",
                              "instance_cap", "visible_cap", "tier_fracs"))
    def train_step(params: GaussianParams, adam: AdamState, aux: GaussianAux,
                   camera, gt, bg, step, do_stats, *, width: int, height: int,
                   sh_degree: int, render_n: int = 0, instance_cap: int = 0,
                   visible_cap: int = 0, tier_fracs: tuple = ()):
        """``render_n`` (static): 0 = render the full capacity; otherwise the
        loop guarantees (via models.gaussians.compact_state after every
        densify round) that all alive slots sit in [:render_n], and only that
        prefix enters the renderer — the instance sort/pack/scatter stages
        scale with the rendered length, not the padded capacity. Gradients
        for the sliced tail are exactly zero (slice transpose), and Adam
        still updates the full arrays (alive-masked, elementwise-cheap).

        ``instance_cap`` (static): 0 = the raster config's cap (usually the
        a-priori auto heuristic); otherwise a measured-load bucket chosen by
        the loop (see loop._instance_bucket) — the stream sort/pack/scatter
        stages scale with this STATIC value, and overflow (counted in
        metrics) triggers a bucket grow.

        ``visible_cap`` (static): 0 = off; otherwise the visible-prefix
        compaction bound (RasterConfig.visible_cap) — per-row binning/pack
        stages scale with the per-camera visible count instead of render_n,
        the win on 360-degree scenes. The loop buckets it from
        metrics.mask_visible and grows on metrics.overflow_visible."""
        rc = (raster_cfg._replace(instance_cap=instance_cap)
              if instance_cap else raster_cfg)
        if visible_cap:
            rc = rc._replace(visible_cap=visible_cap)
        if tier_fracs:
            # scene-calibrated tier prefixes (measured tier_need_counts +
            # margin); overflow_tiles still counts any residual shortfall
            rc = rc._replace(tier_fracs=tier_fracs)
        capacity = params.xyz.shape[0]
        n_render = render_n if render_n else capacity

        def pad_c(x, fill=0):
            if x.shape[0] == capacity:
                return x
            return jnp.pad(x,
                           [(0, capacity - n_render)] + [(0, 0)] * (x.ndim - 1),
                           constant_values=fill)

        def loss_fn(p, ndc_off):
            ps = jax.tree.map(lambda a: a[:n_render], p)
            out = render(camera, width, height, ps, bg, sh_degree=sh_degree,
                         alive=aux.alive[:n_render], ndc_offset=ndc_off,
                         raster_config=rc)
            img = out["render"]
            l1 = l1_loss(img, gt)
            loss = ((1.0 - opt_cfg.lambda_dssim) * l1
                    + opt_cfg.lambda_dssim * (1.0 - ssim(img, gt)))
            if opt_cfg.opacitysparse > 0:
                # push near-dead opacities toward 1 (train.py:102-106)
                opac = jax.nn.sigmoid(p.opacity[:, 0])
                m = aux.alive & (opac < 0.005)
                cnt = m.sum()
                sparse = jnp.where(
                    cnt > 0,
                    (jnp.abs(opac - 1.0) * m).sum() / jnp.maximum(cnt, 1),
                    0.0)
                loss = loss + opt_cfg.opacitysparse * sparse
            return loss, (out, l1)

        ndc_zero = jnp.zeros((n_render, 2))
        (loss, (out, l1)), (g_params, g_ndc) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, ndc_zero)

        g_params, n_bad = scrub_grads(g_params)
        lrs = group_lrs(opt_cfg, step, spatial_lr_scale, params)
        new_params, new_adam = adam_update(g_params, adam, params, lrs,
                                           alive=aux.alive)

        visible = pad_c(out["visibility_filter"], fill=False)
        new_aux = jax.lax.cond(
            do_stats,
            lambda a: add_densification_stats(a, pad_c(out["radii"]),
                                              pad_c(g_ndc), visible),
            lambda a: a, aux)

        metrics = StepMetrics(loss=loss, l1=l1,
                              n_visible=visible.sum(),
                              overflow_tiles=out["overflow_tiles"],
                              overflow_capacity=out["overflow_capacity"],
                              instance_load=out["instance_load"],
                              nonfinite_grad_rows=n_bad,
                              mask_visible=jnp.asarray(
                                  out["n_mask_visible"], jnp.int32),
                              overflow_visible=jnp.asarray(
                                  out["overflow_visible"], jnp.int32),
                              tier_need_counts=jnp.asarray(
                                  out["tier_need_counts"], jnp.int32))
        return new_params, new_adam, new_aux, metrics

    return train_step


def make_eval_render(raster_cfg: RasterConfig):
    @partial(jax.jit,
             static_argnames=("width", "height", "sh_degree", "render_n",
                              "instance_cap", "tier_layout"))
    def eval_render(params, alive, camera, bg, *, width: int, height: int,
                    sh_degree: int, render_n: int = 0, instance_cap: int = 0,
                    tier_layout=None):
        m = render_n if render_n else params.xyz.shape[0]
        rc = (raster_cfg._replace(instance_cap=instance_cap)
              if instance_cap else raster_cfg)
        if tier_layout is not None:
            d, budgets, fracs = tier_layout
            rc = rc._replace(max_tiles_per_gaussian=d, tier_budgets=budgets,
                             tier_fracs=fracs)
        ps = jax.tree.map(lambda a: a[:m], params)
        out = render(camera, width, height, ps, bg, sh_degree=sh_degree,
                     alive=alive[:m], raster_config=rc)
        return jnp.clip(out["render"], 0.0, 1.0)
    return eval_render


def make_eval_metrics(raster_cfg: RasterConfig):
    """Jitted per-view eval returning (L1, PSNR) device scalars — the
    training-report sweep (train.py:210-236) uses this instead of fetching
    whole images: the loop dispatches every view asynchronously and does ONE
    host transfer of the stacked scalars at the end.

    ``instance_cap`` (static): the loop passes the exact tier-enumeration
    bound for the render bucket (loop.eval_instance_cap) so the widened
    eval budgets can never hit global capacity overflow.

    ``tier_layout`` (static): optional (d, budgets, fracs) override — the
    loop passes a measured-needs adaptive layout (quantized for compile
    stability) so reported metrics come from a CLIP-FREE render, exactly
    the operator cli/render's --adaptive_budgets offline chain uses."""
    from ..utils.losses import psnr as psnr_fn

    @partial(jax.jit,
             static_argnames=("width", "height", "sh_degree", "render_n",
                              "instance_cap", "tier_layout"))
    def eval_metrics(params, alive, camera, gt, bg, *, width: int,
                     height: int, sh_degree: int, render_n: int = 0,
                     instance_cap: int = 0, tier_layout=None):
        m = render_n if render_n else params.xyz.shape[0]
        rc = (raster_cfg._replace(instance_cap=instance_cap)
              if instance_cap else raster_cfg)
        if tier_layout is not None:
            d, budgets, fracs = tier_layout
            rc = rc._replace(max_tiles_per_gaussian=d, tier_budgets=budgets,
                             tier_fracs=fracs)
        ps = jax.tree.map(lambda a: a[:m], params)
        out = render(camera, width, height, ps, bg, sh_degree=sh_degree,
                     alive=alive[:m], raster_config=rc)
        img = jnp.clip(out["render"], 0.0, 1.0)
        gtc = jnp.clip(gt, 0.0, 1.0)
        return l1_loss(img, gtc), psnr_fn(img, gtc)[0]
    return eval_metrics
