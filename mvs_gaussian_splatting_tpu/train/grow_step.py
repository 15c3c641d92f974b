"""Training step with speculative grow/split render augmentation.

The grow-mode equivalent of train/step.py: the render set is the live
Gaussians plus a static speculation block of grown / split candidates
(models/grow.py speculative_augment), so the learnable direction, distance,
and split parameters receive gradients every iteration — the fork's core
mechanism (gaussian_renderer/__init__.py:91-253).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..models.densify import add_densification_stats, densification_grads
from ..models.gaussians import GaussianAux, GaussianParams
from ..models.grow import GrowConfig, speculative_augment
from ..ops.preprocess import preprocess
from ..ops.rasterize import RasterConfig, rasterize
from ..utils.losses import l1_loss, ssim
from ..utils.transforms import normalize
from .optim import AdamState, adam_update, group_lrs
from .step import StepMetrics


def make_spec_train_step(opt_cfg, raster_cfg: RasterConfig,
                         spatial_lr_scale: float, grow_cfg: GrowConfig,
                         sphere_dirs, spec_size: int, extent: float,
                         ):
    """Returns step(params, adam, aux, camera, gt, bg, step_i, do_stats, key)
    jitted with static (width, height, sh_degree)."""
    sphere_dirs = (jnp.asarray(sphere_dirs, jnp.float32)
                   if sphere_dirs is not None else None)

    @partial(jax.jit, static_argnames=("width", "height", "sh_degree"))
    def step(params: GaussianParams, adam: AdamState, aux: GaussianAux,
             camera, gt, bg, step_i, do_stats, key, *, width: int,
             height: int, sh_degree: int):
        capacity = params.xyz.shape[0]
        grads_stat = densification_grads(aux)

        def loss_fn(p, ndc_off):
            augd = speculative_augment(
                p, aux, grads_stat, sphere_dirs, grow_cfg,
                opt_cfg.densify_grad_threshold, extent,
                opt_cfg.percent_dense, spec_size, key)
            shs = jnp.concatenate([augd["f_dc"], augd["f_rest"]], axis=1)
            processed = preprocess(
                augd["xyz"], jax.nn.sigmoid(augd["opacity"][:, 0]), camera,
                width, height,
                scales=jnp.exp(augd["scaling"]),
                rotations=normalize(augd["rotation"]),
                shs=shs, sh_degree=sh_degree,
                ndc_offset=ndc_off, mask=augd["alive"],
                tile_w=raster_cfg.tile_w, tile_h=raster_cfg.tile_h)
            img, raux = rasterize(processed, width, height, bg, raster_cfg)
            l1 = l1_loss(img, gt)
            loss = ((1.0 - opt_cfg.lambda_dssim) * l1
                    + opt_cfg.lambda_dssim * (1.0 - ssim(img, gt)))
            if opt_cfg.opacitysparse > 0:
                opac = jax.nn.sigmoid(p.opacity[:, 0])
                m = aux.alive & (opac < 0.005)
                cnt = m.sum()
                sparse = jnp.where(
                    cnt > 0,
                    (jnp.abs(opac - 1.0) * m).sum() / jnp.maximum(cnt, 1),
                    0.0)
                loss = loss + opt_cfg.opacitysparse * sparse
            return loss, (l1, raux)

        n_aug = capacity + 2 * spec_size
        ndc_zero = jnp.zeros((n_aug, 2))
        (loss, (l1, raux)), (g_params, g_ndc) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, ndc_zero)

        lrs = group_lrs(opt_cfg, step_i, spatial_lr_scale, params)
        new_params, new_adam = adam_update(g_params, adam, params, lrs,
                                           alive=aux.alive)

        # stats over the ORIGINAL points only (radii sliced back, :266-269)
        radii = raux["radii"][:capacity]
        visible = radii > 0
        new_aux = jax.lax.cond(
            do_stats,
            lambda a: add_densification_stats(a, radii, g_ndc[:capacity],
                                              visible),
            lambda a: a, aux)

        metrics = StepMetrics(loss=loss, l1=l1, n_visible=visible.sum(),
                              overflow_tiles=raux["overflow_tiles"],
                              overflow_capacity=raux["overflow_capacity"])
        return new_params, new_adam, new_aux, metrics

    return step
