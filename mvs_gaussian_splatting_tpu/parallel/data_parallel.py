"""Camera-batched data-parallel training step over a device mesh.

New first-class design (the reference has no parallelism to port, SURVEY §2):
each device renders a different camera of a batch against replicated Gaussian
parameters; XLA inserts the gradient all-reduce over the ``data`` axis from
the sharding annotations (ICI-resident collective). Densification statistics
accumulate across the batch exactly as the reference accumulates across
sequential iterations.

This is the scaling story for training throughput: B cameras per step instead
of the reference's 1, with loss = mean over cameras.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.gaussians import GaussianAux, GaussianParams
from ..ops.rasterize import RasterConfig
from ..ops.render import render
from ..utils.losses import l1_loss, ssim
from .mesh import batch_sharded, replicated
from ..train.optim import AdamState, adam_update, group_lrs, scrub_grads


class BatchStepMetrics(NamedTuple):
    loss: jnp.ndarray
    l1: jnp.ndarray
    n_visible: jnp.ndarray
    overflow_tiles: jnp.ndarray
    overflow_capacity: jnp.ndarray
    instance_load: jnp.ndarray
    nonfinite_grad_rows: jnp.ndarray


def make_batch_train_step(opt_cfg, raster_cfg: RasterConfig,
                          spatial_lr_scale: float, mesh: Mesh):
    """Returns step(params, adam, aux, cams, gts, bg, step_i, do_stats) with
    static (width, height, sh_degree); cams is a CameraView of stacked leaves
    [B, ...], gts [B, 3, H, W]. B should be a multiple of the data axis size.
    """
    repl = replicated(mesh)
    shard = batch_sharded(mesh)

    def per_camera(p, alive, ndc_off, cam, gt, bg, width, height, sh_degree,
                   rc):
        out = render(cam, width, height, p, bg, sh_degree=sh_degree,
                     alive=alive, ndc_offset=ndc_off, raster_config=rc)
        img = out["render"]
        l1 = l1_loss(img, gt)
        loss = ((1.0 - opt_cfg.lambda_dssim) * l1
                + opt_cfg.lambda_dssim * (1.0 - ssim(img, gt)))
        return loss, (l1, out["radii"], out["visibility_filter"],
                      out["overflow_tiles"], out["overflow_capacity"],
                      out["instance_load"])

    @partial(jax.jit,
             static_argnames=("width", "height", "sh_degree", "render_n",
                              "instance_cap"),
             donate_argnums=(0, 1, 2))
    def step(params: GaussianParams, adam: AdamState, aux: GaussianAux,
             cams, gts, bg, step_i, do_stats, *, width: int, height: int,
             sh_degree: int, render_n: int = 0, instance_cap: int = 0):
        rc = (raster_cfg._replace(instance_cap=instance_cap)
              if instance_cap else raster_cfg)
        b = gts.shape[0]
        capacity = params.xyz.shape[0]
        n_render = render_n if render_n else capacity

        def pad_c(x, fill=0):
            if n_render == capacity:
                return x
            return jnp.pad(x, [(0, 0), (0, capacity - n_render)],
                           constant_values=fill)

        def loss_fn(p, ndc_off):
            # static alive-prefix slice (see train.step.train_step docstring)
            ps = jax.tree.map(lambda a: a[:n_render], p)
            losses, (l1s, radii, vis, ot, oc, il) = jax.vmap(
                lambda c, g, nd: per_camera(ps, aux.alive[:n_render], nd, c,
                                            g, bg, width, height, sh_degree,
                                            rc)
            )(cams, gts, ndc_off)
            return losses.mean(), (l1s.mean(), pad_c(radii),
                                   pad_c(vis, fill=False), ot.sum(), oc.sum(),
                                   il.max())

        ndc_zero = jnp.zeros((b, n_render, 2))
        (loss, (l1, radii, vis, ot, oc, il)), (g_params, g_ndc) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, ndc_zero)

        # scrub AFTER the cross-camera mean: one camera's NaN poisons the
        # reduced row either way, and scrubbing the reduced tree is B× cheaper
        g_params, n_bad = scrub_grads(g_params)
        lrs = group_lrs(opt_cfg, step_i, spatial_lr_scale, params)
        new_params, new_adam = adam_update(g_params, adam, params, lrs,
                                           alive=aux.alive)

        # batched densification stats: accumulate over the camera batch
        if n_render != capacity:
            g_ndc = jnp.pad(g_ndc, [(0, 0), (0, capacity - n_render), (0, 0)])
        gn = jnp.linalg.norm(g_ndc, axis=-1)          # [B, C]
        visf = vis.astype(jnp.float32)                # [B, C]
        new_aux = jax.lax.cond(
            do_stats,
            lambda a: a._replace(
                max_radii2d=jnp.maximum(
                    a.max_radii2d,
                    jnp.max(jnp.where(vis, radii.astype(jnp.float32), 0.0), 0)),
                xyz_grad_accum=a.xyz_grad_accum + (gn * visf).sum(0),
                denom=a.denom + visf.sum(0)),
            lambda a: a, aux)

        metrics = BatchStepMetrics(loss=loss, l1=l1, n_visible=vis.any(0).sum(),
                                   overflow_tiles=ot, overflow_capacity=oc,
                                   instance_load=il, nonfinite_grad_rows=n_bad)
        return new_params, new_adam, new_aux, metrics

    def place_inputs(params, adam, aux, cams, gts, bg):
        """Device placement: params/opt state replicated, batch sharded."""
        params = jax.device_put(params, repl)
        adam = jax.device_put(adam, repl)
        aux = jax.device_put(aux, repl)
        cams = jax.device_put(cams, shard)
        gts = jax.device_put(gts, shard)
        bg = jax.device_put(bg, repl)
        return params, adam, aux, cams, gts, bg

    return step, place_inputs


def stack_cameras(camera_views):
    """List of CameraView → CameraView of stacked leaves [B, ...]."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *camera_views)
