"""Tile-parallel training: ONE camera per step, its tile grid sharded.

The missing leg between camera-DP (parallel/data_parallel.py) and the
render-level tile sharding (parallel/tile_stream.py): a full train step —
render → L1+D-SSIM loss → backward → Adam → densify stats — whose composite
stage is sharded over the mesh's ``tile`` axis (VERDICT round-2 item #3).
This is the path to the 1080p-per-host north star (BASELINE.md #3) that
camera-DP cannot reach: at B=1 the whole mesh cooperates on a single frame
instead of waiting for B same-size cameras.

Design (new TPU-first work; the reference is single-GPU, SURVEY §2):
- Params, camera, Adam state: replicated. Preprocess/binning/packing run
  replicated — O(N log N), a small slice of the step at 1080p.
- The composite (the pixel-dominated stage) runs under ``shard_map`` with
  round-robin tile ownership (dense-foreground vs sky balance).
- shard_map's transpose inserts ONE [16, CAP] psum for the packed attribute
  gradients (each instance slot owned by exactly one shard, so the reduction
  reassembles the exact stream gradient); loss/Adam math is replicated.

Gradient parity with the single-device step is exact up to f32 reduction
order (tests/test_tile_parallel_train.py asserts ≤1e-5).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..models.gaussians import GaussianAux, GaussianParams, activated, get_features
from ..models.densify import add_densification_stats
from ..ops.preprocess import preprocess
from ..ops.rasterize import RasterConfig
from ..train.optim import AdamState, adam_update, group_lrs, scrub_grads
from ..train.step import StepMetrics
from ..utils.losses import l1_loss, ssim
from .mesh import replicated
from .tile_stream import make_tile_sharded_stream


def make_tile_train_step(opt_cfg, raster_cfg: RasterConfig,
                         spatial_lr_scale: float, mesh: Mesh,
                         axis: str = "tile", interpret: bool = None,
                         round_robin: bool = True):
    """Returns (step, place_inputs) like make_batch_train_step, but for a
    single camera with tile-sharded compositing. ``step`` has the same
    signature and return type as train.step.make_train_step's."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    @partial(jax.jit,
             static_argnames=("width", "height", "sh_degree", "render_n",
                              "instance_cap"))
    def step(params: GaussianParams, adam: AdamState, aux: GaussianAux,
             camera, gt, bg, step_i, do_stats, *, width: int, height: int,
             sh_degree: int, render_n: int = 0, instance_cap: int = 0):
        rc = (raster_cfg._replace(instance_cap=instance_cap)
              if instance_cap else raster_cfg)
        if rc.backend not in ("stream", "auto"):
            raise ValueError("tile_parallel requires the stream backend")
        sharded_raster = make_tile_sharded_stream(
            mesh, axis, width, height, rc, interpret=interpret,
            round_robin=round_robin)
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
            scales, rotations, opacity = activated(ps)
            processed = preprocess(
                ps.xyz, opacity, camera, width, height, scales=scales,
                rotations=rotations, shs=get_features(ps),
                sh_degree=sh_degree, ndc_offset=ndc_off,
                mask=aux.alive[:n_render], tile_w=rc.tile_w, tile_h=rc.tile_h)
            img, raux = sharded_raster(processed, bg)
            l1 = l1_loss(img, gt)
            loss = ((1.0 - opt_cfg.lambda_dssim) * l1
                    + opt_cfg.lambda_dssim * (1.0 - ssim(img, gt)))
            return loss, (l1, raux)

        ndc_zero = jnp.zeros((n_render, 2))
        (loss, (l1, raux)), (g_params, g_ndc) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, ndc_zero)

        g_params, n_bad = scrub_grads(g_params)
        lrs = group_lrs(opt_cfg, step_i, spatial_lr_scale, params)
        new_params, new_adam = adam_update(g_params, adam, params, lrs,
                                           alive=aux.alive)

        radii = pad_c(raux["radii"])
        visible = radii > 0
        new_aux = jax.lax.cond(
            do_stats,
            lambda a: add_densification_stats(a, radii, pad_c(g_ndc), visible),
            lambda a: a, aux)

        metrics = StepMetrics(loss=loss, l1=l1, n_visible=visible.sum(),
                              overflow_tiles=raux["overflow_tiles"],
                              overflow_capacity=raux["overflow_capacity"],
                              instance_load=raux["tile_counts"].sum(),
                              nonfinite_grad_rows=n_bad)
        return new_params, new_adam, new_aux, metrics

    repl = replicated(mesh)

    def place_inputs(params, adam, aux, camera, gt, bg):
        """Everything replicated — the tile axis is carved out inside."""
        return (jax.device_put(params, repl), jax.device_put(adam, repl),
                jax.device_put(aux, repl), jax.device_put(camera, repl),
                jax.device_put(gt, repl), jax.device_put(bg, repl))

    return step, place_inputs
