"""Gaussian-sharded (primitive-sharded) TRAINING: params sharded over N.

VERDICT r3 item #3: promote the render-level gauss sharding
(:mod:`gauss_stream`) into a full train mode. This is the scaling axis for
the N ≫ pixels regime the reference's own experiments reached (1.21M points,
exp.xlsx OOM rows): every per-Gaussian stage — parameter storage, Adam
state, activations, preprocess, depth sort, tile enumeration, attribute
packing, the backward scatter — runs on N/D primitives per device, with ONE
all_to_all exchanging packed instance rows into tile owners (gauss_stream
step 3) and the image assembled from fully-partitioned tile outputs.

Layout (new TPU-first design; the reference is single-GPU, SURVEY §2):
- params / Adam moments / aux: sharded over the ``gauss`` axis along the
  capacity dim (capacities and render buckets are powers of two, so the
  shard split is always even). The optimizer update is elementwise and never
  leaves the shard.
- camera, GT, loss: replicated. The per-camera image is small next to the
  primitive state in this regime.
- Gradients: the composite kernel's custom VJP emits per-instance rows; the
  reversed all_to_all returns every row to the device that OWNS its
  Gaussian, so parameter gradients are born sharded — there is no [N]-sized
  all-reduce anywhere (contrast camera-DP, which psums the full gradient
  pytree).

Parity vs the single-device step is asserted in tests/test_gauss_train.py
(shard-count invariance of loss, params, and densification stats).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.gaussians import GaussianAux, GaussianParams, activated, get_features
from ..models.densify import add_densification_stats
from ..ops.preprocess import preprocess
from ..ops.rasterize import RasterConfig
from ..train.optim import AdamState, adam_update, group_lrs, scrub_grads
from ..train.step import StepMetrics
from ..utils.losses import l1_loss, ssim
from .gauss_stream import make_gauss_sharded_stream
from .mesh import replicated


def make_gauss_train_step(opt_cfg, raster_cfg: RasterConfig,
                          spatial_lr_scale: float, mesh: Mesh,
                          axis: str = "gauss", interpret: bool = None,
                          round_robin: bool = True):
    """Returns (step, place_inputs) with make_tile_train_step's signature
    (one camera per step). ``instance_cap`` is interpreted GLOBALLY like the
    other modes and divided across shards (CHUNK-aligned)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_dev = mesh.shape[axis]

    @partial(jax.jit,
             static_argnames=("width", "height", "sh_degree", "render_n",
                              "instance_cap"))
    def step(params: GaussianParams, adam: AdamState, aux: GaussianAux,
             camera, gt, bg, step_i, do_stats, *, width: int, height: int,
             sh_degree: int, render_n: int = 0, instance_cap: int = 0):
        rc = raster_cfg
        if instance_cap:
            local = -(-instance_cap // n_dev)
            local += (-local) % 128
            rc = rc._replace(instance_cap=local)
        if rc.backend not in ("stream", "auto"):
            raise ValueError("gauss_parallel requires the stream backend")
        capacity = params.xyz.shape[0]
        n_render = render_n if render_n else capacity
        assert n_render % n_dev == 0, (
            f"render bucket {n_render} not divisible by {n_dev} shards")
        sharded_raster = make_gauss_sharded_stream(
            mesh, axis, width, height, rc, round_robin=round_robin,
            interpret=interpret)

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

        metrics = StepMetrics(
            loss=loss, l1=l1, n_visible=visible.sum(),
            overflow_tiles=raux["overflow_tiles"],
            overflow_capacity=raux["overflow_capacity"]
            + raux["overflow_quota"],
            # per-shard caps: report the summed exchange load so the loop's
            # measured-load bucket logic sees a global number like the other
            # modes (it divides back by n_dev via the global-cap convention)
            instance_load=raux["instance_load"],
            nonfinite_grad_rows=n_bad)
        return new_params, new_adam, new_aux, metrics

    repl = replicated(mesh)
    shard0 = NamedSharding(mesh, P(axis))

    def shard_cap_dim(tree):
        """Shard every leaf along its leading (capacity) dim."""
        return jax.tree.map(
            lambda a: jax.device_put(a, shard0), tree)

    def place_inputs(params, adam, aux, camera, gt, bg):
        return (shard_cap_dim(params),
                AdamState(mu=shard_cap_dim(adam.mu), nu=shard_cap_dim(adam.nu),
                          count=jax.device_put(adam.count, repl)),
                shard_cap_dim(aux), jax.device_put(camera, repl),
                jax.device_put(gt, repl), jax.device_put(bg, repl))

    return step, place_inputs
