"""2D-mesh training: cameras × tiles sharded in ONE train step.

The composition VERDICT r3 item #1 asked for — the actual shape of "one v5p
host (4 chips) cooperating on each frame + data-parallel across hosts"
(BASELINE.md north stars #3/#4, SURVEY §7 step 7). Until round 4,
``data_parallel`` and ``tile_parallel`` were mutually exclusive train modes;
this module runs both axes in one ``shard_map`` over a ``(data, tile)`` mesh:

- The camera batch (B == mesh.shape["data"]) is sharded over ``data``; every
  device in a camera's tile group runs that camera's preprocess + binning
  redundantly (O(N·log N) — the cheap slice at high resolution, same trade
  tile_train makes) and composites only its ROUND-ROBIN tile subset.
- All outputs of the sharded region are FULLY partitioned (camera × tile), so
  shard_map's transpose is trivially exact: no replicated-output cotangent
  can double-count (the classic hazard when mixing replicated and partitioned
  compute under one shard_map — avoided by design here). Loss (L1 + D-SSIM
  on the reassembled per-camera images) and the Adam update run OUTSIDE the
  shard_map in the pjit world, where XLA lays out the batch axis itself.
- Gradient flow: each device's backward emits its (camera, tile-subset)
  contribution through its local preprocess copy; the automatic psum over
  both mesh axes for the replicated ``params`` input reassembles the exact
  full-batch gradient (parity vs the single-device step is asserted to 1e-5
  in tests/test_grid_train.py).

The reference is single-GPU (SURVEY §2 parallelism inventory) — this axis
composition is new TPU-first design, not a port.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.gaussians import GaussianAux, GaussianParams, activated, get_features
from ..ops.preprocess import preprocess
from ..ops.rasterize import (RasterConfig, _assemble_image,
                             bin_and_pack_stream)
from ..train.optim import AdamState, adam_update, group_lrs, scrub_grads
from .data_parallel import BatchStepMetrics
from .mesh import replicated


def make_grid_train_step(opt_cfg, raster_cfg: RasterConfig,
                         spatial_lr_scale: float, mesh: Mesh,
                         data_axis: str = "data", tile_axis: str = "tile",
                         interpret: bool = None):
    """Returns (step, place_inputs) with the make_batch_train_step signature:
    cams is a CameraView of stacked leaves [B, ...], gts [B, 3, H, W], and
    B must equal mesh.shape[data_axis]."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    from ..ops.pallas.stream import composite_stream
    from ..utils.losses import l1_loss, ssim

    n_data = mesh.shape[data_axis]
    n_tile = mesh.shape[tile_axis]

    @partial(jax.jit,
             static_argnames=("width", "height", "sh_degree", "render_n",
                              "instance_cap"))
    def step(params: GaussianParams, adam: AdamState, aux: GaussianAux,
             cams, gts, bg, step_i, do_stats, *, width: int, height: int,
             sh_degree: int, render_n: int = 0, instance_cap: int = 0):
        rc = (raster_cfg._replace(instance_cap=instance_cap)
              if instance_cap else raster_cfg)
        if rc.backend not in ("stream", "auto"):
            raise ValueError("grid_parallel requires the stream backend")
        b = gts.shape[0]
        assert b == n_data, (
            f"grid_parallel batch {b} != data-axis size {n_data}")
        capacity = params.xyz.shape[0]
        n_render = render_n if render_n else capacity

        tile_w, tile_h = rc.tile_w, rc.tile_h
        tiles_x = -(-width // tile_w)
        tiles_y = -(-height // tile_h)
        num_tiles = tiles_x * tiles_y
        t_padded = num_tiles + (-num_tiles) % n_tile
        t_per = t_padded // n_tile

        def local_render(p, alive, cam1, ndc1, bg_in):
            """Per-device: ONE camera (this data shard), one round-robin tile
            subset (this tile shard). cam1/ndc1 carry a leading dim of 1."""
            cam = jax.tree.map(lambda x: x[0], cam1)
            scales, rotations, opacity = activated(p)
            processed = preprocess(
                p.xyz, opacity, cam, width, height, scales=scales,
                rotations=rotations, shs=get_features(p),
                sh_degree=sh_degree, ndc_offset=ndc1[0],
                mask=alive, tile_w=tile_w, tile_h=tile_h)
            bins, attrs = bin_and_pack_stream(processed, tiles_x, tiles_y, rc)

            # round-robin ownership: tile-device t composites global tiles
            # {j·n_tile + t} (dense-foreground/sky balance, SURVEY §7);
            # the strided subsequence keeps per-device seg_start ascending,
            # which the kernel's sequential boundary-merge relies on.
            t_idx = jax.lax.axis_index(tile_axis)
            seg_end = bins.seg_start[-1] + bins.counts[-1]
            seg_start_p = jnp.concatenate(
                [bins.seg_start,
                 jnp.broadcast_to(seg_end, (t_padded - num_tiles,))])
            counts_p = jnp.concatenate(
                [bins.counts,
                 jnp.zeros((t_padded - num_tiles,), bins.counts.dtype)])
            my_ids = (jnp.arange(t_per, dtype=jnp.int32) * n_tile
                      + t_idx.astype(jnp.int32))
            out, final_t = composite_stream(
                attrs, seg_start_p[my_ids], counts_p[my_ids], bg_in, my_ids,
                tiles_x, tile_w, tile_h, interpret, True, rc.fast_math)

            stats = jnp.stack([jnp.asarray(bins.overflow_tiles, jnp.int32),
                               jnp.asarray(bins.overflow_capacity, jnp.int32),
                               jnp.asarray(bins.counts_raw.sum(), jnp.int32)])
            # [1, t_per, ...] leading camera dim so out_specs partition both
            # axes; radii/stats are per-camera (replicated across tile)
            return (out[None], final_t[None], processed.radius[None],
                    stats[None])

        sharded = jax.shard_map(
            local_render, mesh=mesh,
            in_specs=(P(), P(), P(data_axis), P(data_axis), P()),
            out_specs=(P(data_axis, tile_axis), P(data_axis, tile_axis),
                       P(data_axis), P(data_axis)),
            check_vma=False)

        # destination-major → global tile order (gauss_stream's remap)
        g_idx = jnp.arange(num_tiles, dtype=jnp.int32)
        remap = (g_idx % n_tile) * t_per + g_idx // n_tile

        def assemble_one(tiles_cam, ft_cam):
            img = _assemble_image(tiles_cam[remap].transpose(0, 2, 1),
                                  tiles_x, tiles_y, tile_w, tile_h,
                                  width, height)
            return img, ft_cam

        def loss_fn(p, ndc_off):
            ps = jax.tree.map(lambda a: a[:n_render], p)
            tiles_out, final_t, radii, stats = sharded(
                ps, aux.alive[:n_render], cams, ndc_off, bg)
            imgs, _ = jax.vmap(assemble_one)(tiles_out, final_t)  # [B,3,H,W]
            l1s = jax.vmap(l1_loss)(imgs, gts)
            dssim = 1.0 - jax.vmap(ssim)(imgs, gts)
            losses = (1.0 - opt_cfg.lambda_dssim) * l1s \
                + opt_cfg.lambda_dssim * dssim
            return losses.mean(), (l1s.mean(), radii, stats)

        ndc_zero = jnp.zeros((b, n_render, 2))
        (loss, (l1, radii, stats)), (g_params, g_ndc) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(params, ndc_zero)

        g_params, n_bad = scrub_grads(g_params)
        lrs = group_lrs(opt_cfg, step_i, spatial_lr_scale, params)
        new_params, new_adam = adam_update(g_params, adam, params, lrs,
                                           alive=aux.alive)

        def pad_c(x, fill=0):
            if n_render == capacity:
                return x
            return jnp.pad(x, [(0, 0), (0, capacity - n_render)],
                           constant_values=fill)

        radii = pad_c(radii)
        vis = radii > 0
        if n_render != capacity:
            g_ndc = jnp.pad(g_ndc, [(0, 0), (0, capacity - n_render), (0, 0)])
        gn = jnp.linalg.norm(g_ndc, axis=-1)             # [B, C]
        visf = vis.astype(jnp.float32)
        new_aux = jax.lax.cond(
            do_stats,
            lambda a: a._replace(
                max_radii2d=jnp.maximum(
                    a.max_radii2d,
                    jnp.max(jnp.where(vis, radii.astype(jnp.float32), 0.0),
                            0)),
                xyz_grad_accum=a.xyz_grad_accum + (gn * visf).sum(0),
                denom=a.denom + visf.sum(0)),
            lambda a: a, aux)

        metrics = BatchStepMetrics(
            loss=loss, l1=l1, n_visible=vis.any(0).sum(),
            overflow_tiles=stats[:, 0].sum(),
            overflow_capacity=stats[:, 1].sum(),
            instance_load=stats[:, 2].max(),
            nonfinite_grad_rows=n_bad)
        return new_params, new_adam, new_aux, metrics

    repl = replicated(mesh)
    shard = NamedSharding(mesh, P(data_axis))

    def place_inputs(params, adam, aux, cams, gts, bg):
        """Params/opt state replicated; camera batch sharded over ``data``
        (each leaf's leading dim), replicated over ``tile``."""
        return (jax.device_put(params, repl), jax.device_put(adam, repl),
                jax.device_put(aux, repl), jax.device_put(cams, shard),
                jax.device_put(gts, shard), jax.device_put(bg, repl))

    return step, place_inputs
