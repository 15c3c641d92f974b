"""Tiled differentiable rasterizer: preprocess → bin → per-tile composite.

The production path replacing the CUDA tile rasterizer (SURVEY §2.9). The
composite stage is mathematically identical to :mod:`raster_ref` but works on
fixed-capacity per-tile Gaussian lists built by :mod:`binning`, so cost is
O(T·K·P) instead of O(N·H·W).

Two composite backends share one interface:
- ``jnp``: scan over tile batches, masked cumprod compositing. Runs anywhere
  (CPU tests, TPU), differentiable by construction, checkpointed per batch.
- ``pallas``: hand-written TPU kernels with a custom VJP (ops/pallas/).

All shapes static; binning runs under stop_gradient (indices only).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .binning import TileBins, bin_gaussians
from .preprocess import CameraView, Processed, preprocess  # noqa: F401 (re-export)


class RasterConfig(NamedTuple):
    tile_w: int = 16
    tile_h: int = 16
    max_tiles_per_gaussian: int = 32
    tile_capacity: int = 512
    tile_batch: int = 64
    backend: str = "auto"  # "jnp" | "pallas" | "stream" | "auto"
    # Stream backend: packed instance slots. None = auto-size to 8·N (tile
    # sort, row pack, and the backward scatter-add all scale with this STATIC
    # capacity, so a loose cap taxes every step; typical load is ~5·N and the
    # tier-budget worst case 10.5·N). Clipped to the exact tier bound; any
    # shortfall is counted in aux["overflow_capacity"], never silent.
    instance_cap: Optional[int] = None
    # Tiered per-Gaussian tile budgets (stream binning): every Gaussian gets
    # tier_budgets[0] slots; the largest tier_fracs[i]·N by rect area get
    # tier_budgets[i+1] (nested prefixes, max_tiles_per_gaussian last).
    # () = flat budget. Shortfall is reported in overflow_tiles.
    tier_budgets: tuple = (4, 12)
    tier_fracs: tuple = (0.25, 0.1)
    # Fast-math compositing (stream backend): MXU log-space transmittance
    # scans instead of the exact VPU prefix scan. ~30% kernel-time cut for
    # ~1e-3 pixel error (above the 2e-4 oracle-parity bound — training
    # impact validated on hardware, BASELINE.md). Keep False for eval/oracle.
    fast_math: bool = False
    # Visible-prefix compaction (stream backend, round 4): a static bound on
    # the per-camera VISIBLE Gaussian count. Masked (out-of-frustum/behind-
    # camera) rows carry depth=inf and sort to the depth order's tail, so
    # truncating the order to [:visible_cap] makes every per-row binning
    # stage (tile enumeration, tier ranking, the instance key sort) and the
    # attribute table gather/scatter-transpose scale with the VISIBLE count
    # instead of N — the win on real 360-degree scenes where ~half the cloud
    # is outside any one camera's frustum (the reference's CUDA path culls
    # before binning for the same reason). Visible rows beyond the cap are
    # the FARTHEST ones and are dropped, counted in aux["overflow_visible"]
    # — never silent; the train loop grows its bucket on that signal.
    # None = off (exact full-N behavior).
    visible_cap: Optional[int] = None


def _tile_pixel_grid(tile_ids, tiles_x: int, tile_w: int, tile_h: int):
    """Flat pixel coordinates [B, P] for a batch of tile ids."""
    tx = (tile_ids % tiles_x).astype(jnp.float32)
    ty = (tile_ids // tiles_x).astype(jnp.float32)
    ix = jnp.arange(tile_w, dtype=jnp.float32)
    iy = jnp.arange(tile_h, dtype=jnp.float32)
    px = tx[:, None] * tile_w + jnp.tile(ix, tile_h)[None, :]
    py = ty[:, None] * tile_h + jnp.repeat(iy, tile_w)[None, :]
    return px, py


def composite_tiles_jnp(xy, conic, rgb, opacity, valid, tile_ids,
                        tiles_x: int, tile_w: int, tile_h: int, bg):
    """Composite one batch of tiles.

    xy [B,K,2], conic [B,K,3], rgb [B,K,3], opacity [B,K], valid [B,K],
    tile_ids [B] → ([B, 3, P], final_T [B, P]) with P = tile_h*tile_w.
    """
    px, py = _tile_pixel_grid(tile_ids, tiles_x, tile_w, tile_h)  # [B, P]
    dx = xy[:, :, 0, None] - px[:, None, :]   # [B, K, P]
    dy = xy[:, :, 1, None] - py[:, None, :]
    power = (-0.5 * (conic[:, :, 0, None] * dx * dx
                     + conic[:, :, 2, None] * dy * dy)
             - conic[:, :, 1, None] * dx * dy)
    alpha = jnp.minimum(0.99, opacity[:, :, None] * jnp.exp(power))
    contributes = valid[:, :, None] & (power <= 0.0) & (alpha >= 1.0 / 255.0)
    alpha = jnp.where(contributes, alpha, 0.0)

    one_minus = 1.0 - alpha
    ones = jnp.ones_like(one_minus[:, :1])
    T_excl = jnp.cumprod(jnp.concatenate([ones, one_minus[:, :-1]], axis=1), axis=1)
    fail = contributes & (T_excl * one_minus < 1e-4)
    done_before = jnp.cumsum(fail.astype(jnp.int32), axis=1) - fail.astype(jnp.int32)
    include = contributes & (done_before == 0) & ~fail

    w = jnp.where(include, alpha * T_excl, 0.0)               # [B, K, P]
    out = jnp.einsum("bkp,bkc->bcp", w, rgb,
                     precision=jax.lax.Precision.HIGHEST)
    final_T = jnp.prod(jnp.where(include, one_minus, 1.0), axis=1)  # [B, P]
    out = out + final_T[:, None, :] * bg[None, :, None]
    return out, final_T


def _rasterize_stream(processed: Processed, image_width: int,
                      image_height: int, bg_color, config: RasterConfig,
                      tiles_x: int, tiles_y: int, interpret: bool = False):
    """Instance-stream path: single packed attribute array + segment kernels.

    See ops/pallas/stream.py for the layout. Gradients flow through the
    row-packing gather (its transpose is the per-instance scatter-add back to
    Gaussians); the kernel's custom VJP emits per-instance gradients.
    """
    from .pallas.stream import composite_stream

    tile_w, tile_h = config.tile_w, config.tile_h
    num_tiles = tiles_x * tiles_y
    bins, attrs = bin_and_pack_stream(processed, tiles_x, tiles_y, config)

    tiles_out, final_T = composite_stream(
        attrs, bins.seg_start, bins.counts, bg_color,
        jnp.arange(num_tiles, dtype=jnp.int32), tiles_x, tile_w, tile_h,
        interpret, False, config.fast_math)
    return assemble_stream_output(tiles_out, final_T, bins, processed,
                                  tiles_x, tiles_y, tile_w, tile_h,
                                  image_width, image_height)


def widen_eval_budgets(cfg: RasterConfig) -> RasterConfig:
    """Generous per-Gaussian tile budgets for EVAL surfaces.

    Training can afford tight budgets (d=32, narrow tiers) because
    densification statistics and pruning co-adapt to them — but that makes
    the train-time renderer a *different operator* from the full-footprint
    one: a converged model carries large smooth splats whose tails the
    optimizer never saw. Reported metrics must come from the full render
    (the reference's CUDA rasterizer has no budget caps at all —
    diff-gaussian-rasterization duplicates keys per overlapped tile,
    unbounded), so every eval surface (cli/render AND the in-loop eval
    sweeps — round 5 closed a 0.34 dB loop-vs-offline skew traced to the
    loop evaluating with train budgets) widens to d>=512 with a wide tier
    ladder. Residual clipping is still counted in overflow_tiles.
    """
    if cfg.max_tiles_per_gaussian < 512:
        cfg = cfg._replace(max_tiles_per_gaussian=512)
    # () is the FLAT layout: every Gaussian already gets the full budget —
    # more generous than any tiering; only widen 1/2-tier layouts whose top
    # tier is tight.
    if len(cfg.tier_budgets) in (1, 2):
        cfg = cfg._replace(tier_budgets=(4, 12, 64),
                           tier_fracs=(0.25, 0.1, 0.01))
    return cfg


# Measured scatter-add lowering boundary (exp_scatter2.py, v5e): colliding
# scatter-add into a target of <= ~250K rows runs at ~17 ns/row (the
# accumulator stays VMEM-resident); from ~300K rows the per-row cost jumps
# 6x to ~107 ns/row (per-row HBM read-modify-write). Independent of row
# WIDTH and of collision structure. The backward of the instance row-gather
# scatters CAP (~2-4M) rows into the [N, 16] table, so at bicycle scale
# (N=500K) the default transpose alone cost 217 ms of a 303 ms step; the
# bucketed form below splits the TARGET into fast-regime pieces and makes K
# masked passes over the rows: K=2 at N=500K measured 72 ms vs 228 ms.
_SCATTER_FAST_ROWS = 250_000
# Single-pass widened-row variant: place each row in column block
# `idx // bucket_rows` of a [bucket_rows, K*W] accumulator (still in the
# fast row regime) instead of making K masked passes. Exactly equal output.
# Measured on v5e (exp_scatter3.py): the fast-regime rate is per-ROW even at
# width 64 (17-18 ns/row, 61 MB target), so one widened pass is flat in N —
# ~38 ms at CAP=2.15M for ANY N up to 1M, vs K x ~35 ms for the K-pass form
# (1.9x at N=500K, 3.6x at N=1M). Default on.
_SCATTER_WIDENED = True


def _widened_scatter_add(g_rows, idx, n: int, k: int, b: int):
    """One fast-regime pass: scatter [M, W] rows into [b, K*W] with the
    column block selected by target bucket, then unstack to [n, W]."""
    w = g_rows.shape[1]
    bucket = idx // b
    local = idx - bucket * b
    onehot = (bucket[:, None] == jnp.arange(k, dtype=idx.dtype)[None, :]
              ).astype(g_rows.dtype)
    wide = (onehot[:, :, None] * g_rows[:, None, :]).reshape(
        g_rows.shape[0], k * w)
    acc = jnp.zeros((b, k * w), g_rows.dtype).at[local].add(wide)
    return acc.reshape(b, k, w).swapaxes(0, 1).reshape(k * b, w)[:n]


def _bucketed_scatter_add(g_rows, idx, n: int,
                          fast_rows: int = _SCATTER_FAST_ROWS,
                          widened: bool | None = None):
    """sum-scatter g_rows [M, W] into [n, W] at idx, keeping every
    accumulator bucket inside the fast (<= fast_rows) scatter regime."""
    w = g_rows.shape[1]
    if n <= fast_rows:
        return jnp.zeros((n, w), g_rows.dtype).at[idx].add(g_rows)
    k = -(-n // fast_rows)
    b = -(-n // k)
    if widened if widened is not None else _SCATTER_WIDENED:
        return _widened_scatter_add(g_rows, idx, n, k, b)
    outs = []
    for j in range(k):
        local = idx - j * b
        inb = (local >= 0) & (local < b)
        li = jnp.where(inb, local, b)              # b = dump slot
        acc = jnp.zeros((b + 1, w), g_rows.dtype).at[li].add(
            jnp.where(inb[:, None], g_rows, 0.0))
        outs.append(acc[:b])
    return jnp.concatenate(outs)[:n]


@jax.custom_vjp
def _gather_inst_rows(table, inst_rank, inst_valid):
    """out[:, i] = table[inst_rank[i]] where valid else 0 — the stream pack
    gather, returned TRANSPOSED ([W, CAP]): the validity mask is applied
    after the transpose so the masked pass runs in the attribute-major
    layout (minor dim CAP) instead of over the [CAP, W] rows, whose W=16
    lanes are padded to 128 on TPU (8x the memory traffic; −1.2 ms at the
    1080p load). Backward uses the bucketed/widened scatter above."""
    return jnp.where(inst_valid[None, :], table[inst_rank].T, 0.0)


def _gather_inst_rows_fwd(table, inst_rank, inst_valid):
    return (_gather_inst_rows(table, inst_rank, inst_valid),
            (inst_rank, inst_valid, table.shape[0]))


def _gather_inst_rows_bwd(res, g):
    inst_rank, inst_valid, n = res
    g = jnp.where(inst_valid[None, :], g, 0.0).T
    import numpy as _np
    f0 = lambda x: _np.zeros(x.shape, jax.dtypes.float0)
    return (_bucketed_scatter_add(g, inst_rank, n), f0(inst_rank),
            f0(inst_valid))


_gather_inst_rows.defvjp(_gather_inst_rows_fwd, _gather_inst_rows_bwd)


def bin_and_pack_stream(processed: Processed, tiles_x: int, tiles_y: int,
                        config: RasterConfig):
    """Stream-backend front half: tile binning + packed attribute rows.

    Returns (bins, attrs [16, CAP + CHUNK]). Shared by the single-device
    path and the tile-sharded shard_map path (parallel/tile_stream.py) so
    the packed row layout cannot desync between them.

    Packs per-Gaussian attributes into one [N, 16] struct, permutes it into
    depth order (so instance slots index it directly by depth rank), and
    gathers whole rows per instance — a single 64-byte-row gather instead of
    9 scalar gathers (TPU gathers are row-DMA-bound; scalar gathers ran at
    ~60M elem/s in profiling). Binning's [N, 8] rect table rides the same
    depth-order gather as 8 extra (stop-gradient) columns — row gathers cost
    ~15 ns/row independent of width, so this deletes a whole [N]-row gather.
    The validity gate's where() transpose keeps uninitialized gradient
    memory in out-of-segment columns from scatter-adding into rank 0; the
    depth permutation's transpose unsorts the [N, 16] gradient table back to
    Gaussian order (an N-row scatter).
    """
    from .binning import (auto_instance_cap, bin_instances_stream,
                          rect_table)
    from .pallas.stream import ROWS

    n = processed.xy.shape[0]
    cap = config.instance_cap
    if cap is None:
        cap = auto_instance_cap(n, config.max_tiles_per_gaussian,
                                config.tile_w, config.tile_h,
                                config.tier_budgets, config.tier_fracs)
    assert cap % 128 == 0, "instance_cap must be CHUNK-aligned"
    sg_processed = jax.lax.stop_gradient(processed)
    depth_key = jnp.where(sg_processed.mask, sg_processed.depth, jnp.inf)
    order = jnp.argsort(depth_key, stable=True).astype(jnp.int32)
    overflow_visible = jnp.zeros((), jnp.int32)
    if config.visible_cap and config.visible_cap < n:
        # visible-prefix compaction: masked rows sorted to the tail, so the
        # first V positions hold the V nearest visible Gaussians; every
        # stage below runs on V rows. Dropped visible rows (the farthest)
        # are counted, never silent.
        v = config.visible_cap
        n_vis = sg_processed.mask.sum().astype(jnp.int32)
        overflow_visible = jnp.maximum(n_vis - v, 0)
        order = order[:v]
        nrows = v
    else:
        nrows = n
    table = jnp.concatenate([
        processed.xy,                                  # 0, 1
        processed.conic,                               # 2, 3, 4
        processed.opacity[:, None],                    # 5
        processed.rgb,                                 # 6, 7, 8
        jnp.zeros((n, ROWS - 9)),
        rect_table(sg_processed),                      # 16..23 (no grad)
    ], axis=1)[order]                            # [V, 24] depth-ordered
    bins = bin_instances_stream(sg_processed, tiles_x,
                                tiles_y, config.max_tiles_per_gaussian,
                                cap, tile_w=config.tile_w,
                                tile_h=config.tile_h,
                                tier_budgets=config.tier_budgets,
                                tier_fracs=config.tier_fracs,
                                order=order,
                                rect_ordered=jax.lax.stop_gradient(
                                    table[:, ROWS:]))
    bins = bins._replace(overflow_visible=overflow_visible)
    attrs = _gather_inst_rows(table[:, :ROWS], bins.inst_rank,
                              bins.inst_valid)         # [16, CAP + CHUNK]
    return bins, attrs


def assemble_stream_output(tiles_out, final_T, bins, processed,
                           tiles_x: int, tiles_y: int, tile_w: int,
                           tile_h: int, image_width: int, image_height: int):
    """Stream-backend back half: [T, P, 3] tiles → (image [3,H,W], aux)."""
    num_tiles = tiles_x * tiles_y
    tiles_out = tiles_out.transpose(0, 2, 1)          # [T, 3, P]
    image = _assemble_image(tiles_out, tiles_x, tiles_y, tile_w, tile_h,
                            image_width, image_height)
    final_T_img = _assemble_image(
        jnp.broadcast_to(final_T[:, None, :],
                         (num_tiles, 3, tile_h * tile_w)),
        tiles_x, tiles_y, tile_w, tile_h, image_width, image_height)[0]
    aux = {
        "radii": processed.radius,
        "final_T": final_T_img,
        "overflow_tiles": bins.overflow_tiles,
        "overflow_capacity": bins.overflow_capacity,
        "overflow_visible": bins.overflow_visible,
        "tile_counts": bins.counts_raw,
        # measured per-camera visible count — feedback for the loop's
        # visible_cap bucket (round 4)
        "n_mask_visible": jax.lax.stop_gradient(processed.mask.sum()),
        # per-frame tier demand — feedback for scene-calibrated tier_fracs
        "tier_need_counts": bins.tier_counts,
    }
    return image, aux


def _assemble_image(tiles: jnp.ndarray, tiles_x: int, tiles_y: int,
                    tile_w: int, tile_h: int, width: int, height: int):
    """[T, 3, P] per-tile images → [3, H, W]."""
    img = tiles.reshape(tiles_y, tiles_x, 3, tile_h, tile_w)
    img = img.transpose(2, 0, 3, 1, 4).reshape(3, tiles_y * tile_h, tiles_x * tile_w)
    return img[:, :height, :width]


def rasterize(processed: Processed, image_width: int, image_height: int,
              bg_color: jnp.ndarray, config: RasterConfig = RasterConfig(),
              bins: Optional[TileBins] = None):
    """Full tiled rasterization. Returns (image [3,H,W], aux dict).

    aux: radii [N] int32, final_T [H, W], overflow counters from binning.
    """
    tile_w, tile_h = config.tile_w, config.tile_h
    tiles_x = -(-image_width // tile_w)
    tiles_y = -(-image_height // tile_h)
    num_tiles = tiles_x * tiles_y

    backend = config.backend
    if backend == "auto":
        backend = "stream" if jax.default_backend() == "tpu" else "jnp"

    if backend == "stream":
        return _rasterize_stream(processed, image_width, image_height,
                                 bg_color, config, tiles_x, tiles_y)

    if bins is None:
        bins = bin_gaussians(jax.lax.stop_gradient(processed), tiles_x, tiles_y,
                             config.max_tiles_per_gaussian,
                             config.tile_capacity, tile_w=tile_w,
                             tile_h=tile_h)

    # Gather per-tile attribute lists (bandwidth-bound XLA gathers).
    idx = bins.gauss_idx                    # [T, K]
    g_xy = processed.xy[idx]                # [T, K, 2]
    g_conic = processed.conic[idx]
    g_rgb = processed.rgb[idx]
    g_op = processed.opacity[idx]
    g_valid = bins.valid

    if backend == "pallas":
        from .pallas.composite import composite_tiles_pallas
        tile_ids_all = jnp.arange(num_tiles, dtype=jnp.int32)
        tiles_out, final_T = composite_tiles_pallas(
            g_xy, g_conic, g_rgb, g_op, g_valid, tile_ids_all,
            tiles_x, tile_w, tile_h, bg_color)
    else:
        # Batch tiles through a checkpointed scan to bound live memory.
        b = config.tile_batch
        pad = (-num_tiles) % b
        def pad0(x):
            return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
        tile_ids_all = jnp.arange(num_tiles + pad, dtype=jnp.int32)
        xs = (pad0(g_xy), pad0(g_conic), pad0(g_rgb), pad0(g_op), pad0(g_valid),
              tile_ids_all)
        nb = (num_tiles + pad) // b
        xs = jax.tree.map(lambda x: x.reshape((nb, b) + x.shape[1:]), xs)

        @jax.checkpoint
        def body(carry, x):
            xy, conic, rgb, op, val, ids = x
            out, fT = composite_tiles_jnp(xy, conic, rgb, op, val, ids,
                                          tiles_x, tile_w, tile_h, bg_color)
            return carry, (out, fT)

        _, (tiles_out, final_T) = jax.lax.scan(body, 0, xs)
        tiles_out = tiles_out.reshape(num_tiles + pad, 3, tile_h * tile_w)[:num_tiles]
        final_T = final_T.reshape(num_tiles + pad, tile_h * tile_w)[:num_tiles]

    image = _assemble_image(tiles_out, tiles_x, tiles_y, tile_w, tile_h,
                            image_width, image_height)
    final_T_img = _assemble_image(
        jnp.broadcast_to(final_T[:, None, :], (num_tiles, 3, tile_h * tile_w)),
        tiles_x, tiles_y, tile_w, tile_h, image_width, image_height)[0]

    aux = {
        "radii": processed.radius,
        "final_T": final_T_img,
        "overflow_tiles": bins.overflow_tiles,
        "overflow_capacity": bins.overflow_capacity,
        "tile_counts": bins.counts,
    }
    return image, aux
