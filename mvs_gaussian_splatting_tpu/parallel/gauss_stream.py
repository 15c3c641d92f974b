"""Gaussian-sharded (primitive-sharded) STREAM rendering with all_to_all.

The second parallel axis from SURVEY §7 step 7 (the first — image/tile
sharding with replicated preprocess — is :mod:`tile_stream`): here the
GAUSSIANS are sharded over devices, so preprocess, depth sort, tile
enumeration, and attribute packing all run on N/D primitives per device,
and instances are exchanged to their tile-owner device with one
``all_to_all``. Scales the O(N·log N) binning front half, which dominates
small-image steps, in addition to the composite.

Per-device pipeline inside ``shard_map`` (device d owns tiles ≡ d mod D
round-robin by default — load-balanced across the image, SURVEY §7 "hard
parts"; ``round_robin=False`` falls back to contiguous strips):
1. local ``bin_instances_stream`` over the shard's N/D Gaussians — a
   tile-then-depth sorted local instance stream (depth row carried in the
   packed rows for the cross-device merge). Under round-robin the binning
   sorts tile ids DESTINATION-MAJOR (``round_robin=D`` remap), so each
   owner's tiles still occupy one contiguous span of the stream;
2. the instances destined for each destination are therefore one CONTIGUOUS
   slice either way: D dynamic slices of a fixed quota Q each (no per-row
   gather), truncation counted in ``overflow_quota``;
3. one ``all_to_all`` exchanges rows [D, Q, 16] + per-tile counts;
4. merge: received chunks are (tile, depth)-sorted per source; one
   (tile, depth)-key sort over the D·Q candidates with a row-index payload
   rebuilds the strip's global stream (depth ties across devices break by
   source order instead of global submission order — compositing-order
   parity holds for distinct depths, which is the generic case);
5. ``composite_stream`` on the local strip (global tile ids via the pixel-
   grid indirection).

Gradients: attribute rows flow through slice → all_to_all → sort-gather →
custom-VJP kernel; every transpose is automatic under shard_map (reverse
all_to_all, scatter for the gathers). The depth row rides only in the
(stop-gradient) sort keys, so its cotangent is zero, like the reference's
non-differentiable depth sort.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.binning import auto_instance_cap, bin_instances_stream
from ..ops.pallas.stream import CHUNK, ROWS
from ..ops.preprocess import Processed
from ..ops.rasterize import RasterConfig, _assemble_image


def make_gauss_sharded_stream(mesh: Mesh, axis: str, image_width: int,
                              image_height: int,
                              config: RasterConfig = RasterConfig(),
                              n_total: Optional[int] = None,
                              quota: Optional[int] = None,
                              round_robin: bool = True,
                              interpret: bool = False):
    """Returns fn(processed, bg) → (image [3, H, W], aux).

    ``processed`` leaves are full [N, ...] arrays with N divisible by the
    axis size (the training loop's render buckets are powers of two).
    ``quota`` is the per-(src, dst) instance budget of the exchange; default
    2·cap_local/D, CHUNK-aligned; shortfall lands in aux["overflow_quota"].
    ``round_robin`` assigns device d the tiles ≡ d mod D (even foreground/
    sky mix per device) instead of contiguous raster strips; image and
    gradients are exact either way (tested vs single-device).
    """
    from ..ops.pallas.stream import composite_stream

    n_dev = mesh.shape[axis]
    tile_w, tile_h = config.tile_w, config.tile_h
    tiles_x = -(-image_width // tile_w)
    tiles_y = -(-image_height // tile_h)
    num_tiles = tiles_x * tiles_y
    t_padded = num_tiles + (-num_tiles) % n_dev
    t_per = t_padded // n_dev

    def local_render(processed: Processed, bg):
        d_idx = jax.lax.axis_index(axis)
        n_loc = processed.xy.shape[0]
        cap = config.instance_cap
        if cap is None:
            cap = auto_instance_cap(n_loc, config.max_tiles_per_gaussian,
                                    tile_w, tile_h, config.tier_budgets,
                                    config.tier_fracs)
        q = quota
        if q is None:
            q = 2 * cap // n_dev
        q += (-q) % CHUNK

        # 1. local binning over this shard's Gaussians (destination-major
        # tile order under round-robin, so step 2 stays contiguous slices)
        bins = bin_instances_stream(
            jax.lax.stop_gradient(processed), tiles_x, tiles_y,
            config.max_tiles_per_gaussian, cap, tile_w=tile_w, tile_h=tile_h,
            tier_budgets=config.tier_budgets, tier_fracs=config.tier_fracs,
            round_robin=(n_dev if round_robin else 0))

        table = jnp.concatenate([
            processed.xy,                                   # 0, 1
            processed.conic,                                # 2, 3, 4
            processed.opacity[:, None],                     # 5
            processed.rgb,                                  # 6, 7, 8
            jax.lax.stop_gradient(processed.depth)[:, None],  # 9 (merge key)
            jnp.zeros((n_loc, ROWS - 10)),
        ], axis=1)[bins.order]
        rows = jnp.where(bins.inst_valid[:, None],
                         table[bins.inst_rank], 0.0)        # [cap+CHUNK, 16]

        # 2. contiguous destination slices at fixed quota
        if round_robin:
            # binning already emitted t_padded destination-major segments
            seg_start_pad, counts_pad = bins.seg_start, bins.counts
        else:
            seg_end0 = bins.seg_start[-1] + bins.counts[-1]
            seg_start_pad = jnp.concatenate(
                [bins.seg_start,
                 jnp.broadcast_to(seg_end0, (t_padded - num_tiles,))])
            counts_pad = jnp.concatenate(
                [bins.counts,
                 jnp.zeros((t_padded - num_tiles,), bins.counts.dtype)])
        seg_end = seg_start_pad[-1] + counts_pad[-1]
        strip_lo = seg_start_pad[::t_per]                   # [D]
        strip_hi = jnp.concatenate([strip_lo[1:], seg_end[None]])
        strip_count = strip_hi - strip_lo                   # [D]
        overflow_quota = jnp.maximum(strip_count - q, 0).sum()

        rows_padded = jnp.concatenate(
            [rows, jnp.zeros((q, ROWS), rows.dtype)])
        send_rows = jnp.stack([
            jax.lax.dynamic_slice(rows_padded, (strip_lo[d], 0), (q, ROWS))
            for d in range(n_dev)])                         # [D, Q, 16]
        send_tile_counts = counts_pad.reshape(n_dev, t_per)  # [D, t_per]
        send_count = jnp.minimum(strip_count, q)            # [D]

        # 3. exchange: device j receives chunk j of every source
        recv_rows = jax.lax.all_to_all(send_rows, axis, 0, 0)
        recv_tile_counts = jax.lax.all_to_all(send_tile_counts, axis, 0, 0)
        recv_count = jax.lax.all_to_all(send_count, axis, 0, 0)

        # 4. merge the D sorted chunks: reconstruct per-instance local tile
        # ids from the per-source tile counts, then one (tile, depth) sort
        cum = jnp.cumsum(recv_tile_counts, axis=1)          # [D, t_per]
        j = jnp.arange(q, dtype=jnp.int32)
        tile_local = jax.vmap(
            lambda c, jj: jnp.searchsorted(c, jj, side="right").astype(
                jnp.int32))(cum, jnp.broadcast_to(j, (n_dev, q)))
        valid = j[None, :] < recv_count[:, None]            # [D, Q]
        tile_key = jnp.where(valid, tile_local, t_per).reshape(-1)
        depth_key = jnp.where(valid, recv_rows[:, :, 9], jnp.inf).reshape(-1)
        src_idx = jnp.arange(n_dev * q, dtype=jnp.int32)
        tile_sorted, _, idx_sorted = jax.lax.sort(
            (tile_key, depth_key, src_idx), num_keys=2, is_stable=True)

        flat_rows = recv_rows.reshape(n_dev * q, ROWS)
        merged = jnp.where((tile_sorted < t_per)[:, None],
                           flat_rows[idx_sorted], 0.0)      # [D·Q, 16]
        merged = jnp.concatenate(
            [merged, jnp.zeros((CHUNK, ROWS), merged.dtype)])

        tile_range = jnp.arange(t_per, dtype=jnp.int32)
        seg_start = jnp.searchsorted(tile_sorted, tile_range,
                                     side="left").astype(jnp.int32)
        n_valid = jnp.searchsorted(tile_sorted, jnp.int32(t_per),
                                   side="left").astype(jnp.int32)
        seg_end_l = jnp.concatenate([seg_start[1:], n_valid[None]])
        counts = seg_end_l - seg_start

        # 5. composite the owned tiles (global tile ids; padding positions
        # past num_tiles have count 0 and are dropped at assembly)
        if round_robin:
            tile_ids = tile_range * n_dev + d_idx
        else:
            tile_ids = d_idx * t_per + tile_range
        out, final_t = composite_stream(
            merged.T, seg_start, counts, bg, tile_ids, tiles_x, tile_w,
            tile_h, interpret, False, config.fast_math)
        stats = jnp.stack([jnp.asarray(bins.overflow_tiles, jnp.int32),
                           jnp.asarray(bins.overflow_capacity, jnp.int32),
                           overflow_quota.astype(jnp.int32),
                           jnp.asarray(bins.counts_raw.sum(), jnp.int32)])
        stats = jax.lax.psum(stats, axis)
        return out, final_t, stats

    sharded = jax.shard_map(
        local_render, mesh=mesh,
        in_specs=(P(axis), P()),        # prefix spec: every Processed leaf
        out_specs=(P(axis), P(axis), P()),
        check_vma=False)

    def fn(processed: Processed, bg):
        if n_total is not None:
            assert processed.xy.shape[0] == n_total
        assert processed.xy.shape[0] % n_dev == 0, (
            f"N={processed.xy.shape[0]} not divisible by {n_dev} devices")
        tiles_out, final_t, stats = sharded(processed, bg)
        if round_robin:
            # concatenated shard outputs are destination-major: position
            # d·t_per + l holds global tile l·D + d
            t_idx = jnp.arange(num_tiles, dtype=jnp.int32)
            remap = (t_idx % n_dev) * t_per + t_idx // n_dev
            tiles_out = tiles_out[remap]
            final_t = final_t[remap]
        else:
            tiles_out = tiles_out[:num_tiles]
            final_t = final_t[:num_tiles]
        image = _assemble_image(tiles_out.transpose(0, 2, 1),
                                tiles_x, tiles_y, tile_w, tile_h,
                                image_width, image_height)
        ft_img = _assemble_image(
            jnp.broadcast_to(final_t[:, None, :],
                             (num_tiles, 3, tile_h * tile_w)),
            tiles_x, tiles_y, tile_w, tile_h, image_width, image_height)[0]
        aux = {
            "radii": processed.radius,
            "final_T": ft_img,
            "overflow_tiles": stats[0],
            "overflow_capacity": stats[1],
            "overflow_quota": stats[2],
            "instance_load": stats[3],
        }
        return image, aux

    return fn
