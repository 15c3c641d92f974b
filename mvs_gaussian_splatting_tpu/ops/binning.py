"""Tile binning: per-tile depth-ordered Gaussian lists via one global sort.

TPU-native replacement for the CUDA rasterizer's duplicate-with-keys + radix
sort stage (SURVEY §2.9). Instead of a dynamic number of (tile, depth) key
instances, each Gaussian emits a *fixed* budget of tile instances
(``max_tiles_per_gaussian``); a single lexicographic XLA sort over
(tile_id, depth) yields contiguous per-tile segments, from which each tile
takes up to ``tile_capacity`` front-most entries.

Both caps are explicit and *reported* (`overflow_tiles`, `overflow_capacity`)
— no silent truncation. Shapes are static: the instance table is
[N · max_tiles_per_gaussian] and the output [num_tiles, tile_capacity].
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .preprocess import Processed


class TileBins(NamedTuple):
    gauss_idx: jnp.ndarray   # [T, K] int32 indices into the Gaussian arrays
    valid: jnp.ndarray       # [T, K] bool
    counts: jnp.ndarray      # [T] int32 total intersections per tile (pre-cap)
    overflow_tiles: jnp.ndarray     # int32: Σ tiles dropped by the per-Gaussian budget
    overflow_capacity: jnp.ndarray  # int32: Σ entries dropped by tile_capacity


def bin_gaussians(processed: Processed, tiles_x: int, tiles_y: int,
                  max_tiles_per_gaussian: int, tile_capacity: int) -> TileBins:
    n = processed.xy.shape[0]
    d = max_tiles_per_gaussian
    num_tiles = tiles_x * tiles_y

    rect_min, rect_max = processed.rect_min, processed.rect_max
    span_x = jnp.maximum(rect_max[:, 0] - rect_min[:, 0], 0)
    span_y = jnp.maximum(rect_max[:, 1] - rect_min[:, 1], 0)
    area = jnp.where(processed.mask, span_x * span_y, 0)

    # Enumerate up to d tile instances per Gaussian in row-major rect order.
    j = jnp.arange(d, dtype=jnp.int32)                      # [d]
    span_x_safe = jnp.maximum(span_x, 1)
    ty = rect_min[:, 1, None] + j[None, :] // span_x_safe[:, None]
    tx = rect_min[:, 0, None] + j[None, :] % span_x_safe[:, None]
    inst_valid = j[None, :] < jnp.minimum(area, d)[:, None]  # [n, d]
    tile_id = jnp.where(inst_valid, ty * tiles_x + tx, num_tiles).astype(jnp.int32)

    overflow_tiles = jnp.maximum(area - d, 0).sum().astype(jnp.int32)

    depth_key = jnp.broadcast_to(processed.depth[:, None], (n, d))
    gauss_id = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, d))

    tile_sorted, _, idx_sorted = jax.lax.sort(
        (tile_id.reshape(-1), depth_key.reshape(-1), gauss_id.reshape(-1)),
        num_keys=2, is_stable=True)

    # Per-tile segment boundaries in the sorted instance table.
    tile_range = jnp.arange(num_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(tile_sorted, tile_range, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(tile_sorted, tile_range, side="right").astype(jnp.int32)
    counts = ends - starts

    k = jnp.arange(tile_capacity, dtype=jnp.int32)
    take = starts[:, None] + k[None, :]                      # [T, K]
    valid = k[None, :] < jnp.minimum(counts, tile_capacity)[:, None]
    gauss_idx = jnp.where(valid, idx_sorted[jnp.clip(take, 0, n * d - 1)], 0)

    overflow_capacity = jnp.maximum(counts - tile_capacity, 0).sum().astype(jnp.int32)

    return TileBins(gauss_idx=gauss_idx, valid=valid, counts=counts,
                    overflow_tiles=overflow_tiles,
                    overflow_capacity=overflow_capacity)


class StreamBins(NamedTuple):
    """Instance-stream layout: one packed instance list, CHUNK-aligned
    per-tile regions (consumed by ops/pallas/stream.py)."""

    inst_gauss: jnp.ndarray     # [CAP] int32 Gaussian index per instance slot
    inst_valid: jnp.ndarray     # [CAP] bool
    region_start: jnp.ndarray   # [T] int32, CHUNK-aligned region offsets
    counts: jnp.ndarray         # [T] int32 valid instances per tile (clipped)
    counts_raw: jnp.ndarray     # [T] int32 pre-clip intersection counts
    overflow_tiles: jnp.ndarray
    overflow_capacity: jnp.ndarray


def bin_instances_stream(processed: Processed, tiles_x: int, tiles_y: int,
                         max_tiles_per_gaussian: int, cap: int,
                         chunk: int = 128) -> StreamBins:
    """Depth-presorted, single-key tile sort into aligned regions.

    Gaussians are depth-sorted once (N entries), instances enumerated in that
    order, then stably sorted by tile id alone — stability preserves depth
    order within each tile, replacing the 2-key (tile, depth) sort with a
    cheaper single-key sort. Per-tile segments are then laid into regions
    rounded up to ``chunk`` so stream kernels get aligned DMA and conflict-
    free gradient writes. All truncation is counted, never silent.
    """
    n = processed.xy.shape[0]
    d = max_tiles_per_gaussian
    num_tiles = tiles_x * tiles_y

    depth_key = jnp.where(processed.mask, processed.depth, jnp.inf)
    order = jnp.argsort(depth_key, stable=True).astype(jnp.int32)  # [N]

    # one row-gather for all rect data (scalar gathers are slow on TPU)
    rect_table = jnp.concatenate(
        [processed.rect_min, processed.rect_max,
         processed.mask[:, None].astype(jnp.int32)], axis=1)       # [N, 5]
    rect_o = rect_table[order]
    rect_min = rect_o[:, 0:2]
    rect_max = rect_o[:, 2:4]
    mask_o = rect_o[:, 4] > 0
    span_x = jnp.maximum(rect_max[:, 0] - rect_min[:, 0], 0)
    span_y = jnp.maximum(rect_max[:, 1] - rect_min[:, 1], 0)
    area = jnp.where(mask_o, span_x * span_y, 0)

    j = jnp.arange(d, dtype=jnp.int32)
    span_x_safe = jnp.maximum(span_x, 1)
    ty = rect_min[:, 1, None] + j[None, :] // span_x_safe[:, None]
    tx = rect_min[:, 0, None] + j[None, :] % span_x_safe[:, None]
    inst_valid = j[None, :] < jnp.minimum(area, d)[:, None]
    tile_id = jnp.where(inst_valid, ty * tiles_x + tx, num_tiles).astype(jnp.int32)
    overflow_tiles = jnp.maximum(area - d, 0).sum().astype(jnp.int32)

    gauss_id = jnp.broadcast_to(order[:, None], (n, d))
    sorted_tile, sorted_gauss = jax.lax.sort(
        (tile_id.reshape(-1), gauss_id.reshape(-1)), num_keys=1,
        is_stable=True)

    tile_range = jnp.arange(num_tiles, dtype=jnp.int32)
    seg_start = jnp.searchsorted(sorted_tile, tile_range, side="left").astype(jnp.int32)
    seg_end = jnp.searchsorted(sorted_tile, tile_range, side="right").astype(jnp.int32)
    counts_raw = seg_end - seg_start

    padded = ((counts_raw + chunk - 1) // chunk) * chunk
    region_start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(padded)[:-1].astype(jnp.int32)])
    fits = region_start + padded <= cap
    counts = jnp.where(fits, counts_raw, 0)
    overflow_capacity = (counts_raw.sum() - counts.sum()).astype(jnp.int32)

    # Per-slot region values (region_start[t_q], counts[t_q], seg_start[t_q])
    # via boundary-delta scatter + cumsum instead of per-slot gathers: TPU
    # gathers run at ~60M elem/s, three 2M-element gathers would eat ~40 ms;
    # three 8160-element scatters + 2M cumsums are bandwidth-speed. Duplicate
    # boundary positions (empty regions) scatter-ADD their deltas, which the
    # cumsum accumulates correctly.
    q = jnp.arange(cap, dtype=jnp.int32)

    def per_slot(vals):
        deltas = jnp.concatenate([vals[:1], jnp.diff(vals)])
        arr = jnp.zeros(cap, vals.dtype).at[region_start].add(deltas,
                                                              mode="drop")
        return jnp.cumsum(arr)

    region_start_q = per_slot(region_start)
    counts_q = per_slot(counts)
    seg_start_q = per_slot(seg_start)
    off = q - region_start_q
    valid_q = off < counts_q
    src = jnp.clip(seg_start_q + off, 0, n * d - 1)
    inst_gauss = jnp.where(valid_q, sorted_gauss[src], 0)

    return StreamBins(inst_gauss=inst_gauss, inst_valid=valid_q,
                      region_start=region_start, counts=counts,
                      counts_raw=counts_raw,
                      overflow_tiles=overflow_tiles,
                      overflow_capacity=overflow_capacity)
