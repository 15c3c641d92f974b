"""Tile-sharded rendering: image-space parallelism over the device mesh.

The spatial scaling axis (SURVEY §5.7: tiles are this workload's analog of
sequence parallelism). Preprocess + binning run replicated (they are O(N)
and cheap relative to compositing at high resolution); the per-tile
composite — the dominant cost — is sharded over devices with shard_map, each
device owning a contiguous strip of the tile grid. The assembled image comes
back tile-sharded; the loss is computed shard-local and summed with psum, so
the only cross-device traffic is the scalar loss and the parameter-gradient
all-reduce.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.binning import bin_gaussians
from ..ops.preprocess import Processed
from ..ops.rasterize import RasterConfig, composite_tiles_jnp


def make_tile_sharded_composite(mesh: Mesh, axis: str, image_width: int,
                                image_height: int,
                                config: RasterConfig = RasterConfig()):
    """Returns fn(processed, bg) → (tiles_out [T, 3, P], final_T [T, P], aux)
    with the tile axis sharded over ``axis``. T is padded to a multiple of the
    axis size."""
    n_dev = mesh.shape[axis]
    tile_w, tile_h = config.tile_w, config.tile_h
    tiles_x = -(-image_width // tile_w)
    tiles_y = -(-image_height // tile_h)
    num_tiles = tiles_x * tiles_y
    pad = (-num_tiles) % n_dev
    t_padded = num_tiles + pad

    def local_composite(xy, conic, rgb, op, valid, ids, bg):
        out, fT = composite_tiles_jnp(xy, conic, rgb, op, valid, ids,
                                      tiles_x, tile_w, tile_h, bg)
        return out, fT

    sharded = jax.shard_map(
        local_composite, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=(P(axis), P(axis)))

    def fn(processed: Processed, bg):
        bins = bin_gaussians(jax.lax.stop_gradient(processed), tiles_x,
                             tiles_y, config.max_tiles_per_gaussian,
                             config.tile_capacity)
        idx = bins.gauss_idx
        def pad0(x):
            return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
        g_xy = pad0(processed.xy[idx])
        g_conic = pad0(processed.conic[idx])
        g_rgb = pad0(processed.rgb[idx])
        g_op = pad0(processed.opacity[idx])
        g_valid = pad0(bins.valid)
        ids = jnp.arange(t_padded, dtype=jnp.int32)
        tiles_out, final_T = sharded(g_xy, g_conic, g_rgb, g_op, g_valid,
                                     ids, bg)
        aux = {"overflow_tiles": bins.overflow_tiles,
               "overflow_capacity": bins.overflow_capacity,
               "radii": processed.radius}
        return tiles_out[:num_tiles], final_T[:num_tiles], aux

    return fn
