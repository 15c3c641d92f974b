"""Tile-sharded STREAM rendering: the production multi-chip composite path.

Image-space parallelism (SURVEY §5.7) over the fast instance-stream Pallas
backend, not the jnp fallback of :mod:`tile_parallel`. Preprocess, binning,
and attribute packing run replicated (O(N·log N), cheap at high resolution);
each device then composites a contiguous strip of the tile grid with
:func:`ops.pallas.stream.composite_stream`, reading its segments from its
replica of the packed attribute array.

Gradient flow under ``shard_map``: the composite's custom VJP masks its
per-instance gradient stream to the shard's own segment span [seg_start[0],
seg_end[-1]) — every instance slot is owned by exactly one shard — so the
automatic psum that shard_map's transpose inserts for the replicated
``attrs`` input reassembles the exact full-stream gradient, which then flows
through the pack gather's transpose back to the Gaussians. The only
cross-device traffic is that one [16, CAP] all-reduce plus the scalar loss.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.preprocess import Processed
from ..ops.rasterize import (RasterConfig, assemble_stream_output,
                             bin_and_pack_stream)


def make_tile_sharded_stream(mesh: Mesh, axis: str, image_width: int,
                             image_height: int,
                             config: RasterConfig = RasterConfig(),
                             interpret: bool = False,
                             round_robin: bool = False):
    """Returns fn(processed, bg) → (image [3, H, W], aux).

    The tile axis (tiles_y · tiles_x, padded to the axis size) is sharded
    over ``axis``; tiles come back device-local and are reassembled. Works
    on a CPU host-device mesh with ``interpret=True`` for testing.

    ``round_robin``: assign tiles to devices in stride-D order instead of
    contiguous strips (SURVEY §7 "hard parts": dense-foreground vs sky tiles
    make contiguous strips load-imbalanced). Each shard's tile set is then
    non-contiguous in the instance stream, so the kernel's backward uses the
    exact per-segment gradient mask.
    """
    from ..ops.pallas.stream import composite_stream

    n_dev = mesh.shape[axis]
    tile_w, tile_h = config.tile_w, config.tile_h
    tiles_x = -(-image_width // tile_w)
    tiles_y = -(-image_height // tile_h)
    num_tiles = tiles_x * tiles_y
    pad = (-num_tiles) % n_dev
    t_padded = num_tiles + pad
    t_per = t_padded // n_dev

    def local_composite(attrs, seg_start, counts, tile_ids, bg):
        out, fT = composite_stream(attrs, seg_start, counts, bg, tile_ids,
                                   tiles_x, tile_w, tile_h, interpret,
                                   round_robin, config.fast_math)
        return out, fT

    sharded = jax.shard_map(
        local_composite, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P()),
        out_specs=(P(axis), P(axis)),
        check_vma=False)  # pallas_call out_shapes don't carry vma yet

    def fn(processed: Processed, bg):
        bins, attrs = bin_and_pack_stream(processed, tiles_x, tiles_y, config)

        # Pad the tile axis to the shard count. Padded tiles are empty
        # (count 0) and their seg_start repeats the last segment end so the
        # bwd mask span of the shard holding them stays correct.
        seg_end = bins.seg_start[-1] + bins.counts[-1]
        seg_start = jnp.concatenate(
            [bins.seg_start, jnp.broadcast_to(seg_end, (pad,))])
        counts = jnp.concatenate(
            [bins.counts, jnp.zeros((pad,), bins.counts.dtype)])
        tile_ids = jnp.arange(t_padded, dtype=jnp.int32)

        if round_robin:
            # device d composites tiles d, d+D, 2D+d, ... — per-device
            # seg_start stays ascending (a strided subsequence of an
            # ascending sequence), which the kernel's sequential
            # boundary-merge relies on
            perm = jnp.arange(t_padded, dtype=jnp.int32).reshape(
                t_per, n_dev).T.reshape(-1)
            tiles_out_p, final_T_p = sharded(attrs, seg_start[perm],
                                             counts[perm], perm, bg)
            inv = jnp.argsort(perm)
            tiles_out, final_T = tiles_out_p[inv], final_T_p[inv]
        else:
            tiles_out, final_T = sharded(attrs, seg_start, counts, tile_ids,
                                         bg)
        return assemble_stream_output(tiles_out[:num_tiles],
                                      final_T[:num_tiles], bins, processed,
                                      tiles_x, tiles_y, tile_w, tile_h,
                                      image_width, image_height)

    return fn
