"""Instance-stream Pallas composite: per-tile segments DMA'd from HBM.

The performance architecture for the tile rasterizer (v2 of composite.py).
Instead of gathering fixed-capacity [T, K] per-tile attribute tables (90%
padding waste at typical loads — see profile in bench history), the binning
stage lays all tile instances out in ONE packed attribute array of shape
[16, CAP + CHUNK] (attribute rows × tile-sorted instances, segment-direct:
per-tile segments start at arbitrary unaligned offsets, no chunk-aligned
re-layout). Kernels stream their segment HBM→VMEM with double-buffered async
DMA; per-entry validity is just a lane-index < count mask. Backward gradient
writes are chunk-granular and may spill ≤ CHUNK−1 zero lanes into the next
tile's segment head — safe because the sequential grid drains each step's
write DMAs before the next step, and each tile rewrites its full segment
(see dma_out).

Attribute row layout (rows 9..15 padding for the 16-sublane DMA tile):
  0 x, 1 y, 2 conic_a, 3 conic_b, 4 conic_c, 5 opacity, 6 r, 7 g, 8 b

Compositing semantics identical to composite.py (and the per-pixel oracle).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .composite import (_chunk_include_lanes, _cumsum_lanes,
                        _cumsum_lanes_fast)

CHUNK = 128
ROWS = 16
PREFETCH = True  # double-buffered DMA prefetch (module flag for debugging)
TILE_BATCH = 8   # tiles per grid step (amortizes ~1.5µs/step pipeline cost)
FAST_BWD_HILO = True  # hi+lo bf16 split of dpower in the moment matmul
# (True: moments near-f32; False: one-pass bf16, ~0.4% moment rounding)


def _pixel_grid(tile_id, tiles_x: int, tile_w: int, tile_h: int, p: int):
    tx = (tile_id % tiles_x).astype(jnp.float32)
    ty = (tile_id // tiles_x).astype(jnp.float32)
    flat = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px = tx * tile_w + (flat % tile_w).astype(jnp.float32)
    py = ty * tile_h + (flat // tile_w).astype(jnp.float32)
    return px, py


def _chunk_terms(buf, lo, hi, px, py):
    """buf [ROWS, CK] attribute slab → alpha terms [P, CK].

    Valid lanes are [lo, hi): chunk windows are 128-aligned in the instance
    array (Mosaic requires aligned lane-dim DMA), so the first window of a
    tile leads in with up to CHUNK−1 lanes belonging to the previous tile's
    segment tail, masked here.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    vl = ((lane >= lo) & (lane < hi)).astype(jnp.float32)
    xs, ys = buf[0:1, :], buf[1:2, :]
    ca, cb, cc = buf[2:3, :], buf[3:4, :], buf[4:5, :]
    op = buf[5:6, :]
    dx = xs - px
    dy = ys - py
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    g = jnp.exp(power)
    alpha = jnp.minimum(0.99, op * g)
    contrib = (vl > 0) & (power <= 0.0) & (alpha >= 1.0 / 255.0)
    alpha = jnp.where(contrib, alpha, 0.0)
    return dx, dy, g, alpha, contrib, (ca, cb, cc, op)


def _seg_meta(start_ref, count_ref, t):
    """(base, off, count, n_chunks) of tile ``t``'s segment window.

    Segment offsets are unaligned; kernels DMA 128-aligned windows covering
    the segment and mask the lead-in lanes (off = start mod CHUNK). Empty
    segments (count 0) get n_chunks 0 — no DMA, no junk chunk."""
    start = start_ref[t]
    count = count_ref[t]
    off = jax.lax.rem(start, CHUNK)
    base = pl.multiple_of(start - off, CHUNK)
    n_chunks = jnp.where(count > 0, (off + count + CHUNK - 1) // CHUNK, 0)
    return base, off, count, n_chunks


def _stream_fwd_kernel(start_ref, count_ref, ids_ref, attrs_ref, bg_ref,
                       out_ref, tfin_ref, buf, sem, *,
                       tiles_x: int, tile_w: int, tile_h: int,
                       tile_batch: int, fast: bool = False):
    p = tile_w * tile_h
    pid = pl.program_id(0)

    def dma_at(base, c, slot):
        return pltpu.make_async_copy(
            attrs_ref.at[:, pl.ds(base + c * CHUNK, CHUNK)],
            buf.at[slot], sem.at[slot])

    # Cross-tile pipelining: the read-buffer slot parity ``s`` is carried
    # across the batch's tiles so the NEXT tile's first chunk is prefetched
    # during the current tile's last chunk compute — without it every tile
    # paid one exposed DMA latency (~1.3 µs × all tiles) at its first wait.
    # Each grid step primes its own first tile (one exposed DMA per batch).
    if PREFETCH:
        base0, _, _, n0 = _seg_meta(start_ref, count_ref, pid * tile_batch)

        @pl.when(n0 > 0)
        def _():
            dma_at(base0, 0, 0).start()

    def one_tile(b, s):
        t = pid * tile_batch + b
        px, py = _pixel_grid(ids_ref[t], tiles_x, tile_w, tile_h, p)
        base, off, count, n_chunks = _seg_meta(start_ref, count_ref, t)
        t_max = start_ref.shape[0]
        nbase, _, _, nn = _seg_meta(start_ref, count_ref,
                                    jnp.minimum(t + 1, t_max - 1))
        issue_next = (b + 1 < tile_batch) & (nn > 0)

        def dma(c, slot):
            return dma_at(base, c, slot)

        if not PREFETCH:
            s = jnp.int32(0)

            @pl.when(n_chunks > 0)
            def _():
                dma(0, 0).start()

        def body(state):
            c, t_mono, tmin, acc_r, acc_g, acc_b = state
            slot = (s + c) & 1

            if PREFETCH:
                nxt = (s + c + 1) & 1

                @pl.when(c + 1 < n_chunks)
                def _():
                    dma(c + 1, nxt).start()

                @pl.when((c + 1 == n_chunks) & issue_next)
                def _():
                    dma_at(nbase, 0, nxt).start()
            else:
                @pl.when(c > 0)
                def _():
                    dma(c, slot).start()

            dma(c, slot).wait()
            _, _, _, alpha, contrib, _ = _chunk_terms(
                buf[slot], off - c * CHUNK, off + count - c * CHUNK, px, py)
            include, t_excl, t_incl, t_mono = _chunk_include_lanes(
                alpha, contrib, t_mono, fast)
            w = jnp.where(include, alpha * t_excl, 0.0)          # [P, CK]
            rgb_t = buf[slot][6:9, :]                             # [3, CK]
            # Deferred accumulation: keep per-lane partial sums (and the
            # final-T running min) in [P, CK] accumulators; the expensive
            # lane reductions (log2(CK) full-array shuffles each) run ONCE
            # per tile after the loop instead of once per chunk. Exact f32 —
            # addition order over lanes is unchanged, only chunk partials are
            # summed lane-wise first.
            acc_r = acc_r + w * rgb_t[0:1, :]
            acc_g = acc_g + w * rgb_t[1:2, :]
            acc_b = acc_b + w * rgb_t[2:3, :]
            tmin = jnp.minimum(tmin, jnp.where(include, t_incl, jnp.inf))
            return c + 1, t_mono, tmin, acc_r, acc_g, acc_b

        def cond(state):
            c, t_mono = state[0], state[1]
            return (c < n_chunks) & (jnp.max(t_mono) >= 1e-4)

        init = (jnp.int32(0), jnp.ones((p, 1), jnp.float32),
                jnp.full((p, CHUNK), jnp.inf, jnp.float32),
                jnp.zeros((p, CHUNK), jnp.float32),
                jnp.zeros((p, CHUNK), jnp.float32),
                jnp.zeros((p, CHUNK), jnp.float32))
        c_end, _, tmin, acc_r, acc_g, acc_b = jax.lax.while_loop(cond, body,
                                                                 init)

        # Early exit leaves the prefetched next chunk's DMA in flight — drain
        # it or the semaphore state corrupts the next tile — then issue the
        # next tile's first chunk into the freed slot (this path pays the
        # exposed latency; normal exits issued it during the last chunk's
        # compute). Empty tiles (n_chunks == 0) had nothing prefetched for
        # them, so they issue for their successor here. (Without prefetch no
        # DMA can be outstanding at exit; waiting would hang on a semaphore
        # that was never signaled.)
        if PREFETCH:
            @pl.when(c_end < n_chunks)
            def _():
                dma(c_end, (s + c_end) & 1).wait()

                @pl.when(issue_next)
                def _():
                    dma_at(nbase, 0, (s + c_end) & 1).start()

            @pl.when((n_chunks == 0) & issue_next)
            def _():
                dma_at(nbase, 0, s & 1).start()

        # Reassociating the sum (chunks-then-lanes instead of lanes-then-
        # chunks) shifts final pixel values by a few f32 ulps; include/
        # termination masks stay bit-exact (the cumprod path above is
        # unchanged), and conformance to the jnp oracle is allclose, not
        # bitwise.
        acc = jnp.concatenate(
            [jnp.sum(a, axis=1, keepdims=True) for a in (acc_r, acc_g, acc_b)],
            axis=1)                                               # [P, 3]
        t_fin = jnp.minimum(1.0, jnp.min(tmin, axis=1, keepdims=True))
        out_ref[b, :, :] = acc + t_fin * bg_ref[:, :]
        tfin_ref[b, :, :] = t_fin.reshape(1, p)
        return (s + c_end) & 1

    jax.lax.fori_loop(0, tile_batch, one_tile, jnp.int32(0))


def _stream_bwd_kernel(start_ref, count_ref, ids_ref, attrs_ref, bg_ref,
                       out_ref, tfin_ref, gout_ref, gtfin_ref, gattrs_ref,
                       buf, gbuf, gprev, sem, gsem, psem, *,
                       tiles_x: int, tile_w: int, tile_h: int,
                       tile_batch: int, fast: bool = False):
    p = tile_w * tile_h
    pid = pl.program_id(0)

    # Prime the read pipeline for the batch's first tile (see fwd kernel);
    # subsequent tiles' first chunks are prefetched by their predecessor.
    base0, _, _, n0 = _seg_meta(start_ref, count_ref, pid * tile_batch)

    @pl.when(n0 > 0)
    def _():
        pltpu.make_async_copy(attrs_ref.at[:, pl.ds(base0, CHUNK)],
                              buf.at[0], sem.at[0]).start()

    def one_tile(b, s):
        t = pid * tile_batch + b
        tile_id = ids_ref[t]
        px, py = _pixel_grid(tile_id, tiles_x, tile_w, tile_h, p)
        # tile-center origin for the fast-mode MXU moment reduction:
        # centered pixel coords are integers in [-tile/2, tile/2) whose
        # squares/products stay <= 256, all exactly representable in bf16
        ox = ((tile_id % tiles_x) * tile_w + tile_w // 2).astype(jnp.float32)
        oy = ((tile_id // tiles_x) * tile_h + tile_h // 2).astype(jnp.float32)
        base, off, count, n_chunks = _seg_meta(start_ref, count_ref, t)
        t_max = start_ref.shape[0]
        nbase, _, _, nn = _seg_meta(start_ref, count_ref,
                                    jnp.minimum(t + 1, t_max - 1))
        issue_next = (b + 1 < tile_batch) & (nn > 0)

        g_out = gout_ref[b, :, :]                     # [P, 3]
        t_fin = tfin_ref[b, :, :].reshape(p, 1)
        out_sav = out_ref[b, :, :]
        g_tfin_ext = gtfin_ref[b, :, :].reshape(p, 1)
        g_dot_out = jnp.sum(g_out * out_sav, axis=1, keepdims=True)

        return _bwd_tile(attrs_ref, gattrs_ref,
                         buf, gbuf, gprev, sem, gsem, psem,
                         px, py, ox, oy, off, base, n_chunks, count,
                         g_out, t_fin, g_tfin_ext, g_dot_out, p,
                         s, issue_next, nbase, fast)

    jax.lax.fori_loop(0, tile_batch, one_tile, jnp.int32(0))


def _bwd_tile(attrs_ref, gattrs_ref,
              buf, gbuf, gprev, sem, gsem, psem,
              px, py, ox, oy, off, base, n_chunks, count,
              g_out, t_fin, g_tfin_ext, g_dot_out, p,
              s, issue_next, nbase, fast: bool = False):
    def dma_in_at(b_, c, slot):
        return pltpu.make_async_copy(
            attrs_ref.at[:, pl.ds(b_ + c * CHUNK, CHUNK)],
            buf.at[slot], sem.at[slot])

    def dma_in(c, slot):
        return dma_in_at(base, c, slot)

    def dma_out(c, slot):
        # Chunk windows are 128-aligned over unaligned segments, so the FIRST
        # window of this tile shares a block with the previous tile's tail:
        # its lead-in lanes (< off) are read-merged from gattrs below (the
        # previous tile's writes have drained — sequential grid + end-of-step
        # waits). Tail spill lanes (zeros) past this segment are rewritten by
        # the next non-empty tile's first window, or land in the CHUNK slack
        # columns of gattrs.
        return pltpu.make_async_copy(
            gbuf.at[slot],
            gattrs_ref.at[:, pl.ds(base + c * CHUNK, CHUNK)],
            gsem.at[slot])

    @pl.when(n_chunks > 0)
    def _():
        # previous tile's gradients in the shared boundary block — issued
        # here (NOT prefetched by the predecessor) because it must follow the
        # predecessor's final dma_out drains; its wait sits after chunk 0's
        # compute, which hides the latency
        pltpu.make_async_copy(gattrs_ref.at[:, pl.ds(base, CHUNK)],
                              gprev, psem).start()

    if fast:
        # loop-invariant LHS of the per-chunk moment matmul, built OUTSIDE
        # the chunk loop (while bodies get no LICM; [P,1]-shaped ops cost
        # like full-width ops on the VPU)
        pxl = px - ox                                       # [P, 1] ints
        pyl = py - oy
        mom_lhs = jnp.concatenate(
            [jnp.ones_like(pxl), pxl, pyl, pxl * pxl, pxl * pyl,
             pyl * pyl, g_out], axis=1)                     # [P, 9]
    else:
        mom_lhs = None

    def body(state):
        c, t_mono, prefix = state
        slot = (s + c) & 1

        @pl.when(c + 1 < n_chunks)
        def _():
            dma_in(c + 1, (s + c + 1) & 1).start()

        @pl.when((c + 1 == n_chunks) & issue_next)
        def _():
            dma_in_at(nbase, 0, (s + c + 1) & 1).start()

        dma_in(c, slot).wait()
        # wait for the gbuf slot's previous write-out before overwriting
        # (gbuf/dma_out share the carried parity so slot bookkeeping is
        # uniform; write-outs never cross tiles — fully drained at tile end)
        @pl.when(c >= 2)
        def _():
            dma_out(c - 2, slot).wait()

        dx, dy, g, alpha, contrib, (ca, cb, cc, op) = _chunk_terms(
            buf[slot], off - c * CHUNK, off + count - c * CHUNK, px, py)
        # t_fin is saved from the forward; skip its lane reduction entirely.
        include, t_excl, _, t_new = _chunk_include_lanes(alpha, contrib,
                                                         t_mono, fast)
        w = jnp.where(include, alpha * t_excl, 0.0)
        rgb_t = buf[slot][6:9, :]                              # [3, CK]

        # dL/drgb: [3, CK] = Σ_p g_out[p,c]·w[p,k], per channel (VPU exact;
        # fast mode folds this into the MXU moment matmul below)
        if not fast:
            g_rgb = jnp.concatenate(
                [jnp.sum(g_out[:, c:c + 1] * w, axis=0, keepdims=True)
                 for c in range(3)], axis=0)
        # Σ_c g_c rgb_k,c  [P, CK]
        g_dot_rgb = sum(g_out[:, c:c + 1] * rgb_t[c:c + 1, :]
                        for c in range(3))
        one_minus = jnp.where(include, 1.0 - alpha, 1.0)
        wg = w * g_dot_rgb
        cumsum = _cumsum_lanes_fast if fast else _cumsum_lanes
        cums = cumsum(wg, strict=False) + prefix
        g_dot_S = g_dot_out - cums
        dalpha = jnp.where(
            include,
            g_dot_rgb * t_excl - g_dot_S / one_minus
            - g_tfin_ext * t_fin / one_minus,
            0.0)
        not_clamped = (op * g) < 0.99
        dpower = dalpha * jnp.where(not_clamped, op, 0.0) * g
        if fast:
            # MXU moment reduction (fast mode only; exact mode keeps the
            # f32 VPU sublane reductions for oracle grad parity). All six
            # per-entry gradients are polynomial in (dx, dy) = (xl−pxl,
            # yl−pyl) with per-PIXEL factors only in pxl powers, so the
            # pixel sums collapse to six moments Σ_p dpower·φ_m(p), φ ∈
            # {1, pxl, pyl, pxl², pxl·pyl, pyl²} — one [P,9]ᵀ[P,3·CK]
            # matmul (with g_rgb riding along) instead of 9 sublane
            # reductions + 5 full-width gradient chains. Tile-centered
            # integer pixel coords keep every φ entry bf16-exact; dpower
            # goes through the MXU as a hi+lo bf16 pair (Mosaic feeds the
            # MXU bf16 regardless), bounding the moment error near f32.
            if FAST_BWD_HILO:
                dp_hi = dpower.astype(jnp.bfloat16).astype(jnp.float32)
                dp_lo = dpower - dp_hi
                rhs = jnp.concatenate([dp_hi, dp_lo, w], axis=1)  # [P, 3·CK]
                prod = jax.lax.dot_general(
                    mom_lhs, rhs, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)     # [9, 3·CK]
                mom = prod[:6, :CHUNK] + prod[:6, CHUNK:2 * CHUNK]
                g_rgb_m = prod[6:9, 2 * CHUNK:]
            else:
                rhs = jnp.concatenate([dpower, w], axis=1)  # [P, 2·CK]
                prod = jax.lax.dot_general(
                    mom_lhs, rhs, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)     # [9, 2·CK]
                mom = prod[:6, :CHUNK]
                g_rgb_m = prod[6:9, CHUNK:]
            s0, s1x, s1y = mom[0:1, :], mom[1:2, :], mom[2:3, :]
            s2xx, s2xy, s2yy = mom[3:4, :], mom[4:5, :], mom[5:6, :]
            xl = buf[slot][0:1, :] - ox                     # [1, CK]
            yl = buf[slot][1:2, :] - oy
            mx = xl * s0 - s1x
            my = yl * s0 - s1y
            gbuf[slot, 0:1, :] = -(ca * mx + cb * my)
            gbuf[slot, 1:2, :] = -(cc * my + cb * mx)
            gbuf[slot, 2:3, :] = -0.5 * (xl * mx - xl * s1x + s2xx)
            gbuf[slot, 3:4, :] = -(xl * my - yl * s1x + s2xy)
            gbuf[slot, 4:5, :] = -0.5 * (yl * my - yl * s1y + s2yy)
            gbuf[slot, 5:6, :] = jnp.where(op > 0.0, s0 / op, 0.0)
            gbuf[slot, 6:9, :] = g_rgb_m
        else:
            dop = jnp.where(not_clamped, dalpha * g, 0.0)
            dxp = dpower * (-(ca * dx + cb * dy))
            dyp = dpower * (-(cc * dy + cb * dx))
            dca = dpower * (-0.5 * dx * dx)
            dcb = dpower * (-dx * dy)
            dcc = dpower * (-0.5 * dy * dy)

            gbuf[slot, 0:1, :] = jnp.sum(dxp, axis=0, keepdims=True)
            gbuf[slot, 1:2, :] = jnp.sum(dyp, axis=0, keepdims=True)
            gbuf[slot, 2:3, :] = jnp.sum(dca, axis=0, keepdims=True)
            gbuf[slot, 3:4, :] = jnp.sum(dcb, axis=0, keepdims=True)
            gbuf[slot, 4:5, :] = jnp.sum(dcc, axis=0, keepdims=True)
            gbuf[slot, 5:6, :] = jnp.sum(dop, axis=0, keepdims=True)
            gbuf[slot, 6:9, :] = g_rgb
        gbuf[slot, 9:, :] = jnp.zeros((ROWS - 9, CHUNK), jnp.float32)

        # First window: preserve the previous tile's gradients in the shared
        # boundary block (lanes < off).
        @pl.when(c == 0)
        def _():
            pltpu.make_async_copy(gattrs_ref.at[:, pl.ds(base, CHUNK)],
                                  gprev, psem).wait()
            lane2d = jax.lax.broadcasted_iota(jnp.int32, (ROWS, CHUNK), 1)
            gbuf[slot] = jnp.where(lane2d < off, gprev[...], gbuf[slot])

        dma_out(c, slot).start()

        return c + 1, t_new, cums[:, -1:]

    def cond(state):
        c, t_mono, _ = state
        return (c < n_chunks) & (jnp.max(t_mono) >= 1e-4)

    init = (jnp.int32(0), jnp.ones((p, 1), jnp.float32),
            jnp.zeros((p, 1), jnp.float32))
    c_end, _, _ = jax.lax.while_loop(cond, body, init)

    # Early termination mirror of the forward: chunks past c_end have
    # include=0 everywhere, so their VALID slots' gradients are exactly zero —
    # but gattrs is uninitialized output memory, so the zeros must still be
    # WRITTEN. Drain loop: DMA-only zero writes, no attr reads / compute.
    @pl.when(c_end < n_chunks)
    def _():
        # the prefetched dma_in for chunk c_end is in flight — drain it, then
        # hand the slot to the next tile's first chunk (exposed latency on
        # this rare path only; normal exits issued it inside the main loop)
        dma_in(c_end, (s + c_end) & 1).wait()

        @pl.when(issue_next)
        def _():
            dma_in_at(nbase, 0, (s + c_end) & 1).start()

        def zbody(c, _):
            # c >= c_end >= 1 here (chunk 0 always runs in the main loop, so
            # the boundary-preserve merge never lands in the drain)
            slot = (s + c) & 1
            @pl.when(c >= 2)
            def _():
                dma_out(c - 2, slot).wait()
            gbuf[slot] = jnp.zeros((ROWS, CHUNK), jnp.float32)
            dma_out(c, slot).start()
            return 0

        jax.lax.fori_loop(c_end, n_chunks, zbody, 0)

    # empty tile: nothing was prefetched for it — prime its successor now
    @pl.when((n_chunks == 0) & issue_next)
    def _():
        dma_in_at(nbase, 0, s & 1).start()

    # drain outstanding gradient writes (also orders them before the next
    # tile in this batch reads its boundary block from gattrs)
    @pl.when(n_chunks >= 2)
    def _():
        dma_out(n_chunks - 2, (s + n_chunks - 2) & 1).wait()

    @pl.when(n_chunks >= 1)
    def _():
        dma_out(n_chunks - 1, (s + n_chunks - 1) & 1).wait()

    return (s + c_end) & 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def composite_stream(attrs, seg_start, counts, bg, tile_ids,
                     tiles_x: int, tile_w: int, tile_h: int,
                     interpret: bool = False,
                     exact_grad_mask: bool = False,
                     fast: bool = False):
    """attrs [16, CAP + CHUNK] packed rows (tile-sorted instances, segment-
    direct); seg_start/counts [T] (arbitrary offsets); bg [3];
    tile_ids [T] i32 GLOBAL tile id per local tile (pixel-grid indirection —
    under tile-sharded shard_map each shard passes its own id range; pass
    ``jnp.arange(T)`` single-device) → (out [T, P, 3], final_T [T, P]).

    ``exact_grad_mask``: mask the backward gradient stream per segment
    (union of [seg_start[t], seg_start[t]+counts[t])) instead of the
    contiguous span [first, last). Required when this call's tiles are NOT
    a contiguous range of the stream — e.g. round-robin tile sharding —
    where the span would keep uninitialized gradient memory belonging to
    other shards' segments.

    ``fast``: MXU log-space transmittance scans (RasterConfig.fast_math) —
    ~30% kernel-time cut for ~1e-3 pixel error; see composite.py
    _cumprod_lanes_fast for the accuracy contract."""
    return _stream_fwd_impl(attrs, seg_start, counts, bg, tile_ids, tiles_x,
                            tile_w, tile_h, interpret, fast)


def _pad_tiles(seg_start, counts, tile_ids, tb: int):
    """Pad the tile axis to a multiple of the batch (empty tiles: count 0)."""
    t = seg_start.shape[0]
    pad = (-t) % tb
    if pad:
        seg_start = jnp.concatenate(
            [seg_start, jnp.zeros((pad,), seg_start.dtype)])
        counts = jnp.concatenate([counts, jnp.zeros((pad,), counts.dtype)])
        tile_ids = jnp.concatenate(
            [tile_ids, jnp.zeros((pad,), tile_ids.dtype)])
    return seg_start, counts, tile_ids, t + pad


def _stream_fwd_impl(attrs, seg_start, counts, bg, tile_ids, tiles_x,
                     tile_w, tile_h, interpret, fast: bool = False):
    t = seg_start.shape[0]
    p = tile_w * tile_h
    tb = TILE_BATCH
    seg_start_p, counts_p, ids_p, t_pad = _pad_tiles(seg_start, counts,
                                                     tile_ids, tb)
    kernel = functools.partial(_stream_fwd_kernel, tiles_x=tiles_x,
                               tile_w=tile_w, tile_h=tile_h, tile_batch=tb,
                               fast=fast)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(t_pad // tb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),     # attrs stay in HBM
            pl.BlockSpec((1, 3), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, p, 3), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1, p), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, ROWS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out, tfin = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, p, 3), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, 1, p), jnp.float32),
        ],
        interpret=interpret,
    )(seg_start_p, counts_p, ids_p, attrs, bg.reshape(1, 3))
    return out[:t], tfin.reshape(t_pad, p)[:t]


def _stream_vjp_fwd(attrs, seg_start, counts, bg, tile_ids, tiles_x, tile_w,
                    tile_h, interpret, exact_grad_mask, fast):
    out, tfin = _stream_fwd_impl(attrs, seg_start, counts, bg, tile_ids,
                                 tiles_x, tile_w, tile_h, interpret, fast)
    return (out, tfin), (attrs, seg_start, counts, bg, tile_ids, out, tfin)


def _stream_vjp_bwd(tiles_x, tile_w, tile_h, interpret, exact_grad_mask,
                    fast, res, cts):
    attrs, seg_start, counts, bg, tile_ids, out, tfin = res
    g_out, g_tfin = cts
    t = seg_start.shape[0]
    p = tile_w * tile_h
    tb = TILE_BATCH
    seg_start_p, counts_p, ids_p, t_pad = _pad_tiles(seg_start, counts,
                                                     tile_ids, tb)

    def padt(x):
        pad = t_pad - t
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1)) if pad else x

    kernel = functools.partial(_stream_bwd_kernel, tiles_x=tiles_x,
                               tile_w=tile_w, tile_h=tile_h, tile_batch=tb,
                               fast=fast)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(t_pad // tb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),     # attrs (HBM)
            pl.BlockSpec((1, 3), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, p, 3), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),    # saved out
            pl.BlockSpec((tb, 1, p), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),    # saved tfin
            pl.BlockSpec((tb, p, 3), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),    # g_out
            pl.BlockSpec((tb, 1, p), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),    # g_tfin
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],   # gattrs (HBM)
        scratch_shapes=[
            pltpu.VMEM((2, ROWS, CHUNK), jnp.float32),
            pltpu.VMEM((2, ROWS, CHUNK), jnp.float32),
            pltpu.VMEM((ROWS, CHUNK), jnp.float32),   # gprev (boundary block)
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    cap = attrs.shape[1]
    (gattrs,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((ROWS, cap), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(seg_start_p, counts_p, ids_p, attrs, bg.reshape(1, 3), padt(out),
      padt(tfin.reshape(t, 1, p)), padt(g_out),
      padt(g_tfin.reshape(t, 1, p)))
    # Mask the gradient stream to this call's own segments. Slots outside
    # are either the sentinel tail (uninitialized kernel output, masked
    # again by the pack's validity transpose) or — under tile-sharded
    # shard_map — OTHER shards' segments, which this shard never wrote.
    # Zeroing them makes the shard_map transpose's automatic psum over the
    # replicated attrs input compose exact gradients (each slot owned by
    # exactly one shard; chunk-spill zeros and garbage both land outside).
    if exact_grad_mask:
        # non-contiguous tile sets (round-robin sharding): union of the
        # per-segment intervals via a +1/-1 boundary diff + prefix sum
        width = gattrs.shape[1]
        delta = jnp.zeros((width + 1,), jnp.int32)
        delta = delta.at[seg_start].add(1)
        delta = delta.at[seg_start + counts].add(-1)
        inside = jnp.cumsum(delta[:-1]) > 0
        gattrs = jnp.where(inside[None, :], gattrs, 0.0)
    else:
        # contiguous tile range: one span [first, last)
        lo = seg_start[0]
        hi = seg_start[-1] + counts[-1]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, gattrs.shape[1]), 1)
        gattrs = jnp.where((lane >= lo) & (lane < hi), gattrs, 0.0)
    g_bg = jnp.einsum("tpc,tp->c", g_out, tfin)
    return (gattrs, None, None, g_bg, None)


composite_stream.defvjp(_stream_vjp_fwd, _stream_vjp_bwd)
