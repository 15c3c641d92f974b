"""Pallas TPU kernels for per-tile front-to-back alpha compositing.

The hot core of the rasterizer (the CUDA renderCUDA fwd/bwd equivalent,
SURVEY §2.9), as hand-written TPU kernels with a custom VJP.

Layout strategy: each grid step owns one 16×16 tile. Work is shaped
[P, CK] = [pixels-in-tile (sublanes), Gaussian-chunk (lanes)] so per-entry
attributes broadcast along sublanes and per-pixel state along lanes — both
free on the VPU. Color accumulation is a [P, CK] @ [CK, 3] MXU matmul per
chunk. Chunks walk front-to-back with an early-exit while_loop once every
pixel is saturated (T < 1e-4), mirroring the CUDA early termination.

The backward pass replays chunks front-to-back using the forward's saved
(out, final_T): the suffix sum S_k = Σ_{j>k} c_j α_j T_j needed for dL/dα is
obtained as (out − bg·T_fin) − prefix_k, so no reverse walk or per-entry
transmittance storage is required. Per-entry gradients reduce over the
sublane (pixel) axis; scatter back to Gaussians happens outside via the
gather's linear transpose (XLA scatter-add).

Entry semantics match ops/raster_ref.py exactly: alpha = min(0.99, o·exp(p)),
skip p>0 and α<1/255, terminate when T·(1−α)<1e-4 (the failing entry
excluded).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 128  # Gaussian-list chunk per inner step (lane width)


def _pixel_grid(tile_id, tiles_x: int, tile_w: int, tile_h: int, p: int):
    """px, py as [P, 1] f32 for one tile id (flattened row-major)."""
    tx = (tile_id % tiles_x).astype(jnp.float32)
    ty = (tile_id // tiles_x).astype(jnp.float32)
    flat = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px = tx * tile_w + (flat % tile_w).astype(jnp.float32)
    py = ty * tile_h + (flat // tile_w).astype(jnp.float32)
    return px, py


def _tri_ones(ck: int, strict: bool):
    """Upper-triangular ones [CK, CK]: x @ tri = (exclusive) prefix sums.

    Mosaic has no cumsum/cumprod lowering — a triangular MXU matmul is the
    TPU-native cumulative op for lane-axis scans of width 128.
    """
    r = jax.lax.broadcasted_iota(jnp.int32, (ck, ck), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (ck, ck), 1)
    return ((r < c) if strict else (r <= c)).astype(jnp.float32)


def _cumsum_lanes(x, strict: bool):
    """Prefix sum along the lane axis of [P, CK], exact f32 Hillis-Steele.

    (A triangular MXU matmul is shorter but Mosaic rounds matmul inputs to
    bf16 regardless of the precision flag — measured ~1e-3 relative error.)
    """
    ck = x.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    y = x
    s = 1
    while s < ck:
        y = y + jnp.where(lane >= s, jnp.roll(y, s, axis=1), 0.0)
        s *= 2
    if strict:
        return jnp.where(lane >= 1, jnp.roll(y, 1, axis=1), 0.0)
    return y


def _cumprod_lanes(x):
    """(inclusive, exclusive) prefix products along lanes, exact in f32.

    Hillis-Steele scan (log2(CK) shifted multiplies on the VPU) — a log-space
    matmul version costs ~1e-6 relative error, which is enough to flip the
    1e-4 termination threshold on borderline entries and break bit-parity
    with the jnp oracle. (jnp.cumprod/jnp.prod have no Mosaic lowering.)
    """
    ck = x.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    y = x
    s = 1
    while s < ck:
        y = y * jnp.where(lane >= s, jnp.roll(y, s, axis=1), 1.0)
        s *= 2
    excl = jnp.where(lane >= 1, jnp.roll(y, 1, axis=1), 1.0)
    return y, excl


def _cumsum_lanes_fast(x, strict: bool):
    """Lane prefix sum via ONE triangular MXU matmul (fast-math mode).

    Mosaic feeds the MXU bf16 regardless of the precision flag, so inputs
    carry ~0.4% relative rounding (accumulation is f32) — the documented
    accuracy trade of RasterConfig.fast_math. ~0.5 µs of MXU time replaces
    the 21-op VPU scan per [512, 128] chunk (PROFILE_FLOOR.md census)."""
    ck = x.shape[1]
    cum = jax.lax.dot(x, _tri_ones(ck, strict=False),
                      preferred_element_type=jnp.float32)
    if strict:
        return cum - x
    return cum


def _cumprod_lanes_fast(x):
    """(inclusive, exclusive) lane prefix products in log space via the MXU
    (fast-math mode).

    x = 1 − α is bounded to [0.01, 1] (α ≤ 0.99 clamp; masked lanes exactly
    1.0 → log exactly 0), so log is well-conditioned. bf16 input rounding of
    the log terms bounds the relative T error at ~Σ|log x|·0.4% ≤ ~4e-2 at
    the T = 1e-4 termination depth, typically ~1e-3 — include-mask flips on
    borderline entries shift pixels by up to ~1e-3, which is above the exact
    mode's ≤2e-4 oracle bound but photometrically irrelevant; the training
    impact is validated empirically (fast-mode hardware run, BASELINE.md).
    The exclusive product is recovered exactly as incl/x (x ≥ 0.01)."""
    ck = x.shape[1]
    lx = jnp.log(x)
    cum = jax.lax.dot(lx, _tri_ones(ck, strict=False),
                      preferred_element_type=jnp.float32)
    incl = jnp.exp(cum)
    return incl, incl / x


def _chunk_include(alpha, contrib, t_mono, t_fin):
    """Shared fwd/bwd chunk logic: per-entry include mask + transmittances.

    alpha, contrib: [P, CK]; t_mono, t_fin: [P, 1].

    Monotone-T formulation: the inclusive transmittance over *contributing*
    entries never increases, so entries failing the 1e-4 termination test form
    a suffix — include = contrib & (T_incl ≥ 1e-4) with NO prior-fail cumsum,
    no done flag, and no second cumprod (exactly equivalent to the reference's
    sequential break, see raster_ref.py). Two per-pixel carries: ``t_mono``,
    the product over all contributing entries (drives the test), and
    ``t_fin``, frozen at the last included entry (the output final_T) — the
    lane-min of T_incl over included entries, by monotonicity.

    Returns (include [P,CK], t_excl [P,CK], t_mono_out [P,1], t_fin_out [P,1]).
    """
    include, t_excl, t_incl, t_mono_out = _chunk_include_lanes(
        alpha, contrib, t_mono)
    t_fin_out = jnp.minimum(
        t_fin, jnp.min(jnp.where(include, t_incl, jnp.inf), axis=1,
                       keepdims=True))
    return include, t_excl, t_mono_out, t_fin_out


def _chunk_include_lanes(alpha, contrib, t_mono, fast: bool = False):
    """Per-lane core of :func:`_chunk_include`, no ``t_fin`` lane reduction.

    Returns (include [P,CK], t_excl [P,CK], t_incl [P,CK], t_mono_out [P,1]).
    Callers that track final transmittance lane-wise (stream fwd kernel) fold
    ``where(include, t_incl, inf)`` into a deferred min; callers that have the
    saved t_fin (stream bwd kernel) skip the reduction entirely.

    ``fast``: MXU log-space cumprod instead of the exact VPU scan — see
    :func:`_cumprod_lanes_fast` for the accuracy contract.
    """
    one_minus = jnp.where(contrib, 1.0 - alpha, 1.0)
    cumprod = _cumprod_lanes_fast if fast else _cumprod_lanes
    incl, excl = cumprod(one_minus)
    t_incl = t_mono * incl
    include = contrib & (t_incl >= 1e-4)
    t_excl = t_mono * excl
    t_mono_out = t_mono * incl[:, -1:]
    return include, t_excl, t_incl, t_mono_out


def _alpha_terms(xs, ys, ca, cb, cc, op, valid, px, py):
    """[1, CK] attrs + [P, 1] pixels → alpha, G=exp(power), contrib [P, CK]."""
    dx = xs - px
    dy = ys - py
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    g = jnp.exp(power)
    alpha = jnp.minimum(0.99, op * g)
    contrib = (valid > 0) & (power <= 0.0) & (alpha >= 1.0 / 255.0)
    alpha = jnp.where(contrib, alpha, 0.0)
    return dx, dy, g, alpha, contrib


def _fwd_kernel(count_ref, xs_ref, ys_ref, ca_ref, cb_ref, cc_ref, op_ref,
                valid_ref, rgb_ref, bg_ref, out_ref, tfin_ref, *,
                tiles_x: int, tile_w: int, tile_h: int, k: int):
    p = tile_w * tile_h
    t = pl.program_id(0)
    px, py = _pixel_grid(t, tiles_x, tile_w, tile_h, p)
    n_chunks = (jnp.minimum(count_ref[t], k) + CHUNK - 1) // CHUNK

    def body(state):
        c, t_mono, t_fin, acc = state
        o = c * CHUNK
        xs = xs_ref[0, :, pl.ds(o, CHUNK)]
        ys = ys_ref[0, :, pl.ds(o, CHUNK)]
        ca = ca_ref[0, :, pl.ds(o, CHUNK)]
        cb = cb_ref[0, :, pl.ds(o, CHUNK)]
        cc = cc_ref[0, :, pl.ds(o, CHUNK)]
        op = op_ref[0, :, pl.ds(o, CHUNK)]
        vl = valid_ref[0, :, pl.ds(o, CHUNK)]
        _, _, _, alpha, contrib = _alpha_terms(xs, ys, ca, cb, cc, op, vl, px, py)
        include, t_excl, t_mono, t_fin = _chunk_include(alpha, contrib,
                                                        t_mono, t_fin)
        w = jnp.where(include, alpha * t_excl, 0.0)          # [P, CK]
        rgb = rgb_ref[0, pl.ds(o, CHUNK), :]                  # [CK, 3]
        # VPU multiply-reduce per channel: exact f32 (Mosaic matmuls round
        # inputs to bf16) and the MXU is ~2% utilized at N=3 anyway.
        acc = acc + jnp.concatenate(
            [jnp.sum(w * rgb[:, c].reshape(1, CHUNK), axis=1, keepdims=True)
             for c in range(3)], axis=1)
        return c + 1, t_mono, t_fin, acc

    def cond(state):
        c, t_mono, _, _ = state
        return (c < n_chunks) & (jnp.max(t_mono) >= 1e-4)

    init = (jnp.int32(0), jnp.ones((p, 1), jnp.float32),
            jnp.ones((p, 1), jnp.float32), jnp.zeros((p, 3), jnp.float32))
    _, _, t_fin, acc = jax.lax.while_loop(cond, body, init)

    out_ref[0, :, :] = acc + t_fin * bg_ref[:, :]
    tfin_ref[0, :, :] = t_fin.reshape(1, p)


def _bwd_kernel(count_ref, xs_ref, ys_ref, ca_ref, cb_ref, cc_ref, op_ref,
                valid_ref, rgb_ref, bg_ref, out_saved_ref, tfin_ref,
                gout_ref, gtfin_ref,
                gxs_ref, gys_ref, gca_ref, gcb_ref, gcc_ref, gop_ref, grgb_ref,
                *, tiles_x: int, tile_w: int, tile_h: int, k: int):
    p = tile_w * tile_h
    t = pl.program_id(0)
    px, py = _pixel_grid(t, tiles_x, tile_w, tile_h, p)
    n_chunks = (jnp.minimum(count_ref[t], k) + CHUNK - 1) // CHUNK

    g_out = gout_ref[0, :, :]                    # [P, 3]
    t_fin = tfin_ref[0, :, :].reshape(p, 1)      # [P, 1]
    bg = bg_ref[:, :]                            # [1, 3]
    # residual behind entry k plus background: R_k = (out − acc_prefix_k)
    # where out already includes T_fin·bg. dα needs Σ_c g_c·R_k,c/(1−α).
    out_sav = out_saved_ref[0, :, :]             # [P, 3] (includes bg term)
    # External final_T cotangent only: the g·bg·T_fin pathway is already part
    # of g_dot_S below (out_sav includes the background term) — adding it here
    # would double count.
    g_tfin_ext = gtfin_ref[0, :, :].reshape(p, 1)

    def body(state):
        c, t_mono, t_fin_run, prefix = state
        o = c * CHUNK
        xs = xs_ref[0, :, pl.ds(o, CHUNK)]
        ys = ys_ref[0, :, pl.ds(o, CHUNK)]
        ca = ca_ref[0, :, pl.ds(o, CHUNK)]
        cb = cb_ref[0, :, pl.ds(o, CHUNK)]
        cc = cc_ref[0, :, pl.ds(o, CHUNK)]
        op = op_ref[0, :, pl.ds(o, CHUNK)]
        vl = valid_ref[0, :, pl.ds(o, CHUNK)]
        dx, dy, g, alpha, contrib = _alpha_terms(xs, ys, ca, cb, cc, op, vl, px, py)
        include, t_excl, t_new, tf_new = _chunk_include(alpha, contrib,
                                                        t_mono, t_fin_run)
        w = jnp.where(include, alpha * t_excl, 0.0)          # [P, CK]
        rgb = rgb_ref[0, pl.ds(o, CHUNK), :]                  # [CK, 3]

        # dL/drgb_k = Σ_p g_out[p,c]·w[p,k], per channel on the VPU
        grgb_ref[0, pl.ds(o, CHUNK), :] += jnp.concatenate(
            [jnp.sum(g_out[:, c].reshape(p, 1) * w, axis=0,
                     keepdims=True).reshape(CHUNK, 1) for c in range(3)],
            axis=1)

        # per-entry prefix of the accumulated color INCLUDING this entry:
        # prefix_after_k[p,c] = prefix_in + Σ_{j<=k in chunk} w_j rgb_j,c
        # needed residual: S'_k = out − prefix_after_k (per channel).
        # dL/dα_k = Σ_c g_c (rgb_k,c T_k − S'_k,c/(1−α_k)) − gT·T_fin/(1−α_k)
        one_minus = jnp.where(include, 1.0 - alpha, 1.0)
        # Σ_c g_c·rgb_k,c accumulated per channel on the VPU
        g_dot_rgb = sum(g_out[:, c].reshape(p, 1) * rgb[:, c].reshape(1, CHUNK)
                        for c in range(3))
        # per-channel prefix must stay per-channel for S'·g contraction:
        # Σ_c g_c S'_k,c = Σ_c g_c out_c − Σ_c g_c prefix_after_k,c.
        # prefix_after contraction: running scalar prefix of w_j (g·rgb_j):
        wg = w * g_dot_rgb                                    # [P, CK]
        cums = _cumsum_lanes(wg, strict=False) + prefix       # Σ_{j<=k} g·w·rgb
        g_dot_out = jnp.sum(g_out * out_sav, axis=1, keepdims=True)
        g_dot_S = g_dot_out - cums                            # Σ_c g_c S'_k,c
        dalpha = jnp.where(
            include,
            g_dot_rgb * t_excl - g_dot_S / one_minus
            - g_tfin_ext * t_fin / one_minus,
            0.0)

        # chain through alpha = min(0.99, op·G), power, conic, means
        not_clamped = (op * g) < 0.99
        dG_alpha = jnp.where(not_clamped, op, 0.0)
        dop = jnp.where(not_clamped, dalpha * g, 0.0)
        dpower = dalpha * dG_alpha * g
        dxp = dpower * (-(ca * dx + cb * dy))
        dyp = dpower * (-(cc * dy + cb * dx))
        dca = dpower * (-0.5 * dx * dx)
        dcb = dpower * (-dx * dy)
        dcc = dpower * (-0.5 * dy * dy)

        gxs_ref[0, :, pl.ds(o, CHUNK)] += jnp.sum(dxp, axis=0, keepdims=True)
        gys_ref[0, :, pl.ds(o, CHUNK)] += jnp.sum(dyp, axis=0, keepdims=True)
        gca_ref[0, :, pl.ds(o, CHUNK)] += jnp.sum(dca, axis=0, keepdims=True)
        gcb_ref[0, :, pl.ds(o, CHUNK)] += jnp.sum(dcb, axis=0, keepdims=True)
        gcc_ref[0, :, pl.ds(o, CHUNK)] += jnp.sum(dcc, axis=0, keepdims=True)
        gop_ref[0, :, pl.ds(o, CHUNK)] += jnp.sum(dop, axis=0, keepdims=True)

        return c + 1, t_new, tf_new, cums[:, -1:]

    def cond(state):
        c, t_mono, _, _ = state
        return (c < n_chunks) & (jnp.max(t_mono) >= 1e-4)

    # zero-init gradient outputs (written additively per chunk)
    for ref in (gxs_ref, gys_ref, gca_ref, gcb_ref, gcc_ref, gop_ref, grgb_ref):
        ref[...] = jnp.zeros(ref.shape, ref.dtype)

    init = (jnp.int32(0), jnp.ones((p, 1), jnp.float32),
            jnp.ones((p, 1), jnp.float32), jnp.zeros((p, 1), jnp.float32))
    jax.lax.while_loop(cond, body, init)


def _specs(k: int, p: int):
    row = lambda i, *_: (i, 0, 0)
    in_specs = [
        *[pl.BlockSpec((1, 1, k), row, memory_space=pltpu.VMEM)] * 7,  # attrs
        pl.BlockSpec((1, k, 3), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),  # bg
    ]
    return in_specs


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def composite_pallas(attrs, rgb, valid, counts, bg,
                     tiles_x: int, tile_w: int, tile_h: int, k: int,
                     interpret: bool = False):
    """attrs: (xs, ys, ca, cb, cc, op) each [T, K]; rgb [T, K, 3];
    valid [T, K] f32; counts [T] i32; bg [3].
    Returns (out [T, P, 3], final_T [T, P])."""
    out, tfin = _composite_fwd_impl(attrs, rgb, valid, counts, bg,
                                    tiles_x, tile_w, tile_h, k, interpret)
    return out, tfin


def _composite_fwd_impl(attrs, rgb, valid, counts, bg, tiles_x, tile_w, tile_h,
                        k, interpret):
    xs, ys, ca, cb, cc, op = attrs
    t = xs.shape[0]
    p = tile_w * tile_h
    kernel = functools.partial(_fwd_kernel, tiles_x=tiles_x, tile_w=tile_w,
                               tile_h=tile_h, k=k)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=_specs(k, p),
        out_specs=[
            pl.BlockSpec((1, p, 3), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
    )
    r3 = lambda a: a.reshape(t, 1, k)
    out, tfin = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((t, p, 3), jnp.float32),
            jax.ShapeDtypeStruct((t, 1, p), jnp.float32),
        ],
        interpret=interpret,
    )(counts.astype(jnp.int32), r3(xs), r3(ys), r3(ca), r3(cb), r3(cc), r3(op),
      r3(valid), rgb, bg.reshape(1, 3))
    return out, tfin.reshape(t, p)


def _composite_vjp_fwd(attrs, rgb, valid, counts, bg, tiles_x, tile_w, tile_h,
                       k, interpret):
    out, tfin = _composite_fwd_impl(attrs, rgb, valid, counts, bg, tiles_x,
                                    tile_w, tile_h, k, interpret)
    return (out, tfin), (attrs, rgb, valid, counts, bg, out, tfin)


def _composite_vjp_bwd(tiles_x, tile_w, tile_h, k, interpret, res, cts):
    attrs, rgb, valid, counts, bg, out, tfin = res
    g_out, g_tfin = cts
    xs, ys, ca, cb, cc, op = attrs
    t = xs.shape[0]
    p = tile_w * tile_h
    kernel = functools.partial(_bwd_kernel, tiles_x=tiles_x, tile_w=tile_w,
                               tile_h=tile_h, k=k)
    in_specs = _specs(k, p) + [
        pl.BlockSpec((1, p, 3), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),  # out
        pl.BlockSpec((1, 1, p), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),  # tfin
        pl.BlockSpec((1, p, 3), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),  # g_out
        pl.BlockSpec((1, 1, p), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),  # g_tfin
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((1, 1, k), lambda i, *_: (i, 0, 0),
                                memory_space=pltpu.VMEM)] * 6
        + [pl.BlockSpec((1, k, 3), lambda i, *_: (i, 0, 0),
                        memory_space=pltpu.VMEM)],
    )
    r3 = lambda a: a.reshape(t, 1, k)
    grads = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((t, 1, k), jnp.float32)] * 6
        + [jax.ShapeDtypeStruct((t, k, 3), jnp.float32)],
        interpret=interpret,
    )(counts.astype(jnp.int32), r3(xs), r3(ys), r3(ca), r3(cb), r3(cc), r3(op),
      r3(valid), rgb, bg.reshape(1, 3), out, tfin.reshape(t, 1, p),
      g_out, g_tfin.reshape(t, 1, p))
    gxs, gys, gca, gcb, gcc, gop, grgb = [g.reshape(t, k) for g in grads[:6]] + [grads[6]]
    g_bg = jnp.einsum("tpc,tp->c", g_out, tfin)
    return ((gxs, gys, gca, gcb, gcc, gop), grgb, None, None, g_bg)


composite_pallas.defvjp(_composite_vjp_fwd, _composite_vjp_bwd)


def composite_tiles_pallas(g_xy, g_conic, g_rgb, g_op, g_valid, tile_ids,
                           tiles_x: int, tile_w: int, tile_h: int, bg,
                           counts=None, interpret: bool = False
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Adapter matching composite_tiles_jnp's contract over ALL tiles.

    g_xy [T,K,2], g_conic [T,K,3], g_rgb [T,K,3], g_op [T,K], g_valid [T,K]
    bool → (tiles_out [T, 3, P], final_T [T, P]).
    """
    t, k = g_op.shape
    if counts is None:
        counts = g_valid.sum(axis=1).astype(jnp.int32)
    attrs = (g_xy[:, :, 0], g_xy[:, :, 1], g_conic[:, :, 0], g_conic[:, :, 1],
             g_conic[:, :, 2], g_op)
    valid_f = g_valid.astype(jnp.float32)
    out, tfin = composite_pallas(attrs, g_rgb, valid_f, counts, bg,
                                 tiles_x, tile_w, tile_h, k, interpret)
    return out.transpose(0, 2, 1), tfin
