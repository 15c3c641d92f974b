"""Round-5 bisect: full-binning cost for the 2x2 of
(enumeration layout: transposed [w,N] vs original [N,w]) x
(seg starts: histogram+cumsum vs searchsorted), all with the packed key.
Identifies what regressed 13.8 -> 22.6 ms."""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
from bench import build_scene
from mvs_gaussian_splatting_tpu.ops.preprocess import preprocess
from mvs_gaussian_splatting_tpu.ops.rasterize import RasterConfig
from mvs_gaussian_splatting_tpu.ops.binning import (
    _tier_layout, _tile_in_level_set, rect_table, auto_instance_cap)
from mvs_gaussian_splatting_tpu.utils.transforms import normalize

W, H, N = 1920, 1088, 200_000
if "--workload" in sys.argv:
    from train_bench import WORKLOADS
    wl = WORKLOADS[sys.argv[sys.argv.index("--workload") + 1]]
    W, H, N = wl["width"], wl["height"], wl["n"]
cfg = RasterConfig(tile_w=32, tile_h=16, tile_capacity=1024,
                   max_tiles_per_gaussian=32, backend="stream")
tiles_x, tiles_y = -(-W // cfg.tile_w), -(-H // cfg.tile_h)
num_tiles = tiles_x * tiles_y
d = cfg.max_tiles_per_gaussian
CAP = auto_instance_cap(N, d, cfg.tile_w, cfg.tile_h, cfg.tier_budgets,
                        cfg.tier_fracs)
cam, (means, log_scales, quats, opac_logit, shs) = build_scene(N, W, H)
p = jax.jit(lambda: preprocess(
    means, jax.nn.sigmoid(opac_logit), cam, W, H,
    scales=jnp.exp(log_scales), rotations=normalize(quats), shs=shs,
    sh_degree=3, tile_w=cfg.tile_w, tile_h=cfg.tile_h))()
jax.block_until_ready(p)


def timeit(f, iters=10):
    salt = (time.time_ns() % 997) * 1e-9
    o = f(jnp.float32(salt)); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for i in range(iters):
        o = f(jnp.float32(salt + 1e-6 * (i + 1)))
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters * 1000


budgets, caps = _tier_layout(N, d, cfg.tier_budgets, cfg.tier_fracs)
rank_bits = max((N - 1).bit_length(), 1)
sentinel = (num_tiles << rank_bits)
chunk = 128


def binning(eps, enum_mode, seg_mode, div_mode):
    pp = p._replace(depth=p.depth + eps)
    depth_key = jnp.where(pp.mask, pp.depth, jnp.inf)
    order = jnp.argsort(depth_key, stable=True).astype(jnp.int32)
    rect_o = rect_table(pp)[order]
    rect_min = rect_o[:, 0:2].astype(jnp.int32)
    rect_max = rect_o[:, 2:4].astype(jnp.int32)
    mask_o = rect_o[:, 4] > 0
    span_x = jnp.maximum(rect_max[:, 0] - rect_min[:, 0], 0)
    span_y = jnp.maximum(rect_max[:, 1] - rect_min[:, 1], 0)
    area = jnp.where(mask_o, span_x * span_y, 0)
    n = N

    def divmod_(j, sx):
        if div_mode == "int":
            return j // sx, j % sx
        q = jnp.floor((j.astype(jnp.float32) + 0.5)
                      / sx.astype(jnp.float32)).astype(jnp.int32)
        return q, j - q * sx

    def enum_T(rows, lo, hi, row_area, rT):
        j = (lo + jnp.arange(hi - lo, dtype=jnp.int32))[:, None]
        rminx = rT[0:1, :].astype(jnp.int32)
        rminy = rT[1:2, :].astype(jnp.int32)
        rmaxx = rT[2:3, :].astype(jnp.int32)
        sx = jnp.maximum(jnp.maximum(rmaxx - rminx, 0), 1)
        q, r = divmod_(j, sx)
        ty = rminy + q
        tx = rminx + r
        valid = j < jnp.minimum(row_area, hi)[None, :]
        x, y, cr2 = rT[5:6, :], rT[6:7, :], rT[7:8, :]
        tx_px = tx.astype(jnp.float32) * cfg.tile_w
        ty_px = ty.astype(jnp.float32) * cfg.tile_h
        ddx = jnp.maximum(jnp.maximum(tx_px - x, x - (tx_px + cfg.tile_w - 1)), 0.0)
        ddy = jnp.maximum(jnp.maximum(ty_px - y, y - (ty_px + cfg.tile_h - 1)), 0.0)
        valid &= ddx * ddx + ddy * ddy <= cr2
        tid = (ty * tiles_x + tx).astype(jnp.int32)
        return jnp.where(valid, (tid << rank_bits) | rows[None, :],
                         sentinel).reshape(-1)

    def enum_R(rows, lo, hi, row_area, rr):
        j = lo + jnp.arange(hi - lo, dtype=jnp.int32)
        rmin = rr[:, 0:2].astype(jnp.int32)
        rmax = rr[:, 2:4].astype(jnp.int32)
        sx = jnp.maximum(jnp.maximum(rmax[:, 0] - rmin[:, 0], 0), 1)
        q, r = divmod_(j[None, :], sx[:, None])
        ty = rmin[:, 1, None] + q
        tx = rmin[:, 0, None] + r
        valid = j[None, :] < jnp.minimum(row_area, hi)[:, None]
        valid &= _tile_in_level_set(rr[:, 5:7], rr[:, 7], tx, ty,
                                    cfg.tile_w, cfg.tile_h)
        tid = (ty * tiles_x + tx).astype(jnp.int32)
        tid = jnp.where(valid, tid, num_tiles)
        rk = jnp.broadcast_to(rows[:, None], tid.shape)
        return jnp.where(valid, (tid << rank_bits) | rk, sentinel).reshape(-1)

    aorder = jnp.argsort(-area, stable=True).astype(jnp.int32)
    area_sorted = area[aorder]
    bounds = [0] + budgets + [d]
    ks = []
    rows0 = jnp.arange(n, dtype=jnp.int32)
    if enum_mode == "T":
        rT = rect_o.T
        for t, (lo, hi) in enumerate(zip(bounds[:-1], bounds[1:])):
            if t == 0:
                ks.append(enum_T(rows0, lo, hi, area, rT))
            else:
                m = caps[t - 1]
                ks.append(enum_T(aorder[:m], lo, hi, area_sorted[:m],
                                 rT[:, aorder[:m]]))
    else:
        for t, (lo, hi) in enumerate(zip(bounds[:-1], bounds[1:])):
            if t == 0:
                ks.append(enum_R(rows0, lo, hi, area, rect_o))
            else:
                m = caps[t - 1]
                ks.append(enum_R(aorder[:m], lo, hi, area_sorted[:m],
                                 rect_o[aorder[:m]]))
    key = jnp.concatenate(ks)
    (sorted_key,) = jax.lax.sort((key,), num_keys=1, is_stable=False)

    if seg_mode == "hist":
        tid_sorted = sorted_key >> rank_bits
        cnt = jnp.zeros((num_tiles + 1,), jnp.int32).at[tid_sorted].add(
            1, mode="drop", indices_are_sorted=True)
        seg = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(cnt)])
        seg_start = seg[:num_tiles]
        n_valid = seg[num_tiles]
    else:
        tile_range = jnp.arange(num_tiles, dtype=jnp.int32)
        seg_start = jnp.searchsorted(sorted_key, (tile_range << rank_bits),
                                     side="left").astype(jnp.int32)
        n_valid = jnp.searchsorted(sorted_key,
                                   jnp.int32(num_tiles << rank_bits),
                                   side="left").astype(jnp.int32)
    seg_end = jnp.concatenate([seg_start[1:], n_valid[None]])
    counts_raw = seg_end - seg_start
    counts = jnp.clip(CAP - seg_start, 0, counts_raw)
    seg_start = jnp.minimum(seg_start, CAP)
    total = CAP + chunk
    m = sorted_key.shape[0]
    sk = sorted_key[:total] if m >= total else jnp.pad(
        sorted_key, (0, total - m), constant_values=sentinel)
    sr = sk & ((1 << rank_bits) - 1)
    q = jnp.arange(total, dtype=jnp.int32)
    valid_q = q < jnp.minimum(n_valid, CAP)
    inst_rank = jnp.where(valid_q, sr, 0)
    return inst_rank, valid_q, seg_start, counts, counts_raw


ref = None
for enum_mode in ("R", "T"):
    for seg_mode in ("search", "hist"):
        for div_mode in (("int", "f32") if enum_mode == "R" else ("f32",)):
            f = jax.jit(lambda e, em=enum_mode, sm=seg_mode, dm=div_mode:
                        binning(e, em, sm, dm))
            t = timeit(f)
            o = f(jnp.float32(0.0))
            jax.block_until_ready(o)
            if ref is None:
                ref = o
                match = True
            else:
                match = all(bool((a == b).all()) for a, b in zip(ref, o))
            print(f"enum={enum_mode} div={div_mode:3} seg={seg_mode:6}: "
                  f"{t:7.2f} ms  match={match}")
