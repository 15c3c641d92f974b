"""Round-5: transposed enumeration layout test. Hypothesis: the [N, width]
enumeration intermediates (width 4/8/20) are lane-padded to 128 on TPU
(up to 32x memory traffic), explaining D=9.4 ms at 1080p. Emitting
[width, N] (minor dim = N, well tiled) should collapse that cost. Key
ORDER differs but the packed key carries (tile, rank) fully and the sort
is non-stable on the whole key, so sorted streams must match exactly.

Also: transposed rect layout [8, N] for the enumeration inputs, and an
F-stage breakdown (searchsorted vs inst_rank tail build).
"""
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
    _tier_layout, rect_table, auto_instance_cap)
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


order = jnp.argsort(jnp.where(p.mask, p.depth, jnp.inf),
                    stable=True).astype(jnp.int32)
rect_o = rect_table(p)[order]
jax.block_until_ready(rect_o)
rect_oT = rect_o.T.copy()  # [8, N]
area = jnp.where(rect_o[:, 4] > 0,
                 jnp.maximum(rect_o[:, 2] - rect_o[:, 0], 0)
                 * jnp.maximum(rect_o[:, 3] - rect_o[:, 1], 0),
                 0).astype(jnp.int32)
aorder = jnp.argsort(-area, stable=True).astype(jnp.int32)
jax.block_until_ready((area, aorder))

budgets, caps = _tier_layout(N, d, cfg.tier_budgets, cfg.tier_fracs)
rank_bits = max((N - 1).bit_length(), 1)
sentinel = (num_tiles << rank_bits)


def enum_tier_T(rows, lo, hi, row_area, rT):
    """rT [8, M] transposed rect rows; returns [hi-lo, M] keys."""
    j = (lo + jnp.arange(hi - lo, dtype=jnp.int32))[:, None]       # [w, 1]
    rminx = rT[0:1, :].astype(jnp.int32)
    rminy = rT[1:2, :].astype(jnp.int32)
    rmaxx = rT[2:3, :].astype(jnp.int32)
    sx = jnp.maximum(jnp.maximum(rmaxx - rminx, 0), 1)
    r = 1.0 / sx.astype(jnp.float32)
    q = jnp.floor((j.astype(jnp.float32) + 0.5) * r).astype(jnp.int32)
    ty = rminy + q
    tx = rminx + (j - q * sx)
    valid = j < jnp.minimum(row_area, hi)[None, :]
    x, y = rT[5:6, :], rT[6:7, :]
    cull_r2 = rT[7:8, :]
    tx_px = tx.astype(jnp.float32) * cfg.tile_w
    ty_px = ty.astype(jnp.float32) * cfg.tile_h
    dx = jnp.maximum(jnp.maximum(tx_px - x, x - (tx_px + cfg.tile_w - 1)), 0.0)
    dy = jnp.maximum(jnp.maximum(ty_px - y, y - (ty_px + cfg.tile_h - 1)), 0.0)
    valid &= dx * dx + dy * dy <= cull_r2
    tid = (ty * tiles_x + tx).astype(jnp.int32)
    return jnp.where(valid, (tid << rank_bits) | rows[None, :],
                     sentinel).reshape(-1)


def build_keys_T(eps):
    rT = rect_oT.at[7, :].add(eps * 0)
    bounds = [0] + budgets + [d]
    ks = []
    rows0 = jnp.arange(N, dtype=jnp.int32)
    area_sorted = area[aorder]
    for t, (lo, hi) in enumerate(zip(bounds[:-1], bounds[1:])):
        if t == 0:
            ks.append(enum_tier_T(rows0, lo, hi, area, rT))
        else:
            m = caps[t - 1]
            rows = aorder[:m]
            ks.append(enum_tier_T(rows, lo, hi, area_sorted[:m],
                                  rT[:, rows]))
    return jnp.concatenate(ks)


t_dT = timeit(jax.jit(build_keys_T))
keysT = jax.jit(build_keys_T)(jnp.float32(0.0))

# enum + sort fused (lets XLA overlap)
def keys_sorted_T(eps):
    (s,) = jax.lax.sort((build_keys_T(eps),), num_keys=1, is_stable=False)
    return s

t_dTs = timeit(jax.jit(keys_sorted_T))
sortedT = jax.jit(keys_sorted_T)(jnp.float32(0.0))

# reference: original [N, w] layout, int div, then sorted — compare

# --- F breakdown ---
rank_mask = (1 << rank_bits) - 1

def f_search(eps):
    sk = sortedT + (eps.astype(jnp.int32) * 0)
    tile_range = jnp.arange(num_tiles, dtype=jnp.int32)
    seg_start = jnp.searchsorted(sk, (tile_range << rank_bits),
                                 side="left").astype(jnp.int32)
    n_valid = jnp.searchsorted(sk, jnp.int32(num_tiles << rank_bits),
                               side="left").astype(jnp.int32)
    return seg_start, n_valid

t_fs = timeit(jax.jit(f_search))
seg_start, n_valid = jax.jit(f_search)(jnp.float32(0.0))

def f_tail(eps):
    sk = sortedT + (eps.astype(jnp.int32) * 0)
    total = CAP + 128
    m = sk.shape[0]
    sr = (sk[:total] if m >= total else jnp.pad(sk, (0, total - m))) & rank_mask
    q = jnp.arange(total, dtype=jnp.int32)
    valid_q = q < jnp.minimum(n_valid, CAP)
    return jnp.where(valid_q, sr, 0), valid_q

t_ft = timeit(jax.jit(f_tail))

# alternative searchsorted: one-hot histogram + cumsum over [T]
def f_hist(eps):
    sk = sortedT + (eps.astype(jnp.int32) * 0)
    tid = (sk >> rank_bits)
    cnt = jnp.zeros((num_tiles + 1,), jnp.int32).at[tid].add(
        1, mode="drop", indices_are_sorted=True)
    seg = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                           jnp.cumsum(cnt)])[:-1]
    return seg[:num_tiles], seg[num_tiles]

t_fh = timeit(jax.jit(f_hist))
seg_h, nv_h = jax.jit(f_hist)(jnp.float32(0.0))
ok_h = bool((seg_h == seg_start).all()) and int(nv_h) == int(n_valid)

print(f"workload {W}x{H} N={N}")
print(f"D^T enumeration [w,N] f32-div     : {t_dT:7.2f} ms")
print(f"D^T enum + sort fused             : {t_dTs:7.2f} ms")
print(f"F searchsorted (2 calls)          : {t_fs:7.2f} ms")
print(f"F  alt histogram+cumsum           : {t_fh:7.2f} ms  match: {ok_h}")
print(f"F tail inst_rank build            : {t_ft:7.2f} ms")
