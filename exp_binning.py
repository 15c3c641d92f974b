"""Round-5 binning micro-profile: decompose bin_instances_stream's cost and
measure candidate optimizations (VERDICT r4 next #1: "binning enumeration/
sort ... named headroom, not closed levers").

Stages mirrored from ops/binning.bin_instances_stream (packed-key path):
  A depth argsort [N]
  B rect_table + order gather [N,8]
  C area compute + area argsort (tier ranking)
  D tier enumeration (div/mod + level-set + key pack + concat)
  E lax.sort packed key [bound]
  F searchsorted + tail (seg_start/counts/inst_rank build)

Variants:
  D2 enumeration with f32-reciprocal div/mod (j < 32 exact-fixup trick)
  C2 tier rows via bool-key argsort (area<=thr, iota) instead of f32 argsort
  E2 sort at a needs-calibrated bound (adaptive tiers on the same scene)

Usage: python exp_binning.py [--workload bicycle]
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
    _tile_in_level_set, _tier_layout, rect_table, stream_instance_bound,
    auto_instance_cap, adaptive_tier_layout)
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


# --- A: depth argsort ---
def stage_a(eps):
    return jnp.argsort(jnp.where(p.mask, p.depth + eps, jnp.inf),
                       stable=True).astype(jnp.int32)

t_a = timeit(jax.jit(stage_a))
order = jax.jit(stage_a)(jnp.float32(0.0))

# --- B: rect table + order gather ---
def stage_b(eps):
    return rect_table(p._replace(xy=p.xy + eps))[order]

t_b = timeit(jax.jit(stage_b))
rect_o = jax.jit(stage_b)(jnp.float32(0.0))
jax.block_until_ready(rect_o)

rect_min = rect_o[:, 0:2].astype(jnp.int32)
rect_max = rect_o[:, 2:4].astype(jnp.int32)
mask_o = rect_o[:, 4] > 0
span_x = jnp.maximum(rect_max[:, 0] - rect_min[:, 0], 0)
span_y = jnp.maximum(rect_max[:, 1] - rect_min[:, 1], 0)
area_host = np.asarray(jnp.where(mask_o, span_x * span_y, 0))

# --- C: area + argsort ---
def stage_c(eps):
    ro = rect_o + eps * 0  # keep input dependence
    rmin = ro[:, 0:2].astype(jnp.int32)
    rmax = ro[:, 2:4].astype(jnp.int32)
    m = ro[:, 4] > eps - 1e9 + 0  # always true; forces dependence
    sx = jnp.maximum(rmax[:, 0] - rmin[:, 0], 0)
    sy = jnp.maximum(rmax[:, 1] - rmin[:, 1], 0)
    ar = jnp.where(m & (ro[:, 4] > 0), sx * sy, 0) + eps.astype(jnp.int32) * 0
    return jnp.argsort(-ar, stable=True).astype(jnp.int32), ar

t_c = timeit(jax.jit(stage_c))
aorder, area = jax.jit(stage_c)(jnp.float32(0.0))
jax.block_until_ready((aorder, area))

budgets, caps = _tier_layout(N, d, cfg.tier_budgets, cfg.tier_fracs)
bound_static = stream_instance_bound(N, d, cfg.tier_budgets, cfg.tier_fracs)
rank_bits = max((N - 1).bit_length(), 1)
tile_bits = (num_tiles + 1 - 1).bit_length()
assert rank_bits + tile_bits <= 31
sentinel = (num_tiles << rank_bits)


def enum_tier(rows, lo, hi, row_area, row_rect, div):
    j = lo + jnp.arange(hi - lo, dtype=jnp.int32)
    rmin = row_rect[:, 0:2].astype(jnp.int32)
    rmax = row_rect[:, 2:4].astype(jnp.int32)
    sx = jnp.maximum(jnp.maximum(rmax[:, 0] - rmin[:, 0], 0), 1)
    if div == "int":
        ty = rmin[:, 1, None] + j[None, :] // sx[:, None]
        tx = rmin[:, 0, None] + j[None, :] % sx[:, None]
    else:
        # j < 32 always; (j + 0.5) * (1/sx) floors exactly for sx <= 2^12
        r = 1.0 / sx.astype(jnp.float32)
        q = jnp.floor((j[None, :].astype(jnp.float32) + 0.5) * r[:, None]
                      ).astype(jnp.int32)
        ty = rmin[:, 1, None] + q
        tx = rmin[:, 0, None] + (j[None, :] - q * sx[:, None])
    valid = j[None, :] < jnp.minimum(row_area, hi)[:, None]
    valid &= _tile_in_level_set(row_rect[:, 5:7], row_rect[:, 7], tx, ty,
                                cfg.tile_w, cfg.tile_h)
    tid = (ty * tiles_x + tx).astype(jnp.int32)
    tid = jnp.where(valid, tid, num_tiles)
    return jnp.where(valid, (tid << rank_bits) |
                     jnp.broadcast_to(rows[:, None], tid.shape),
                     sentinel).reshape(-1)


def build_keys(eps, div):
    ro = rect_o.at[:, 7].add(eps * 0)
    ar = area
    bounds = [0] + budgets + [d]
    ks = []
    rows0 = jnp.arange(N, dtype=jnp.int32)
    area_sorted = ar[aorder]
    for t, (lo, hi) in enumerate(zip(bounds[:-1], bounds[1:])):
        if t == 0:
            ks.append(enum_tier(rows0, lo, hi, ar, ro, div))
        else:
            m = caps[t - 1]
            rows = aorder[:m]
            ks.append(enum_tier(rows, lo, hi, area_sorted[:m], ro[rows], div))
    return jnp.concatenate(ks)

t_d = timeit(jax.jit(lambda e: build_keys(e, "int")))
t_d2 = timeit(jax.jit(lambda e: build_keys(e, "f32")))
keys = jax.jit(lambda e: build_keys(e, "int"))(jnp.float32(0.0))
keys2 = jax.jit(lambda e: build_keys(e, "f32"))(jnp.float32(0.0))
same = bool((keys == keys2).all())

# --- E: sort ---
def stage_e(eps):
    kk = keys + (eps.astype(jnp.int32) * 0)
    (s,) = jax.lax.sort((kk,), num_keys=1, is_stable=False)
    return s

t_e = timeit(jax.jit(stage_e))
sorted_key = jax.jit(stage_e)(jnp.float32(0.0))

# --- F: searchsorted + tail ---
def stage_f(eps):
    sk = sorted_key + (eps.astype(jnp.int32) * 0)
    tile_range = jnp.arange(num_tiles, dtype=jnp.int32)
    seg_start = jnp.searchsorted(sk, (tile_range << rank_bits),
                                 side="left").astype(jnp.int32)
    n_valid = jnp.searchsorted(sk, jnp.int32(num_tiles << rank_bits),
                               side="left").astype(jnp.int32)
    seg_end = jnp.concatenate([seg_start[1:], n_valid[None]])
    counts_raw = seg_end - seg_start
    counts = jnp.clip(CAP - seg_start, 0, counts_raw)
    seg_start = jnp.minimum(seg_start, CAP)
    total = CAP + 128
    m = sk.shape[0]
    sr = sk[:total] & ((1 << rank_bits) - 1) if m >= total else jnp.pad(
        sk & ((1 << rank_bits) - 1), (0, total - m))
    q = jnp.arange(total, dtype=jnp.int32)
    valid_q = q < jnp.minimum(n_valid, CAP)
    return jnp.where(valid_q, sr, 0), valid_q, seg_start, counts

t_f = timeit(jax.jit(stage_f))

# --- C2: bool-key compaction ranking (we only need ANY order of rows above
# each threshold; packed keys carry rank so tier blocks need no depth order)
def stage_c2(eps):
    ar = area + eps.astype(jnp.int32) * 0
    flag = (ar <= budgets[0]).astype(jnp.int32)  # 0 = wanted rows first
    return jnp.argsort(flag, stable=True).astype(jnp.int32)

t_c2 = timeit(jax.jit(stage_c2))

# --- E2: needs-calibrated tiers on this same scene (train-time adaptive) ---
d_a, budgets_a, fracs_a, n_clip = adaptive_tier_layout(
    area_host, d, cfg.tier_budgets, cfg.tier_fracs)
bound_a = stream_instance_bound(N, d_a, budgets_a, fracs_a)
budgets_al, caps_al = _tier_layout(N, d_a, budgets_a, fracs_a)


def build_keys_adaptive(eps):
    ro = rect_o.at[:, 7].add(eps * 0)
    ar = area
    bounds = [0] + budgets_al + [d_a]
    ks = []
    rows0 = jnp.arange(N, dtype=jnp.int32)
    area_sorted = ar[aorder]
    for t, (lo, hi) in enumerate(zip(bounds[:-1], bounds[1:])):
        if t == 0:
            ks.append(enum_tier(rows0, lo, hi, ar, ro, "f32"))
        else:
            m = caps_al[t - 1]
            rows = aorder[:m]
            ks.append(enum_tier(rows, lo, hi, area_sorted[:m], ro[rows],
                                "f32"))
    return jnp.concatenate(ks)

t_d3 = timeit(jax.jit(build_keys_adaptive))
keys_a = jax.jit(build_keys_adaptive)(jnp.float32(0.0))

def sort_adaptive(eps):
    kk = keys_a + (eps.astype(jnp.int32) * 0)
    (s,) = jax.lax.sort((kk,), num_keys=1, is_stable=False)
    return s

t_e3 = timeit(jax.jit(sort_adaptive))

live = int((keys != sentinel).sum())
print(f"workload {W}x{H} N={N}  tiles={num_tiles}  CAP={CAP}")
print(f"bound(static)={bound_static}  live={live}  "
      f"bound(adaptive)={bound_a} (d={d_a}, budgets={budgets_a}, "
      f"fracs={tuple(round(f,4) for f in fracs_a)}, clipped={n_clip})")
print(f"A depth argsort [N]        : {t_a:7.2f} ms")
print(f"B rect gather [N,8]        : {t_b:7.2f} ms")
print(f"C area + argsort           : {t_c:7.2f} ms")
print(f"C2 bool-key argsort        : {t_c2:7.2f} ms")
print(f"D enumeration (int div)    : {t_d:7.2f} ms")
print(f"D2 enumeration (f32 div)   : {t_d2:7.2f} ms  keys equal: {same}")
print(f"D3 enumeration (adaptive)  : {t_d3:7.2f} ms")
print(f"E sort {keys.shape[0]:>9} keys     : {t_e:7.2f} ms")
print(f"E2 sort {keys_a.shape[0]:>9} keys    : {t_e3:7.2f} ms")
print(f"F searchsorted + tail      : {t_f:7.2f} ms")
print(f"sum A-F (int)              : {t_a+t_b+t_c+t_d+t_e+t_f:7.2f} ms")
