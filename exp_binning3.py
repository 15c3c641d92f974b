"""Round-5: why did the shipped transposed-enumeration binning regress
on hardware (13.8 -> 22.6 ms at 1080p)? Suspects: the in-program
[N,8] -> [8,N] transpose, the lane-dim tier gathers rect_oT[:, rows],
and the histogram seg-start scatter. Time each variant of the FULL
binning call."""
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
from mvs_gaussian_splatting_tpu.ops import binning as B
from mvs_gaussian_splatting_tpu.utils.transforms import normalize

W, H, N = 1920, 1088, 200_000
if "--workload" in sys.argv:
    from train_bench import WORKLOADS
    wl = WORKLOADS[sys.argv[sys.argv.index("--workload") + 1]]
    W, H, N = wl["width"], wl["height"], wl["n"]
cfg = RasterConfig(tile_w=32, tile_h=16, tile_capacity=1024,
                   max_tiles_per_gaussian=32, backend="stream")
tiles_x, tiles_y = -(-W // cfg.tile_w), -(-H // cfg.tile_h)
CAP = B.auto_instance_cap(N, cfg.max_tiles_per_gaussian, cfg.tile_w,
                          cfg.tile_h, cfg.tier_budgets, cfg.tier_fracs)
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


def full_bin(eps):
    return B.bin_instances_stream(
        p._replace(depth=p.depth + eps), tiles_x, tiles_y,
        cfg.max_tiles_per_gaussian, CAP, tile_w=cfg.tile_w,
        tile_h=cfg.tile_h, tier_budgets=cfg.tier_budgets,
        tier_fracs=cfg.tier_fracs)

print("full binning (shipped)      :", round(timeit(jax.jit(full_bin)), 2))

order = jnp.argsort(jnp.where(p.mask, p.depth, jnp.inf),
                    stable=True).astype(jnp.int32)
rect_o = B.rect_table(p)[order]
jax.block_until_ready((order, rect_o))

# transpose alone, in-program
print("rect_o.T alone              :",
      round(timeit(jax.jit(lambda e: (rect_o + e).T)), 2))

# lane-dim tier gather alone
rect_oT = jnp.asarray(np.asarray(rect_o).T)
rows = jnp.arange(50_000, dtype=jnp.int32)
print("rect_oT[:, rows] 50K lanes  :",
      round(timeit(jax.jit(lambda e: rect_oT[:, rows] + e)), 2))
print("rect_o[rows] 50K rows       :",
      round(timeit(jax.jit(lambda e: rect_o[rows] + e)), 2))
print("rect_o[rows].T 50K rows+T   :",
      round(timeit(jax.jit(lambda e: (rect_o[rows] + e).T)), 2))

# column slices instead of transpose (8 strided slices)
def cols(e):
    r = rect_o + e
    return tuple(r[:, k] for k in range(8))
print("8 column slices [N]         :", round(timeit(jax.jit(cols)), 2))

# full binning with precomputed order+rect (the fused path rasterize uses)
def full_bin_fused(eps):
    return B.bin_instances_stream(
        p, tiles_x, tiles_y, cfg.max_tiles_per_gaussian, CAP,
        tile_w=cfg.tile_w, tile_h=cfg.tile_h,
        tier_budgets=cfg.tier_budgets, tier_fracs=cfg.tier_fracs,
        order=order, rect_ordered=rect_o + eps)
print("full binning (order given)  :",
      round(timeit(jax.jit(full_bin_fused)), 2))
