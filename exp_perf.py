"""Perf experiment harness (dev tool): candidate levers + hardware-floor
microbenches for the 1080p step. Produces the numbers behind
PROFILE_FLOOR.md. Usage: python exp_perf.py [section ...]; sections:
rates, tiers, batch, kernels. Default: all.
"""
import math, sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
from bench import build_scene
from mvs_gaussian_splatting_tpu.ops.preprocess import preprocess
from mvs_gaussian_splatting_tpu.ops.rasterize import (RasterConfig,
                                                      bin_and_pack_stream)
from mvs_gaussian_splatting_tpu.ops.binning import bin_instances_stream
from mvs_gaussian_splatting_tpu.utils.transforms import normalize

W, H = 1920, 1088
N = 200_000
CAP = 851_968
cfg = RasterConfig(tile_w=32, tile_h=16, tile_capacity=1024,
                   max_tiles_per_gaussian=32, tile_batch=256,
                   backend="stream", instance_cap=CAP)
cam, (means, log_scales, quats, opac_logit, shs) = build_scene(N, W, H)
bg = jnp.zeros(3)
tiles_x, tiles_y = -(-W // cfg.tile_w), -(-H // cfg.tile_h)
sections = set(sys.argv[1:]) or {"rates", "tiers", "batch", "kernels"}


def timeit(f, iters=10):
    salt = (time.time_ns() % 997) * 1e-9
    o = f(jnp.float32(salt)); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for i in range(iters):
        o = f(jnp.float32(salt + 1e-6 * (i + 1)))
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters * 1000


def pre_fn(eps):
    return preprocess(means + eps, jax.nn.sigmoid(opac_logit), cam, W, H,
                      scales=jnp.exp(log_scales), rotations=normalize(quats),
                      shs=shs, sh_degree=3, tile_w=cfg.tile_w,
                      tile_h=cfg.tile_h)


p = jax.jit(pre_fn)(jnp.float32(0.0))
jax.block_until_ready(p)

if "rates" in sections:
    # ---- raw hardware-rate microbenches (floor evidence) ----
    rng = np.random.RandomState(0)
    idx = jnp.asarray(rng.randint(0, N, CAP).astype(np.int32))
    table16 = jnp.asarray(rng.rand(N, 16).astype(np.float32))
    grows = jnp.asarray(rng.rand(CAP, 16).astype(np.float32))
    keys = jnp.asarray(rng.randint(0, 1 << 30, 1_600_000).astype(np.int32))

    t = timeit(jax.jit(lambda e: table16[idx] + e))
    print(f"raw row-gather   [CAP={CAP}] of [N,16] rows : {t:7.2f} ms "
          f"({t * 1e6 / CAP:.1f} ns/row)")
    t = timeit(jax.jit(
        lambda e: jnp.zeros((N, 16)).at[idx].add(grows + e)))
    print(f"raw row-scatter+ [CAP={CAP}] into [N,16]    : {t:7.2f} ms "
          f"({t * 1e6 / CAP:.1f} ns/row)")
    t = timeit(jax.jit(lambda e: jax.lax.sort(
        (keys + jnp.int32(0 * e),), num_keys=1, is_stable=False)))
    print(f"raw i32 sort     [1.6M]                     : {t:7.2f} ms")
    t = timeit(jax.jit(lambda e: jax.lax.sort(
        (keys[:1_280_000] + jnp.int32(0 * e),), num_keys=1,
        is_stable=False)))
    print(f"raw i32 sort     [1.28M]                    : {t:7.2f} ms")
    # element gather (for composed-index relayout estimate)
    eidx = jnp.asarray(rng.randint(0, CAP, CAP).astype(np.int32))
    flat = jnp.asarray(rng.rand(CAP).astype(np.float32))
    t = timeit(jax.jit(lambda e: (flat + e)[eidx]))
    print(f"raw elem-gather  [CAP]                      : {t:7.2f} ms")

if "tiers" in sections:
    for budgets, fracs in [((4, 12), (0.25, 0.1)),
                           ((4, 10), (0.18, 0.06)),
                           ((3, 8), (0.25, 0.08)),
                           ((4, 12), (0.18, 0.05))]:
        binf = jax.jit(lambda eps, b=budgets, f=fracs: bin_instances_stream(
            p._replace(depth=p.depth + eps), tiles_x, tiles_y,
            cfg.max_tiles_per_gaussian, CAP, tile_w=cfg.tile_w,
            tile_h=cfg.tile_h, tier_budgets=b, tier_fracs=f))
        t = timeit(binf)
        bb = binf(jnp.float32(0.0))
        print(f"bin tiers {budgets}@{fracs}: {t:7.2f} ms  "
              f"overflow_tiles={int(bb.overflow_tiles)} "
              f"overflow_cap={int(bb.overflow_capacity)} "
              f"load={int(bb.counts.sum())}")

if "batch" in sections or "kernels" in sections:
    bins, attrs = jax.jit(lambda eps: bin_and_pack_stream(
        p._replace(xy=p.xy + 0 * eps), tiles_x, tiles_y, cfg))(
            jnp.float32(0.0))
    jax.block_until_ready(attrs)
    tile_ids = jnp.arange(tiles_x * tiles_y, dtype=jnp.int32)

if "batch" in sections:
    import mvs_gaussian_splatting_tpu.ops.pallas.stream as st
    for tb in (8, 16):
        st.TILE_BATCH = tb
        fwdk = jax.jit(lambda eps: st.composite_stream(
            attrs + eps, bins.seg_start, bins.counts, bg, tile_ids, tiles_x,
            cfg.tile_w, cfg.tile_h, False))
        t = timeit(fwdk)

        def loss_k(a):
            out, tfin = st.composite_stream(a, bins.seg_start, bins.counts,
                                            bg, tile_ids, tiles_x, cfg.tile_w,
                                            cfg.tile_h, False)
            return out.mean()
        gradk = jax.jit(lambda eps: jax.grad(loss_k)(attrs + eps))
        tg = timeit(gradk)
        print(f"TILE_BATCH={tb:2d}: kernel fwd {t:7.2f} ms   "
              f"fwd+bwd {tg:7.2f} ms")
    st.TILE_BATCH = 8


# ---------------------------------------------------------------------------
# unsort: candidate replacements for the backward's CAP-row scatter-add
# (PROFILE_FLOOR.md "fused segment-reduce" headroom item). Run on hardware:
#   python exp_perf.py unsort
# ---------------------------------------------------------------------------
if "unsort" in sections:
    rng = np.random.RandomState(0)
    ranks = jnp.asarray(rng.randint(0, N, CAP).astype(np.int32))
    g_rows = jnp.asarray(rng.randn(CAP, 16).astype(np.float32))

    def scatter_add(eps):
        g = g_rows + eps
        return jnp.zeros((N, 16)).at[ranks].add(g)

    print("unsort/scatter-add [CAP,16]→[N,16]:",
          round(timeit(jax.jit(scatter_add)), 2), "ms")

    def sort_gather_cumsum(eps):
        g = g_rows + eps
        # rank-major order via a 2-array sort, then gather rows, then a
        # cumsum-diff segment sum (NB: cancellation-lossy — timing probe only)
        sr, pos = jax.lax.sort((ranks, jnp.arange(CAP, dtype=jnp.int32)),
                               num_keys=1, is_stable=False)
        gs = g[pos]
        cs = jnp.cumsum(gs, axis=0)
        ends = jnp.searchsorted(sr, jnp.arange(N, dtype=jnp.int32),
                                side="right").astype(jnp.int32)
        csz = jnp.concatenate([jnp.zeros((1, 16)), cs], 0)
        return csz[ends] - csz[jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), ends[:-1]])]

    print("unsort/sort+gather+cumsumdiff:",
          round(timeit(jax.jit(sort_gather_cumsum)), 2), "ms")

    def just_sort(eps):
        sr, pos = jax.lax.sort((ranks + jnp.int32(0 * eps),
                                jnp.arange(CAP, dtype=jnp.int32)),
                               num_keys=1, is_stable=False)
        return pos

    print("unsort/rank-sort alone:", round(timeit(jax.jit(just_sort)), 2),
          "ms")

    def just_gather(eps):
        g = g_rows + eps
        return g[ranks]

    print("unsort/CAP-row gather alone:",
          round(timeit(jax.jit(just_gather)), 2), "ms")

    def seg_sum_presorted(eps):
        # segment-sum when rows are ALREADY rank-sorted (kernel-side cost
        # model): cumsum + boundary gather only
        g = g_rows + eps
        cs = jnp.cumsum(g, axis=0)
        ends = jnp.searchsorted(jnp.sort(ranks),
                                jnp.arange(N, dtype=jnp.int32),
                                side="right").astype(jnp.int32)
        csz = jnp.concatenate([jnp.zeros((1, 16)), cs], 0)
        return csz[ends] - csz[jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), ends[:-1]])]

    print("unsort/segsum-presorted (cumsum+gather):",
          round(timeit(jax.jit(seg_sum_presorted)), 2), "ms")
