"""Component-level timing of the 1080p fwd+bwd step (dev tool).

All timing loops perturb one input per iteration: the serving tunnel
memoizes executions with bit-identical input buffers.
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
from mvs_gaussian_splatting_tpu.ops.rasterize import RasterConfig, rasterize
from mvs_gaussian_splatting_tpu.ops.binning import bin_instances_stream
from mvs_gaussian_splatting_tpu.ops.pallas.stream import ROWS, composite_stream
from mvs_gaussian_splatting_tpu.utils.transforms import normalize

W, H = 1920, 1088
N = 200_000
if "--workload" in sys.argv:       # e.g. --workload bicycle (VERDICT r4 #4)
    _wl = sys.argv[sys.argv.index("--workload") + 1]
    from train_bench import WORKLOADS
    W, H, N = (WORKLOADS[_wl][k] for k in ("width", "height", "n"))
cfg = RasterConfig(tile_w=32, tile_h=16, tile_capacity=1024,
                   max_tiles_per_gaussian=32, tile_batch=256, backend="stream",
                   fast_math="--fast" in sys.argv)
from mvs_gaussian_splatting_tpu.ops.binning import auto_instance_cap
CAP = auto_instance_cap(N, cfg.max_tiles_per_gaussian, cfg.tile_w,
                        cfg.tile_h, cfg.tier_budgets, cfg.tier_fracs)
if (len(sys.argv) > 1 and sys.argv[1] not in ("auto", "--fast")
        and not sys.argv[1].startswith("--")):
    CAP = int(sys.argv[1])
    cfg = cfg._replace(instance_cap=CAP)
cam, (means, log_scales, quats, opac_logit, shs) = build_scene(N, W, H)
bg = jnp.zeros(3)
tiles_x, tiles_y = -(-W // cfg.tile_w), -(-H // cfg.tile_h)


def timeit(f, iters=10):
    """f(eps_scalar) -> outputs; eps unique per iteration AND per run (the
    serving tunnel memoizes previously-seen (program, input-value) pairs)."""
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
                      shs=shs, sh_degree=3, tile_w=cfg.tile_w, tile_h=cfg.tile_h)

pre = jax.jit(pre_fn)
t_pre = timeit(pre)
p = pre(jnp.float32(0.0))
jax.block_until_ready(p)

binf = jax.jit(lambda eps: bin_instances_stream(
    p._replace(depth=p.depth + eps), tiles_x, tiles_y,
    cfg.max_tiles_per_gaussian, CAP, tile_w=cfg.tile_w, tile_h=cfg.tile_h,
    tier_budgets=cfg.tier_budgets, tier_fracs=cfg.tier_fracs))
t_bin = timeit(binf)
bins = binf(jnp.float32(0.0))
jax.block_until_ready(bins)

# pack (gather + where + transpose)
def pack_fn(eps):
    table = jnp.concatenate([p.xy + eps, p.conic, p.opacity[:, None], p.rgb,
                             jnp.zeros((N, ROWS - 9))], axis=1)[bins.order]
    return jnp.where(bins.inst_valid[:, None], table[bins.inst_rank], 0.0).T

packj = jax.jit(pack_fn)
t_pack = timeit(packj)
attrs = packj(jnp.float32(0.0))
jax.block_until_ready(attrs)

# kernel fwd alone
tile_ids = jnp.arange(tiles_x * tiles_y, dtype=jnp.int32)
fwdk = jax.jit(lambda eps: composite_stream(
    attrs + eps, bins.seg_start, bins.counts, bg, tile_ids, tiles_x,
    cfg.tile_w, cfg.tile_h, False, False, cfg.fast_math))
t_fwdk = timeit(fwdk)

# kernel fwd+bwd (isolated custom vjp)
def loss_k(a):
    out, tfin = composite_stream(a, bins.seg_start, bins.counts, bg,
                                 tile_ids, tiles_x, cfg.tile_w, cfg.tile_h,
                                 False, False, cfg.fast_math)
    return out.mean()
gradk = jax.jit(lambda eps: jax.grad(loss_k)(attrs + eps))
t_gradk = timeit(gradk)

# pack fwd+bwd in isolation (gather + where + transpose AND their
# transposes: the [CAP]-row scatter-add back into the [N, 16] table plus
# the depth-order unsort scatter)
def pack_loss(eps):
    return pack_fn(eps).sum()

pack_grad = jax.jit(lambda eps: jax.grad(pack_loss)(eps))
t_pack_bwd = timeit(pack_grad)

# pack-transpose scatter in isolation: grad of the instance row-gather
# w.r.t. the [N, 16] table — the CAP-row scatter-add the backward must run
_rngw = np.random.RandomState(9)
wrand = jnp.asarray(_rngw.rand(attrs.shape[1], ROWS).astype(np.float32))
table16 = jnp.asarray(_rngw.rand(N, ROWS).astype(np.float32))
valid_col = bins.inst_valid[:, None]

def _gather_loss(t, eps):
    rows = jnp.where(valid_col, (t + eps)[bins.inst_rank], 0.0)
    return (rows * wrand).sum()

scatf = jax.jit(lambda eps: jax.grad(_gather_loss)(table16, eps))
t_scat = timeit(scatf)

# depth-unsort scatter in isolation: grad of the [N]-row order gather
worder = jnp.asarray(_rngw.rand(N, ROWS).astype(np.float32))
unsf = jax.jit(lambda eps: jax.grad(
    lambda t: (((t + eps)[bins.order]) * worder).sum())(table16))
t_uns = timeit(unsf)

# depth argsort alone ([N] f32 keys)
sortf = jax.jit(lambda eps: jnp.argsort(
    jnp.where(p.mask, p.depth + eps, jnp.inf), stable=True))
t_sort = timeit(sortf)

# binning+pack+kernel fwd+bwd WITHOUT preprocess (isolates the raster
# half's backward from preprocess's transpose)
def raster_only_loss(eps):
    img, _ = rasterize(p._replace(xy=p.xy + eps), W, H, bg, cfg)
    return img.mean()

raster_grad = jax.jit(lambda eps: jax.grad(raster_only_loss)(eps))
t_raster_bwd = timeit(raster_grad)

# full fwd / full fwd+bwd
def loss_fn(eps):
    pp = pre_fn(eps)
    img, aux = rasterize(pp, W, H, bg, cfg)
    return img.mean()

full_fwd = jax.jit(loss_fn)
t_full_fwd = timeit(full_fwd)
step = jax.jit(jax.grad(lambda m, ls, q, ol, s: rasterize(
    preprocess(m, jax.nn.sigmoid(ol), cam, W, H, scales=jnp.exp(ls),
               rotations=normalize(q), shs=s, sh_degree=3,
               tile_w=cfg.tile_w, tile_h=cfg.tile_h),
    W, H, bg, cfg)[0].mean(), argnums=(0, 1, 2, 3, 4)))

def step_f(eps):
    return step(means + eps, log_scales, quats, opac_logit, shs)
t_step = timeit(step_f)

counts_np = np.asarray(bins.counts)
ss_np = np.asarray(bins.seg_start)
chunks = int((((ss_np % 128) + counts_np + 127) // 128).sum())
print(f"instances={counts_np.sum()}  window-chunks={chunks}  CAP={CAP}")
print(f"preprocess fwd       : {t_pre:7.2f} ms")
print(f"depth argsort        : {t_sort:7.2f} ms")
print(f"binning              : {t_bin:7.2f} ms")
print(f"pack (gather+T)      : {t_pack:7.2f} ms")
print(f"pack fwd+bwd         : {t_pack_bwd:7.2f} ms (bwd ~{t_pack_bwd - t_pack:.2f})")
print(f"pack-transpose scat  : {t_scat:7.2f} ms (isolated CAP-row scatter-add)")
print(f"unsort scatter       : {t_uns:7.2f} ms (isolated [N]-row scatter)")
print(f"kernel fwd           : {t_fwdk:7.2f} ms")
print(f"kernel fwd+bwd       : {t_gradk:7.2f} ms (bwd ~{t_gradk - t_fwdk:.2f})")
print(f"raster-only fwd+bwd  : {t_raster_bwd:7.2f} ms (no preprocess bwd)")
print(f"full fwd             : {t_full_fwd:7.2f} ms")
print(f"full fwd+bwd         : {t_step:7.2f} ms")
