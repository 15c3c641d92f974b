"""Backward-pass component timing + gather shape experiments (dev tool)."""
import math, sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
from bench import build_scene
from mvs_gaussian_splatting_tpu.ops.preprocess import preprocess
from mvs_gaussian_splatting_tpu.ops.binning import bin_instances_stream
from mvs_gaussian_splatting_tpu.ops.pallas.stream import ROWS, composite_stream
from mvs_gaussian_splatting_tpu.utils.transforms import normalize

W, H = 1920, 1088
N = 200_000
CAP = 1 << 21
TW = TH = 16
tiles_x, tiles_y = -(-W // TW), -(-H // TH)

cam, (means, log_scales, quats, opac_logit, shs) = build_scene(N, W, H)
bg = jnp.zeros(3)


def timeit(f, *args, iters=15):
    o = f(*args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters * 1000


pre = jax.jit(lambda: preprocess(means, jax.nn.sigmoid(opac_logit), cam, W, H,
                                 scales=jnp.exp(log_scales),
                                 rotations=normalize(quats), shs=shs,
                                 sh_degree=3, tile_w=TW, tile_h=TH))
p = pre(); jax.block_until_ready(p)
bins = jax.jit(lambda: bin_instances_stream(p, tiles_x, tiles_y, 32, CAP))()
jax.block_until_ready(bins)
ig, v = bins.inst_gauss, bins.inst_valid

# attrs pack
def pack(xy, conic, opacity, rgb):
    table = jnp.concatenate([xy, conic, opacity[:, None], rgb,
                             jnp.zeros((N, ROWS - 9))], axis=1)
    inst = jnp.where(v[:, None], table[ig], 0.0)
    return inst.T

packj = jax.jit(pack)
attrs = packj(p.xy, p.conic, p.opacity, p.rgb)
jax.block_until_ready(attrs)

# 1: kernel fwd alone
fwdk = jax.jit(lambda a: composite_stream(a, bins.region_start, bins.counts,
                                          bg, tiles_x, TW, TH, False))
t_fwdk = timeit(fwdk, attrs)

# 2: kernel fwd+bwd (vjp w.r.t. attrs only)
def loss_k(a):
    out, tfin = composite_stream(a, bins.region_start, bins.counts, bg,
                                 tiles_x, TW, TH, False)
    return out.mean()
gradk = jax.jit(jax.grad(loss_k))
t_gradk = timeit(gradk, attrs)

# 3: pack bwd alone (gather transpose = scatter-add)
def loss_pack(xy, conic, opacity, rgb):
    return packj(xy, conic, opacity, rgb).sum()
gradp = jax.jit(jax.grad(loss_pack, argnums=(0, 1, 2, 3)))
t_gradp = timeit(gradp, p.xy, p.conic, p.opacity, p.rgb)

# 4: preprocess fwd+bwd alone
def loss_pre(m, ls, q, ol, s):
    pp = preprocess(m, jax.nn.sigmoid(ol), cam, W, H, scales=jnp.exp(ls),
                    rotations=normalize(q), shs=s, sh_degree=3,
                    tile_w=TW, tile_h=TH)
    return (pp.xy.sum() + pp.conic.sum() + pp.rgb.sum() + pp.opacity.sum())
gpre = jax.jit(jax.grad(loss_pre, argnums=(0, 1, 2, 3, 4)))
t_gpre = timeit(gpre, means, log_scales, quats, opac_logit, shs)

# gather shape experiments
rng = np.random.RandomState(0)
idx = jnp.asarray(rng.randint(0, N, CAP).astype(np.int32))
for cols in (4, 8, 16, 32):
    tab = jnp.asarray(rng.randn(N, cols).astype(np.float32))
    g = jax.jit(lambda t, i: t[i])
    tg = timeit(g, tab, idx)
    print(f"gather [{CAP>>20}M, {cols:2d}] f32 : {tg:7.2f} ms "
          f"({CAP/tg/1e3:.0f}M rows/s)")

# scatter-add shape experiment (transpose of the gather)
for cols in (8, 16):
    gr = jnp.asarray(rng.randn(CAP, cols).astype(np.float32))
    s = jax.jit(lambda g, i: jnp.zeros((N, cols)).at[i].add(g))
    ts = timeit(s, gr, idx)
    print(f"scatter-add [{CAP>>20}M, {cols:2d}] : {ts:7.2f} ms")

print(f"kernel fwd           : {t_fwdk:7.2f} ms")
print(f"kernel fwd+bwd       : {t_gradk:7.2f} ms (bwd ~ {t_gradk-t_fwdk:.2f})")
print(f"pack fwd+bwd (scatter): {t_gradp:7.2f} ms")
print(f"preprocess fwd+bwd   : {t_gpre:7.2f} ms")
