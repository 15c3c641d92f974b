"""Component-level timing of the 1080p fwd+bwd step (dev tool, not a test)."""
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
from mvs_gaussian_splatting_tpu.utils.transforms import normalize

W, H = 1920, 1088
N = 200_000
cfg = RasterConfig(tile_capacity=1024, max_tiles_per_gaussian=32,
                   tile_batch=256, backend="stream")
cam, (means, log_scales, quats, opac_logit, shs) = build_scene(N, W, H)
bg = jnp.zeros(3)
tiles_x, tiles_y = -(-W // cfg.tile_w), -(-H // cfg.tile_h)


def timeit(f, *args, iters=20):
    o = f(*args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters * 1000


pre = jax.jit(lambda m, ls, q, ol, s: preprocess(
    m, jax.nn.sigmoid(ol), cam, W, H, scales=jnp.exp(ls),
    rotations=normalize(q), shs=s, sh_degree=3,
    tile_w=cfg.tile_w, tile_h=cfg.tile_h))
t_pre = timeit(pre, means, log_scales, quats, opac_logit, shs)
p = pre(means, log_scales, quats, opac_logit, shs)

binf = jax.jit(lambda p: bin_instances_stream(p, tiles_x, tiles_y,
                                              cfg.max_tiles_per_gaussian,
                                              cfg.instance_cap))
t_bin = timeit(binf, p)

fwd = jax.jit(lambda p: rasterize(p, W, H, bg, cfg)[0])
t_fwd_only = timeit(fwd, p)  # composite fwd given processed (incl. binning)


def loss_fn(m, ls, q, ol, s):
    pp = preprocess(m, jax.nn.sigmoid(ol), cam, W, H, scales=jnp.exp(ls),
                    rotations=normalize(q), shs=s, sh_degree=3,
                    tile_w=cfg.tile_w, tile_h=cfg.tile_h)
    img, aux = rasterize(pp, W, H, bg, cfg)
    return img.mean()

full_fwd = jax.jit(loss_fn)
t_full_fwd = timeit(full_fwd, means, log_scales, quats, opac_logit, shs)
step = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4)))
t_step = timeit(step, means, log_scales, quats, opac_logit, shs, iters=10)

# preprocess grad alone
pre_loss = jax.jit(jax.grad(lambda m, ls, q, ol, s: sum(
    jnp.sum(x) for x in [pre(m, ls, q, ol, s).xy.sum()] )  # dummy
    , argnums=(0,)))

print(f"preprocess fwd      : {t_pre:7.2f} ms")
print(f"binning (stream)    : {t_bin:7.2f} ms")
print(f"fwd raster(given p) : {t_fwd_only:7.2f} ms (incl binning)")
print(f"full fwd            : {t_full_fwd:7.2f} ms")
print(f"full fwd+bwd        : {t_step:7.2f} ms")
print(f"  -> implied bwd    : {t_step - t_full_fwd:7.2f} ms")
