"""Single-pass widened-row scatter vs K-pass bucketed target (round 4b).

exp_scatter2.py established: colliding scatter-add cost is ~17 ns/row when
the TARGET has <= ~250K rows and ~107 ns/row above, independent of row
WIDTH. The shipped fix (ops/rasterize._bucketed_scatter_add) makes K masked
passes over all CAP instance rows -> K x 17 ns/row.

If the fast-regime rate really is per-ROW (not per-byte), one pass over a
WIDER target should beat K passes: place each instance grad row in column
block `bucket = idx // b` of a [b, K*W] accumulator (row `idx % b`), then
unstack the K column blocks into the [N, W] result. Cost model: 1 x 17
ns/row instead of K x 17 ns/row, at the price of a fused one-hot widen.

Run on TPU: python exp_scatter3.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp


def timeit(f, *args, iters=10):
    salt = (time.time_ns() % 997) * 1e-9
    o = f(jnp.float32(salt), *args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for i in range(iters):
        o = f(jnp.float32(salt + 1e-6 * (i + 1)), *args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters * 1000


CAP = 2_146_432
rng = np.random.RandomState(0)
ROWS16 = jnp.asarray(rng.rand(CAP, 16).astype(np.float32))


def widened(eps, ix, r, n, k):
    w = r.shape[1]
    b = -(-n // k)
    bucket = ix // b
    local = ix - bucket * b
    r = r + eps
    onehot = (bucket[:, None] == jnp.arange(k)[None, :]).astype(r.dtype)
    wide = (onehot[:, :, None] * r[:, None, :]).reshape(CAP, k * w)
    acc = jnp.zeros((b, k * w)).at[local].add(wide)
    return acc.reshape(b, k, w).swapaxes(0, 1).reshape(k * b, w)[:n]


def bucketed(eps, ix, r, n, k):
    w = r.shape[1]
    b = -(-n // k)
    outs = []
    r = r + eps
    for j in range(k):
        local = ix - j * b
        inb = (local >= 0) & (local < b)
        li = jnp.where(inb, local, b)
        acc = jnp.zeros((b + 1, w)).at[li].add(jnp.where(inb[:, None], r, 0.0))
        outs.append(acc[:b])
    return jnp.concatenate(outs)[:n]


def main():
    print(f"device: {jax.devices()[0]}  CAP={CAP}")

    # correctness first (small n, vs plain scatter)
    n_small = 1000
    ix_s = jnp.asarray(rng.randint(0, n_small, CAP).astype(np.int32))
    ref = jnp.zeros((n_small, 16)).at[ix_s].add(ROWS16)
    got = widened(jnp.float32(0.0), ix_s, ROWS16, n_small, 3)
    print(f"  correctness (n=1000, k=3): max|diff| = "
          f"{float(jnp.max(jnp.abs(ref - got))):.3e}")

    # fast-regime width sweep: is 17 ns/row really width-independent?
    n_t = 250_000
    ix_t = jnp.asarray(rng.randint(0, n_t, CAP).astype(np.int32))
    for w in (16, 32, 48, 64):
        rows_w = jnp.concatenate([ROWS16] * (-(-w // 16)), 1)[:, :w]

        def scatw(eps, ix, rows):
            return jnp.zeros((n_t, w)).at[ix].add(rows + eps)

        t = timeit(jax.jit(scatw), ix_t, rows_w)
        print(f"  fast-regime width {w:>2} (target {n_t * w * 4 / 2**20:6.1f}"
              f" MB): {t:8.2f} ms ({t * 1e6 / CAP:.1f} ns/row)")

    # head-to-head at bicycle scale and above
    for n, k in ((500_000, 2), (750_000, 3), (1_000_000, 4)):
        ix = jnp.asarray(rng.randint(0, n, CAP).astype(np.int32))
        tb = timeit(jax.jit(lambda e, i, r: bucketed(e, i, r, n, k)), ix, ROWS16)
        tw = timeit(jax.jit(lambda e, i, r: widened(e, i, r, n, k)), ix, ROWS16)
        print(f"  N={n:>9} K={k}:  bucketed {tb:7.2f} ms   "
              f"widened {tw:7.2f} ms   ({tb / tw:.2f}x)")


if __name__ == "__main__":
    main()
