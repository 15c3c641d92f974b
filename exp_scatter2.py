"""Scatter-add target-size boundary + bucketed-target fix (round 4).

exp_scatter.py showed the colliding scatter-add into [N, 16] runs at
17.6 ns/row when N=200K but 106 ns/row when N=500K — per-row cost depends on
the TARGET size, not the instance count or collisions (permutation scatter
is 106 ns/row at both). Hypothesis: below some size the accumulator stays
VMEM-resident. This maps the boundary and measures the candidate fix:
K passes over the instance rows, each accumulating into a target bucket of
N/K rows that fits the fast regime (rows outside the bucket masked to a
dump slot), then concatenate.

Run on TPU: python exp_scatter2.py
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
N = 500_000
rng = np.random.RandomState(0)
IDX = jnp.asarray(rng.randint(0, N, size=CAP).astype(np.int32))
ROWS16 = jnp.asarray(rng.rand(CAP, 16).astype(np.float32))


def main():
    print(f"device: {jax.devices()[0]}  CAP={CAP}")

    # target-size sweep at fixed rows/width (indices mod n_t)
    for n_t in (125_000, 200_000, 250_000, 300_000, 400_000, 500_000):
        idx_t = IDX % n_t

        def scat(eps, ix):
            return jnp.zeros((n_t, 16)).at[ix].add(ROWS16 + eps)

        t = timeit(jax.jit(scat), idx_t)
        print(f"  target {n_t:>7} x16 ({n_t * 64 / 2**20:5.1f} MB): "
              f"{t:8.2f} ms ({t * 1e6 / CAP:.1f} ns/row)")

    # width sweep at N=500K
    for w in (8, 9, 12):
        rows_w = ROWS16[:, :w]

        def scatw(eps, ix):
            return jnp.zeros((N, w)).at[ix].add(rows_w + eps)

        t = timeit(jax.jit(scatw), IDX)
        print(f"  width  {w:>2} at N=500K ({N * w * 4 / 2**20:5.1f} MB): "
              f"{t:8.2f} ms ({t * 1e6 / CAP:.1f} ns/row)")

    # bucketed-target: K passes, rows outside bucket masked to dump slot
    for k in (2, 3, 4):
        b = -(-N // k)

        def bucketed(eps, ix):
            outs = []
            r = ROWS16 + eps
            for j in range(k):
                local = ix - j * b
                inb = (local >= 0) & (local < b)
                li = jnp.where(inb, local, b)          # b = dump slot
                acc = jnp.zeros((b + 1, 16)).at[li].add(
                    jnp.where(inb[:, None], r, 0.0))
                outs.append(acc[:b])
            return jnp.concatenate(outs)[:N]

        t = timeit(jax.jit(bucketed), IDX)
        print(f"  bucketed K={k} (bucket {b} rows, "
              f"{(b + 1) * 64 / 2**20:.1f} MB): {t:8.2f} ms "
              f"({t * 1e6 / CAP:.1f} ns/row-pass x{k})")

    # bf16 accumulator (precision trade — measurement only)
    def scat_bf16(eps, ix):
        return jnp.zeros((N, 16), jnp.bfloat16).at[ix].add(
            (ROWS16 + eps).astype(jnp.bfloat16))

    t = timeit(jax.jit(scat_bf16), IDX)
    print(f"  bf16 accumulator (16.0 MB): {t:8.2f} ms")


if __name__ == "__main__":
    main()
