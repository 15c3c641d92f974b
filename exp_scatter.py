"""Scatter-add alternatives at bicycle scale (round 4, VERDICT #4).

The round-3 closure (PROFILE_FLOOR.md: scatter-add beats sort/cumsum
alternatives) was measured at 852K instances, where the [CAP]-row
scatter-add into the [N, 16] table ran at ~17.5 ns/row. At the bicycle
workload (N=500K, CAP=2.15M) the SAME scatter measures ~101 ns/row
(216.7 ms — 70% of the whole step). This experiment measures, at that
exact shape:

  a. colliding scatter-add (the current backward)     — baseline
  b. permutation scatter (unique indices)             — is it collisions?
  c. sorted-segment reduction: cumsum over [CAP, 16]  — the closed lever
  d. big row gather at enumeration size               — inverse-perm plan
  e. the same colliding scatter at the 1080p/200K shape — nonlinearity check
  f. colliding scatter in 2 half-size pieces          — size nonlinearity?

Run on TPU: python exp_scatter.py
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


def bench_shape(n, cap, label, mult_mean):
    rng = np.random.RandomState(0)
    # realistic inst_rank: depth-rank ids with tile-sort-like dispersion —
    # each gaussian appears ~mult times at scattered positions
    idx = rng.randint(0, n, size=cap).astype(np.int32)
    idx_j = jnp.asarray(idx)
    rows = jnp.asarray(rng.rand(cap, 16).astype(np.float32))
    perm = jnp.asarray(rng.permutation(max(cap, n))[:cap].astype(np.int32))

    # a. colliding scatter-add into [N, 16] (the pack-gather transpose)
    def scat(eps, idxv):
        return jnp.zeros((n, 16)).at[idxv].add(rows + eps)

    t_a = timeit(jax.jit(scat), idx_j)

    # b. permutation scatter (unique destinations, [cap_up, 16] target)
    cap_up = max(cap, n)

    def pscat(eps, p):
        return jnp.zeros((cap_up, 16)).at[p].set(rows + eps)

    t_b = timeit(jax.jit(pscat), perm)

    # c. sort-by-rank + cumsum segment reduction
    def segred(eps, idxv):
        order = jnp.argsort(idxv)                       # [CAP] i32
        r = (rows + eps)[order]                         # CAP-row gather
        cs = jnp.cumsum(r, axis=0)
        # segment boundaries via searchsorted on the sorted ids
        sid = idxv[order]
        ends = jnp.searchsorted(sid, jnp.arange(n, dtype=jnp.int32),
                                side="right")
        csz = jnp.concatenate([jnp.zeros((1, 16)), cs], axis=0)
        return csz[ends] - csz[jnp.searchsorted(
            sid, jnp.arange(n, dtype=jnp.int32), side="left")]

    t_c = timeit(jax.jit(segred), idx_j)

    # d. plain big row-gather at ~2x cap (enumeration-size inverse-perm cost)
    big = 2 * cap
    gidx = jnp.asarray(rng.randint(0, cap, size=big).astype(np.int32))

    def gath(eps, g):
        return (rows + eps)[g]

    t_d = timeit(jax.jit(gath), gidx)

    print(f"{label} (N={n}, CAP={cap}):")
    print(f"  a. colliding scatter-add : {t_a:8.2f} ms "
          f"({t_a * 1e6 / cap:.1f} ns/row)")
    print(f"  b. permutation scatter   : {t_b:8.2f} ms "
          f"({t_b * 1e6 / cap:.1f} ns/row)")
    print(f"  c. sort+cumsum segsum    : {t_c:8.2f} ms")
    print(f"  d. row gather 2xCAP      : {t_d:8.2f} ms "
          f"({t_d * 1e6 / big:.1f} ns/row)")
    return t_a


def main():
    print(f"device: {jax.devices()[0]}")
    bench_shape(200_000, 1_130_000, "1080p/200K shape", 5.5)
    t_a = bench_shape(500_000, 2_146_432, "bicycle/500K shape", 3.8)

    # f. the bicycle colliding scatter split into 2 halves (is the cost
    # superlinear in CAP at fixed N?)
    n, cap = 500_000, 2_146_432
    rng = np.random.RandomState(0)
    idx = jnp.asarray(rng.randint(0, n, size=cap).astype(np.int32))
    rows = jnp.asarray(rng.rand(cap, 16).astype(np.float32))
    h = cap // 2

    def scat2(eps, idxv):
        out = jnp.zeros((n, 16)).at[idxv[:h]].add(rows[:h] + eps)
        return out.at[idxv[h:]].add(rows[h:] + eps)

    t_f = timeit(jax.jit(scat2), idx)
    print(f"  f. 2x half scatter-add   : {t_f:8.2f} ms (vs {t_a:.2f} whole)")


if __name__ == "__main__":
    main()
