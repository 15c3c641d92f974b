"""Gather/scatter layout experiments (dev tool)."""
import sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp

N = 200_000
CAP = 1 << 21
D = 32


def timeit(f, *args, iters=15):
    o = f(*args); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters * 1000


rng = np.random.RandomState(0)
idx = jnp.asarray(rng.randint(0, N, CAP).astype(np.int32))
v = jnp.asarray(rng.rand(CAP) < 0.6)
tab = jnp.asarray(rng.randn(N, 16).astype(np.float32))
tabT = jnp.asarray(np.ascontiguousarray(np.asarray(tab).T))

# A: row gather + where + XLA transpose (current pack)
fA = jax.jit(lambda t, i: jnp.where(v[:, None], t[i], 0.0).T)
print(f"A row-gather+where+T : {timeit(fA, tab, idx):7.2f} ms")

# B: row gather + where, NO transpose (instance-major out)
fB = jax.jit(lambda t, i: jnp.where(v[:, None], t[i], 0.0))
print(f"B row-gather+where   : {timeit(fB, tab, idx):7.2f} ms")

# C: lane-axis gather from [16, N]
fC = jax.jit(lambda t, i: jnp.where(v[None, :], t[:, i], 0.0))
print(f"C lane-gather [16,N] : {timeit(fC, tabT, idx):7.2f} ms")

# D: scatter-add rows [CAP,16] -> [N,16] (current bwd transpose)
gr = jnp.asarray(rng.randn(CAP, 16).astype(np.float32))
fD = jax.jit(lambda g, i: jnp.zeros((N, 16)).at[i].add(
    jnp.where(v[:, None], g, 0.0)))
print(f"D scatter-add        : {timeit(fD, gr, idx):7.2f} ms")

# E: unique-dest scatter-set into [N*D,16] + reshape-sum
uniq = (idx * D + jnp.asarray(rng.randint(0, D, CAP).astype(np.int32)))
fE = jax.jit(lambda g, u: jnp.zeros((N * D, 16)).at[u].set(
    jnp.where(v[:, None], g, 0.0), mode="drop",
    unique_indices=True).reshape(N, D, 16).sum(1))
print(f"E uniq scatter-set   : {timeit(fE, gr, uniq):7.2f} ms")

# F: scatter-add from [16, CAP] layout (transpose first)
grT = jnp.asarray(np.ascontiguousarray(np.asarray(gr).T))
fF = jax.jit(lambda g, i: jnp.zeros((N, 16)).at[i].add(
    jnp.where(v[:, None], g.T, 0.0)))
print(f"F T+scatter-add      : {timeit(fF, grT, idx):7.2f} ms")

# G: sort-by-dest then sorted scatter-add
fG = jax.jit(lambda g, i: jnp.zeros((N, 16)).at[jnp.sort(i)].add(
    jnp.where(v[:, None], g, 0.0), indices_are_sorted=True))
print(f"G sorted scatter-add : {timeit(fG, gr, idx):7.2f} ms (excl sort cost correctness)")

# H: cumsum over CAP i32 (per_slot cost unit)
c1 = jnp.asarray(rng.randint(0, 3, CAP).astype(np.int32))
fH = jax.jit(lambda c: jnp.cumsum(c))
print(f"H cumsum 2M i32      : {timeit(fH, c1):7.2f} ms")

# I: 2M scalar gather (inst_gauss = sorted_gauss[src])
big = jnp.asarray(rng.randint(0, N, N * D).astype(np.int32))
src = jnp.asarray(rng.randint(0, N * D, CAP).astype(np.int32))
fI = jax.jit(lambda b, s: b[s])
print(f"I scalar gather 2M   : {timeit(fI, big, src):7.2f} ms")

# J: searchsorted 8160 over 6.4M
keys = jnp.sort(jnp.asarray(rng.randint(0, 8160, N * D).astype(np.int32)))
tr = jnp.arange(8160, dtype=jnp.int32)
fJ = jax.jit(lambda k: (jnp.searchsorted(k, tr, side="left"),
                        jnp.searchsorted(k, tr, side="right")))
print(f"J searchsorted x2    : {timeit(fJ, keys):7.2f} ms")
