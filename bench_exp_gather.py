"""Chained (dedup-proof) gather/sort/scatter rate microbench.

Pins the primitive rates behind the sparse-kernel budget split
(docs/ROADMAP.md r5): each iteration's indices depend on the previous
iteration's gathered values, so no two dispatches are identical and
the device must execute every one — un-chained repeats of an
identical program measure 26 G/s apparent (pipelined/deduplicated
below the dispatch floor) and are meaningless on this tunnel.

Measured 2026-08-20 (6.25M-row table): (N,4) row gather 87.5 M/s at
2^20 lanes, 160 M/s at 2^23; packed (N,) 71 M/s (NOT faster — gather
cost is per transaction, not per element); 3-op sort 2.7 ms, cummax
1.2 ms, scatter-max 8.1 ms per 2^20.
"""
import sys, time
import numpy as np
sys.path.insert(0, ".")
import jax, jax.numpy as jnp

N = 6_256_164
rng = np.random.default_rng(0)
g4 = jnp.asarray(rng.integers(0, 2**32, size=(N, 4), dtype=np.uint32))

def bench_chained(f, x0, label, iters=30):
    x = f(x0)  # warm/compile
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    x = x0
    for _ in range(iters):
        x = f(x)
    jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:36s} {dt*1e3:9.3f} ms/iter", flush=True)
    return dt

for logE in (20, 23):
    E = 1 << logE
    idx = jnp.asarray(rng.integers(0, N, size=E, dtype=np.int32))
    @jax.jit
    def g(i):
        v = jnp.take(g4, i, axis=0)  # (E,4) random row gather
        return (i + v[:, 2].astype(jnp.int32) + 1) % N
    d = bench_chained(g, idx, f"chained gather E=2^{logE} rows (N,4)")
    print(f"   -> {E/d/1e6:8.1f} M row-gathers/s", flush=True)

E = 1 << 20
idx = jnp.asarray(rng.integers(0, N, size=E, dtype=np.int32))
g1 = g4[:, 2].copy()
@jax.jit
def gp(i):
    v = jnp.take(g1, i)  # packed single-column gather
    return (i + v.astype(jnp.int32) + 1) % N
d = bench_chained(gp, idx, "chained gather E=2^20 packed (N,)")
print(f"   -> {E/d/1e6:8.1f} M elt-gathers/s", flush=True)

# chained 3-op sort at expansion scale
k = jnp.asarray(rng.integers(0, 2**31, size=E, dtype=np.int32))
@jax.jit
def s3(a):
    x, y, z = jax.lax.sort((a, a ^ 12345, a + 7), num_keys=2)
    return x ^ y ^ z
d = bench_chained(s3, k, "chained 3-op sort E=2^20")

# chained scatter-max
@jax.jit
def sm(a):
    o = jnp.zeros(E, jnp.int32).at[a % E].max(a, mode="drop")
    return o + 1
d = bench_chained(sm, k, "chained scatter-max E=2^20")

# chained cummax
@jax.jit
def cm(a):
    return (jax.lax.cummax(a) + a) % (1 << 30)
d = bench_chained(cm, k, "chained cummax E=2^20")
