#!/usr/bin/env python
"""Microbenchmark grid — the reference's criterion benches, TPU edition.

Mirrors /root/reference/benches/benchmark.rs: sketch throughput over
{protein, dayhoff, hp} × k ∈ {5, 10, 20} (plus the production hp/k24),
on whatever backend is active. Prints one JSON line per config.
Run: python bench_micro.py  (CPU: JAX_PLATFORMS=cpu python bench_micro.py)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    from bench import _device_healthy

    if os.environ.get("JAX_PLATFORMS") != "cpu" and not _device_healthy():
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from kmerseek_tpu.ops.sketch import sketch_capacity, sorted_window_hashes

    use_pallas = jax.default_backend() not in ("cpu",)
    rng = np.random.default_rng(0)
    letters = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", np.uint8)
    B, L = 2048, 512
    seqs = jax.device_put(jnp.asarray(letters[rng.integers(0, 20, (B, L))]))
    lens = jax.device_put(jnp.asarray(np.full(B, L, np.int32)))

    @jax.jit
    def consume(out, dep):
        s_hi, s_lo, first, n_kept = out
        return (
            n_kept.sum()
            + first.astype(jnp.int32).sum()
            + (s_lo & jnp.uint32(1)).astype(jnp.int32).sum()
            + dep
        )

    grid = [(m, k) for m in ("protein", "dayhoff", "hp") for k in (5, 10, 20)]
    grid.append(("hp", 24))
    for moltype, k in grid:
        cap = max((sketch_capacity(L, k, 5) + 127) // 128 * 128, 128)

        def step(dep):
            out = sorted_window_hashes(
                seqs,
                lens - (dep % 2).astype(jnp.int32),
                k=k,
                scaled=5,
                moltype=moltype,
                capacity=cap,
                use_pallas=use_pallas,
            )
            return consume(out, dep)

        int(step(jnp.int32(0)))  # compile+sync
        iters = 10
        t0 = time.perf_counter()
        dep = jnp.int32(0)
        for _ in range(iters):
            dep = step(dep)
        int(dep)
        dt = (time.perf_counter() - t0) / iters
        kmers = B * (L - k + 1)
        print(
            json.dumps(
                {
                    "metric": "sketch_kmers_per_second",
                    "moltype": moltype,
                    "k": k,
                    "value": kmers / dt,
                    "backend": jax.default_backend(),
                }
            )
        )


if __name__ == "__main__":
    main()
