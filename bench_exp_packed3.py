#!/usr/bin/env python
"""Round-4 experiment: 12-byte posting rows for the probe kernels.

The dense engine's accumulate phase and the sparse engine's expansion
are gather-bound on the packed (N, 4) u32 posting rows (16 B per
gather). When n_targets < 2^24 and max_abundance < 256 (every bench
corpus and most real proteomes), tid and abundance fit ONE u32
((tid << 8) | ab), shrinking rows to (N, 3) = 12 B — 25% less HBM
traffic per probe step. This A/Bs the dense kernel on both layouts,
plus a 2048-query block, on the live backend. Prints JSON lines.
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp

    from kmerseek_tpu.ops.inverted import (
        _bucketed_lower_bound_packed,
        build_inverted_np,
        device_postings,
        inverted_pair_stats_packed,
    )
    from kmerseek_tpu.utils.device import enable_compilation_cache

    enable_compilation_cache()

    TARGETS, SKETCH = 20000, 128
    rng = np.random.default_rng(0)

    def _mk(n, S, fill=100):
        counts = rng.integers(fill // 2, fill, size=n).astype(np.int32)
        vals = np.sort(
            rng.integers(0, 2**62, size=(n, S), dtype=np.uint64), axis=1
        )
        mask = np.arange(S)[None, :] < counts[:, None]
        hi = np.where(mask, (vals >> 32).astype(np.uint32), 0xFFFFFFFF)
        lo = np.where(mask, (vals & 0xFFFFFFFF).astype(np.uint32), 0xFFFFFFFF)
        return hi, lo, mask, counts, vals

    t_hi, t_lo, t_mask, t_c, t_vals = _mk(TARGETS, SKETCH)
    mins = t_vals[t_mask]
    offsets = np.concatenate([[0], np.cumsum(t_c)]).astype(np.int64)
    inv = build_inverted_np(mins, np.ones(len(mins), np.int64), offsets)
    binv, g4, starts = device_postings(inv)

    # 12-byte layout: [hi, lo, (tid << 8) | ab]
    g3_host = np.stack(
        [
            binv.g_hi,
            binv.g_lo,
            (binv.tid.astype(np.uint32) << np.uint32(8))
            | binv.ab.astype(np.uint32),
        ],
        axis=1,
    )
    g3 = jnp.asarray(g3_host)

    @functools.partial(
        jax.jit,
        static_argnames=("n_targets", "max_run", "span_steps", "bucket_shift"),
    )
    def pair_stats_packed3(
        g3, bucket_starts, q_hi, q_lo, q_valid, *,
        n_targets, max_run, span_steps, bucket_shift,
    ):
        pos = _bucketed_lower_bound_packed(
            g3, bucket_starts, q_hi, q_lo, span_steps, bucket_shift
        )
        Q, S = q_hi.shape
        N = g3.shape[0]
        qi = jax.lax.broadcasted_iota(jnp.int32, (Q, S), 0)
        drop = jnp.int32(n_targets)

        def body(r, carry):
            counts, weights = carry
            idx = jnp.minimum(pos + r, N - 1)
            row = jnp.take(g3, idx, axis=0)
            match = (
                q_valid
                & (row[..., 0] == q_hi)
                & (row[..., 1] == q_lo)
                & (pos + r < N)
            )
            ta = row[..., 2]
            t = jnp.where(match, (ta >> jnp.uint32(8)).astype(jnp.int32), drop)
            counts = counts.at[qi, t].add(match.astype(jnp.int32), mode="drop")
            weights = weights.at[qi, t].add(
                jnp.where(match, (ta & jnp.uint32(0xFF)).astype(jnp.int32), 0),
                mode="drop",
            )
            return counts, weights

        counts = jnp.zeros((Q, n_targets), jnp.int32)
        weights = jnp.zeros((Q, n_targets), jnp.int32)
        counts = counts + (g3[0, 0] * jnp.uint32(0)).astype(jnp.int32)
        weights = weights + (g3[0, 0] * jnp.uint32(0)).astype(jnp.int32)
        return jax.lax.fori_loop(0, max_run, body, (counts, weights))

    kw = dict(
        n_targets=binv.n_targets,
        max_run=binv.max_run,
        span_steps=max(int(binv.max_span).bit_length(), 1),
        bucket_shift=binv.bucket_shift,
    )
    red = jax.jit(lambda c, w, d: c.sum() + w.sum() + d)

    for QUERIES in (1024, 2048):
        q_hi, q_lo, q_mask, q_c, _ = _mk(QUERIES, SKETCH)
        q_hi_d, q_lo_d = jnp.asarray(q_hi), jnp.asarray(q_lo)
        q_valid = jnp.asarray(q_mask)

        def step4(dep):
            c, w = inverted_pair_stats_packed(
                g4, starts, q_hi_d, q_lo_d, q_valid & (dep >= 0), **kw
            )
            return red(c, w, dep)

        def step3(dep):
            c, w = pair_stats_packed3(
                g3, starts, q_hi_d, q_lo_d, q_valid & (dep >= 0), **kw
            )
            return red(c, w, dep)

        # bit-equality first
        c4, w4 = inverted_pair_stats_packed(
            g4, starts, q_hi_d, q_lo_d, q_valid, **kw
        )
        c3, w3 = pair_stats_packed3(
            g3, starts, q_hi_d, q_lo_d, q_valid, **kw
        )
        assert np.array_equal(np.asarray(c4), np.asarray(c3))
        assert np.array_equal(np.asarray(w4), np.asarray(w3))

        out = {"queries": QUERIES, "targets": TARGETS}
        for tag, step in (("g4_16B", step4), ("g3_12B", step3)):
            int(step(jnp.int32(0)))  # warm
            t0 = time.perf_counter()
            dep = jnp.int32(0)
            iters = 5
            for _ in range(iters):
                dep = step(dep)
            int(dep)
            dt = (time.perf_counter() - t0) / iters
            out[tag + "_qps"] = QUERIES / dt
        out["speedup"] = out["g3_12B_qps"] / out["g4_16B_qps"]
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
