#!/usr/bin/env python
"""Round-4 experiment: decompose the sparse warm block at 512x524k.

The r03 gap: warm ~2.8k q/s vs kernel-only ~14k. Candidate terms:
kernel compute, stats-sync RTT, hit-buffer D2H bytes, host assembly.
This script measures each in isolation on the live backend, then A/Bs
(a) multi-block batching (C chunks per scan launch -> one sync + one
fetch set for all chunks) and (b) a packed (t<<8|count) u32 transport
(8 B/hit instead of 10). Prints one JSON line per measurement.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from kmerseek_tpu.utils.hostmem import prefault_arena, tune_host_allocator

tune_host_allocator()


def main():
    import jax
    import jax.numpy as jnp

    from kmerseek_tpu.ops.inverted import build_inverted, device_postings
    from kmerseek_tpu.ops.sparse_search import (
        _expand_budget,
        inverted_sparse_hits,
        sparse_search,
    )
    from kmerseek_tpu.utils.device import enable_compilation_cache

    enable_compilation_cache()
    targets, sketch, queries, pool_bits = 524288, 128, 512, 22
    prefault_arena(min(targets * sketch * 12, 6 << 30))
    rng = np.random.default_rng(1)
    pool = np.unique(rng.integers(0, 2**62, size=1 << pool_bits, dtype=np.uint64))
    t_c = rng.integers(sketch // 2, sketch, size=targets).astype(np.int64)
    vals = np.sort(pool[rng.integers(0, len(pool), size=(targets, sketch))], axis=1)
    keep = np.ones_like(vals, bool)
    keep[:, 1:] = vals[:, 1:] != vals[:, :-1]
    keep &= np.arange(sketch)[None, :] < t_c[:, None]
    mins = vals[keep]
    offsets = np.concatenate([[0], np.cumsum(keep.sum(axis=1))]).astype(np.int64)
    inv = build_inverted(mins, np.ones(len(mins), np.int64), offsets)

    class _Idx:
        inverted = inv

    def qblock(n, seed=7):
        r = np.random.default_rng(seed)
        q64 = np.where(
            np.arange(sketch)[None, :] % 2 == 0,
            pool[r.integers(0, len(pool), size=(n, sketch))],
            r.integers(0, 2**62, size=(n, sketch), dtype=np.uint64),
        )
        q64 = np.sort(q64, axis=1)
        qv = np.ones((n, sketch), bool)
        qv[:, 1:] = q64[:, 1:] != q64[:, :-1]
        return (
            jnp.asarray((q64 >> np.uint64(32)).astype(np.uint32)),
            jnp.asarray((q64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
            jnp.asarray(qv),
        )

    q_hi, q_lo, q_valid = qblock(queries)
    binv, g4, starts = device_postings(inv)

    # warm everything once
    hits = sparse_search(_Idx(), q_hi, q_lo, q_valid, q_chunk=512)
    res = {"n_hits": int(hits.n_hits), "backend": jax.default_backend()}

    def best_of(f, n=5):
        b = None
        for _ in range(n):
            t0 = time.perf_counter()
            f()
            dt = time.perf_counter() - t0
            b = dt if b is None else min(b, dt)
        return b

    # (1) full production block
    res["full_block_s"] = best_of(
        lambda: sparse_search(_Idx(), q_hi, q_lo, q_valid, q_chunk=512)
    )

    # (2) kernel launch + stats sync only (no hit fetch)
    E = _expand_budget(inv, queries, sketch, int(binv.max_run))
    kw = dict(
        n_targets=binv.n_targets,
        max_run=int(binv.max_run),
        capacity=512 * 1024,
        span_steps=max(int(binv.max_span).bit_length(), 1),
        bucket_shift=binv.bucket_shift,
        expand_e=E,
        wide_weights=False,
        compact_io=True,
        w16=True,
    )
    out = inverted_sparse_hits(g4, starts, q_hi, q_lo, q_valid, **kw)
    np.asarray(out[4])

    def launch_stats():
        o = inverted_sparse_hits(g4, starts, q_hi, q_lo, q_valid, **kw)
        np.asarray(o[4])

    res["launch_stats_s"] = best_of(launch_stats)

    # (3) + trimmed hit fetch (the production fetch size)
    hp = 1 << int(np.ceil(np.log2(max(int(hits.n_hits), 128))))
    hp = min(hp, kw["capacity"])

    def launch_fetch():
        o = inverted_sparse_hits(g4, starts, q_hi, q_lo, q_valid, **kw)
        views = (o[0][:hp], o[1][:hp], o[2][:hp], o[3][:hp])
        for v in views:
            v.copy_to_host_async()
        np.asarray(o[4])
        return [np.asarray(v) for v in views]

    res["launch_fetch_s"] = best_of(launch_fetch)
    res["fetch_hp"] = int(hp)
    res["fetch_bytes"] = int(hp * (2 + 4 + 2 + 2))  # q16,t32,c16,w16

    # (4) multi-block batching: 4 chunks of 512 in one scan launch
    q_hi4, q_lo4, q_valid4 = qblock(4 * queries, seed=8)
    sparse_search(_Idx(), q_hi4, q_lo4, q_valid4, q_chunk=512)  # warm
    res["batched4_block_s"] = best_of(
        lambda: sparse_search(_Idx(), q_hi4, q_lo4, q_valid4, q_chunk=512)
    )
    res["batched4_qps"] = 4 * queries / res["batched4_block_s"]
    res["full_qps"] = queries / res["full_block_s"]
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
