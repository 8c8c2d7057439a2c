#!/usr/bin/env python
"""One-shot on-chip experiment: two-row interleaved sketch sort.

Last unexplored sketch-kernel residual (ROADMAP gap 3; VERDICT r3 item
9). The sketch stage's sort runs one row per sequence over W lanes.
Two-row interleaving folds each PAIR of rows into one 2W-wide sort,
tagging the odd row's keys with the top bit of ``hi`` (free whenever
scaled ≥ 2: kept hashes satisfy hi ≤ max_hash>>32 < 2^31), so the pair
sorts into [even-row keys asc | odd-row keys asc (tagged) | sentinels];
a per-pair gather at offset n_even de-interleaves back to the (B, S)
layout, bit-equal to the production path.

Why it might win: half the sort invocations / wider rows could use the
lane grid better at the narrow buckets. Why it might lose: a bitonic
sort of width 2W costs log(2W)·(log(2W)+1)/2 stages over the same
element count vs log(W)·(log(W)+1)/2 — e.g. W=512: 55 vs 45 stages/el,
+22% comparator work, plus the de-interleave gather.

Measures (production corpus buckets, hp/k24/scaled5):
  prod      current `_sort_keys_64` single-key fast path + dedup mask
  il2       two-row interleaved tagged sort + de-interleave gather
Both are measured over pre-staged masked key arrays; bit-equality of
il2 vs prod is asserted on every bucket first.

Run:  timeout -k 10 900 python bench_exp_interleave.py
Prints one JSON line.
"""

import json
import sys
import time

import numpy as np

import bench


def main():
    deadline = time.monotonic() + 840
    backoff = iter((30, 45, 60, 90, 120, 120, 150))
    while True:
        if bench._device_healthy(deadline_s=75):
            break
        wait = next(backoff, 180)
        if time.monotonic() + wait + 240 >= deadline:
            print(json.dumps({"ok": False, "reason": "accelerator unhealthy"}))
            return
        print(f"probe failed; retry in {wait}s", file=sys.stderr)
        time.sleep(wait)

    from kmerseek_tpu.utils.device import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from kmerseek_tpu.ops.sketch import _sort_keys_64
    from kmerseek_tpu.ops.sketch_pallas import masked_window_keys_pallas

    seqs = bench.load_corpus()
    buckets = bench.pack_buckets(seqs)
    out = {"ok": True, "backend": jax.default_backend()}

    TAG = jnp.uint32(0x80000000)
    BIG = jnp.uint32(0xFFFFFFFF)

    # pre-stage the masked key arrays per bucket (replicated like bench)
    staged = []
    counts = []
    total_kmers = 0
    for arr, lens in buckets:
        rep = max(16 // max(arr.shape[0] // 512, 1), 1)
        arr = np.concatenate([arr] * rep, axis=0) if rep > 1 else arr
        lens = np.concatenate([lens] * rep) if rep > 1 else lens
        if arr.shape[0] % 2:  # il2 needs even B: pad an all-sentinel row
            arr = np.concatenate([arr, arr[-1:]], axis=0)
            lens = np.concatenate([lens, np.zeros(1, lens.dtype)])
        hi, lo, cnt = jax.jit(
            lambda a, l: masked_window_keys_pallas(
                a, l, k=bench.K, scaled=bench.SCALED, moltype=bench.MOLTYPE
            )
        )(jnp.asarray(arr), jnp.asarray(lens))
        W = arr.shape[1] - bench.K + 1
        hi = jax.device_put(hi[:, :W])
        lo = jax.device_put(lo[:, :W])
        n = jax.device_put(cnt.astype(jnp.int32))
        assert int((jnp.where(hi == BIG, 0, hi) >> 31).max()) == 0, (
            "top hi bit not free — tag scheme invalid at this scaled"
        )
        staged.append((hi, lo, n))
        counts.append(n)
        total_kmers += int(np.maximum(lens - (bench.K - 1), 0).sum())

    def consume(s_hi, s_lo, dep):
        return (
            (s_lo & jnp.uint32(1)).astype(jnp.int32).sum()
            + (s_hi & jnp.uint32(1)).astype(jnp.int32).sum()
            + dep
        )

    def prod(hi, lo, n, dep):
        s_hi, s_lo = _sort_keys_64(hi ^ (dep.astype(jnp.uint32) & jnp.uint32(1)), lo)
        return consume(s_hi, s_lo, dep)

    def il2_sort(hi, lo, n):
        """Interleaved tagged sort → de-interleaved (B, W) sorted keys."""
        B, W = hi.shape
        thi = jnp.where(hi == BIG, hi, hi | (jax.lax.broadcasted_iota(
            jnp.uint32, (B, W), 0) & jnp.uint32(1)) * TAG)
        phi = thi.reshape(B // 2, 2 * W)
        plo = lo.reshape(B // 2, 2 * W)
        s_hi, s_lo = jax.lax.sort((phi, plo), num_keys=1, is_stable=False)
        tie = jnp.any(
            (s_hi[:, 1:] == s_hi[:, :-1]) & (s_lo[:, 1:] != s_lo[:, :-1])
        )
        s_hi, s_lo = jax.lax.cond(
            tie,
            lambda: jax.lax.sort((phi, plo), num_keys=2, is_stable=False),
            lambda: (s_hi, s_lo),
        )
        # de-interleave: even row at lane j, odd row at lane n_even + j
        n0 = n.reshape(B // 2, 2)[:, :1]  # (B/2, 1) even-row kept count
        j = jax.lax.broadcasted_iota(jnp.int32, (B // 2, W), 1)
        g_even = jnp.minimum(j, 2 * W - 1)
        g_odd = jnp.minimum(n0 + j, 2 * W - 1)
        e_hi = jnp.take_along_axis(s_hi, g_even, axis=1)
        e_lo = jnp.take_along_axis(s_lo, g_even, axis=1)
        o_hi = jnp.take_along_axis(s_hi, g_odd, axis=1) & ~TAG
        o_lo = jnp.take_along_axis(s_lo, g_odd, axis=1)
        n1 = n.reshape(B // 2, 2)[:, 1:]
        e_hi = jnp.where(j < n0, e_hi, BIG)
        e_lo = jnp.where(j < n0, e_lo, BIG)
        o_hi = jnp.where(j < n1, o_hi, BIG)
        o_lo = jnp.where(j < n1, o_lo, BIG)
        d_hi = jnp.stack([e_hi, o_hi], axis=1).reshape(B, W)
        d_lo = jnp.stack([e_lo, o_lo], axis=1).reshape(B, W)
        return d_hi, d_lo

    def il2(hi, lo, n, dep):
        d_hi, d_lo = il2_sort(
            hi ^ (dep.astype(jnp.uint32) & jnp.uint32(1)), lo, n
        )
        return consume(d_hi, d_lo, dep)

    # bit-equality gate: il2's de-interleaved keys must equal prod's
    # sorted keys with sentinel-masked tails on every bucket
    for hi, lo, n in staged:
        p_hi, p_lo = jax.jit(_sort_keys_64)(hi, lo)
        j = jnp.arange(hi.shape[1])[None, :]
        valid = j < n[:, None]
        p_hi = np.asarray(jnp.where(valid, p_hi, BIG))
        p_lo = np.asarray(jnp.where(valid, p_lo, BIG))
        d_hi, d_lo = jax.jit(il2_sort)(hi, lo, n)
        assert np.array_equal(np.asarray(d_hi), p_hi)
        assert np.array_equal(np.asarray(d_lo), p_lo)
    out["bit_equal"] = True

    def rate(fn, iters=10):
        jfn = jax.jit(fn)
        dep = jnp.int32(0)
        for hi, lo, n in staged:
            dep = jfn(hi, lo, n, dep)
        int(dep)  # compile + warm
        trivial = jax.jit(lambda d: d + 1)
        int(trivial(jnp.int32(0)))
        t0 = time.perf_counter()
        int(trivial(jnp.int32(1)))
        latency = time.perf_counter() - t0
        t0 = time.perf_counter()
        dep = jnp.int32(0)
        for _ in range(iters):
            for hi, lo, n in staged:
                dep = jfn(hi, lo, n, dep)
        final = int(dep)
        dt = max(time.perf_counter() - t0 - latency, 1e-9) / iters
        assert final >= 0
        return total_kmers / dt

    for rep in range(2):
        for tag, fn in (("prod", prod), ("il2", il2)):
            r = rate(fn)
            key = tag + "_Mkmers"
            out[key] = max(out.get(key, 0.0), round(r / 1e6, 1))
            print(f"rep{rep} {tag}: {r/1e6:.1f} M kmers/s", file=sys.stderr)

    out["corpus_kmers"] = total_kmers
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
