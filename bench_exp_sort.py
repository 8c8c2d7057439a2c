#!/usr/bin/env python
"""One-shot on-chip experiment: sketch-stage sort variants.

The 2-key sentinel sort is ~47% of the sketch stage (round 2 on-chip
decomposition). This measures the candidates for shrinking it, on the
real production shapes (corpus buckets, hp/k24/scaled5):

  stage            full sorted_window_hashes (current production path)
  kernel           hash kernel only (masked keys + counts, no sort)
  sort2_stable     lax.sort((hi, lo), num_keys=2)            [current]
  sort2_unstable   same with is_stable=False — stability is meaningless
                   here (equal (hi,lo) keys are indistinguishable dups)
  sort1_unstable   single-key unstable sort on hi carrying lo (order
                   within hi-ties wrong → needs host fix-up; measures
                   the comparator-cost ceiling)
  sortc_unstable   chunked (B, C, W/C) last-dim 2-key unstable sort
                   (log^2 shrink; needs a host C-way merge)

Sort variants are measured over pre-staged sentinel-masked key arrays
(the hash kernel's own output), so they isolate pure sort cost.

Run:  timeout -k 10 900 python bench_exp_sort.py
Prints one JSON line.
"""

import json
import sys
import time

import numpy as np

import bench


def sort_rate(staged, fn, total_kmers, iters=10):
    """Sustained kmers/s through `fn(hi, lo, dep) -> dep` over buckets."""
    import jax
    import jax.numpy as jnp

    jfn = jax.jit(fn)
    dep = jnp.int32(0)
    for hi, lo in staged:
        dep = jfn(hi, lo, dep)
    int(dep)  # compile + warm

    trivial = jax.jit(lambda d: d + 1)
    int(trivial(jnp.int32(0)))
    t0 = time.perf_counter()
    int(trivial(jnp.int32(1)))
    latency = time.perf_counter() - t0

    t0 = time.perf_counter()
    dep = jnp.int32(0)
    for _ in range(iters):
        for hi, lo in staged:
            dep = jfn(hi, lo, dep)
    final = int(dep)
    dt = max(time.perf_counter() - t0 - latency, 1e-9) / iters
    assert final >= 0
    return total_kmers / dt


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

    from kmerseek_tpu.ops.sketch_pallas import masked_window_keys_pallas

    seqs = bench.load_corpus()
    buckets = bench.pack_buckets(seqs)
    out = {"ok": True, "backend": jax.default_backend()}

    # full stage + kernel-only via the bench harness
    rate, total = bench.tpu_throughput(buckets, iters=10)
    out["stage_Mkmers"] = round(rate / 1e6, 1)

    # pre-stage the masked key arrays per bucket (replicated like bench)
    staged = []
    total_kmers = 0
    for arr, lens in buckets:
        rep = max(16 // max(arr.shape[0] // 512, 1), 1)
        arr = np.concatenate([arr] * rep, axis=0) if rep > 1 else arr
        lens = np.concatenate([lens] * rep) if rep > 1 else lens
        hi, lo, cnt = jax.jit(
            lambda a, l: masked_window_keys_pallas(
                a, l, k=bench.K, scaled=bench.SCALED, moltype=bench.MOLTYPE
            )
        )(jnp.asarray(arr), jnp.asarray(lens))
        W = arr.shape[1] - bench.K + 1
        hi = jax.device_put(hi[:, :W])
        lo = jax.device_put(lo[:, :W])
        staged.append((hi, lo))
        total_kmers += int(np.maximum(lens - (bench.K - 1), 0).sum())

    def consume(s_hi, s_lo, dep):
        return (
            (s_lo & jnp.uint32(1)).astype(jnp.int32).sum()
            + (s_hi & jnp.uint32(1)).astype(jnp.int32).sum()
            + dep
        )

    def sort2(hi, lo, dep, stable):
        s_hi, s_lo = jax.lax.sort(
            (hi ^ (dep.astype(jnp.uint32) & jnp.uint32(1)), lo),
            num_keys=2,
            is_stable=stable,
        )
        return consume(s_hi, s_lo, dep)

    def sort1(hi, lo, dep):
        s_hi, s_lo = jax.lax.sort(
            (hi ^ (dep.astype(jnp.uint32) & jnp.uint32(1)), lo),
            num_keys=1,
            is_stable=False,
        )
        return consume(s_hi, s_lo, dep)

    def sortc(hi, lo, dep, cw=128):
        B, W = hi.shape
        Wp = (W + cw - 1) // cw * cw
        if Wp != W:
            pad = ((0, 0), (0, Wp - W))
            big = jnp.uint32(0xFFFFFFFF)
            hi = jnp.pad(hi, pad, constant_values=big)
            lo = jnp.pad(lo, pad, constant_values=big)
        hi = (hi ^ (dep.astype(jnp.uint32) & jnp.uint32(1))).reshape(B, Wp // cw, cw)
        lo = lo.reshape(B, Wp // cw, cw)
        s_hi, s_lo = jax.lax.sort((hi, lo), num_keys=2, is_stable=False)
        return consume(s_hi, s_lo, dep)

    import functools

    variants = {
        "sort2_stable": functools.partial(sort2, stable=True),
        "sort2_unstable": functools.partial(sort2, stable=False),
        "sort1_unstable": sort1,
        "sortc128_unstable": functools.partial(sortc, cw=128),
        "sortc256_unstable": functools.partial(sortc, cw=256),
        "baseline_consume": lambda hi, lo, dep: consume(
            hi ^ (dep.astype(jnp.uint32) & jnp.uint32(1)), lo, dep
        ),
    }
    for rep in range(2):
        for tag, fn in variants.items():
            r = sort_rate(staged, fn, total_kmers, iters=10)
            key = tag + "_Mkmers"
            out[key] = max(out.get(key, 0.0), round(r / 1e6, 1))
            print(f"rep{rep} {tag}: {r/1e6:.1f} M kmers/s", file=sys.stderr)

    out["corpus_kmers"] = total_kmers
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
