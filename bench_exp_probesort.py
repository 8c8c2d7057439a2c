"""On-chip experiment: probe-locality sort (ROADMAP post-r5 candidate #2).

The sparse kernel's probe stage (bucketed lower bound + narrowed
hash+1 upper-bound bisect) is ~47 ms of the 121 ms fast-window block
wall (docs/ROADMAP.md r5 budget split). Query sketches arrive with
each ROW's S hashes already ascending (FracMinHash mins are stored
sorted), but the Q rows interleave arbitrary hash ranges, so
consecutive probe lanes jump across the posting array.

Variant under test — globally sort the Q·S flattened probes by
(hi, lo) with an iota rider, run both bisect stages on the sorted
probes, then inverse-permute pos/cnt back to probe order. Adds two
65k-lane 3-operand sorts (cheap); wins only if HBM gather cost drops
when consecutive lanes touch adjacent posting rows. The prior 2^22
bucket-table experiment (+3%) bounds how much probe-side locality is
worth on this chip, and TPU gathers are per-element rather than
cache-line — so the expectation is neutral; this run pins the number.

Usage: python bench_exp_probesort.py [targets]
Asserts pos/cnt equality of the two formulations, then prints
steady-state probe-stage times.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bench_exp_tail import _build_synthetic  # noqa: E402


def main():
    targets = int(sys.argv[1]) if len(sys.argv) > 1 else 524288
    import jax
    import jax.numpy as jnp

    from kmerseek_tpu.ops.inverted import (
        _bisect_rounds_packed,
        _bucketed_lower_bound_packed,
        device_postings,
    )

    print("building synthetic index...", flush=True)
    t0 = time.perf_counter()
    inv, pool, q64, qv = _build_synthetic(targets=targets)
    print(
        f"build {time.perf_counter() - t0:.1f}s postings={inv.n_postings} "
        f"max_run={inv.max_run}",
        flush=True,
    )

    q_hi = jnp.asarray((q64 >> np.uint64(32)).astype(np.uint32))
    q_lo = jnp.asarray((q64 & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    binv, g4, bucket_starts = device_postings(inv)
    N = g4.shape[0]
    span_steps = max(int(binv.max_span).bit_length(), 1)
    shift = binv.bucket_shift
    true_max_run = int(inv.max_run)
    ub_steps = max(true_max_run.bit_length(), 1)

    def probe_stage(hi, lo):
        """lower bound + exact-run-length upper bound, as in
        _sparse_hits_core's compact path (sparse_search.py:151-233)."""
        pos = _bucketed_lower_bound_packed(g4, bucket_starts, hi, lo, span_steps, shift)
        lo1 = lo + jnp.uint32(1)
        hi1 = hi + (lo1 == 0).astype(jnp.uint32)
        wrapped = (hi == jnp.uint32(0xFFFFFFFF)) & (lo == jnp.uint32(0xFFFFFFFF))
        ub = _bisect_rounds_packed(
            g4, hi1, lo1, pos, jnp.minimum(pos + jnp.int32(true_max_run), N), ub_steps
        )
        ub = jnp.where(wrapped, jnp.int32(N), ub)
        return pos, ub - pos

    @jax.jit
    def plain(hi, lo):
        pos, cnt = probe_stage(hi, lo)
        return pos, cnt

    @jax.jit
    def probesorted(hi, lo):
        Q, S = hi.shape
        P = Q * S
        rider = jnp.arange(P, dtype=jnp.int32)
        shi, slo, perm = jax.lax.sort(
            (hi.reshape(-1), lo.reshape(-1), rider), num_keys=2
        )
        pos, cnt = probe_stage(shi.reshape(1, P), slo.reshape(1, P))
        # inverse permutation via a second sort keyed on the rider —
        # sort beats scatter on this chip everywhere it was measured
        _, pos_o, cnt_o = jax.lax.sort(
            (perm, pos.reshape(-1), cnt.reshape(-1)), num_keys=1
        )
        return pos_o.reshape(Q, S), cnt_o.reshape(Q, S)

    Qc = 512
    qh, ql = q_hi[:Qc], q_lo[:Qc]

    p0, c0 = (np.asarray(x) for x in plain(qh, ql))
    p1, c1 = (np.asarray(x) for x in probesorted(qh, ql))
    assert np.array_equal(p0, p1) and np.array_equal(c0, c1)
    print(f"pos/cnt equal over {p0.size} probes", flush=True)

    def bench(f, label, iters=50):
        f(qh, ql)
        t0 = time.perf_counter()
        outs = None
        for _ in range(iters):
            outs = f(qh, ql)
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / iters
        print(f"{label:12s} {dt * 1e3:8.2f} ms/block ({Qc} q)", flush=True)
        return dt

    a = bench(plain, "plain")
    b = bench(probesorted, "probe-sorted")
    bench(plain, "plain #2")
    print(f"ratio sorted/plain = {b / a:.3f}", flush=True)


if __name__ == "__main__":
    main()
