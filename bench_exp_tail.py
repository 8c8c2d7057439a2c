"""On-chip experiment: sparse-kernel tail variants (scatter vs cumsum).

The sparse hit-list kernel's tail turns sorted (q, t, w) match tuples
into bounded per-pair outputs. The production tail scatter-writes four
buffers (counts add, weights add, q/t head sets). TPU scatter is the
slowest primitive in this codebase's repertoire, and all four scatters
run over the full expansion length E.

Variant under test — "cumsum tail": ONE scatter (head tuple positions
into hit slots) plus exclusive cumsums + boundary gathers:

  starts[j] = position of the j-th segment head      (the one scatter)
  ends[j]   = starts[j+1]  (or V, the valid-tuple count, for the last)
  counts[j] = ends[j] - starts[j]
  weight[j] = csw[ends[j]] - csw[starts[j]]          (csw = excl. cumsum)
  q/t[j]    = sq/st[starts[j]]                        (gathers)

int32 cumsum wraparound is harmless: differences are exact mod 2^32 and
every true segment sum fits int32 on the narrow path (the same
S·max_ab < 2^31 proof as production's narrow weight gate).

Usage: python bench_exp_tail.py [targets] [queries]
Prints per-variant steady-state block times; asserts bit-equality of
the variant outputs first.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _build_synthetic(targets=524288, sketch=128, pool_bits=22, seed=1):
    from kmerseek_tpu.ops.inverted import build_inverted

    rng = np.random.default_rng(seed)
    pool = np.unique(rng.integers(0, 2**62, size=1 << pool_bits, dtype=np.uint64))
    t_c = rng.integers(sketch // 2, sketch, size=targets).astype(np.int64)
    vals = np.sort(pool[rng.integers(0, len(pool), size=(targets, sketch))], axis=1)
    keep = np.ones_like(vals, bool)
    keep[:, 1:] = vals[:, 1:] != vals[:, :-1]
    keep &= np.arange(sketch)[None, :] < t_c[:, None]
    mins = vals[keep]
    counts = keep.sum(axis=1).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    inv = build_inverted(mins, np.ones(len(mins), np.int64), offsets)
    q64 = np.where(
        np.arange(sketch)[None, :] % 2 == 0,
        pool[rng.integers(0, len(pool), size=(512, sketch))],
        rng.integers(0, 2**62, size=(512, sketch), dtype=np.uint64),
    )
    q64 = np.sort(q64, axis=1)
    qv = np.ones((512, sketch), bool)
    qv[:, 1:] = q64[:, 1:] != q64[:, :-1]
    return inv, pool, q64, qv


def make_cumsum_tail_kernel():
    """inverted_sparse_hits twin with the cumsum tail (narrow weights)."""
    import functools

    import jax
    import jax.numpy as jnp

    from kmerseek_tpu.ops.inverted import _bucketed_lower_bound_packed

    @functools.partial(
        jax.jit,
        static_argnames=(
            "n_targets", "max_run", "capacity", "span_steps", "bucket_shift",
            "expand_e",
        ),
    )
    def kernel(
        g4, bucket_starts, q_hi, q_lo, q_valid, *,
        n_targets, max_run, capacity, span_steps, bucket_shift,
        expand_e,
    ):
        Q, S = q_hi.shape
        N = g4.shape[0]

        def lower_bound(hi, lo):
            return _bucketed_lower_bound_packed(
                g4, bucket_starts, hi, lo, span_steps, bucket_shift
            )

        pos = lower_bound(q_hi, q_lo)
        E = expand_e
        lo1 = q_lo + jnp.uint32(1)
        hi1 = q_hi + (lo1 == 0).astype(jnp.uint32)
        wrapped = (q_hi == jnp.uint32(0xFFFFFFFF)) & (q_lo == jnp.uint32(0xFFFFFFFF))
        ub = lower_bound(hi1, lo1)
        ub = jnp.where(wrapped, jnp.int32(N), ub)
        cnt = jnp.where(q_valid, ub - pos, 0)
        cnt = jnp.clip(cnt, 0, max_run)
        cntf = cnt.reshape(-1)
        lbf = pos.reshape(-1)
        offs = jnp.cumsum(cntf) - cntf
        m_total = offs[-1] + cntf[-1]
        P = cntf.shape[0]
        pid = jnp.arange(P, dtype=jnp.int32)
        seg0 = jnp.zeros(E, jnp.int32).at[offs].max(pid + 1, mode="drop")
        probe = jax.lax.cummax(seg0) - 1
        rank = jnp.arange(E, dtype=jnp.int32) - jnp.take(offs, probe)
        valid_t = rank < jnp.take(cntf, probe)
        idx = jnp.take(lbf, probe) + rank
        row = jnp.take(g4, jnp.clip(idx, 0, N - 1), axis=0)
        t = jnp.where(valid_t, row[:, 2].astype(jnp.int32), jnp.int32(n_targets))
        q_key = jnp.where(valid_t, probe // jnp.int32(S), jnp.int32(Q))
        w = jnp.where(valid_t, row[:, 3].astype(jnp.int32), 0)

        sq, st, sw = jax.lax.sort((q_key, t, w), num_keys=2, is_stable=False)
        valid = sq < Q
        prev_q = jnp.concatenate([jnp.full((1,), -1, sq.dtype), sq[:-1]])
        prev_t = jnp.concatenate([jnp.full((1,), -1, st.dtype), st[:-1]])
        head = valid & ((sq != prev_q) | (st != prev_t))
        seg = jnp.cumsum(head.astype(jnp.int32)) - 1
        n_hits = jnp.sum(head.astype(jnp.int32))
        V = jnp.sum(valid.astype(jnp.int32))

        # --- cumsum tail: ONE scatter-min + boundary gathers ---
        # head j's tuple position lands in slot j; overflow heads
        # (seg >= capacity) collapse into the extra slot, whose MIN is
        # exactly the end of stored segment capacity-1 — so counts and
        # weights of every STORED slot are exact even on overflow,
        # matching the production scatter-add semantics.
        Etup = sq.shape[0]
        head_slot = jnp.where(head, jnp.minimum(seg, capacity), capacity + 1)
        iota_e = jnp.arange(Etup, dtype=jnp.int32)
        starts_ext = jnp.full(capacity + 1, Etup, jnp.int32).at[head_slot].min(
            iota_e, mode="drop"
        )
        starts = starts_ext[:capacity]
        slot_id = jnp.arange(capacity, dtype=jnp.int32)
        live = slot_id < jnp.minimum(n_hits, capacity)
        ends = jnp.minimum(starts_ext[1:], V)
        counts = jnp.where(live, ends - starts, 0)
        wv = jnp.where(valid, sw, 0)
        csw = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(wv)]
        )  # exclusive prefix sums, length E+1; int32 wrap is mod-exact
        gstart = jnp.minimum(starts, Etup)
        weights = jnp.where(
            live, jnp.take(csw, ends) - jnp.take(csw, gstart), 0
        )
        gq = jnp.minimum(starts, Etup - 1)
        q_out = jnp.where(live, jnp.take(sq, gq), Q)
        t_out = jnp.where(live, jnp.take(st, gq), n_targets)
        stats = jnp.stack([n_hits, m_total.astype(jnp.int32)])
        return q_out, t_out, counts, weights, stats

    return kernel


def main():
    targets = int(sys.argv[1]) if len(sys.argv) > 1 else 524288
    import jax
    import jax.numpy as jnp

    from kmerseek_tpu.ops.inverted import device_postings
    from kmerseek_tpu.ops.sparse_search import (
        _expand_budget,
        inverted_sparse_hits,
    )

    print("building synthetic index...", flush=True)
    t0 = time.perf_counter()
    inv, pool, q64, qv = _build_synthetic(targets=targets)
    print(f"build {time.perf_counter()-t0:.1f}s postings={inv.n_postings} max_run={inv.max_run}", flush=True)

    q_hi = jnp.asarray((q64 >> np.uint64(32)).astype(np.uint32))
    q_lo = jnp.asarray((q64 & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    q_valid = jnp.asarray(qv)
    Qc = 128
    binv, g4, bucket_starts = device_postings(inv)
    S = q_hi.shape[1]
    max_run = int(inv.max_run)
    E = _expand_budget(inv, Qc, S, max_run)
    cap = 256 * 1024
    kw = dict(
        n_targets=binv.n_targets, max_run=max_run, capacity=cap,
        span_steps=max(int(binv.max_span).bit_length(), 1),
        bucket_shift=binv.bucket_shift,
    )
    qh, ql, qv_ = q_hi[:Qc], q_lo[:Qc], q_valid[:Qc]

    cumsum_kernel = make_cumsum_tail_kernel()

    # production kernel, narrow + wide
    def run_prod(wide):
        return inverted_sparse_hits(
            g4, bucket_starts, qh, ql, qv_, run_offset=0, expand_e=E,
            wide_weights=wide, **kw
        )

    def run_cumsum():
        return cumsum_kernel(g4, bucket_starts, qh, ql, qv_, expand_e=E, **kw)

    # bit-equality first
    qo, to, co, wo, st = (np.asarray(x) for x in run_prod(False))
    qo2, to2, co2, wo2, st2 = (np.asarray(x) for x in run_cumsum())
    n = int(st[0])
    assert int(st2[0]) == n, (st, st2)
    assert np.array_equal(qo[:n], qo2[:n])
    assert np.array_equal(to[:n], to2[:n])
    assert np.array_equal(co[:n], co2[:n])
    assert np.array_equal(wo[:n], wo2[:n]), "weights differ"
    print(f"bit-equal ok over {n} hits, E={E}", flush=True)

    def bench(f, label, iters=30):
        f()  # warm
        outs = None
        t0 = time.perf_counter()
        for _ in range(iters):
            outs = f()
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / iters
        print(f"{label:16s} {dt*1e3:8.2f} ms/block  ({Qc/dt:8.0f} q/s kernel-only)", flush=True)
        return dt

    bench(lambda: run_prod(True), "prod wide")
    bench(lambda: run_prod(False), "prod narrow")
    bench(run_cumsum, "cumsum tail")
    bench(lambda: run_prod(False), "prod narrow #2")


if __name__ == "__main__" and len(sys.argv) <= 2:
    main()


def profile_production(targets=524288):
    """Decompose production sparse_search wall time at several q_chunks."""
    import jax
    import jax.numpy as jnp

    from kmerseek_tpu.ops.sparse_search import sparse_search

    print("building synthetic index...", flush=True)
    t0 = time.perf_counter()
    inv, pool, q64, qv = _build_synthetic(targets=targets)
    print(f"build {time.perf_counter()-t0:.1f}s postings={inv.n_postings}", flush=True)

    class _Idx:
        inverted = inv

    q_hi = jnp.asarray((q64 >> np.uint64(32)).astype(np.uint32))
    q_lo = jnp.asarray((q64 & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    q_valid = jnp.asarray(qv)
    Q = q_hi.shape[0]
    for qc in (64, 128, 256, 512):
        sparse_search(_Idx(), q_hi, q_lo, q_valid, q_chunk=qc)  # compile+learn
        best = None
        for _ in range(5):
            t0 = time.perf_counter()
            hits = sparse_search(_Idx(), q_hi, q_lo, q_valid, q_chunk=qc)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"q_chunk={qc:4d}: {best*1e3:7.1f} ms  {Q/best:7.0f} q/s  hits={hits.n_hits}", flush=True)


if __name__ == "__main__" and len(sys.argv) > 2 and sys.argv[2] == "profile":
    profile_production(int(sys.argv[1]))


def packed_key_variant():
    """Kernel twin: pack (q, t) into ONE int32 sort key.

    MEASURED AND REJECTED on-chip (2026-08-19, 50M postings): dead even
    with the production 2-key unstable sort at both 128- and 512-query
    blocks (9.10 vs 9.10, 33.6 vs 33.6 ms/block) — unlike the sketch
    stage's hi-word fast path, collapsing the comparator here buys
    nothing (the sort is bandwidth-bound on the 3-operand permute, not
    comparator-bound). Kept as the documented negative result.

    q < 2^15 and q·(T+1)+t < 2^31 at every production shape up to
    ~4k-query blocks over 500k+ targets, so the 2-key 3-operand sort
    collapses to a single-key sort with w as the only payload; q and t
    unpack afterwards by one divide (a multiply on TPU) and one
    multiply-subtract. Sentinels: invalid tuples carry key = Q·(T+1)
    which sinks to the end exactly like the (Q, t) sentinel pair."""
    import functools

    import jax
    import jax.numpy as jnp

    from kmerseek_tpu.ops.inverted import _bucketed_lower_bound_packed

    @functools.partial(
        jax.jit,
        static_argnames=(
            "n_targets", "max_run", "capacity", "span_steps", "bucket_shift",
            "expand_e",
        ),
    )
    def kernel(
        g4, bucket_starts, q_hi, q_lo, q_valid, *,
        n_targets, max_run, capacity, span_steps, bucket_shift,
        expand_e,
    ):
        Q, S = q_hi.shape
        N = g4.shape[0]
        T1 = n_targets + 1

        def lower_bound(hi, lo):
            return _bucketed_lower_bound_packed(
                g4, bucket_starts, hi, lo, span_steps, bucket_shift
            )

        pos = lower_bound(q_hi, q_lo)
        E = expand_e
        lo1 = q_lo + jnp.uint32(1)
        hi1 = q_hi + (lo1 == 0).astype(jnp.uint32)
        wrapped = (q_hi == jnp.uint32(0xFFFFFFFF)) & (q_lo == jnp.uint32(0xFFFFFFFF))
        ub = lower_bound(hi1, lo1)
        ub = jnp.where(wrapped, jnp.int32(N), ub)
        cnt = jnp.where(q_valid, ub - pos, 0)
        cnt = jnp.clip(cnt, 0, max_run)
        cntf = cnt.reshape(-1)
        lbf = pos.reshape(-1)
        offs = jnp.cumsum(cntf) - cntf
        m_total = offs[-1] + cntf[-1]
        P = cntf.shape[0]
        pid = jnp.arange(P, dtype=jnp.int32)
        seg0 = jnp.zeros(E, jnp.int32).at[offs].max(pid + 1, mode="drop")
        probe = jax.lax.cummax(seg0) - 1
        rank = jnp.arange(E, dtype=jnp.int32) - jnp.take(offs, probe)
        valid_t = rank < jnp.take(cntf, probe)
        idx = jnp.take(lbf, probe) + rank
        row = jnp.take(g4, jnp.clip(idx, 0, N - 1), axis=0)
        t = row[:, 2].astype(jnp.int32)
        qk = probe // jnp.int32(S)
        # ONE packed key; invalid → Q*T1 (max, sinks to end)
        key = jnp.where(valid_t, qk * jnp.int32(T1) + t, jnp.int32(Q) * jnp.int32(T1))
        w = jnp.where(valid_t, row[:, 3].astype(jnp.int32), 0)

        skey, sw = jax.lax.sort((key, w), num_keys=1, is_stable=False)
        sq = skey // jnp.int32(T1)
        st = skey - sq * jnp.int32(T1)
        valid = sq < Q
        prev = jnp.concatenate([jnp.full((1,), -1, skey.dtype), skey[:-1]])
        head = valid & (skey != prev)
        seg = jnp.cumsum(head.astype(jnp.int32)) - 1
        n_hits = jnp.sum(head.astype(jnp.int32))

        slot = jnp.where(valid, seg, capacity)
        counts = jnp.zeros(capacity, jnp.int32).at[slot].add(
            valid.astype(jnp.int32), mode="drop"
        )
        wv = jnp.where(valid, sw, 0)
        weights = jnp.zeros(capacity, jnp.int32).at[slot].add(wv, mode="drop")
        head_slot = jnp.where(head, seg, capacity)
        q_out = jnp.full(capacity, Q, jnp.int32).at[head_slot].set(sq, mode="drop")
        t_out = jnp.full(capacity, n_targets, jnp.int32).at[head_slot].set(
            st, mode="drop"
        )
        stats = jnp.stack([n_hits, m_total.astype(jnp.int32)])
        return q_out, t_out, counts, weights, stats

    return kernel


def main_packed():
    targets = int(sys.argv[1]) if len(sys.argv) > 1 else 524288
    import jax
    import jax.numpy as jnp

    from kmerseek_tpu.ops.inverted import device_postings
    from kmerseek_tpu.ops.sparse_search import (
        _expand_budget,
        inverted_sparse_hits,
    )

    print("building synthetic index...", flush=True)
    t0 = time.perf_counter()
    inv, pool, q64, qv = _build_synthetic(targets=targets)
    print(f"build {time.perf_counter()-t0:.1f}s postings={inv.n_postings}", flush=True)

    q_hi = jnp.asarray((q64 >> np.uint64(32)).astype(np.uint32))
    q_lo = jnp.asarray((q64 & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    q_valid = jnp.asarray(qv)
    binv, g4, bucket_starts = device_postings(inv)
    S = q_hi.shape[1]
    max_run = int(inv.max_run)
    packed = packed_key_variant()
    for Qc in (128, 512):
        E = _expand_budget(inv, Qc, S, max_run)
        cap = 512 * 1024
        kw = dict(
            n_targets=binv.n_targets, max_run=max_run, capacity=cap,
            span_steps=max(int(binv.max_span).bit_length(), 1),
            bucket_shift=binv.bucket_shift,
        )
        qh, ql, qv_ = q_hi[:Qc], q_lo[:Qc], q_valid[:Qc]

        def run_prod():
            return inverted_sparse_hits(
                g4, bucket_starts, qh, ql, qv_, run_offset=0, expand_e=E,
                wide_weights=False, **kw
            )

        def run_packed():
            return packed(g4, bucket_starts, qh, ql, qv_, expand_e=E, **kw)

        a = [np.asarray(x) for x in run_prod()]
        b = [np.asarray(x) for x in run_packed()]
        n = int(a[4][0])
        assert int(b[4][0]) == n
        for x, y in zip(a[:4], b[:4]):
            assert np.array_equal(x[:n], y[:n].astype(x.dtype)), "mismatch"
        print(f"Qc={Qc}: bit-equal over {n} hits, E={E}", flush=True)

        def bench(f, label, iters=30):
            f()
            outs = None
            t0 = time.perf_counter()
            for _ in range(iters):
                outs = f()
            jax.block_until_ready(outs)
            dt = (time.perf_counter() - t0) / iters
            print(f"  {label:12s} {dt*1e3:8.2f} ms/block ({Qc/dt:8.0f} q/s kernel-only)", flush=True)

        bench(run_prod, "prod 2-key")
        bench(run_packed, "packed 1-key")


if __name__ == "__main__" and len(sys.argv) > 2 and sys.argv[2] == "packed":
    main_packed()
