"""Inverted-index search engine vs the per-pair reference engine."""

import jax.numpy as jnp
import numpy as np
import pytest

from kmerseek_tpu.ops import u64
from kmerseek_tpu.ops.intersect import pairwise_stats
from kmerseek_tpu.ops.inverted import (
    build_inverted_np,
    inverted_pair_stats,
)


def _make_indexes(rng, T, S_real, universe, dup_heavy=False):
    """Random target sketches; optionally force heavy hash sharing."""
    sketches = []
    for _ in range(T):
        n = rng.integers(max(S_real // 2, 1), S_real + 1)
        vals = np.unique(rng.integers(0, universe, n).astype(np.uint64) * np.uint64(2**32))
        sketches.append(vals)
    return sketches


def _csr(sketches):
    offsets = np.zeros(len(sketches) + 1, np.int64)
    for i, s in enumerate(sketches):
        offsets[i + 1] = offsets[i] + len(s)
    mins = np.concatenate(sketches) if sketches else np.zeros(0, np.uint64)
    ab = np.ones(len(mins), np.int64)
    return mins, ab, offsets


def _dense_q(sketches, S):
    Q = len(sketches)
    hi = np.full((Q, S), 0xFFFFFFFF, np.uint32)
    lo = np.full((Q, S), 0xFFFFFFFF, np.uint32)
    valid = np.zeros((Q, S), bool)
    for i, sk in enumerate(sketches):
        h, l = u64.split_np(np.sort(sk))
        hi[i, : len(sk)] = h
        lo[i, : len(sk)] = l
        valid[i, : len(sk)] = True
    return jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(valid)


@pytest.mark.parametrize("universe,tag", [(10_000, "sparse"), (50, "dup-heavy")])
def test_inverted_matches_pairwise(universe, tag):
    rng = np.random.default_rng(0)
    targets = _make_indexes(rng, 23, 24, universe)
    queries = _make_indexes(rng, 5, 16, universe)
    mins, ab, offsets = _csr(targets)
    inv = build_inverted_np(mins, ab, offsets)
    q_hi, q_lo, q_valid = _dense_q(queries, 32)

    counts, weights = inverted_pair_stats(
        jnp.asarray(inv.g_hi),
        jnp.asarray(inv.g_lo),
        jnp.asarray(inv.tid),
        jnp.asarray(inv.ab),
        q_hi,
        q_lo,
        q_valid,
        n_targets=inv.n_targets,
        max_run=inv.max_run,
    )

    # reference: per-pair engine
    St = max(len(t) for t in targets)
    t_hi = np.full((23, 32), 0xFFFFFFFF, np.uint32)
    t_lo = np.full((23, 32), 0xFFFFFFFF, np.uint32)
    t_ab = np.zeros((23, 32), np.int32)
    t_c = np.zeros(23, np.int32)
    for i, t in enumerate(targets):
        h, l = u64.split_np(np.sort(t))
        t_hi[i, : len(t)] = h
        t_lo[i, : len(t)] = l
        t_ab[i, : len(t)] = 1
        t_c[i] = len(t)
    q_counts = jnp.asarray(np.array([len(q) for q in queries], np.int32))
    ref = pairwise_stats(
        q_hi,
        q_lo,
        q_counts,
        jnp.asarray(t_hi),
        jnp.asarray(t_lo),
        jnp.asarray(t_ab),
        jnp.asarray(t_c),
    )
    assert np.array_equal(np.asarray(counts), np.asarray(ref.intersect)), tag
    assert np.array_equal(np.asarray(weights), np.asarray(ref.weighted)), tag
    if tag == "dup-heavy":
        assert inv.max_run > 3  # the run expansion is actually exercised


def test_inverted_empty_and_extremes():
    mins = np.array([0, 5, 2**64 - 2], np.uint64)
    ab = np.array([3, 1, 7], np.int64)
    offsets = np.array([0, 2, 3], np.int64)
    inv = build_inverted_np(mins, ab, offsets)
    q_hi, q_lo, q_valid = _dense_q([np.array([0, 2**64 - 2], np.uint64)], 8)
    counts, weights = inverted_pair_stats(
        jnp.asarray(inv.g_hi),
        jnp.asarray(inv.g_lo),
        jnp.asarray(inv.tid),
        jnp.asarray(inv.ab),
        q_hi,
        q_lo,
        q_valid,
        n_targets=2,
        max_run=inv.max_run,
    )
    assert np.asarray(counts).tolist() == [[1, 1]]
    assert np.asarray(weights).tolist() == [[3, 7]]


def test_bucketed_lower_bound_bit_equal():
    """The bucketed fast path must be bit-equal to the full binary
    search across random corpora (including dense-collision pools)."""
    import jax.numpy as jnp

    from kmerseek_tpu.ops.inverted import (
        build_inverted_np,
        inverted_pair_stats,
        inverted_pair_stats_bucketed,
    )

    rng = np.random.default_rng(21)
    for pool_size in (50, 5000):
        pool = np.sort(
            rng.choice(
                np.uint64(2) ** 62, size=pool_size, replace=False
            ).astype(np.uint64)
        )
        T, S = 40, 24
        ids = np.sort(rng.integers(0, pool_size, size=(T, S)), axis=1)
        keep = np.ones_like(ids, bool)
        keep[:, 1:] = ids[:, 1:] != ids[:, :-1]
        counts = keep.sum(axis=1)
        mins = pool[ids[keep]]
        offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        inv = build_inverted_np(mins, np.ones(len(mins), np.int64), offsets)
        assert inv.bucket_starts is not None and inv.max_span >= 1

        q_ids = np.sort(rng.integers(0, pool_size, size=(8, S)), axis=1)
        qk = np.ones_like(q_ids, bool)
        qk[:, 1:] = q_ids[:, 1:] != q_ids[:, :-1]
        q64 = np.where(qk, pool[q_ids], np.uint64(2**64 - 1))
        q_hi = jnp.asarray((q64 >> np.uint64(32)).astype(np.uint32))
        q_lo = jnp.asarray((q64 & np.uint64(0xFFFFFFFF)).astype(np.uint32))
        q_valid = jnp.asarray(qk)

        args = (
            jnp.asarray(inv.g_hi), jnp.asarray(inv.g_lo),
            jnp.asarray(inv.tid), jnp.asarray(inv.ab),
        )
        n0, w0 = inverted_pair_stats(
            *args, q_hi, q_lo, q_valid,
            n_targets=inv.n_targets, max_run=inv.max_run,
        )
        n1, w1 = inverted_pair_stats_bucketed(
            *args, jnp.asarray(inv.bucket_starts), q_hi, q_lo, q_valid,
            n_targets=inv.n_targets, max_run=inv.max_run,
            span_steps=max(int(inv.max_span).bit_length(), 1),
            bucket_shift=inv.bucket_shift,
        )
        assert np.array_equal(np.asarray(n0), np.asarray(n1))
        assert np.array_equal(np.asarray(w0), np.asarray(w1))


def test_packed_engine_bit_equal():
    """The interleaved (N,4) packed engine must match the plain engine
    bit-for-bit."""
    import jax.numpy as jnp

    from kmerseek_tpu.ops.inverted import (
        build_inverted_np,
        inverted_pair_stats,
        inverted_pair_stats_packed,
    )

    rng = np.random.default_rng(51)
    pool = np.sort(
        rng.choice(np.uint64(2) ** 62, size=800, replace=False).astype(np.uint64)
    )
    T, S = 50, 24
    ids = np.sort(rng.integers(0, len(pool), size=(T, S)), axis=1)
    keep = np.ones_like(ids, bool)
    keep[:, 1:] = ids[:, 1:] != ids[:, :-1]
    counts = keep.sum(axis=1)
    mins = pool[ids[keep]]
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    ab = rng.integers(1, 9, size=len(mins)).astype(np.int64)
    inv = build_inverted_np(mins, ab, offsets)

    q_ids = np.sort(rng.integers(0, len(pool), size=(12, S)), axis=1)
    qk = np.ones_like(q_ids, bool)
    qk[:, 1:] = q_ids[:, 1:] != q_ids[:, :-1]
    q64 = np.where(qk, pool[q_ids], np.uint64(2**64 - 1))
    q_hi = jnp.asarray((q64 >> np.uint64(32)).astype(np.uint32))
    q_lo = jnp.asarray((q64 & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    q_valid = jnp.asarray(qk)

    n0, w0 = inverted_pair_stats(
        jnp.asarray(inv.g_hi), jnp.asarray(inv.g_lo),
        jnp.asarray(inv.tid), jnp.asarray(inv.ab),
        q_hi, q_lo, q_valid,
        n_targets=inv.n_targets, max_run=inv.max_run,
    )
    n1, w1 = inverted_pair_stats_packed(
        jnp.asarray(inv.packed()), jnp.asarray(inv.bucket_starts),
        q_hi, q_lo, q_valid,
        n_targets=inv.n_targets, max_run=inv.max_run,
        span_steps=max(int(inv.max_span).bit_length(), 1),
        bucket_shift=inv.bucket_shift,
    )
    assert np.array_equal(np.asarray(n0), np.asarray(n1))
    assert np.array_equal(np.asarray(w0), np.asarray(w1))


def test_device_postings_cache_reuses_arrays():
    """Repeated searches against one index must not re-upload postings.

    The cache is keyed on the identity of the host g_hi array, so the
    same InvertedIndex yields the *same* device (g4, bucket) arrays, a
    bucketless view over the same postings still hits, and a different
    index gets fresh arrays."""
    from kmerseek_tpu.ops.inverted import InvertedIndex, device_postings

    rng = np.random.default_rng(3)
    mins = np.sort(rng.integers(0, 2**62, size=40, dtype=np.uint64))
    ab = np.ones(40, np.int64)
    offsets = np.array([0, 20, 40], np.int64)
    inv = build_inverted_np(mins, ab, offsets)

    a = device_postings(inv)
    b = device_postings(inv)
    assert all(x is y for x, y in zip(a, b))
    # a bucketless NamedTuple over the SAME posting arrays must not
    # re-upload (device_postings attaches the table itself)
    bare = InvertedIndex(
        inv.g_hi, inv.g_lo, inv.tid, inv.ab, inv.n_targets, inv.max_run
    )
    assert device_postings(bare)[1] is a[1]

    inv2 = build_inverted_np(mins.copy(), ab, offsets)
    c = device_postings(inv2)
    assert c[1] is not a[1]
    # original entry still cached (2 slots)
    assert device_postings(inv)[1] is a[1]


@pytest.mark.parametrize("seed", range(6))
def test_randomized_engines_match_host_oracle(seed):
    """Production engines vs a direct host oracle on randomized corpora.

    Each seed draws a different corpus shape: universe size (dup-heavy
    through sparse), random abundances 1..5, and a fraction of empty
    target/query sketches. The packed dense engine (the production
    ``inverted_search`` path) and the sparse hit-list engine must both
    reproduce per-pair ``np.intersect1d`` counts and target-abundance
    weighted sums exactly."""
    from kmerseek_tpu.ops.inverted import device_postings, inverted_pair_stats_packed
    from kmerseek_tpu.ops.sparse_search import sparse_search

    rng = np.random.default_rng(100 + seed)
    universe = int(rng.choice([30, 200, 5_000]))
    T, Q = int(rng.integers(5, 30)), int(rng.integers(2, 8))

    def draw(n):
        out = []
        for _ in range(n):
            k = int(rng.integers(0, 20))
            if rng.random() < 0.15:
                k = 0  # empty sketch
            vals = np.unique(
                rng.integers(0, universe, k).astype(np.uint64) * np.uint64(2**33 + 7)
            )
            out.append(vals)
        return out

    targets, queries = draw(T), draw(Q)
    t_ab = [rng.integers(1, 6, size=len(t)).astype(np.int64) for t in targets]

    mins, _, offsets = _csr(targets)
    ab = np.concatenate(t_ab) if len(mins) else np.zeros(0, np.int64)
    inv = build_inverted_np(mins, ab, offsets)
    S = max(max((len(q) for q in queries), default=1), 1)
    S = ((S + 7) // 8) * 8
    q_hi, q_lo, q_valid = _dense_q(queries, S)

    # host oracle
    want_n = np.zeros((Q, T), np.int64)
    want_w = np.zeros((Q, T), np.int64)
    for i, q in enumerate(queries):
        for j, t in enumerate(targets):
            inter = np.intersect1d(q, t)
            want_n[i, j] = len(inter)
            want_w[i, j] = t_ab[j][np.isin(t, inter)].sum()

    if len(mins):
        binv, g4, starts = device_postings(inv)
        n, w = inverted_pair_stats_packed(
            g4, starts, q_hi, q_lo, q_valid,
            n_targets=binv.n_targets, max_run=binv.max_run,
            span_steps=max(int(binv.max_span).bit_length(), 1),
            bucket_shift=binv.bucket_shift,
        )
        assert np.array_equal(np.asarray(n), want_n)
        assert np.array_equal(np.asarray(w), want_w)

    class _Idx:
        inverted = inv

    hits = sparse_search(_Idx(), q_hi, q_lo, q_valid)
    got_n = np.zeros((Q, T), np.int64)
    got_w = np.zeros((Q, T), np.int64)
    got_n[hits.q, hits.t] = hits.count
    got_w[hits.q, hits.t] = hits.weight
    assert hits.n_hits == int((want_n > 0).sum())
    assert np.array_equal(got_n, want_n)
    assert np.array_equal(got_w, want_w)


def test_clear_device_postings_evicts():
    from kmerseek_tpu.ops.inverted import (
        _DEVICE_CACHE, clear_device_postings, device_postings,
    )

    rng = np.random.default_rng(9)
    mins = np.sort(rng.integers(0, 2**62, size=16, dtype=np.uint64))
    inv = build_inverted_np(mins, np.ones(16, np.int64), np.array([0, 16], np.int64))
    a = device_postings(inv)
    assert id(inv.g_hi) in _DEVICE_CACHE
    clear_device_postings(inv)
    assert id(inv.g_hi) not in _DEVICE_CACHE
    b = device_postings(inv)  # re-uploads cleanly
    assert b[1] is not a[1]
    clear_device_postings()
    assert not _DEVICE_CACHE
