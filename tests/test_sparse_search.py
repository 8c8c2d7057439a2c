"""Sparse hit-list engine vs the dense inverted engine (bit-equality)
and the 1M-target scale case that the dense engine cannot hold.
"""

import numpy as np
import pytest

from kmerseek_tpu.core.index import IndexConfig, ProteomeIndex
from kmerseek_tpu.ops.sparse_search import sparse_search


def _mk_index(n_rows, row_len, pool, seed):
    r = np.random.default_rng(seed)
    ids = np.sort(r.integers(0, len(pool), size=(n_rows, row_len)), axis=1)
    keep = np.ones_like(ids, bool)
    keep[:, 1:] = ids[:, 1:] != ids[:, :-1]
    counts = keep.sum(axis=1)
    mins = pool[ids[keep]]
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    ab = (r.integers(1, 5, size=len(mins))).astype(np.int64)
    names = [f"p{i}" for i in range(n_rows)]
    return ProteomeIndex(IndexConfig(16, 5, "hp"), names, mins, ab, offsets)


def _query_block(index):
    import jax.numpy as jnp

    q_hi, q_lo, _ab, counts = index.dense_device_arrays()
    S = q_hi.shape[1]
    q_valid = jnp.asarray(np.arange(S)[None, :] < index.counts[:, None])
    return q_hi, q_lo, q_valid


def _densify(hits, Q, T):
    n = np.zeros((Q, T), np.int64)
    w = np.zeros((Q, T), np.int64)
    n[hits.q, hits.t] = hits.count
    w[hits.q, hits.t] = hits.weight
    return n, w


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_sparse_matches_dense(seed):
    from kmerseek_tpu.ops.inverted import inverted_search

    rng = np.random.default_rng(100 + seed)
    pool = np.sort(
        rng.choice(np.uint64(2) ** 62, size=400, replace=False).astype(np.uint64)
    )
    target = _mk_index(60, 20, pool, seed)
    query = _mk_index(25, 15, pool, seed + 50)
    q_hi, q_lo, q_valid = _query_block(query)

    nd, wd = inverted_search(target, q_hi, q_lo, q_valid)
    nd, wd = np.asarray(nd), np.asarray(wd)
    hits = sparse_search(target, q_hi, q_lo, q_valid)
    assert hits.n_hits == int(np.count_nonzero(nd))
    assert len(hits.q) == hits.n_hits  # default capacity never overflows
    # (q, t) ascending and unique
    key = hits.q.astype(np.int64) * len(target) + hits.t
    assert np.all(np.diff(key) > 0)
    ns, ws = _densify(hits, len(query), len(target))
    assert np.array_equal(ns, nd)
    assert np.array_equal(ws, wd)


def test_sparse_overflow_reports_true_count():
    rng = np.random.default_rng(3)
    pool = np.sort(
        rng.choice(np.uint64(2) ** 62, size=100, replace=False).astype(np.uint64)
    )
    target = _mk_index(40, 20, pool, 4)
    query = _mk_index(20, 15, pool, 5)
    q_hi, q_lo, q_valid = _query_block(query)
    full = sparse_search(target, q_hi, q_lo, q_valid)
    assert full.n_hits > 128
    small = sparse_search(target, q_hi, q_lo, q_valid, capacity=128)
    assert small.n_hits == full.n_hits  # true count still reported
    assert len(small.q) == 128  # trimmed to capacity
    # surviving slots are the first 128 pairs, bit-equal
    assert np.array_equal(small.q, full.q[:128])
    assert np.array_equal(small.count, full.count[:128])


def test_manysearch_sparse_validation_runs(monkeypatch):
    """manysearch's device cross-check runs the sparse hit-list engine
    (the production validation engine) and rows are unchanged when the
    check is skipped via KMERSEEK_SEARCH_VALIDATE=0."""
    import kmerseek_tpu.ops.sparse_search as sp
    from kmerseek_tpu.core.search import manysearch

    rng = np.random.default_rng(11)
    pool = np.sort(
        rng.choice(np.uint64(2) ** 62, size=300, replace=False).astype(np.uint64)
    )
    target = _mk_index(50, 20, pool, 6)
    query = _mk_index(10, 15, pool, 7)
    calls = []
    real = sp.sparse_search

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(sp, "sparse_search", spy)
    validated_rows = manysearch(query, target)
    assert calls, "sparse validation engine was not invoked"
    monkeypatch.setenv("KMERSEEK_SEARCH_VALIDATE", "0")
    unvalidated_rows = manysearch(query, target)
    assert unvalidated_rows == validated_rows
    assert len(validated_rows) > 0


def test_million_target_index_no_dense_matrix():
    """1M-target search: dense (Q, T) would be ~1 GB of HBM for 32
    queries; the sparse engine's footprint is O(Q*S*max_run)."""
    rng = np.random.default_rng(9)
    T = 1_000_000
    # two hashes per target from a huge pool: collisions (max_run) stay
    # small, postings = 2M
    mins2 = rng.choice(
        np.uint64(2) ** 62, size=(T, 2), replace=False
    ).astype(np.uint64)
    mins2.sort(axis=1)
    mins = mins2.reshape(-1)
    offsets = (np.arange(T + 1, dtype=np.int64)) * 2
    ab = np.ones(len(mins), np.int64)
    target = ProteomeIndex(
        IndexConfig(16, 5, "hp"), [f"t{i}" for i in range(T)], mins, ab, offsets
    )

    # queries: each holds hashes of known targets → exact expected hits
    picks = rng.choice(T, size=(32, 8), replace=False)
    q_mins = np.sort(mins2[picks, 0], axis=1)
    q_offsets = np.arange(33, dtype=np.int64) * 8
    query = ProteomeIndex(
        IndexConfig(16, 5, "hp"),
        [f"q{i}" for i in range(32)],
        q_mins.reshape(-1),
        np.ones(32 * 8, np.int64),
        q_offsets,
    )
    q_hi, q_lo, q_valid = _query_block(query)
    hits = sparse_search(target, q_hi, q_lo, q_valid)
    # every planted (query, target) pair must be found with count >= 1
    expect = {(qi, int(t)) for qi in range(32) for t in picks[qi]}
    got = set(zip(hits.q.tolist(), hits.t.tolist()))
    assert expect <= got
    assert hits.n_hits == len(got)


def test_chunked_query_blocks_bit_equal():
    """q_chunk processing (large query blocks) must concatenate to the
    exact unchunked hit list, including the padded final chunk."""
    rng = np.random.default_rng(31)
    pool = np.sort(
        rng.choice(np.uint64(2) ** 62, size=500, replace=False).astype(np.uint64)
    )
    target = _mk_index(80, 20, pool, 8)
    query = _mk_index(37, 12, pool, 9)  # 37 % 8 != 0 → padded last chunk
    q_hi, q_lo, q_valid = _query_block(query)
    full = sparse_search(target, q_hi, q_lo, q_valid)
    chunked = sparse_search(target, q_hi, q_lo, q_valid, q_chunk=8)
    assert chunked.n_hits == full.n_hits
    assert np.array_equal(chunked.q, full.q)
    assert np.array_equal(chunked.t, full.t)
    assert np.array_equal(chunked.count, full.count)
    assert np.array_equal(chunked.weight, full.weight)


def test_run_chunk_tiling_bit_equal():
    """A pathological hash shared by hundreds of targets inflates
    max_run; run-offset tiling (run_chunk) must merge the partial hit
    lists to the exact untiled result — kernel memory stays
    O(Q*S*run_chunk) regardless of the worst posting run."""
    from kmerseek_tpu.ops.inverted import inverted_search

    rng = np.random.default_rng(71)
    pool = np.sort(
        rng.choice(np.uint64(2) ** 62, size=300, replace=False).astype(np.uint64)
    )
    target = _mk_index(250, 10, pool, 16)
    # plant one hash into EVERY target: its posting run spans all 250
    common = pool[0]
    mins, ab = [], []
    for i in range(len(target)):
        row = target.mins[target.offsets[i]:target.offsets[i + 1]]
        rab = target.abundances[target.offsets[i]:target.offsets[i + 1]]
        if common not in row:
            j = int(np.searchsorted(row, common))
            row = np.insert(row, j, common)
            rab = np.insert(rab, j, 2)
        mins.append(row)
        ab.append(rab)
    counts = np.array([len(r) for r in mins])
    target = ProteomeIndex(
        target.config,
        list(target.names),
        np.concatenate(mins),
        np.concatenate(ab),
        np.concatenate([[0], np.cumsum(counts)]).astype(np.int64),
    )
    assert target.inverted.max_run >= 250

    query = _mk_index(12, 8, pool, 17)
    # make sure at least one query probes the pathological run
    qm = query.mins.copy()
    qm[query.offsets[0]] = common
    qm[query.offsets[0]:query.offsets[1]] = np.sort(
        qm[query.offsets[0]:query.offsets[1]]
    )
    query = ProteomeIndex(
        query.config, list(query.names), qm, query.abundances, query.offsets
    )
    q_hi, q_lo, q_valid = _query_block(query)

    full = sparse_search(target, q_hi, q_lo, q_valid)
    tiled = sparse_search(target, q_hi, q_lo, q_valid, run_chunk=16)
    assert tiled.n_hits == full.n_hits
    assert np.array_equal(tiled.q, full.q)
    assert np.array_equal(tiled.t, full.t)
    assert np.array_equal(tiled.count, full.count)
    assert np.array_equal(tiled.weight, full.weight)
    # and against the dense engine
    nd, wd = inverted_search(target, q_hi, q_lo, q_valid)
    ns, ws = _densify(tiled, len(query), len(target))
    assert np.array_equal(ns, np.asarray(nd))
    assert np.array_equal(ws, np.asarray(wd))
    # explicit capacity trims the merged list but reports the true count
    trimmed = sparse_search(
        target, q_hi, q_lo, q_valid, capacity=64, run_chunk=16
    )
    assert trimmed.n_hits == full.n_hits
    assert len(trimmed.q) == 64
    assert np.array_equal(trimmed.q, full.q[:64])
    assert np.array_equal(trimmed.count, full.count[:64])


def test_default_capacity_retries_on_overflow(monkeypatch):
    """The bounded default capacity retries once with the exact count
    when it overflows — callers never silently lose hits. (An explicit
    capacity never retries: the caller asked for a hard bound.)"""
    import kmerseek_tpu.ops.sparse_search as sp

    rng = np.random.default_rng(41)
    pool = np.sort(
        rng.choice(np.uint64(2) ** 62, size=100, replace=False).astype(np.uint64)
    )
    target = _mk_index(40, 20, pool, 14)
    query = _mk_index(20, 15, pool, 15)
    q_hi, q_lo, q_valid = _query_block(query)
    full = sparse_search(target, q_hi, q_lo, q_valid)
    assert full.n_hits > 128
    assert len(full.q) == full.n_hits  # default path returns everything

    # explicit capacity: hard bound, overflow reported but not retried
    caps = []
    real = sp.inverted_sparse_hits

    def spy(*a, **k):
        caps.append(k["capacity"])
        return real(*a, **k)

    monkeypatch.setattr(sp, "inverted_sparse_hits", spy)
    small = sparse_search(target, q_hi, q_lo, q_valid, capacity=128)
    assert caps == [128]  # no retry for an explicit bound
    assert small.n_hits == full.n_hits and len(small.q) == 128


def test_chunked_overflow_retries_exact(monkeypatch):
    """When a chunk's auto-sized capacity overflows inside the scan
    launch, that chunk is re-run at its exact hit count — the chunked
    result stays bit-equal to the unchunked one."""
    import kmerseek_tpu.ops.sparse_search as sp

    rng = np.random.default_rng(83)
    pool = np.sort(
        rng.choice(np.uint64(2) ** 62, size=200, replace=False).astype(np.uint64)
    )
    target = _mk_index(80, 20, pool, 21)
    query = _mk_index(33, 15, pool, 22)
    q_hi, q_lo, q_valid = _query_block(query)
    full = sparse_search(target, q_hi, q_lo, q_valid)
    # shrink the auto capacity floor so at least one chunk overflows
    monkeypatch.setattr(sp, "_CHUNK_CAP_FLOOR", 128)
    monkeypatch.setattr(sp, "_SCAN_SLOT_BUDGET", 128)
    singles = []
    real = sp._sparse_single

    def spy(*a, **k):
        singles.append(k.get("capacity"))
        return real(*a, **k)

    monkeypatch.setattr(sp, "_sparse_single", spy)
    chunked = sparse_search(target, q_hi, q_lo, q_valid, q_chunk=8)
    assert singles, "expected at least one exact-capacity chunk retry"
    assert chunked.n_hits == full.n_hits
    assert np.array_equal(chunked.q, full.q)
    assert np.array_equal(chunked.t, full.t)
    assert np.array_equal(chunked.count, full.count)
    assert np.array_equal(chunked.weight, full.weight)


def test_lower_bound_exact_above_corpus_max():
    """Regression: a probe above the whole posting array (or a whole
    bucket) must bisect to exactly N, not N+1 — the compact expansion
    derives run lengths as exact ub - lb differences, so a +1 overshoot
    fabricated a phantom posting row (caught as a count mismatch in
    test_sparse_matches_dense[0] before the lo<hi convergence guard)."""
    import jax.numpy as jnp

    from kmerseek_tpu.ops.inverted import (
        _bucketed_lower_bound_packed,
        build_inverted_np,
        device_postings,
    )

    rng = np.random.default_rng(100)
    pool = np.sort(
        rng.choice(np.uint64(2) ** 62, size=400, replace=False).astype(np.uint64)
    )
    target = _mk_index(60, 20, pool, 0)
    inv = build_inverted_np(target.mins, target.abundances, target.offsets)
    binv, g4, bucket_starts = device_postings(inv)
    N = g4.shape[0]
    g = (inv.g_hi.astype(np.uint64) << np.uint64(32)) | inv.g_lo.astype(
        np.uint64
    )
    # probes: every posting hash, its successor (upper bound), the
    # corpus max + 1, and u64 max — all must match numpy searchsorted
    probes = np.concatenate(
        [g, g + np.uint64(1), [np.uint64(0xFFFFFFFFFFFFFFFF)]]
    )
    want = np.searchsorted(g, probes, side="left")
    q_hi = jnp.asarray((probes >> np.uint64(32)).astype(np.uint32))[None, :]
    q_lo = jnp.asarray((probes & np.uint64(0xFFFFFFFF)).astype(np.uint32))[
        None, :
    ]
    got = np.asarray(
        _bucketed_lower_bound_packed(
            g4,
            bucket_starts,
            q_hi,
            q_lo,
            max(int(binv.max_span).bit_length(), 1),
            binv.bucket_shift,
        )
    )[0]
    assert got.max() <= N
    assert np.array_equal(got, want)


def test_compact_vs_rectangular_bit_equal(monkeypatch):
    """The compact expansion (exact run lengths + segment-fill gather)
    must be bit-equal to the rectangular (max_run, Q, S) expansion on
    randomized blocks — same hits, counts, weights, order."""
    import kmerseek_tpu.ops.sparse_search as sp

    for seed in range(4):
        rng = np.random.default_rng(500 + seed)
        pool = np.sort(
            rng.choice(
                np.uint64(2) ** 62, size=300, replace=False
            ).astype(np.uint64)
        )
        target = _mk_index(70, 20, pool, 600 + seed)
        query = _mk_index(20, 15, pool, 700 + seed)
        q_hi, q_lo, q_valid = _query_block(query)
        monkeypatch.setattr(sp, "COMPACT_EXPANSION", True)
        compact = sparse_search(target, q_hi, q_lo, q_valid)
        monkeypatch.setattr(sp, "COMPACT_EXPANSION", False)
        rect = sparse_search(target, q_hi, q_lo, q_valid)
        assert compact.n_hits == rect.n_hits
        assert np.array_equal(compact.q, rect.q)
        assert np.array_equal(compact.t, rect.t)
        assert np.array_equal(compact.count, rect.count)
        assert np.array_equal(compact.weight, rect.weight)


def test_compact_undersized_budget_retries_exact(monkeypatch):
    """An undersized learned E must be detected via the kernel's exact
    match total and retried — never silently dropping matches — and the
    cache must learn the larger budget for the next call."""
    import kmerseek_tpu.ops.sparse_search as sp

    rng = np.random.default_rng(91)
    pool = np.sort(
        rng.choice(np.uint64(2) ** 62, size=150, replace=False).astype(np.uint64)
    )
    target = _mk_index(50, 20, pool, 23)
    query = _mk_index(15, 15, pool, 24)
    q_hi, q_lo, q_valid = _query_block(query)
    monkeypatch.setattr(sp, "COMPACT_EXPANSION", False)
    truth = sparse_search(target, q_hi, q_lo, q_valid)
    monkeypatch.setattr(sp, "COMPACT_EXPANSION", True)

    # poison the cache with a tiny budget for this (index, Q, S)
    Q, S = np.asarray(q_hi).shape
    import weakref

    key = (id(target.inverted.g_hi), Q, S)
    monkeypatch.setitem(
        sp._EXPAND_CACHE, key, (weakref.ref(target.inverted.g_hi), 128)
    )
    es = []
    real = sp.inverted_sparse_hits

    def spy(*a, **k):
        es.append(k["expand_e"])
        return real(*a, **k)

    monkeypatch.setattr(sp, "inverted_sparse_hits", spy)
    got = sparse_search(target, q_hi, q_lo, q_valid)
    assert len(es) == 2 and es[0] == 128 and es[1] > 128  # retry happened
    assert got.n_hits == truth.n_hits
    assert np.array_equal(got.q, truth.q)
    assert np.array_equal(got.count, truth.count)
    assert np.array_equal(got.weight, truth.weight)
    assert sp._EXPAND_CACHE[key][1] >= es[1]  # budget learned


def test_compact_u64_max_hash_run():
    """A posting hash of u64::MAX exercises the compact expansion's
    wrapped upper bound (hash+1 overflows to 0 → ub forced to N); the
    run must still be counted exactly, in both expansion modes."""
    import jax.numpy as jnp

    M = 0xFFFFFFFFFFFFFFFF
    mins = np.array([5, 1000, M, 7, M, 9, M], dtype=np.uint64)
    # three targets; targets 0, 1, 2 all contain u64::MAX
    mins = np.sort(mins[:3]), np.sort(mins[3:5]), np.sort(mins[5:])
    flat = np.concatenate(mins)
    offsets = np.array([0, 3, 5, 7], np.int64)
    ab = np.arange(1, len(flat) + 1, dtype=np.int64)
    target = ProteomeIndex(
        IndexConfig(16, 1, "hp"), ["a", "b", "c"], flat, ab, offsets
    )
    q64 = np.array([[5, M]], dtype=np.uint64)
    q_hi = jnp.asarray((q64 >> np.uint64(32)).astype(np.uint32))
    q_lo = jnp.asarray((q64 & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    q_valid = jnp.ones((1, 2), bool)

    import kmerseek_tpu.ops.sparse_search as sp

    for compact in (True, False):
        old = sp.COMPACT_EXPANSION
        sp.COMPACT_EXPANSION = compact
        try:
            hits = sparse_search(target, q_hi, q_lo, q_valid)
        finally:
            sp.COMPACT_EXPANSION = old
        got = {
            (int(q), int(t)): (int(c), int(w))
            for q, t, c, w in zip(hits.q, hits.t, hits.count, hits.weight)
        }
        # target a shares {5, MAX}; targets b and c share {MAX}
        assert got == {
            (0, 0): (2, 1 + 3),
            (0, 1): (1, 5),
            (0, 2): (1, 7),
        }, got


def test_repeat_search_uses_hp_hint_bit_equal():
    """A second identical search consumes the optimistic (hinted-length)
    fetch path; results must be bit-equal and the hint recorded."""
    import kmerseek_tpu.ops.sparse_search as sp

    rng = np.random.default_rng(61)
    pool = np.sort(
        rng.choice(np.uint64(2) ** 62, size=300, replace=False).astype(np.uint64)
    )
    target = _mk_index(60, 20, pool, 62)
    query = _mk_index(20, 15, pool, 63)
    q_hi, q_lo, q_valid = _query_block(query)
    first = sparse_search(target, q_hi, q_lo, q_valid)
    Q, S = np.asarray(q_hi).shape
    hinted = [
        k for k in sp._HP_CACHE if k[0] == id(target.inverted.g_hi)
    ]
    assert hinted, "hit-length hint was not recorded"
    second = sparse_search(target, q_hi, q_lo, q_valid)
    assert second.n_hits == first.n_hits
    assert np.array_equal(second.q, first.q)
    assert np.array_equal(second.t, first.t)
    assert np.array_equal(second.count, first.count)
    assert np.array_equal(second.weight, first.weight)
    # chunked path records/uses its own hint too
    c1 = sparse_search(target, q_hi, q_lo, q_valid, q_chunk=8)
    c2 = sparse_search(target, q_hi, q_lo, q_valid, q_chunk=8)
    assert np.array_equal(c1.q, c2.q) and np.array_equal(c1.count, c2.count)
    # poisoned oversized hint: results still exact (just extra bytes)
    import weakref

    for k in list(sp._HP_CACHE):
        if k[0] == id(target.inverted.g_hi):
            sp._HP_CACHE[k] = (weakref.ref(target.inverted.g_hi), 1 << 20)
    third = sparse_search(target, q_hi, q_lo, q_valid)
    assert np.array_equal(third.q, first.q)
    # poisoned undersized hint: refetch path, still exact
    for k in list(sp._HP_CACHE):
        if k[0] == id(target.inverted.g_hi):
            sp._HP_CACHE[k] = (weakref.ref(target.inverted.g_hi), 1)
    fourth = sparse_search(target, q_hi, q_lo, q_valid)
    assert np.array_equal(fourth.q, first.q)
    assert np.array_equal(fourth.weight, first.weight)


def test_explicit_capacity_slot_budget_fallback(monkeypatch):
    """An explicit per-chunk capacity large enough that the stacked
    (C, capacity) scan buffers would blow the slot budget (the
    _validate_with_device path passes the corpus' exact hit count) must
    fall back to sequential per-chunk calls with identical results."""
    import kmerseek_tpu.ops.sparse_search as sp

    rng = np.random.default_rng(61)
    pool = np.sort(
        rng.choice(np.uint64(2) ** 62, size=200, replace=False).astype(np.uint64)
    )
    target = _mk_index(50, 20, pool, 62)
    query = _mk_index(32, 15, pool, 63)
    q_hi, q_lo, q_valid = _query_block(query)

    full = sparse_search(target, q_hi, q_lo, q_valid)
    cap = ((full.n_hits + 128 + 127) // 128) * 128
    normal = sparse_search(
        target, q_hi, q_lo, q_valid, capacity=cap, q_chunk=8
    )
    monkeypatch.setattr(sp, "_SCAN_SLOT_BUDGET", cap)  # 4 chunks * cap > budget
    seq = sparse_search(target, q_hi, q_lo, q_valid, capacity=cap, q_chunk=8)
    for a, b in zip(seq, normal):
        assert np.array_equal(a, b) if isinstance(a, np.ndarray) else a == b


def test_weight_limbs_exact_past_int32():
    """High-abundance corpus: device weighted sums must equal the host
    int64 sums even where a pair's sum exceeds 2^31 (the 16-bit limb
    accumulation — VERDICT r2 item 4; no saturation, no skip)."""
    rng = np.random.default_rng(91)
    pool = np.sort(
        rng.choice(np.uint64(2) ** 62, size=120, replace=False).astype(np.uint64)
    )
    target = _mk_index(30, 20, pool, 92)
    # crank abundances toward int32 max: a pair with ≥2 shared hashes
    # sums past 2^31
    hot = (1 << 31) - 17
    ab = np.full(len(target.mins), hot, np.int64)
    target = ProteomeIndex(
        target.config, list(target.names), target.mins, ab, target.offsets
    )
    query = _mk_index(10, 15, pool, 93)
    q_hi, q_lo, q_valid = _query_block(query)

    hits = sparse_search(target, q_hi, q_lo, q_valid)
    assert hits.n_hits > 0
    # host oracle: searchsorted join, int64 sums
    g = target.inverted.g64()
    inv = target.inverted
    exp = {}
    for qi in range(len(query)):
        qs = query.mins[query.offsets[qi]:query.offsets[qi + 1]]
        lo = np.searchsorted(g, qs, side="left")
        hi = np.searchsorted(g, qs, side="right")
        for a, b in zip(lo, hi):
            for p in range(a, b):
                k = (qi, int(inv.tid[p]))
                c, w = exp.get(k, (0, 0))
                exp[k] = (c + 1, w + int(inv.ab[p]))
    assert len(exp) == hits.n_hits
    over = 0
    for q, t, c, w in zip(hits.q, hits.t, hits.count, hits.weight):
        ec, ew = exp[(int(q), int(t))]
        assert (ec, ew) == (int(c), int(w))
        over += ew >= 2**31
    assert over > 0  # the saturating case is genuinely exercised

    # the production validate path compares every sampled weight now
    from kmerseek_tpu.core.search import manysearch_columns

    cols = manysearch_columns(query, target)
    assert max(cols["n_weighted_found"]) >= 2**31


def test_narrow_weight_path_gated_and_bit_equal(monkeypatch):
    """Low-abundance corpora take the single-scatter (narrow) weight
    path — the gate must engage, and the hits must be bit-equal to the
    two-limb (wide) path on the same block."""
    import kmerseek_tpu.ops.sparse_search as sp
    from kmerseek_tpu.ops.inverted import max_abundance

    rng = np.random.default_rng(17)
    pool = np.sort(
        rng.choice(np.uint64(2) ** 62, size=160, replace=False).astype(np.uint64)
    )
    target = _mk_index(40, 20, pool, 18)
    query = _mk_index(12, 15, pool, 19)
    q_hi, q_lo, q_valid = _query_block(query)
    S = q_hi.shape[1]

    # the gate: abundances here are small window counts, so the narrow
    # path must be selected ...
    assert max_abundance(target.inverted) * S < 2**31
    assert not sp._wide_weights_needed(target.inverted, S)
    narrow = sparse_search(target, q_hi, q_lo, q_valid)

    # ... and the wide path (forced) must agree bit-for-bit
    monkeypatch.setattr(sp, "_wide_weights_needed", lambda inv, s: True)
    wide = sparse_search(target, q_hi, q_lo, q_valid)
    assert narrow.n_hits == wide.n_hits > 0
    for a, b in zip(narrow, wide):
        assert np.array_equal(a, b) if isinstance(a, np.ndarray) else a == b
    assert narrow.weight.dtype == np.int64


def test_device_build_records_max_ab():
    """The device inverted build must carry max abundance as a build
    scalar so the narrow-weight gate never forces a posting download."""
    jax = pytest.importorskip("jax")
    from kmerseek_tpu.ops.inverted import (
        build_inverted_dev,
        build_inverted_np,
        max_abundance,
    )

    rng = np.random.default_rng(41)
    mins = np.sort(rng.integers(0, 2**62, size=500, dtype=np.uint64))
    mins = np.unique(mins)
    ab = rng.integers(1, 1000, size=len(mins)).astype(np.int64)
    offsets = np.array([0, len(mins) // 2, len(mins)], np.int64)
    # per-target mins must be sorted+distinct: splitting a sorted unique
    # array keeps both halves valid
    dev = build_inverted_dev(mins, ab, offsets)
    host = build_inverted_np(mins, ab, offsets)
    assert dev.max_ab == int(ab.max()) == max_abundance(dev)
    assert max_abundance(host) == int(ab.max())
    # cached: second call hits the weakref cache, same value
    assert max_abundance(host) == dev.max_ab


def test_learned_hints_persist_roundtrip(tmp_path):
    """Learned sparse-engine hints (expansion budget, fetch lengths)
    persist in .ksx and re-seed the caches on load (VERDICT r2 item 6:
    warm-start without the first-call undersize retry)."""
    import kmerseek_tpu.ops.sparse_search as sp

    rng = np.random.default_rng(71)
    pool = np.sort(
        rng.choice(np.uint64(2) ** 62, size=160, replace=False).astype(np.uint64)
    )
    target = _mk_index(40, 20, pool, 72)
    query = _mk_index(12, 15, pool, 73)
    q_hi, q_lo, q_valid = _query_block(query)

    hits = sparse_search(target, q_hi, q_lo, q_valid)
    assert hits.n_hits > 0
    inv = target.inverted
    hints = sp.export_learned_hints(inv)
    assert hints["expand"]  # the search learned a budget
    path = str(tmp_path / "idx.ksx")
    target.save(path)
    assert (tmp_path / "idx.ksx" / "hints.json").exists()

    # fresh caches (a new process)
    sp._EXPAND_CACHE.clear()
    sp._HP_CACHE.clear()
    from kmerseek_tpu.core.index import ProteomeIndex as PI

    loaded = PI.load(path)
    re = sp.export_learned_hints(loaded.inverted)
    assert re["expand"] == hints["expand"]
    assert re["hp"] == hints["hp"]
    # and the loaded index searches identically
    hits2 = sparse_search(loaded, q_hi, q_lo, q_valid)
    for a, b in zip(hits, hits2):
        assert np.array_equal(a, b) if isinstance(a, np.ndarray) else a == b


def test_dense_block_hint_persist_roundtrip(tmp_path):
    """The measured-best dense query block (note_dense_block /
    autotune_dense_block) rides hints.json: a loaded .ksx picks the
    recorded block, and library inverted_search consumes it — chunked
    output bit-equal to one dispatch (VERDICT r4 weak #5: the autotune
    must live in the library, not the bench)."""
    import kmerseek_tpu.ops.sparse_search as sp
    from kmerseek_tpu.ops.inverted import (
        DEFAULT_DENSE_BLOCK,
        _DENSE_BLOCK_CACHE,
        dense_block_hint,
        inverted_search,
        note_dense_block,
    )

    rng = np.random.default_rng(91)
    pool = np.sort(
        rng.choice(np.uint64(2) ** 62, size=200, replace=False).astype(np.uint64)
    )
    target = _mk_index(40, 20, pool, 92)
    query = _mk_index(24, 15, pool, 93)
    q_hi, q_lo, q_valid = _query_block(query)

    inv = target.inverted
    assert dense_block_hint(inv) == DEFAULT_DENSE_BLOCK  # nothing learned
    note_dense_block(inv, 8)  # pretend the autotune measured 8 best
    assert dense_block_hint(inv) == 8
    assert sp.export_learned_hints(inv)["dense_block"] == 8

    path = str(tmp_path / "idx.ksx")
    target.save(path)
    _DENSE_BLOCK_CACHE.clear()  # fresh process
    from kmerseek_tpu.core.index import ProteomeIndex as PI

    loaded = PI.load(path)
    assert dense_block_hint(loaded.inverted) == 8

    # 24 queries at block 8 → 3 dispatches; bit-equal to one dispatch
    c1, w1 = inverted_search(loaded, q_hi, q_lo, q_valid)  # hint: 8
    c2, w2 = inverted_search(loaded, q_hi, q_lo, q_valid, q_block=1 << 20)
    assert np.array_equal(np.asarray(c1), np.asarray(c2))
    assert np.array_equal(np.asarray(w1), np.asarray(w2))


def test_autotune_dense_block_records_winner():
    """autotune_dense_block measures the candidates on the current
    backend and records the winner so dense_block_hint returns it."""
    from kmerseek_tpu.ops.inverted import (
        autotune_dense_block,
        dense_block_hint,
    )

    rng = np.random.default_rng(95)
    pool = np.sort(
        rng.choice(np.uint64(2) ** 62, size=200, replace=False).astype(np.uint64)
    )
    target = _mk_index(30, 20, pool, 96)
    res = autotune_dense_block(
        target, sketch_slots=16, candidates=(4, 8), iters=1
    )
    assert set(res) == {4, 8}
    for v in res.values():
        assert v["queries_per_second"] > 0
    best = max(res, key=lambda q: res[q]["queries_per_second"])
    assert dense_block_hint(target.inverted) == best


def test_compact_io_bit_equal_int16_transfer():
    """compact_io=True downcasts q/count to int16 for the tunnel fetch;
    values must be identical after upcast, and the dispatcher must
    upcast so SparseHits keeps its int32 contract."""
    import jax.numpy as jnp

    from kmerseek_tpu.ops.inverted import device_postings
    from kmerseek_tpu.ops.sparse_search import (
        _expand_budget,
        inverted_sparse_hits,
    )

    rng = np.random.default_rng(55)
    pool = np.sort(
        rng.choice(np.uint64(2) ** 62, size=160, replace=False).astype(np.uint64)
    )
    target = _mk_index(40, 20, pool, 56)
    query = _mk_index(12, 15, pool, 57)
    q_hi, q_lo, q_valid = _query_block(query)
    inv = target.inverted
    binv, g4, bucket_starts = device_postings(inv)
    kw = dict(
        n_targets=binv.n_targets,
        max_run=int(inv.max_run),
        capacity=512,
        span_steps=max(int(binv.max_span).bit_length(), 1),
        bucket_shift=binv.bucket_shift,
        run_offset=0,
        expand_e=_expand_budget(inv, *q_hi.shape, int(inv.max_run)),
        # w16 statically requires the narrow weight path (the 16-bit
        # limb accumulators must never be truncated to int16)
        wide_weights=False,
    )
    a = inverted_sparse_hits(
        jnp.asarray(g4), jnp.asarray(bucket_starts),
        jnp.asarray(q_hi), jnp.asarray(q_lo), jnp.asarray(q_valid),
        compact_io=False, **kw,
    )
    b = inverted_sparse_hits(
        jnp.asarray(g4), jnp.asarray(bucket_starts),
        jnp.asarray(q_hi), jnp.asarray(q_lo), jnp.asarray(q_valid),
        compact_io=True, t16=True, w16=True, **kw,
    )
    assert np.asarray(b[0]).dtype == np.int16  # q
    assert np.asarray(b[1]).dtype == np.int16  # t (n_targets < 2^15)
    assert np.asarray(b[2]).dtype == np.int16  # count
    assert np.asarray(b[3]).dtype == np.int16  # weight (S*max_ab < 2^15)
    for x, y in zip(a, b):
        assert np.array_equal(np.asarray(x), np.asarray(y).astype(np.asarray(x).dtype))

    # production path returns int32/int64 as before
    hits = sparse_search(target, q_hi, q_lo, q_valid)
    assert hits.q.dtype == np.int32
    assert hits.count.dtype == np.int32
    assert hits.weight.dtype == np.int64


def test_trim_len_quantization():
    from kmerseek_tpu.ops.sparse_search import _trim_len

    cap = 1 << 22
    for h in (1, 127, 128, 129, 390195, 524288, 524289, 4_000_000):
        t = _trim_len(h, cap)
        assert t >= min(max(h, 128), cap)
        assert t <= cap
        # over-fetch bounded at 25% past the 128 floor
        if 128 <= h <= cap:
            assert t <= max(h + (h >> 2), 128)
    assert _trim_len(5_000_000, cap) == cap


def test_tc32_packed_transport_bit_equal():
    """n_targets in [2^15, 2^24) with S < 256 engages the (t << 8)|count
    u32 transport (counts never fetched); results must equal the dense
    oracle bit-for-bit, including the ub-probe narrowing."""
    from kmerseek_tpu.ops.inverted import inverted_search

    rng = np.random.default_rng(77)
    pool = np.unique(
        rng.integers(0, 2**62, size=4096, dtype=np.uint64)
    )
    T = 40_000  # >= 2^15: t16 impossible, tc32 engages
    target = _mk_index(T, 6, pool, 78)
    query = _mk_index(64, 15, pool, 79)
    q_hi, q_lo, q_valid = _query_block(query)
    assert len(target) >= 2**15
    hits = sparse_search(target, q_hi, q_lo, q_valid)
    c, w = inverted_search(target, q_hi, q_lo, q_valid)
    n_d, w_d = _densify(hits, len(query), len(target))
    assert np.array_equal(n_d, np.asarray(c).astype(np.int64))
    assert np.array_equal(w_d, np.asarray(w).astype(np.int64))
    assert hits.n_hits == int((np.asarray(c) > 0).sum())
    # chunked path too (scan kernel, same transport)
    hits2 = sparse_search(target, q_hi, q_lo, q_valid, q_chunk=16)
    n2, w2 = _densify(hits2, len(query), len(target))
    assert np.array_equal(n2, n_d) and np.array_equal(w2, w_d)


def test_q_bounds_transport_bit_equal(monkeypatch):
    """The q-bounds transport (per-query boundary vector instead of the
    per-hit q column) must be bit-equal to the explicit-q path on the
    single, chunked, and capacity-truncated paths."""
    import kmerseek_tpu.ops.sparse_search as sp

    rng = np.random.default_rng(91)
    pool = np.sort(
        rng.choice(np.uint64(2) ** 62, size=300, replace=False).astype(np.uint64)
    )
    target = _mk_index(50, 20, pool, 92)
    query = _mk_index(24, 15, pool, 93)
    q_hi, q_lo, q_valid = _query_block(query)

    monkeypatch.setattr(sp, "Q_BOUNDS_IO", False)
    ref = sp.sparse_search(target, q_hi, q_lo, q_valid)
    ref_c = sp.sparse_search(target, q_hi, q_lo, q_valid, q_chunk=8)
    ref_t = sp.sparse_search(target, q_hi, q_lo, q_valid, capacity=128)
    monkeypatch.setattr(sp, "Q_BOUNDS_IO", True)
    got = sp.sparse_search(target, q_hi, q_lo, q_valid)
    got_c = sp.sparse_search(target, q_hi, q_lo, q_valid, q_chunk=8)
    got_t = sp.sparse_search(target, q_hi, q_lo, q_valid, capacity=128)
    for a, b in ((ref, got), (ref_c, got_c), (ref_t, got_t)):
        assert a.n_hits == b.n_hits
        assert np.array_equal(a.q, b.q)
        assert np.array_equal(a.t, b.t)
        assert np.array_equal(a.count, b.count)
        assert np.array_equal(a.weight, b.weight)


def test_skip_weights_unit_abundance(monkeypatch):
    """On a unit-abundance corpus the weight fetch is elided (weight ≡
    count); results must equal both the flag-off path and the dense
    oracle. A non-unit corpus must NOT engage the elision."""
    import kmerseek_tpu.ops.sparse_search as sp
    from kmerseek_tpu.ops.inverted import inverted_search

    rng = np.random.default_rng(94)
    pool = np.sort(
        rng.choice(np.uint64(2) ** 62, size=300, replace=False).astype(np.uint64)
    )
    target = _mk_index(50, 20, pool, 95)
    # force unit abundance
    target = ProteomeIndex(
        target.config,
        target.names,
        target.mins,
        np.ones(len(target.mins), np.int64),
        target.offsets,
    )
    query = _mk_index(24, 15, pool, 96)
    q_hi, q_lo, q_valid = _query_block(query)

    monkeypatch.setattr(sp, "SKIP_W_UNIT_AB", False)
    ref = sp.sparse_search(target, q_hi, q_lo, q_valid)
    monkeypatch.setattr(sp, "SKIP_W_UNIT_AB", True)
    got = sp.sparse_search(target, q_hi, q_lo, q_valid)
    got_c = sp.sparse_search(target, q_hi, q_lo, q_valid, q_chunk=8)
    assert np.array_equal(ref.weight, got.weight)
    assert np.array_equal(got.weight, got.count.astype(np.int64))
    c, w = inverted_search(target, q_hi, q_lo, q_valid)
    n_d, w_d = _densify(got, len(query), len(target))
    assert np.array_equal(n_d, np.asarray(c).astype(np.int64))
    assert np.array_equal(w_d, np.asarray(w).astype(np.int64))
    n_c, w_c = _densify(got_c, len(query), len(target))
    assert np.array_equal(n_c, n_d) and np.array_equal(w_c, w_d)

    # non-unit abundance: elision must stay off (weights are real sums)
    target_ab = _mk_index(50, 20, pool, 95)
    assert int(target_ab.abundances.max()) > 1
    ref2 = None
    monkeypatch.setattr(sp, "SKIP_W_UNIT_AB", False)
    ref2 = sp.sparse_search(target_ab, q_hi, q_lo, q_valid)
    monkeypatch.setattr(sp, "SKIP_W_UNIT_AB", True)
    got2 = sp.sparse_search(target_ab, q_hi, q_lo, q_valid)
    assert np.array_equal(ref2.weight, got2.weight)
    assert not np.array_equal(got2.weight, got2.count.astype(np.int64))


def test_host_engine_bit_equal():
    """sparse_search_host (the cold-start serve engine) must be
    bit-equal to the device engine, including capacity trimming and
    empty blocks."""
    from kmerseek_tpu.ops.sparse_search import sparse_search_host

    rng = np.random.default_rng(97)
    pool = np.sort(
        rng.choice(np.uint64(2) ** 62, size=300, replace=False).astype(np.uint64)
    )
    target = _mk_index(50, 20, pool, 98)
    query = _mk_index(24, 15, pool, 99)
    q_hi, q_lo, q_valid = _query_block(query)

    dev = sparse_search(target, q_hi, q_lo, q_valid)
    host = sparse_search_host(target, q_hi, q_lo, q_valid)
    assert host.n_hits == dev.n_hits
    assert np.array_equal(host.q, dev.q)
    assert np.array_equal(host.t, dev.t)
    assert np.array_equal(host.count, dev.count)
    assert np.array_equal(host.weight, dev.weight)

    trimmed = sparse_search_host(target, q_hi, q_lo, q_valid, capacity=64)
    assert trimmed.n_hits == dev.n_hits
    assert np.array_equal(trimmed.q, dev.q[:64])
    assert np.array_equal(trimmed.weight, dev.weight[:64])

    # all-miss block → empty
    import jax.numpy as jnp

    miss_hi = jnp.full_like(q_hi, 0x7FFFFFFF)
    miss_lo = jnp.full_like(q_lo, 0x12345678)
    empty = sparse_search_host(target, miss_hi, miss_lo, q_valid)
    assert empty.n_hits == 0 and len(empty.q) == 0


def test_production_cold_child_protocol(tmp_path):
    """The bench's cold-serve child (fresh process: .ksx → host-first
    block → device handover) must run end to end at tiny scale, assert
    host/device bit-equality internally, and report the full timing
    decomposition the parent derives cold_queries_per_second from."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys_path_repo = repo

    # parent side: build a small synthetic index the same way
    # bench_search.measure_search_sparse does (pool draws, CSR contract)
    rng = np.random.default_rng(1)
    pool_bits, targets, sketch, queries = 12, 512, 32, 64
    pool = np.unique(rng.integers(0, 2**62, size=1 << pool_bits, dtype=np.uint64))
    t_c = rng.integers(sketch // 2, sketch, size=targets).astype(np.int64)
    vals = np.sort(pool[rng.integers(0, len(pool), size=(targets, sketch))], axis=1)
    keep = np.ones_like(vals, bool)
    keep[:, 1:] = vals[:, 1:] != vals[:, :-1]
    keep &= np.arange(sketch)[None, :] < t_c[:, None]
    mins = vals[keep]
    counts = keep.sum(axis=1).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)

    idx = ProteomeIndex(
        IndexConfig(16, 5, "hp"),
        [f"t{i}" for i in range(targets)],
        mins,
        np.ones(len(mins), np.int64),
        offsets,
    )
    ksx = str(tmp_path / "cold.ksx")
    idx.save(ksx)

    env = dict(os.environ)
    env["KMERSEEK_BENCH_COLD_KSX"] = ksx
    env["KMERSEEK_BENCH_COLD_PARAMS"] = f"{queries},{sketch},64,{pool_bits}"
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, os.path.join(sys_path_repo, "bench_search.py")],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd=sys_path_repo,
    )
    assert r.returncode == 0, r.stderr[-800:]
    rec = json.loads([l for l in r.stdout.splitlines() if l.startswith("{")][-1])
    assert rec["host_device_bit_equal"] is True
    assert rec["upload_error"] is None
    for key in (
        "load_s", "query_prep_s", "host_first_block_s", "serve_done_s",
        "upload_wait_s", "device_first_block_s", "in_child_total_s",
    ):
        assert key in rec and rec[key] >= 0
    assert rec["n_hits"] > 0


def test_sparse_search_stream_bit_equal():
    """sparse_search_stream pipelines one block in flight; results must
    be bit-identical to per-block sparse_search, including blocks that
    fall back to the chunked path (VERDICT r4 ask #2)."""
    from kmerseek_tpu.ops.sparse_search import sparse_search_stream

    rng = np.random.default_rng(201)
    pool = np.sort(
        rng.choice(np.uint64(2) ** 62, size=300, replace=False).astype(np.uint64)
    )
    target = _mk_index(60, 20, pool, 202)
    blocks = []
    for seed in (203, 204, 205, 206):
        q = _mk_index(16, 12, pool, seed)
        blocks.append(_query_block(q))
    # big block to trigger the q_chunk fallback mid-stream
    big = _mk_index(40, 12, pool, 207)
    blocks.insert(2, _query_block(big))

    expected = [
        sparse_search(target, *b, q_chunk=16) for b in blocks
    ]
    got = list(sparse_search_stream(target, blocks, q_chunk=16))
    assert len(got) == len(expected)
    for e, g in zip(expected, got):
        assert g.n_hits == e.n_hits
        for a, b in zip(e[:4], g[:4]):
            assert np.array_equal(a, b)


def test_warm_sparse_engine_does_not_poison_hints():
    """warm_sparse_engine's zero-match dummy must not shrink the
    learned expansion budget or fetch-length hints — otherwise the
    first REAL block compiles a different program AND pays the
    undersize retry, un-warming the handover (code-review r5)."""
    import kmerseek_tpu.ops.sparse_search as sp
    from kmerseek_tpu.ops.sparse_search import (
        _expand_budget,
        warm_sparse_engine,
    )

    rng = np.random.default_rng(211)
    pool = np.sort(
        rng.choice(np.uint64(2) ** 62, size=300, replace=False).astype(np.uint64)
    )
    target = _mk_index(50, 20, pool, 212)
    query = _mk_index(12, 15, pool, 213)
    q_hi, q_lo, q_valid = _query_block(query)
    Q, S = q_hi.shape

    # learn real budgets with a real block first
    hits = sparse_search(target, q_hi, q_lo, q_valid)
    assert hits.n_hits > 0
    inv = target.inverted
    e_before = _expand_budget(inv, Q, S, inv.max_run)
    hp_before = dict(sp._HP_CACHE)

    assert warm_sparse_engine(target, (Q, S))
    assert _expand_budget(inv, Q, S, inv.max_run) == e_before
    assert {k: v[1] for k, v in sp._HP_CACHE.items()} == {
        k: v[1] for k, v in hp_before.items()
    }
    # and results after warming are unchanged
    hits2 = sparse_search(target, q_hi, q_lo, q_valid)
    for a, b in zip(hits[:4], hits2[:4]):
        assert np.array_equal(a, b)


def test_run_length_lookup_bit_equal(monkeypatch):
    """The run-length lookup path (RL_LOOKUP) must reproduce the
    hash+1 upper-bound bisect bit-for-bit, including the u64-max hash
    (whose hash+1 wraps) and run-offset tiling."""
    import kmerseek_tpu.ops.sparse_search as sp

    rng = np.random.default_rng(221)
    pool = np.sort(
        rng.choice(np.uint64(2) ** 62, size=250, replace=False).astype(np.uint64)
    )
    target = _mk_index(80, 20, pool, 222)
    # plant the u64-max hash in several targets AND in the query
    top = np.uint64(0xFFFFFFFFFFFFFFFF)
    mins, ab, offs = [], [], [0]
    for i in range(len(target)):
        row = target.mins[target.offsets[i]:target.offsets[i + 1]]
        rab = target.abundances[target.offsets[i]:target.offsets[i + 1]]
        if i % 3 == 0:
            row = np.append(row, top)
            rab = np.append(rab, 2)
        mins.append(row)
        ab.append(rab)
        offs.append(offs[-1] + len(row))
    target = ProteomeIndex(
        target.config, list(target.names),
        np.concatenate(mins), np.concatenate(ab),
        np.asarray(offs, np.int64),
    )
    query = _mk_index(16, 12, pool, 223)
    qm = [query.mins[query.offsets[i]:query.offsets[i + 1]] for i in range(len(query))]
    qm[0] = np.append(qm[0], top)
    qoffs = np.concatenate([[0], np.cumsum([len(r) for r in qm])]).astype(np.int64)
    query = ProteomeIndex(
        query.config, list(query.names), np.concatenate(qm),
        np.ones(int(qoffs[-1]), np.int64), qoffs,
    )
    q_hi, q_lo, q_valid = _query_block(query)

    monkeypatch.setattr(sp, "RL_LOOKUP", False)
    ref = sparse_search(target, q_hi, q_lo, q_valid)
    ref_tiled = sparse_search(target, q_hi, q_lo, q_valid, run_chunk=2)
    monkeypatch.setattr(sp, "RL_LOOKUP", True)
    got = sparse_search(target, q_hi, q_lo, q_valid)
    got_tiled = sparse_search(target, q_hi, q_lo, q_valid, run_chunk=2)
    for e, g in ((ref, got), (ref_tiled, got_tiled)):
        assert g.n_hits == e.n_hits and e.n_hits > 0
        for a, b in zip(e[:4], g[:4]):
            assert np.array_equal(a, b)


def test_sparse_search_stream_empty_and_single():
    """Stream edge cases: an empty-posting index mid-stream (fallback
    path yields the empty hit list) and a single-block stream."""
    from kmerseek_tpu.core.index import IndexConfig, ProteomeIndex
    from kmerseek_tpu.ops.sparse_search import sparse_search_stream

    rng = np.random.default_rng(231)
    pool = np.sort(
        rng.choice(np.uint64(2) ** 62, size=200, replace=False).astype(np.uint64)
    )
    target = _mk_index(30, 15, pool, 232)
    empty = ProteomeIndex(
        IndexConfig(16, 5, "hp"), ["e0", "e1"],
        np.zeros(0, np.uint64), np.zeros(0, np.int64),
        np.zeros(3, np.int64),
    )
    q = _mk_index(8, 10, pool, 233)
    blk = _query_block(q)

    outs = list(sparse_search_stream(empty, [blk, blk]))
    assert [o.n_hits for o in outs] == [0, 0]

    single = list(sparse_search_stream(target, [blk]))
    ref = sparse_search(target, *blk)
    assert len(single) == 1 and single[0].n_hits == ref.n_hits
    for a, b in zip(ref[:4], single[0][:4]):
        assert np.array_equal(a, b)
