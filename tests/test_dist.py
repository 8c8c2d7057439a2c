"""Sharded search / pipeline on the 8-device virtual CPU mesh."""

import jax
import numpy as np
import pytest

from kmerseek_tpu.core.index import IndexConfig, ProteomeIndex
from kmerseek_tpu.parallel.dist import (
    distributed_manysearch_stats,
    make_dist_pipeline_step,
    make_mesh,
    shard_targets,
)


@pytest.fixture(scope="module")
def indexes():
    ced9 = "/root/reference/tests/testdata/fasta/ced9.fasta"
    bcl2 = (
        "/root/reference/tests/testdata/fasta/"
        "bcl2_first25_uniprotkb_accession_O43236_OR_accession_2025_02_06.fasta.gz"
    )
    import pathlib

    if not pathlib.Path(bcl2).exists():
        pytest.skip("reference fixtures unavailable")
    cfg = IndexConfig(16, 5, "hp")
    return ProteomeIndex.build(ced9, cfg), ProteomeIndex.build(bcl2, cfg)


def test_mesh_has_8_virtual_devices():
    assert len(jax.devices()) == 8


def test_sharded_stats_match_single_device(indexes):
    from kmerseek_tpu.core.search import _device_pair_stats

    query, target = indexes
    ref = _device_pair_stats(query, target)
    mesh = make_mesh()
    got = distributed_manysearch_stats(query, target, mesh)
    for a, b in zip(ref, got):
        assert np.array_equal(a, b)


def test_sharded_search_rows_identical(indexes, monkeypatch):
    """manysearch rows with the SHARDED sparse engine as the validation
    device stage equal the golden single-device path — the full CLI
    search flow runs against the 8-device mesh."""
    import kmerseek_tpu.core.search as search_mod
    import kmerseek_tpu.ops.sparse_search as sp
    from kmerseek_tpu.parallel.dist import sharded_sparse_search

    query, target = indexes
    ref_rows = search_mod.manysearch(query, target)

    mesh = make_mesh()
    calls = []

    def sharded(index, q_hi, q_lo, q_valid, capacity=None, q_chunk=None, **kw):
        calls.append(1)
        return sharded_sparse_search(mesh, index.inverted, q_hi, q_lo, q_valid)

    monkeypatch.setattr(sp, "sparse_search", sharded)
    got_rows = search_mod.manysearch(query, target)
    assert calls, "sharded validation engine was not invoked"
    assert got_rows == ref_rows


def test_dist_pipeline_step(indexes):
    """Full sharded step: dp sketch + all_gather + sharded intersect."""
    query, target = indexes
    mesh = make_mesh()
    n_dev = mesh.devices.size

    # tiny synthetic batch of query sequences, one row per device slot;
    # row 0 is a repeated motif so its sketch has heavy duplicates —
    # the intersection must count distinct hashes only
    rng = np.random.default_rng(0)
    letters = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", np.uint8)
    B, L = n_dev * 2, 256
    seqs = letters[rng.integers(0, 20, size=(B, L))]
    seqs[0] = np.tile(seqs[0, :32], L // 32)
    lens = np.full(B, L, np.int32)

    th, tl, ta, tc = target.dense_device_arrays()
    t_hi, t_lo, t_ab, t_counts = shard_targets(mesh, th, tl, ta, tc)

    step = make_dist_pipeline_step(
        mesh, k=16, scaled=5, moltype="hp", capacity=128
    )
    inter, weighted, total = step(
        jax.numpy.asarray(seqs), jax.numpy.asarray(lens), t_hi, t_lo, t_ab, t_counts
    )
    assert inter.shape[0] == B
    assert int(total) > 0

    # cross-check one row against the single-device reference path
    from kmerseek_tpu.ops.sketch import sketch_batch
    from kmerseek_tpu.ops.intersect import pairwise_stats

    sk = sketch_batch(
        jax.numpy.asarray(seqs),
        jax.numpy.asarray(lens),
        k=16,
        scaled=5,
        moltype="hp",
        capacity=128,
    )
    ref = pairwise_stats(sk.mins_hi, sk.mins_lo, sk.counts, th, tl, ta, tc)
    T = len(target)
    assert np.array_equal(np.asarray(ref.intersect), np.asarray(inter)[:, :T])
    assert np.array_equal(np.asarray(ref.weighted), np.asarray(weighted)[:, :T])


def test_sharded_inverted_search_matches(indexes):
    """Hash-range-sharded inverted search == single-device engine."""
    import jax.numpy as jnp
    from kmerseek_tpu.ops.inverted import build_inverted_np, inverted_pair_stats
    from kmerseek_tpu.parallel.dist import sharded_inverted_search

    query, target = indexes
    inv = build_inverted_np(target.mins, target.abundances, target.offsets)
    q_hi, q_lo, _qa, _qc = query.dense_device_arrays()
    q_valid = jnp.asarray(
        np.arange(q_hi.shape[1])[None, :] < query.counts[:, None]
    )
    ref_c, ref_w = inverted_pair_stats(
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
    mesh = make_mesh()
    got_c, got_w = sharded_inverted_search(mesh, inv, q_hi, q_lo, q_valid)
    assert np.array_equal(np.asarray(got_c), np.asarray(ref_c))
    assert np.array_equal(np.asarray(got_w), np.asarray(ref_w))
    # and the reference values are the golden manysearch counts
    assert int(np.asarray(got_c).sum()) == 9  # 2+1+1+2+3 golden intersections


def _rand_index(n_rows, row_len, pool, seed):
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


@pytest.mark.parametrize("expand_e", [None, 4096])
def test_sharded_sparse_search_matches(expand_e):
    """Hash-range-sharded sparse hit lists merge to the exact unsharded
    result — both expansion strategies, on the 8-device mesh."""
    from kmerseek_tpu.ops.sparse_search import sparse_search
    from kmerseek_tpu.parallel.dist import sharded_sparse_search

    rng = np.random.default_rng(7)
    pool = np.sort(
        rng.choice(np.uint64(2) ** 62, size=400, replace=False).astype(np.uint64)
    )
    target = _rand_index(60, 20, pool, 70)
    query = _rand_index(25, 15, pool, 71)
    import jax.numpy as jnp

    q_hi, q_lo, _ab, _c = query.dense_device_arrays()
    S = q_hi.shape[1]
    q_valid = jnp.asarray(np.arange(S)[None, :] < query.counts[:, None])

    full = sparse_search(target, q_hi, q_lo, q_valid)
    mesh = make_mesh()
    got = sharded_sparse_search(
        mesh, target.inverted, q_hi, q_lo, q_valid, expand_e=expand_e
    )
    assert got.n_hits == full.n_hits
    assert np.array_equal(got.q, full.q)
    assert np.array_equal(got.t, full.t)
    assert np.array_equal(got.count, full.count)
    assert np.array_equal(got.weight, full.weight)


def test_sharded_sparse_search_undersized_budget_retries():
    """A too-small compact budget must be detected via the per-shard
    match totals and retried exactly."""
    from kmerseek_tpu.ops.sparse_search import sparse_search
    from kmerseek_tpu.parallel.dist import sharded_sparse_search

    rng = np.random.default_rng(8)
    pool = np.sort(
        rng.choice(np.uint64(2) ** 62, size=150, replace=False).astype(np.uint64)
    )
    target = _rand_index(50, 20, pool, 80)
    query = _rand_index(20, 15, pool, 81)
    import jax.numpy as jnp

    q_hi, q_lo, _ab, _c = query.dense_device_arrays()
    S = q_hi.shape[1]
    q_valid = jnp.asarray(np.arange(S)[None, :] < query.counts[:, None])
    full = sparse_search(target, q_hi, q_lo, q_valid)
    mesh = make_mesh()
    got = sharded_sparse_search(
        mesh, target.inverted, q_hi, q_lo, q_valid, expand_e=128
    )
    assert got.n_hits == full.n_hits
    assert np.array_equal(got.q, full.q)
    assert np.array_equal(got.count, full.count)
    assert np.array_equal(got.weight, full.weight)


def test_sharded_sparse_pad_rows_filtered():
    """Sentinel pad rows (hash u64::MAX, tid = n_targets) sit at the end
    of the padded posting array; a genuine query hash of u64::MAX must
    match the real postings but never surface a pad-row hit."""
    import jax.numpy as jnp

    from kmerseek_tpu.ops.sparse_search import sparse_search
    from kmerseek_tpu.parallel.dist import sharded_sparse_search

    M = 0xFFFFFFFFFFFFFFFF
    # 3 targets, 7 postings (not divisible by 8 → pad rows added)
    rows = [
        np.array([5, 1000, M], dtype=np.uint64),
        np.array([7, M], dtype=np.uint64),
        np.array([9, M], dtype=np.uint64),
    ]
    flat = np.concatenate(rows)
    offsets = np.array([0, 3, 5, 7], np.int64)
    ab = np.arange(1, len(flat) + 1, dtype=np.int64)
    target = ProteomeIndex(
        IndexConfig(16, 1, "hp"), ["a", "b", "c"], flat, ab, offsets
    )
    q64 = np.array([[5, M]], dtype=np.uint64)
    q_hi = jnp.asarray((q64 >> np.uint64(32)).astype(np.uint32))
    q_lo = jnp.asarray((q64 & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    q_valid = jnp.ones((1, 2), bool)

    full = sparse_search(target, q_hi, q_lo, q_valid)
    mesh = make_mesh()
    for e in (None, 1024):
        got = sharded_sparse_search(
            mesh, target.inverted, q_hi, q_lo, q_valid, expand_e=e
        )
        assert got.t.max(initial=-1) < len(target)  # no pad-row hits
        assert got.n_hits == full.n_hits
        assert np.array_equal(got.q, full.q)
        assert np.array_equal(got.t, full.t)
        assert np.array_equal(got.count, full.count)
        assert np.array_equal(got.weight, full.weight)


def test_sharded_sparse_empty_index():
    """Zero-posting index: the sharded engine must return an empty hit
    list instead of gathering into a 0-row posting array."""
    import jax.numpy as jnp

    from kmerseek_tpu.ops.inverted import build_inverted_np
    from kmerseek_tpu.parallel.dist import sharded_sparse_search

    inv = build_inverted_np(
        np.zeros(0, np.uint64), np.zeros(0, np.int64), np.array([0, 0, 0], np.int64)
    )
    mesh = make_mesh()
    got = sharded_sparse_search(
        mesh,
        inv,
        jnp.zeros((2, 4), jnp.uint32),
        jnp.zeros((2, 4), jnp.uint32),
        jnp.ones((2, 4), bool),
    )
    assert got.n_hits == 0 and len(got.q) == 0


def test_sharded_sparse_program_cached():
    """Repeated searches against one index reuse the sharded upload and
    the jitted program (no re-device_put / re-trace per call)."""
    import jax.numpy as jnp

    import kmerseek_tpu.parallel.dist as dist_mod
    from kmerseek_tpu.parallel.dist import sharded_sparse_search

    rng = np.random.default_rng(5)
    pool = np.sort(
        rng.choice(np.uint64(2) ** 62, size=200, replace=False).astype(np.uint64)
    )
    target = _rand_index(40, 15, pool, 90)
    query = _rand_index(10, 10, pool, 91)
    q_hi, q_lo, _ab, _c = query.dense_device_arrays()
    S = q_hi.shape[1]
    q_valid = jnp.asarray(np.arange(S)[None, :] < query.counts[:, None])
    mesh = make_mesh()
    a = sharded_sparse_search(mesh, target.inverted, q_hi, q_lo, q_valid)
    key = (id(target.inverted.g_hi), id(mesh))
    assert key in dist_mod._SHARDED_SPARSE_CACHE
    entry_before = dist_mod._SHARDED_SPARSE_CACHE[key][2]
    b = sharded_sparse_search(mesh, target.inverted, q_hi, q_lo, q_valid)
    assert dist_mod._SHARDED_SPARSE_CACHE[key][2] is entry_before
    assert a.n_hits == b.n_hits and np.array_equal(a.q, b.q)


def test_sharded_sparse_run_chunk_tiling():
    """A heavy-hitter hash present in every target inflates max_run;
    the sharded engine must tile run offsets (bounding per-chip kernel
    memory to O(Q*S*run_chunk)) and merge the per-(shard, tile) partial
    lists to the exact unsharded result — both expansion strategies."""
    import jax.numpy as jnp

    from kmerseek_tpu.ops.sparse_search import sparse_search
    from kmerseek_tpu.parallel.dist import sharded_sparse_search

    rng = np.random.default_rng(73)
    pool = np.sort(
        rng.choice(np.uint64(2) ** 62, size=300, replace=False).astype(np.uint64)
    )
    base = _rand_index(120, 10, pool, 74)
    common = pool[1]
    mins, ab = [], []
    for i in range(len(base)):
        row = base.mins[base.offsets[i]:base.offsets[i + 1]]
        rab = base.abundances[base.offsets[i]:base.offsets[i + 1]]
        if common not in row:
            j = int(np.searchsorted(row, common))
            row = np.insert(row, j, common)
            rab = np.insert(rab, j, 3)
        mins.append(row)
        ab.append(rab)
    counts = np.array([len(r) for r in mins])
    target = ProteomeIndex(
        base.config,
        list(base.names),
        np.concatenate(mins),
        np.concatenate(ab),
        np.concatenate([[0], np.cumsum(counts)]).astype(np.int64),
    )
    assert target.inverted.max_run >= 120

    query = _rand_index(10, 8, pool, 75)
    qm = query.mins.copy()
    qm[query.offsets[0]] = common
    qm[query.offsets[0]:query.offsets[1]] = np.sort(
        qm[query.offsets[0]:query.offsets[1]]
    )
    query = ProteomeIndex(
        query.config, list(query.names), qm, query.abundances, query.offsets
    )
    q_hi, q_lo, _ab, _c = query.dense_device_arrays()
    S = q_hi.shape[1]
    q_valid = jnp.asarray(np.arange(S)[None, :] < query.counts[:, None])

    full = sparse_search(target, q_hi, q_lo, q_valid)
    mesh = make_mesh()
    for expand_e in (None, 2048):
        got = sharded_sparse_search(
            mesh,
            target.inverted,
            q_hi,
            q_lo,
            q_valid,
            expand_e=expand_e,
            run_chunk=8,
        )
        assert got.n_hits == full.n_hits
        assert np.array_equal(got.q, full.q)
        assert np.array_equal(got.t, full.t)
        assert np.array_equal(got.count, full.count)
        assert np.array_equal(got.weight, full.weight)
