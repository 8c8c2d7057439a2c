"""Entity artifact caching and reuse semantics (entity.py parity),
alphabet policies, stitching quirks, multihost sharding helpers."""

import os

import pytest

from kmerseek_tpu.core.entity import KmerseekIndex, KmerseekQuery, make_sigfile

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture
def local_fasta(tmp_path):
    p = tmp_path / "tiny.fasta"
    p.write_text(">p1\nPLANTANDANIMALGENQMES\n>p2\nLIVINGALIVE\n")
    return str(p)


def test_entity_products_and_reuse(local_fasta):
    e = KmerseekIndex(local_fasta, moltype="protein", ksize=5, scaled=1)
    sig = e.sig
    assert sig == make_sigfile(local_fasta, "protein", 5, 1)
    assert os.path.exists(sig)
    ksx = e.ksx
    assert os.path.isdir(ksx)

    # second entity must REUSE (mtime unchanged)
    t0 = os.path.getmtime(sig)
    e2 = KmerseekIndex(local_fasta, moltype="protein", ksize=5, scaled=1)
    assert e2.sig == sig
    assert os.path.getmtime(sig) == t0

    # force re-creates
    e3 = KmerseekIndex(local_fasta, moltype="protein", ksize=5, scaled=1, force=True)
    _ = e3.sig
    # loaded-from-cache index must equal the fresh one
    assert e2.index.is_equivalent_to(e3.index)


def test_entity_kmers_pq(local_fasta):
    q = KmerseekQuery(
        local_fasta, moltype="hp", ksize=5, scaled=1, extract_kmers=True
    )
    pq_path = q.kmers_pq
    assert pq_path.endswith(".kmers.pq")
    df = q.kmers_dataframe
    assert list(df.columns) == [
        "sequence_file",
        "sequence_name",
        "kmer",
        "hashval",
        "encoded",
        "start",
    ]
    # p1 has 17 windows, p2 has 7 (scaled=1 keeps all)
    assert len(df) == 24
    no_extract = KmerseekQuery(local_fasta, moltype="hp", ksize=5, scaled=1)
    assert no_extract.kmers_pq is None


def test_alphabet_random_policy_seeded():
    from kmerseek_tpu.core.alphabet import validate_resolve_batch

    out1 = validate_resolve_batch([b"BZJBZJBZJ"] * 4, policy="random", seed=7)
    out2 = validate_resolve_batch([b"BZJBZJBZJ"] * 4, policy="random", seed=7)
    assert out1 == out2  # deterministic under a seed
    # every resolution is a legal candidate
    for s in out1:
        for i, ch in enumerate("BZJ" * 3):
            assert chr(s[i]) in {"B": "DN", "Z": "EQ", "J": "IL"}[ch]


def test_stitch_delta_zero_quirk():
    """Δstart == 0 appends the whole k-mer (reference search.py:37-58)."""
    from kmerseek_tpu.core.stitch import single_stitch_together_kmers

    assert single_stitch_together_kmers(["ABCDE"], [0]) == "ABCDE"
    assert single_stitch_together_kmers(["ABCDE", "BCDEF"], [0, 1]) == "ABCDEF"
    # the quirk: same start twice → whole second k-mer appended
    assert single_stitch_together_kmers(["ABCDE", "XYZPQ"], [3, 3]) == "ABCDEXYZPQ"
    # gap >= k appends the whole k-mer too
    assert single_stitch_together_kmers(["ABCDE", "FGHIJ"], [0, 5]) == "ABCDEFGHIJ"


def test_stitch_negative_delta_matches_reference_slice():
    """Δ<0 appends kmer[|Δ|:] — the reference's kmer[-kmer_slice:] with a
    negative slice (search.py:52-53), NOT the whole k-mer."""
    from kmerseek_tpu.core.stitch import single_stitch_together_kmers

    # delta = 1 - 3 = -2 → appends kmer[2:] = "ZPQ"
    assert single_stitch_together_kmers(["ABCDE", "XYZPQ"], [3, 1]) == "ABCDEZPQ"
    # delta = 1 - 9 = -8 → kmer[8:] is empty (len-5 kmer): nothing appended
    assert single_stitch_together_kmers(["ABCDE", "XYZPQ"], [9, 1]) == "ABCDE"


def test_multihost_sharding_helpers():
    from kmerseek_tpu.parallel.multihost import (
        hash_range_for_shard,
        host_owns_record,
    )

    # round-robin: every record owned by exactly one of 3 hosts
    owners = [
        [p for p in range(3) if host_owns_record(i, p, 3)] for i in range(10)
    ]
    assert all(len(o) == 1 for o in owners)
    assert [o[0] for o in owners] == [0, 1, 2, 0, 1, 2, 0, 1, 2, 0]

    lo0, hi0 = hash_range_for_shard(0, 4)
    lo3, hi3 = hash_range_for_shard(3, 4)
    assert lo0 == 0 and hi3 == 1 << 64
    assert hi0 == (1 << 64) // 4


def test_iter_host_shard_batches(local_fasta):
    from kmerseek_tpu.parallel.multihost import iter_host_shard_batches

    seen = []
    for pid in range(2):
        for batch in iter_host_shard_batches(local_fasta, pid, 2):
            seen.extend((o, r.name) for o, r in batch)
    assert sorted(seen) == [(0, "p1"), (1, "p2")]


def test_fasta_compression_variants(tmp_path):
    """bz2 / xz / plain round-trip through the auto-detecting reader."""
    import bz2 as _bz2
    import lzma as _lzma

    from kmerseek_tpu.core.fasta import read_fasta

    content = b">s1\nPLANTANDANIMALGENQMES\n>s2\nLIVING\nALIVE\n"
    for name, data in [
        ("plain.fasta", content),
        ("c.fasta.bz2", _bz2.compress(content)),
        ("c.fasta.xz", _lzma.compress(content)),
    ]:
        p = tmp_path / name
        p.write_bytes(data)
        recs = read_fasta(str(p))
        assert [r.name for r in recs] == ["s1", "s2"]
        assert recs[1].seq == b"LIVINGALIVE"  # multi-line concatenation


def test_fasta_stdin(tmp_path):
    """'-' reads stdin (io.rs:74-76 parity) — via subprocess."""
    import subprocess, sys, os

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO_ROOT
    code = (
        "from kmerseek_tpu.core.fasta import read_fasta;"
        "recs = read_fasta('-');"
        "print(len(recs), recs[0].name)"
    )
    r = subprocess.run(
        [sys.executable, "-c", code],
        input=">p1\nPLANT\n>p2\nLIVING\n",
        capture_output=True,
        text=True,
        env=env,
    )
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip() == "2 p1"


def test_prefetch_orders_and_propagates_errors():
    from kmerseek_tpu.core.fasta import prefetch

    assert list(prefetch(iter(range(100)), depth=3)) == list(range(100))

    def boom():
        yield 1
        raise ValueError("producer broke")

    it = prefetch(boom(), depth=2)
    assert next(it) == 1
    import pytest as _pytest

    with _pytest.raises(ValueError, match="producer broke"):
        list(it)


def test_prefetch_producer_stops_when_abandoned():
    """Abandoning the prefetch generator mid-stream must stop the
    producer thread (it would otherwise block forever on the bounded
    queue, leaking the thread and the open FASTA handle)."""
    import threading
    import time as _time

    from kmerseek_tpu.core.fasta import prefetch

    started = threading.Event()
    finished = threading.Event()

    def slow_source():
        started.set()
        try:
            for i in range(1000):
                yield i
        finally:
            finished.set()

    gen = prefetch(slow_source(), depth=1)
    assert next(gen) == 0
    assert started.is_set()
    gen.close()  # abandon
    for _ in range(100):  # producer notices within ~0.1s polls
        if finished.is_set():
            break
        _time.sleep(0.05)
    assert finished.is_set()


def test_stitch_group_by_pair_separates_queries():
    """Reference quirk: grouping by match_name only interleaves k-mers
    from different queries hitting the same target into ONE stitched
    row (search.py:222-240). group_by_pair=True opts into per-(match,
    query) rows; default stays quirk-compatible."""
    import pandas as pd

    from kmerseek_tpu.core.stitch import stitch_results

    def kdf(rows):
        return pd.DataFrame(
            rows,
            columns=["kmer", "start", "sequence_name", "sequence_file",
                     "encoded", "hashval"],
        )

    target_kmers = kdf([
        ("AAAAA", 0, "M", "t.fa", "hhhhh", 1),
        ("CCCCC", 10, "M", "t.fa", "ppppp", 2),
    ])
    query_kmers = kdf([
        ("AAAAA", 0, "QA", "q.fa", "hhhhh", 1),
        ("CCCCC", 5, "QB", "q.fa", "ppppp", 2),
    ])
    rows = [
        {"match_name": "M", "query_name": "QA"},
        {"match_name": "M", "query_name": "QB"},
    ]

    merged_df, _rep = stitch_results(rows, query_kmers, target_kmers)
    assert len(merged_df) == 1  # quirk: one row mixing QA and QB
    assert merged_df.iloc[0]["query_name"] == "QA"
    assert merged_df.iloc[0]["length"] == 10

    per_pair, _rep2 = stitch_results(
        rows, query_kmers, target_kmers, group_by_pair=True
    )
    assert len(per_pair) == 2
    assert set(per_pair["query_name"]) == {"QA", "QB"}
    assert per_pair["length"].tolist() == [5, 5]


def test_streaming_kmer_writer_identical(local_fasta, tmp_path, monkeypatch):
    """write_kmer_table_for_index streams row groups; decoded contents
    must equal the eager table, even when a tiny row-group size forces
    many groups (the memory-bounded path at UniProt scale)."""
    import pyarrow.parquet as pq

    from kmerseek_tpu.core import kmers as kmers_mod
    from kmerseek_tpu.core.index import IndexConfig, ProteomeIndex

    idx = ProteomeIndex.build(
        local_fasta,
        IndexConfig(ksize=5, scaled=1, moltype="hp"),
        store_raw_sequences=True,
    )
    eager = kmers_mod.kmer_table_for_index(idx)
    p_eager = str(tmp_path / "eager.pq")
    kmers_mod.write_kmer_table(eager, p_eager)

    monkeypatch.setattr(kmers_mod, "KMERS_ROW_GROUP", 4)
    p_stream = str(tmp_path / "stream.pq")
    kmers_mod.write_kmer_table_for_index(idx, p_stream)

    t_stream = pq.read_table(p_stream)
    assert t_stream.num_rows == eager.num_rows == 24
    assert t_stream.to_pandas().equals(eager.to_pandas())
    # tiny row groups really were flushed incrementally (batch_rows=512
    # sequences -> one iter chunk here, split into 4-row groups)
    assert pq.ParquetFile(p_stream).num_row_groups >= 2


def test_stitch_streaming_byte_equal(ced9, bcl2_first25, tmp_path, monkeypatch):
    """The streaming hash-join stitch (parquet scan + name/hash filters)
    must reproduce the eager pandas-join stitch byte-for-byte on the
    golden ced9-vs-bcl2 corpus, including with row groups small enough
    that the target sidecar spans many scan batches."""
    import shutil

    from kmerseek_tpu.core import kmers as kmers_mod
    from kmerseek_tpu.core.search import manysearch
    from kmerseek_tpu.core.stitch import (
        stitch_results,
        stitch_results_streaming,
        stitched_to_csv,
    )

    q_fa = str(tmp_path / os.path.basename(ced9))
    t_fa = str(tmp_path / os.path.basename(bcl2_first25))
    shutil.copy(ced9, q_fa)
    shutil.copy(bcl2_first25, t_fa)

    monkeypatch.setattr(kmers_mod, "KMERS_ROW_GROUP", 128)
    query = KmerseekQuery(q_fa, moltype="hp", ksize=16, scaled=5, extract_kmers=True)
    target = KmerseekIndex(t_fa, moltype="hp", ksize=16, scaled=5, extract_kmers=True)
    rows = manysearch(query.index, target.index)

    eager_df, eager_rep = stitch_results(
        rows, query.kmers_dataframe, target.kmers_dataframe
    )
    stream_df, stream_rep = stitch_results_streaming(
        rows, query.kmers_pq, target.kmers_pq, batch_rows=64
    )
    assert stitched_to_csv(stream_df) == stitched_to_csv(eager_df)
    assert stream_rep == eager_rep
    assert len(eager_df) == 5  # the golden five stitched segments

    # group_by_pair opt-out flows through the streaming path too
    e2, _ = stitch_results(
        rows, query.kmers_dataframe, target.kmers_dataframe, group_by_pair=True
    )
    s2, _ = stitch_results_streaming(
        rows, query.kmers_pq, target.kmers_pq, group_by_pair=True, batch_rows=64
    )
    assert stitched_to_csv(s2) == stitched_to_csv(e2)
