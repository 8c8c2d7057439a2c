"""Support-module parity tests: metrics, config, iterators, uniprot,
native CLI surface."""

import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_metrics_rates():
    from kmerseek_tpu.utils.metrics import IndexMetrics, MetricsCollector, time_operation

    m = IndexMetrics(kmers_processed=1000, processing_time_secs=2.0)
    assert m.kmers_per_second == 500.0
    c = MetricsCollector()
    c.record_kmers(10)
    c.record_signatures(2)
    c.record_cache(True)
    c.record_cache(False)
    snap = c.snapshot()
    assert snap.kmers_processed == 10
    assert snap.cache_hit_rate == 0.5
    sink = {}
    with time_operation("op", sink):
        pass
    assert "op" in sink


def test_performance_config():
    from kmerseek_tpu.utils.config import PerformanceConfig, PerformanceConfigBuilder

    cfg = (
        PerformanceConfigBuilder()
        .host_threads(2)
        .batch_size(500)
        .enable_metrics()
        .build()
    )
    assert cfg.effective_thread_count == 2
    assert cfg.batch_size == 500
    assert PerformanceConfig().effective_thread_count >= 1
    with pytest.raises(ValueError):
        PerformanceConfigBuilder().batch_size(0).build()


def test_performance_config_is_consumed(tmp_path, monkeypatch):
    """The process-wide PerformanceConfig really feeds its consumers:
    the Pallas block picker's VMEM budget and the ingest batch size."""
    from kmerseek_tpu.ops.sketch_pallas import _pick_block_rows
    from kmerseek_tpu.utils.config import (
        PerformanceConfig,
        get_default_performance_config,
        set_default_performance_config,
    )

    orig = get_default_performance_config()
    try:
        big = _pick_block_rows(256, 1024, 24)
        set_default_performance_config(
            PerformanceConfig(vmem_budget_bytes=256 * 1024)
        )
        small = _pick_block_rows(256, 1024, 24)
        assert small < big  # tighter budget → smaller blocks

        # batch_size drives the ingest loop: count record batches
        import kmerseek_tpu.core.index as index_mod

        p = tmp_path / "four.fasta"
        p.write_text(">a\nMKVLAAN\n>b\nPLANTSS\n>c\nSEVENAA\n>d\nPROTEIN\n")
        calls = []
        real = index_mod.iter_record_batches

        def spy(fasta, batch_size):
            calls.append(batch_size)
            return real(fasta, batch_size)

        monkeypatch.setattr(index_mod, "iter_record_batches", spy)
        set_default_performance_config(PerformanceConfig(batch_size=2))
        index_mod.ProteomeIndex.build(
            str(p), index_mod.IndexConfig(5, 1, "protein")
        )
        assert calls == [2]
    finally:
        set_default_performance_config(orig)


@pytest.fixture
def kmer_table():
    return pd.DataFrame(
        {
            "sequence_file": ["f"] * 5,
            "sequence_name": ["s1", "s1", "s1", "s2", "s2"],
            "kmer": ["AAAAA", "CCCCC", "AAAAA", "GGGGG", "TTTTT"],
            "hashval": np.array([11, 22, 11, 33, 44], np.uint64),
            "encoded": ["hhhhh", "ppppp", "hhhhh", "hhhhh", "ppppp"],
            "start": np.array([0, 3, 10, 2, 4], np.uint32),
        }
    )


def test_iterators_functional(kmer_table):
    from kmerseek_tpu.core import iterators as it

    infos = dict(it.iter_kmer_infos(kmer_table))
    assert set(infos) == {11, 22, 33, 44}
    assert it.unique_kmer_count(kmer_table, 11) == 1
    assert it.total_occurrences(kmer_table, 11) == 2
    assert it.has_position(kmer_table, 11, 10)
    assert not it.has_position(kmer_table, 11, 5)

    groups = it.group_kmers_by_count(kmer_table)
    assert 11 in groups[2] and 22 in groups[1]
    assert it.find_multi_position_kmers(kmer_table) == [11]
    # s1 windows at starts {0, 3, 10}; k=5 → overlap only (0, 3)
    assert it.find_overlapping_kmers(kmer_table, "s1", 5) == [(0, 3)]
    assert it.calculate_kmer_density(kmer_table, "s1", 14, 5) == 0.3


def test_uniprot_stub_and_xml():
    from kmerseek_tpu.core.uniprot import get_domains

    # stub behavior (no XML): None, reference parity
    assert get_domains("sp|P10415|BCL2_HUMAN", 0, 100) is None

    xml = "/root/reference/tests/testdata/index/uniprotkb_gene_bcl2_AND_reviewed_true_2025_06_04.xml"
    if not os.path.exists(xml):
        pytest.skip("uniprot xml fixture unavailable")
    doms = get_domains("sp|P10415|BCL2_HUMAN", 0, 250, xml_path=xml)
    assert doms is not None and len(doms) > 0
    assert all(d.start < 250 and d.end > 0 for d in doms)


def test_native_cli_surface(tmp_path):
    fasta = tmp_path / "two.fasta"
    fasta.write_text(">p1\nPLANTANDANIMALGENQMES\n>p2\nLIVINGALIVE\n")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    result = subprocess.run(
        [
            sys.executable,
            "-m",
            "kmerseek_tpu.native_cli",
            "index",
            "--input",
            str(fasta),
            "--ksize",
            "5",
        ],
        capture_output=True,
        text=True,
        cwd=tmp_path,
        env=env,
    )
    assert result.returncode == 0, result.stderr
    out = str(fasta) + ".protein.k5.scaled1.kmerseek.ksx"
    assert os.path.isdir(out)
    assert "2 signatures" in result.stderr
    assert "kmers/s" in result.stderr

    from kmerseek_tpu.core.index import ProteomeIndex

    idx = ProteomeIndex.load(out)
    assert sorted(idx.counts.tolist()) == [7, 17]


def test_error_types(tmp_path):
    from kmerseek_tpu.utils.errors import (
        ConfigurationError,
        InvalidAminoAcid,
        KmerseekError,
        NoSavedState,
        with_context,
    )
    from kmerseek_tpu.core.index import ProteomeIndex

    with pytest.raises(NoSavedState):
        ProteomeIndex.load(str(tmp_path / "nope"))
    e = ConfigurationError("ksize", "out of range")
    assert e.field == "ksize" and "ksize" in str(e)
    wrapped = with_context(ValueError("x"), "loading index")
    assert isinstance(wrapped, KmerseekError)
    assert isinstance(wrapped.__cause__, ValueError)
    assert issubclass(InvalidAminoAcid, ValueError)


def test_store_raw_sequences_roundtrip(tmp_path):
    """Raw-sequence storage parity (index.rs:2847-2934): stored form is
    the uppercased, resolved, stop-truncated sequence; survives
    save/load."""
    from kmerseek_tpu.core.index import IndexConfig, ProteomeIndex

    fasta = tmp_path / "raw.fasta"
    fasta.write_text(">p1\nplantBzj*tail\n>p2\nLIVINGALIVE\n")
    idx = ProteomeIndex.build(
        str(fasta), IndexConfig(5, 1, "protein"), store_raw_sequences=True
    )
    assert idx.sequences[0] == b"PLANTDEI*"
    assert idx.sequences[1] == b"LIVINGALIVE"
    p = str(tmp_path / "idx.ksx")
    idx.save(p)
    idx2 = ProteomeIndex.load(p)
    assert idx2.sequences == idx.sequences


def test_u64_split_join_view_roundtrip():
    """The byte-view split/join (fast path on this host class: numpy's
    u64 shift kernels run ~25x slower than copies) must be bit-equal to
    the shift arithmetic over edge values, shapes, and scalars."""
    import numpy as np

    from kmerseek_tpu.ops import u64

    v = np.array(
        [0, 1, 0xFFFFFFFF, 0x100000000, 0xFFFFFFFFFFFFFFFF, 0x123456789ABCDEF0],
        dtype=np.uint64,
    )
    hi, lo = u64.split_np(v)
    assert hi.dtype == np.uint32 and lo.dtype == np.uint32
    assert np.array_equal(hi, (v >> np.uint64(32)).astype(np.uint32))
    assert np.array_equal(lo, (v & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    assert np.array_equal(u64.join_np(hi, lo), v)
    # 2-D, non-contiguous input, scalar, empty
    m = np.arange(24, dtype=np.uint64).reshape(4, 6) * np.uint64(2**33 + 7)
    h2, l2 = u64.split_np(m[::2])
    assert np.array_equal(u64.join_np(h2, l2), m[::2])
    hs, ls = u64.split_np(np.uint64(0x0123456789ABCDEF))
    assert int(hs) == 0x01234567 and int(ls) == 0x89ABCDEF
    he, le = u64.split_np(np.zeros(0, np.uint64))
    assert u64.join_np(he, le).shape == (0,)


def test_tune_host_allocator_idempotent():
    from kmerseek_tpu.utils.hostmem import tune_host_allocator

    assert tune_host_allocator() in (True, False)
    # second call must be a no-op returning the cached result
    assert tune_host_allocator() == tune_host_allocator()


def test_prefault_arena_adaptive():
    """prefault_arena is a no-op when the requested bytes are already
    covered, and never raises; the high-water mark only grows."""
    import kmerseek_tpu.utils.hostmem as hm

    before = hm._prefaulted
    r1 = hm.prefault_arena(1 << 20)
    assert isinstance(r1, bool)
    assert hm._prefaulted >= before
    # covered request: immediate no-op regardless of fault-rate phase
    mark = hm._prefaulted
    assert hm.prefault_arena(min(mark, 1)) is False
    assert hm._prefaulted == mark


def test_compile_cache_seeding(tmp_path, monkeypatch):
    """The live cache dir is seeded from the shipped artifact dir —
    holes filled, local entries never overwritten, non-cache files
    ignored (utils/device.py::_seed_compile_cache)."""
    from kmerseek_tpu.utils.device import _seed_compile_cache

    src = tmp_path / "shipped"
    dst = tmp_path / "live"
    src.mkdir()
    dst.mkdir()
    (src / "jit_f-aaaa-cache").write_bytes(b"shipped-exe")
    (src / "jit_g-bbbb-cache").write_bytes(b"shipped-exe-2")
    (src / "README.txt").write_bytes(b"not a cache entry")
    (dst / "jit_g-bbbb-cache").write_bytes(b"local-exe")  # must survive

    monkeypatch.setenv("KMERSEEK_WARM_CACHE_DIR", str(src))
    _seed_compile_cache(str(dst))

    assert (dst / "jit_f-aaaa-cache").read_bytes() == b"shipped-exe"
    assert (dst / "jit_g-bbbb-cache").read_bytes() == b"local-exe"
    assert not (dst / "README.txt").exists()

    # atomic writes: no temp litter, and no inode sharing with the
    # shipped artifact (a hardlink would let cache mutation corrupt the
    # checked-out repo file — ADVICE r4)
    assert not [p for p in dst.iterdir() if p.name.startswith(".seed-")]
    assert (dst / "jit_f-aaaa-cache").stat().st_ino != (
        src / "jit_f-aaaa-cache"
    ).stat().st_ino

    # same dir for src and dst: no-op, no error
    monkeypatch.setenv("KMERSEEK_WARM_CACHE_DIR", str(dst))
    _seed_compile_cache(str(dst))
    # missing artifact dir: no-op, no error
    monkeypatch.setenv("KMERSEEK_WARM_CACHE_DIR", str(tmp_path / "nope"))
    _seed_compile_cache(str(dst))

    # opt-out env var disables seeding entirely
    (src / "jit_h-cccc-cache").write_bytes(b"late")
    monkeypatch.setenv("KMERSEEK_WARM_CACHE_DIR", str(src))
    monkeypatch.setenv("KMERSEEK_NO_CACHE_SEED", "1")
    _seed_compile_cache(str(dst))
    assert not (dst / "jit_h-cccc-cache").exists()


def test_bench_compact_record_contract():
    """bench.py's compact summary line (the LAST stdout line the driver
    parses) must stay short and carry every headline metric — BENCH_r04
    was lost to an oversized final line (VERDICT r4 ask #1)."""
    import json

    import bench

    result = {
        "metric": "sketch_kmers_per_second",
        "value": 1.321e9,
        "unit": "kmers/s",
        "vs_baseline": 26.3,
        "detail": {
            "cpu_1t_kmers_per_s": 5.02e7,
            "pct_of_vpu_speed_of_light": 56.4,
            "backend": "tpu (accelerator)",
            "search_queries_per_second": 112513.4,
            "search": {"queries": 4096, "block_autotune": {"x": 1}},
            "manysearch_end_to_end_queries_per_second": 16666.1,
            "manysearch_end_to_end": {"rows_per_s": 1662935.75, "big": "y" * 3000},
            "multisearch_end_to_end_queries_per_second": 6976.45,
            "multisearch_end_to_end": {"rows_per_s": 695915.22},
            "extract_stitch_sidecar_rows_per_second": 30253.0,
            "sharded_load_s": 0.044,
            "sharded_2proc_qps": 35.9,
            "uniprot_scale_sparse": {
                "targets": 524288,
                "warm_queries_per_second": 4120.41,
                "cold_queries_per_second": 51.7,
                "production_cold": {
                    "device_first_block_s": 0.87,
                    "device_cold_queries_per_second": 54.9,
                    "save_s": 12.3,
                    "load_s": 0.037,
                },
            },
        },
    }
    line = json.dumps(bench._compact(result))
    assert len(line) < 1800
    rec = json.loads(line)
    assert rec["metric"] == "sketch_kmers_per_second"
    assert rec["vs_baseline"] == 26.3
    s = rec["summary"]
    for key in (
        "sketch_kmers_per_s", "dense_search_qps", "dense_block",
        "manysearch_e2e_qps", "multisearch_e2e_qps",
        "extract_stitch_rows_per_s", "sparse_warm_qps", "sparse_cold_qps",
        "cold_device_first_block_s", "cold_save_s", "sharded_load_s",
        "backend",
    ):
        assert key in s, key
    # multi-KB nested detail must never leak into the compact line
    assert "big" not in line
