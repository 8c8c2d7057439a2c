"""Native C++ library (libkseek) vs the Python/JAX reference paths."""


import numpy as np
import pytest

from kmerseek_tpu import native
from kmerseek_tpu.ops.encoding import encode_bytes_np, max_hash_for_scaled
from kmerseek_tpu.ops.murmur3 import murmur64_bytes_py

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libkseek.so not built (make -C kmerseek_tpu/native)"
)


def test_native_parse_fasta_matches_python(bcl2_first25):
    from kmerseek_tpu.core.fasta import open_maybe_compressed

    # python reference parse (force non-native by reading the stream)
    name = None
    chunks = []
    py_records = []
    with open_maybe_compressed(bcl2_first25) as f:
        for raw in f:
            line = raw.rstrip(b"\r\n")
            if line.startswith(b">"):
                if name is not None:
                    py_records.append((name, b"".join(chunks)))
                name = line[1:].decode()
                chunks = []
            elif line:
                chunks.append(line)
    py_records.append((name, b"".join(chunks)))

    native_records = native.parse_fasta(bcl2_first25)
    assert native_records == py_records


def test_native_sketch_matches_oracle():
    rng = np.random.default_rng(5)
    letters = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", np.uint8)
    seq = bytes(letters[rng.integers(0, 20, size=300)])
    enc = encode_bytes_np(np.frombuffer(seq, np.uint8), "hp").tobytes()
    k, scaled = 16, 5
    mh = max_hash_for_scaled(scaled)
    hashes, abund = native.sketch_cpu(enc, k, mh)

    from collections import Counter

    c = Counter()
    for i in range(len(enc) - k + 1):
        h = murmur64_bytes_py(enc[i : i + k])
        if h <= mh:
            c[h] += 1
    expect = sorted(c)
    assert [int(h) for h in hashes] == expect
    assert [int(a) for a in abund] == [c[h] for h in expect]


def test_native_batch_throughput_runs():
    rng = np.random.default_rng(5)
    letters = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", np.uint8)
    seqs = [bytes(letters[rng.integers(0, 20, size=200)]) for _ in range(50)]
    enc = [encode_bytes_np(np.frombuffer(s, np.uint8), "hp").tobytes() for s in seqs]
    concat = b"".join(enc)
    offsets = np.zeros(len(enc) + 1, np.int64)
    for i, e in enumerate(enc):
        offsets[i + 1] = offsets[i] + len(e)
    secs, total = native.sketch_cpu_batch_throughput(
        concat, offsets, 16, max_hash_for_scaled(5), 2
    )
    assert total == sum(len(e) - 16 + 1 for e in enc)
    assert secs > 0


def test_fasta_reader_uses_native(bcl2_first25):
    """read_fasta must produce the same records whether or not the
    native parser is in play."""
    from kmerseek_tpu.core.fasta import read_fasta

    records = read_fasta(bcl2_first25)
    assert len(records) == 25
    assert records[0].name.startswith("sp|O43236|SEPT4_HUMAN")


def test_native_argsort_u64_matches_numpy_stable():
    """The radix argsort must be a bit-exact stable argsort: the
    inverted posting build relies on ties (equal hashes) keeping CSR
    order so posting runs stay tid-ascending."""
    if not native.available():
        import pytest

        pytest.skip("libkseek.so unavailable")
    rng = np.random.default_rng(19)
    for n in [0, 1, 7, 1000, 65537]:
        keys = rng.integers(0, 2**62, size=n, dtype=np.uint64)
        if n >= 4:
            keys[: n // 2] = keys[n // 2 : n // 2 + n // 2]  # duplicates
        got = native.argsort_u64(keys, n_threads=3)
        want = np.argsort(keys, kind="stable")
        assert np.array_equal(got, want), f"n={n}"
    # narrow key range: exercises the constant-digit pass skip
    keys = rng.integers(0, 1000, size=50_000, dtype=np.uint64)
    assert np.array_equal(
        native.argsort_u64(keys), np.argsort(keys, kind="stable")
    )


def test_build_inverted_uses_native_sort(monkeypatch):
    """Above the size threshold build_inverted_np routes through the
    native argsort and produces the identical InvertedIndex."""
    import kmerseek_tpu.ops.inverted as inv_mod

    if not native.available():
        import pytest

        pytest.skip("libkseek.so unavailable")
    rng = np.random.default_rng(23)
    T, S = 300, 24
    mins = np.sort(
        rng.integers(0, 2**40, size=(T, S), dtype=np.uint64), axis=1
    ).reshape(-1)
    ab = rng.integers(1, 5, size=len(mins)).astype(np.int64)
    offsets = np.arange(T + 1, dtype=np.int64) * S
    ref = inv_mod.build_inverted_np(mins, ab, offsets)

    calls = []
    real = native.argsort_u64

    def spy(keys, n_threads=None):
        calls.append(len(keys))
        return real(keys, n_threads)

    monkeypatch.setattr(inv_mod, "_NATIVE_SORT_MIN", 1)
    import kmerseek_tpu.native as nat

    monkeypatch.setattr(nat, "argsort_u64", spy)
    got = inv_mod.build_inverted_np(mins, ab, offsets)
    assert calls == [len(mins)]
    assert np.array_equal(got.g_hi, ref.g_hi)
    assert np.array_equal(got.g_lo, ref.g_lo)
    assert np.array_equal(got.tid, ref.tid)
    assert np.array_equal(got.ab, ref.ab)
    assert got.max_run == ref.max_run
    assert np.array_equal(got.bucket_starts, ref.bucket_starts)


def test_build_engine_native_bit_equal(bcl2_first25):
    """engine='native' (C++ CPU sketcher, no jax compile) must produce
    an index bit-equal to the device path; 'auto' picks native for tiny
    corpora and must match too."""
    from kmerseek_tpu.core.index import IndexConfig, ProteomeIndex

    cfg = IndexConfig(16, 5, "hp")
    dev = ProteomeIndex.build(bcl2_first25, cfg, engine="device")
    nat = ProteomeIndex.build(bcl2_first25, cfg, engine="native")
    auto = ProteomeIndex.build(bcl2_first25, cfg)
    assert nat.is_equivalent_to(dev)
    assert auto.is_equivalent_to(dev)
    assert np.array_equal(nat.mins, dev.mins)
    assert np.array_equal(nat.abundances, dev.abundances)
    assert nat.mins.dtype == dev.mins.dtype
    assert nat.abundances.dtype == dev.abundances.dtype


def test_build_engine_native_unavailable_raises(bcl2_first25, monkeypatch):
    """engine='native' must fail loudly when libkseek is missing, and
    'auto' must silently fall back to the device path."""
    import kmerseek_tpu.native as native_mod
    from kmerseek_tpu.core.index import IndexConfig, ProteomeIndex

    monkeypatch.setattr(native_mod, "available", lambda: False)
    cfg = IndexConfig(16, 5, "hp")
    with pytest.raises(RuntimeError, match="libkseek"):
        ProteomeIndex.build(bcl2_first25, cfg, engine="native")
    auto = ProteomeIndex.build(bcl2_first25, cfg)  # falls back to device
    dev = ProteomeIndex.build(bcl2_first25, cfg, engine="device")
    assert auto.is_equivalent_to(dev)
    with pytest.raises(ValueError, match="unknown sketch engine"):
        ProteomeIndex.build(bcl2_first25, cfg, engine="gpu")


def test_auto_engine_routes_corpora_to_device(bcl2_first25, monkeypatch):
    """'auto' must fast-path natively ONLY when the whole corpus is one
    under-threshold batch — a multi-batch build (every batch under the
    window threshold individually) must take the device path, not crawl
    through the serial CPU sketcher batch by batch."""
    import kmerseek_tpu.core.index as index_mod
    from kmerseek_tpu.core.index import IndexConfig, ProteomeIndex

    calls = []
    real = index_mod.sketch_batch_signatures_native

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(index_mod, "sketch_batch_signatures_native", spy)
    cfg = IndexConfig(16, 5, "hp")
    # batch_size 8 < 25 records → multi-batch corpus → device engine
    ProteomeIndex.build(bcl2_first25, cfg, batch_size=8)
    assert not calls, "multi-batch auto build must not use the native path"
    # single under-threshold batch → native fast path
    ProteomeIndex.build(bcl2_first25, cfg)
    assert calls, "single-batch tiny build should use the native path"
