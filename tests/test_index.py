"""ProteomeIndex build/persist/interop vs reference fixtures & counts."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from kmerseek_tpu.core.index import IndexConfig, ProteomeIndex, generate_index_path
from kmerseek_tpu.core.kmers import kmer_table_for_index
from kmerseek_tpu.core.sigzip import read_sig_zip
from kmerseek_tpu.core.signature import mins_sum_hex, sourmash_md5


def test_build_bcl2_hp_k16(bcl2_first25, bcl2_hp_k16_sig_zip, tmp_path):
    idx = ProteomeIndex.build(bcl2_first25, IndexConfig(16, 5, "hp"))
    assert len(idx) == 25

    # signatures must equal the committed sourmash fixture exactly
    fixture = {s.name: s for s in read_sig_zip(bcl2_hp_k16_sig_zip)}
    assert set(idx.names) == set(fixture)
    for sig in idx.signatures():
        ref = fixture[sig.name]
        assert np.array_equal(sig.mins, ref.mins), sig.name
        assert np.array_equal(sig.abundances, ref.abundances), sig.name
        assert sig.md5sum == ref.md5sum, sig.name

    # save / load roundtrip + equivalence oracle
    p = str(tmp_path / "idx.ksx")
    idx.save(p)
    idx2 = ProteomeIndex.load(p)
    assert idx.is_equivalent_to(idx2)
    assert idx2.is_equivalent_to(idx)

    # sig.zip roundtrip
    zp = str(tmp_path / "out.sig.zip")
    idx.to_sig_zip(zp)
    idx3 = ProteomeIndex.from_sig_zip(zp)
    assert idx.is_equivalent_to(idx3)


def test_md5_matches_sourmash_fixture(bcl2_hp_k16_sig_zip):
    sigs = read_sig_zip(bcl2_hp_k16_sig_zip)
    for s in sigs[:3]:
        assert sourmash_md5(s.mins, s.ksize) == s.md5sum


def test_rust_sum_md5_parity():
    """The Rust path's 'md5' = hex(wrapping_sum(mins)) — golden id
    '7641839ad508ab8' for PLANTANDANIMALGENQMES protein k5
    (index.rs:1764-1768)."""
    from tests.test_murmur import GOLDEN_PROTEIN

    mins = sorted(h for h, _k, _p in GOLDEN_PROTEIN)
    assert mins_sum_hex(mins) == "7641839ad508ab8"


def test_kmer_table_matches_fixture(
    bcl2_first25, bcl2_hp_k24_true_kmers_pq, tmp_path
):
    """The 1712-row golden parquet (tests/test_entity.py:44-59)."""
    idx = ProteomeIndex.build(
        bcl2_first25, IndexConfig(24, 5, "hp"), store_raw_sequences=True
    )
    table = kmer_table_for_index(idx).to_pandas()
    ref = pq.read_table(bcl2_hp_k24_true_kmers_pq).to_pandas()
    assert len(table) == len(ref) == 1712

    key = ["sequence_name", "kmer", "start"]
    t = table.sort_values(key).reset_index(drop=True)
    r = ref.sort_values(key).reset_index(drop=True)
    assert (t["sequence_name"] == r["sequence_name"]).all()
    assert (t["kmer"] == r["kmer"]).all()
    assert (t["encoded"] == r["encoded"]).all()
    assert (t["start"].astype(np.uint32) == r["start"].astype(np.uint32)).all()
    assert (
        t["hashval"].astype(np.uint64) == r["hashval"].astype(np.uint64)
    ).all()


def test_index_config_validation():
    with pytest.raises(ValueError):
        IndexConfig(0, 5, "hp")
    with pytest.raises(ValueError):
        IndexConfig(101, 5, "hp")
    with pytest.raises(ValueError):
        IndexConfig(10, 0, "hp")
    with pytest.raises(ValueError):
        IndexConfig(10, 5, "dna")
    assert generate_index_path("x.fa", "hp", 24, 5) == "x.fa.hp.k24.scaled5.kmerseek.ksx"


def test_mixed_case_and_compression():
    """Mixed-case FASTA is uppercased (index.rs:2847-2934); zst works."""
    path = "/root/reference/tests/testdata/fasta/test_compression.fasta.zst"
    if not os.path.exists(path):
        pytest.skip("fixture missing")
    idx = ProteomeIndex.build(path, IndexConfig(5, 1, "protein"))
    by_name = {n: c for n, c in zip(idx.names, idx.counts)}
    # index.rs:1749-1789: LIVINGALIVE=7 distinct 5-mers, TEST_PROTEIN=17,
    # combined = 24
    assert sorted(by_name.values()) == [7, 17]
    comb, _ = idx.combined
    assert len(comb) == 24


def test_sig_zip_duplicate_sketches_not_shadowed(tmp_path):
    """Identical sketches share one md5; the writer must deduplicate the
    internal 'signatures/<md5>.sig.gz' names (like sourmash ZipStorage)
    so every signature survives a write/read roundtrip."""
    from kmerseek_tpu.core.signature import Signature
    from kmerseek_tpu.core.sigzip import read_sig_zip, write_sig_zip

    mins = np.array([11, 22, 33], np.uint64)
    ab = np.array([1, 2, 3], np.int64)
    sigs = [
        Signature(name=n, mins=mins, abundances=ab, ksize=16, scaled=5, moltype="hp")
        for n in ("protA", "protB", "protC")
    ]
    p = str(tmp_path / "dup.sig.zip")
    write_sig_zip(p, sigs)
    back = read_sig_zip(p)
    assert sorted(s.name for s in back) == ["protA", "protB", "protC"]
    for s in back:
        assert np.array_equal(s.mins, mins)
        assert np.array_equal(s.abundances, ab)


def test_sig_zip_byte_fidelity_vs_sourmash_fixture(tmp_path):
    """Roundtrip the sourmash-written TRUE.zip: our writer's decompressed
    member payloads and manifest must byte-match the fixture (member
    order, JSON key order, compact separators, float formatting), and
    the archive itself must be deterministic (gzip mtime 0, 1980 zip
    dates)."""
    import gzip
    import pathlib
    import zipfile

    from kmerseek_tpu.core.sigzip import read_sig_zip, write_sig_zip

    fixture = (
        "/root/reference/tests/testdata/fasta/"
        "bcl2_first25_uniprotkb_accession_O43236_OR_accession_2025_02_06"
        ".fasta.gz.hp.k24.scaled5.sig.TRUE.zip"
    )
    if not pathlib.Path(fixture).exists():
        pytest.skip("reference fixture unavailable")
    sigs = read_sig_zip(fixture)
    out = str(tmp_path / "round.sig.zip")
    write_sig_zip(out, sigs)

    with zipfile.ZipFile(fixture) as zf, zipfile.ZipFile(out) as zo:
        assert zf.namelist() == zo.namelist()  # member order preserved
        for name in zf.namelist():
            a, b = zf.read(name), zo.read(name)
            if name.endswith(".gz"):
                a, b = gzip.decompress(a), gzip.decompress(b)
            assert a == b, f"member {name} differs"
        for info in zo.infolist():
            assert info.date_time == (1980, 1, 1, 0, 0, 0)
            assert info.compress_type == zipfile.ZIP_STORED

    # determinism: a second write is byte-identical
    out2 = str(tmp_path / "round2.sig.zip")
    write_sig_zip(out2, sigs)
    assert (
        pathlib.Path(out).read_bytes() == pathlib.Path(out2).read_bytes()
    )


def test_old_ksx_without_bucket_table_loads(tmp_path):
    """Round-1 .ksx saves carry no bucket table (3-entry shape, no
    bucket_starts member): load must rebuild it and search normally."""
    import jax.numpy as jnp

    sigs = _sig_pair()
    idx = ProteomeIndex.from_signatures(sigs, IndexConfig(16, 5, "hp"))
    path = str(tmp_path / "old.ksx")
    idx.save(path)
    # rewrite the directory in the old format-1 layout: arrays.npz +
    # pre-bucket inverted.npz, no manifest (format-2 saves write raw
    # .npy members instead)
    _to_legacy_layout(path, idx, pre_bucket=True)
    loaded = ProteomeIndex.load(path)
    inv = loaded._inverted
    assert inv.bucket_starts is not None and inv.max_span >= 1
    from kmerseek_tpu.ops.inverted import inverted_search

    q_hi, q_lo, _ab, _c = loaded.dense_device_arrays()
    q_valid = jnp.asarray(
        np.arange(q_hi.shape[1])[None, :] < loaded.counts[:, None]
    )
    n, _w = inverted_search(loaded, q_hi, q_lo, q_valid)
    assert np.array_equal(
        np.diag(np.asarray(n)), loaded.counts
    )  # self-search diagonal


def _sig_pair():
    from kmerseek_tpu.core.signature import Signature

    return [
        Signature(
            name=f"p{i}",
            mins=np.sort(
                np.array([11 + 7 * i, 22 + 7 * i, 33, 44], np.uint64) << 40
            ),
            abundances=np.array([1, 2, 1, 3], np.int64),
            ksize=16,
            scaled=5,
            moltype="hp",
        )
        for i in range(3)
    ]


def test_md5s_persisted_and_reused(tmp_path):
    sigs = _sig_pair()
    idx = ProteomeIndex.from_signatures(sigs, IndexConfig(16, 5, "hp"))
    expect = [s.md5sum for s in sigs]
    assert [idx.md5_for(i) for i in range(3)] == expect
    path = str(tmp_path / "m.ksx")
    idx.save(path)
    loaded = ProteomeIndex.load(path)
    assert loaded._md5s == expect  # persisted, not lazily recomputed


def test_equivalence_includes_kmer_sidecar(tmp_path):
    """index.rs:562-605 parity: when both indexes carry a k-mer table,
    equivalence compares it too."""
    p = tmp_path / "two.fasta"
    p.write_text(">a\nPLANTANDANIMALGENQMES\n>b\nLIVINGALIVE\n")
    cfg = IndexConfig(5, 1, "hp")
    a = ProteomeIndex.build(str(p), cfg, store_raw_sequences=True)
    b = ProteomeIndex.build(str(p), cfg, store_raw_sequences=True)
    _ = a.kmer_table
    _ = b.kmer_table
    assert a.is_equivalent_to(b)
    # corrupt one side's table: equivalence must now fail
    import pyarrow as pa

    tbl = b.kmer_table
    col = tbl.column("start").to_pylist()
    col[0] = col[0] + 1
    b._kmer_table = tbl.set_column(
        tbl.schema.get_field_index("start"), "start", pa.array(col, pa.uint32())
    )
    assert not a.is_equivalent_to(b)


def test_equivalence_derives_counterpart_sidecar(tmp_path):
    """The k-mer clause must fire when only ONE side pre-materialized
    its table and the other can derive one (round-2 verdict weak #8:
    previously two indexes differing only in sidecar content compared
    equal unless the caller pre-touched both tables)."""
    p = tmp_path / "two.fasta"
    p.write_text(">a\nPLANTANDANIMALGENQMES\n>b\nLIVINGALIVE\n")
    cfg = IndexConfig(5, 1, "hp")
    a = ProteomeIndex.build(str(p), cfg, store_raw_sequences=True)
    b = ProteomeIndex.build(str(p), cfg, store_raw_sequences=True)
    import pyarrow as pa

    tbl = a.kmer_table  # a materialized; b not touched
    col = tbl.column("start").to_pylist()
    col[0] = col[0] + 1
    a._kmer_table = tbl.set_column(
        tbl.schema.get_field_index("start"), "start", pa.array(col, pa.uint32())
    )
    assert b._kmer_table is None
    assert not a.is_equivalent_to(b)  # b's table derived for the compare
    assert not b.is_equivalent_to(a)
    # differing stored sequences (same sketches impossible here, so use
    # the sequence clause directly): byte-diff must break equivalence
    c = ProteomeIndex.build(str(p), cfg, store_raw_sequences=True)
    d = ProteomeIndex.build(str(p), cfg, store_raw_sequences=True)
    assert c.is_equivalent_to(d)
    d.sequences[0] = d.sequences[0] + b"X" if isinstance(
        d.sequences[0], bytes
    ) else d.sequences[0] + "X"
    assert not c.is_equivalent_to(d)


def _to_legacy_layout(path, idx, pre_bucket=False, flip_bit=False):
    """Rewrite a saved .ksx directory in the format-1 npz layout (what
    old saves produced) so the legacy load branch stays covered."""
    import json

    inv = idx.inverted.with_buckets()
    np.savez_compressed(
        os.path.join(path, "arrays.npz"),
        mins=idx.mins,
        abundances=idx.abundances,
        offsets=idx.offsets,
    )
    g_lo = inv.g_lo.copy()
    if flip_bit:
        g_lo[0] ^= 1  # flip a posting bit: sums no longer match
    kw = dict(g_hi=inv.g_hi, g_lo=g_lo, tid=inv.tid, ab=inv.ab)
    if pre_bucket:
        kw["shape"] = np.asarray([inv.n_targets, inv.max_run], np.int64)
    else:
        kw["bucket_starts"] = inv.bucket_starts
        kw["shape"] = np.asarray(
            [inv.n_targets, inv.max_run, inv.max_span, inv.bucket_shift],
            np.int64,
        )
    np.savez_compressed(os.path.join(path, "inverted.npz"), **kw)
    os.remove(os.path.join(path, "manifest.json"))
    for name in (
        "mins", "abundances", "offsets",
        "inv_g_hi", "inv_g_lo", "inv_tid", "inv_ab", "inv_bucket_starts",
    ):
        fp = os.path.join(path, f"{name}.npy")
        if os.path.exists(fp):
            os.remove(fp)
    # format stamp back to 1
    mp = os.path.join(path, "metadata.json")
    meta = json.load(open(mp))
    meta["format_version"] = 1
    json.dump(meta, open(mp, "w"))


def test_corrupt_inverted_npz_rebuilt_on_load(tmp_path, caplog):
    """A stale format-1 inverted.npz (inconsistent with arrays.npz)
    must be detected at load and rebuilt from the CSR arrays — not
    trusted (the legacy-branch O(N) content guard)."""
    sigs = _sig_pair()
    idx = ProteomeIndex.from_signatures(sigs, IndexConfig(16, 5, "hp"))
    path = str(tmp_path / "c.ksx")
    idx.save(path)
    _to_legacy_layout(path, idx, flip_bit=True)
    loaded = ProteomeIndex.load(path)
    assert loaded._inverted is None  # rejected, lazily rebuilt
    inv = loaded.inverted
    assert np.array_equal(inv.g64(), np.sort(idx.mins))


def test_npy_manifest_guards(tmp_path):
    """Format-2 structural guards: a truncated member or a shape
    mismatch must fail the load loudly; KMERSEEK_LOAD_VERIFY=full must
    catch a content flip (size-preserving) and rebuild postings."""
    import json
    import os as _os

    import pytest

    sigs = _sig_pair()
    idx = ProteomeIndex.from_signatures(sigs, IndexConfig(16, 5, "hp"))
    path = str(tmp_path / "g.ksx")
    idx.save(path)
    assert _os.path.exists(_os.path.join(path, "manifest.json"))

    # size-preserving content flip: default load trusts it (structural
    # checks only), full verify detects and rebuilds
    fp = _os.path.join(path, "inv_g_lo.npy")
    arr = np.load(fp)
    arr[0] ^= 1
    np.save(fp, arr)
    loaded = ProteomeIndex.load(path)  # default: structural pass
    assert loaded._inverted is not None
    _os.environ["KMERSEEK_LOAD_VERIFY"] = "full"
    try:
        loaded = ProteomeIndex.load(path)
        assert loaded._inverted is None  # rejected, lazily rebuilt
        assert np.array_equal(loaded.inverted.g64(), np.sort(idx.mins))
    finally:
        del _os.environ["KMERSEEK_LOAD_VERIFY"]

    # truncation: loud failure
    with open(fp, "r+b") as f:
        f.truncate(_os.path.getsize(fp) - 8)
    with pytest.raises(ValueError, match="size-mismatched"):
        ProteomeIndex.load(path)


def test_sig_zip_reader_skips_dna_sketches(tmp_path):
    """sourmash archives can mix DNA sketches in; the protein ksize/3
    convention doesn't apply to them — they're skipped, not mis-read."""
    import gzip
    import json
    import zipfile

    from kmerseek_tpu.core.sigzip import read_sig_zip

    payload = [
        {
            "class": "sourmash_signature",
            "email": "",
            "hash_function": "0.murmur64",
            "filename": "x.fa",
            "name": "dna-thing",
            "license": "CC0",
            "signatures": [
                {
                    "num": 0,
                    "ksize": 31,
                    "seed": 42,
                    "max_hash": 0,
                    "mins": [1, 2, 3],
                    "md5sum": "00",
                    "abundances": [1, 1, 1],
                    "molecule": "DNA",
                },
                {
                    "num": 0,
                    "ksize": 48,
                    "seed": 42,
                    "max_hash": 0,
                    "mins": [9, 10],
                    "md5sum": "01",
                    "abundances": [1, 1],
                    "molecule": "hp",
                },
            ],
        }
    ]
    p = str(tmp_path / "mixed_mol.sig.zip")
    with zipfile.ZipFile(p, "w") as z:
        z.writestr(
            "signatures/00.sig.gz", gzip.compress(json.dumps(payload).encode())
        )
    sigs = read_sig_zip(p)
    assert len(sigs) == 1
    assert sigs[0].moltype == "hp" and sigs[0].ksize == 16


def test_build_search_property_fuzz(tmp_path):
    """Property sweep: random corpora (edge lengths, ambiguity codes,
    stops, mixed case, gzip) through build + self-search under random
    (k, scaled, moltype, engine) — every non-empty sketch must
    self-match with containment exactly 1.0."""
    import gzip

    from kmerseek_tpu.core.search import manysearch

    rng = np.random.default_rng(7)
    AA = "ACDEFGHIKLMNPQRSTVWY"

    def rand_seq(n):
        chars = []
        for _ in range(n):
            r = rng.random()
            if r < 0.92:
                chars.append(AA[rng.integers(0, 20)])
            elif r < 0.96:
                chars.append("XUO"[rng.integers(0, 3)])
            elif r < 0.99:
                chars.append("BZJ"[rng.integers(0, 3)])
            else:
                chars.append("*")
        s = "".join(chars)
        return s.lower() if rng.random() < 0.3 else s

    for trial in range(6):
        k = int(rng.integers(3, 30))
        scaled = int(rng.integers(1, 8))
        moltype = ["protein", "dayhoff", "hp"][rng.integers(0, 3)]
        engine = ["auto", "device", "native"][rng.integers(0, 3)]
        n_rec = int(rng.integers(1, 20))
        path = tmp_path / f"f{trial}.fasta"
        with open(path, "w") as f:
            for i in range(n_rec):
                ln = int(rng.choice([1, k - 1, k, k + 1, 50, 300]))
                f.write(f">rec{i} desc {i}\n{rand_seq(ln)}\n")
        if rng.random() < 0.3:
            gz = str(path) + ".gz"
            with open(path, "rb") as src, gzip.open(gz, "wb") as dst:
                dst.write(src.read())
            path = gz
        idx = ProteomeIndex.build(str(path), IndexConfig(k, scaled, moltype), engine=engine)
        assert len(idx) == n_rec
        rows = manysearch(idx, idx)
        counts = np.diff(idx.offsets)
        self_rows = [r for r in rows if r["query_name"] == r["match_name"]]
        assert len(self_rows) == int((counts > 0).sum())
        assert all(r["containment"] == 1.0 for r in self_rows)


def test_resave_loaded_index_into_own_directory(tmp_path):
    """Re-saving a LOADED (mmap-backed) index into its own .ksx
    directory must not truncate the inodes backing the live memmaps
    (np.save straight onto the final name would — SIGBUS under the
    mapping; save() writes temp + os.replace). Code-review r5."""
    import numpy as np

    from kmerseek_tpu.core.index import IndexConfig, ProteomeIndex

    rng = np.random.default_rng(31)
    mins_rows = [
        np.sort(
            np.unique(rng.integers(0, 2**62, size=20, dtype=np.uint64))
        )
        for _ in range(6)
    ]
    counts = np.array([len(m) for m in mins_rows], np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    mins = np.concatenate(mins_rows)
    idx = ProteomeIndex(
        IndexConfig(16, 5, "hp"),
        [f"t{i}" for i in range(6)],
        mins,
        np.ones(len(mins), np.int64),
        offsets,
    )
    p = str(tmp_path / "own.ksx")
    idx.save(p)
    loaded = ProteomeIndex.load(p)  # members mmap'd
    _ = loaded.inverted  # touch the postings
    loaded.save(p)  # re-save into the SAME directory while mapped
    again = ProteomeIndex.load(p)
    assert np.array_equal(np.asarray(again.mins), mins)
    assert np.array_equal(
        np.asarray(again.inverted.g64()), np.asarray(loaded.inverted.g64())
    )
    # and the still-open first mapping remains readable (old inode alive)
    assert int(np.asarray(loaded.mins).sum(dtype=np.uint64)) == int(
        mins.sum(dtype=np.uint64)
    )
