"""Batch sketch pipeline vs the reference's golden counts and fixtures.

Oracles: per-moltype k-mer tables for TEST_PROTEIN (index.rs:1084-1326)
and exact mins/abundances from the committed sourmash ``.sig.zip``
fixture (hp, k16, scaled5) — SURVEY.md §2.5, §4.2.
"""

import gzip
import json
import zipfile

import jax.numpy as jnp
import numpy as np
import pytest

from kmerseek_tpu.ops import u64
from kmerseek_tpu.ops.encoding import max_hash_for_scaled
from kmerseek_tpu.ops.sketch import (
    merge_sketches_np,
    sketch_batch,
    sketch_capacity,
)
from tests.test_murmur import GOLDEN_DAYHOFF, GOLDEN_HP, GOLDEN_PROTEIN, TEST_PROTEIN


def _pack(seqs):
    L = max(len(s) for s in seqs)
    arr = np.zeros((len(seqs), max(L, 64)), dtype=np.uint8)
    lens = np.zeros(len(seqs), dtype=np.int32)
    for i, s in enumerate(seqs):
        b = s.encode() if isinstance(s, str) else s
        arr[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
        lens[i] = len(b)
    return jnp.asarray(arr), jnp.asarray(lens)


def _row_sketch(res, i):
    n = int(res.counts[i])
    mins = u64.join_np(np.asarray(res.mins_hi[i][:n]), np.asarray(res.mins_lo[i][:n]))
    ab = np.asarray(res.abund[i][:n])
    return mins, ab


@pytest.mark.parametrize(
    "moltype,golden,n_distinct",
    [
        ("protein", [(h, 1) for h, _k, _p in GOLDEN_PROTEIN], 17),
        ("dayhoff", [(h, 1) for h, _e, _o, _p in GOLDEN_DAYHOFF], 17),
        ("hp", [(h, len(o)) for h, _e, o, _p in GOLDEN_HP], 14),
    ],
)
def test_golden_test_protein(moltype, golden, n_distinct):
    seqs, lens = _pack([TEST_PROTEIN])
    res = sketch_batch(seqs, lens, k=5, scaled=1, moltype=moltype, capacity=32)
    mins, ab = _row_sketch(res, 0)
    assert len(mins) == n_distinct
    expect = sorted(golden)
    assert [int(m) for m in mins] == [h for h, _ in expect]
    assert list(ab) == [a for _, a in expect]


def test_batch_rows_independent():
    seqs, lens = _pack([TEST_PROTEIN, "LIVINGALIVE", "AAAA"])
    res = sketch_batch(seqs, lens, k=5, scaled=1, moltype="protein", capacity=32)
    assert int(res.counts[0]) == 17
    assert int(res.counts[1]) == 7  # LIVINGALIVE has 7 distinct 5-mers
    assert int(res.counts[2]) == 0  # shorter than k


def test_max_hash_rounding():
    # f64 rounding quirk — SURVEY.md §2.5 / observed sig fixture
    assert max_hash_for_scaled(5) == 3689348814741910528
    assert max_hash_for_scaled(1) == 2**64 - 1


def test_sketch_matches_sig_zip_fixture(bcl2_hp_k16_sig_zip, bcl2_first25):
    """Every one of the 25 proteins must reproduce fixture mins+abunds."""
    from kmerseek_tpu.core.fasta import read_fasta
    from kmerseek_tpu.core.alphabet import validate_resolve_batch

    records = read_fasta(bcl2_first25)
    names = [r.name for r in records]
    resolved = validate_resolve_batch([r.seq for r in records])

    k, scaled = 16, 5
    L = max(len(s) for s in resolved)
    seqs, lens = _pack([s.decode("ascii") for s in resolved])
    cap = sketch_capacity(L, k, scaled)
    res = sketch_batch(seqs, lens, k=k, scaled=scaled, moltype="hp", capacity=cap)
    assert int(res.counts.max()) <= cap

    fixture = {}
    with zipfile.ZipFile(bcl2_hp_k16_sig_zip) as z:
        for name in z.namelist():
            if not name.startswith("signatures/"):
                continue
            sig = json.loads(gzip.decompress(z.read(name)))[0]
            inner = sig["signatures"][0]
            fixture[sig["name"]] = (inner["mins"], inner["abundances"])

    assert set(names) == set(fixture)
    for i, name in enumerate(names):
        mins, ab = _row_sketch(res, i)
        fmins, fab = fixture[name]
        assert [int(m) for m in mins] == fmins, name
        assert list(ab) == fab, name


def test_combined_minhash_counts(bcl2_first25):
    """Reference golden corpus counts, index.rs:1821-1844, 1896-1903,
    1962-1969: protein k5 SEPT4=474 BCL2=235 combined=9049; dayhoff k5
    combined=2730; hp k12 combined=3549."""
    from kmerseek_tpu.core.fasta import read_fasta
    from kmerseek_tpu.core.alphabet import validate_resolve_batch

    records = read_fasta(bcl2_first25)
    resolved = validate_resolve_batch([r.seq for r in records])
    seqs, lens = _pack([s.decode("ascii") for s in resolved])

    for moltype, k, per_protein, combined_size in [
        ("protein", 5, {"SEPT4": 474, "BCL2_HUMAN": 235}, 9049),
        ("dayhoff", 5, {"SEPT4": 433, "BCL2_HUMAN": 204}, 2730),
        ("hp", 12, {"SEPT4": 452, "BCL2_HUMAN": 220}, 3549),
    ]:
        cap = int(lens.max()) - k + 1
        res = sketch_batch(seqs, lens, k=k, scaled=1, moltype=moltype, capacity=cap)
        mins_list, ab_list = [], []
        for i, rec in enumerate(records):
            mins, ab = _row_sketch(res, i)
            mins_list.append(mins)
            ab_list.append(ab)
            for tag, expect in per_protein.items():
                if tag in rec.name:
                    assert len(mins) == expect, (moltype, rec.name)
        uniq, _sums = merge_sketches_np(mins_list, ab_list)
        assert len(uniq) == combined_size, moltype


def test_presort_compact_bit_equal(bcl2_first25):
    """presort_compact packs survivors to capacity width before the
    sort; outputs must be bit-identical to the full-width sort for all
    moltypes (the sorted survivor set is the same set)."""
    import jax.numpy as jnp

    from kmerseek_tpu.core.alphabet import validate_resolve_batch
    from kmerseek_tpu.core.fasta import read_fasta
    from kmerseek_tpu.ops.sketch import sketch_capacity, sorted_window_hashes

    records = read_fasta(bcl2_first25)
    resolved = validate_resolve_batch([r.seq for r in records])
    L = max(len(s) for s in resolved)
    seqs = np.zeros((len(resolved), L), np.uint8)
    lens = np.zeros(len(resolved), np.int32)
    for i, s in enumerate(resolved):
        seqs[i, : len(s)] = np.frombuffer(s, np.uint8)
        lens[i] = len(s)
    for moltype, k, scaled in [("hp", 24, 5), ("dayhoff", 8, 100), ("protein", 10, 5)]:
        cap = sketch_capacity(L, k, scaled)
        assert cap < L - k + 1  # compaction actually engages
        base = sorted_window_hashes(
            jnp.asarray(seqs), jnp.asarray(lens),
            k=k, scaled=scaled, moltype=moltype, capacity=cap,
        )
        fast = sorted_window_hashes(
            jnp.asarray(seqs), jnp.asarray(lens),
            k=k, scaled=scaled, moltype=moltype, capacity=cap,
            presort_compact=True,
        )
        for a, b in zip(base, fast):
            assert np.array_equal(np.asarray(a), np.asarray(b)), (moltype, k)


def test_sort_keys_64_tie_fallback():
    """_sort_keys_64's fast path sorts by hi alone; rows containing
    equal-hi/different-lo pairs must flag the scalar tie cond and come
    out in exact 64-bit order anyway (bit-equal to the 2-key sort)."""
    import jax

    from kmerseek_tpu.ops.sketch import _sort_keys_64

    rng = np.random.default_rng(7)
    B, W = 16, 256
    # dense hi space (0..3) → plenty of equal-hi ties with distinct lo
    hi = rng.integers(0, 4, size=(B, W)).astype(np.uint32)
    lo = rng.integers(0, 2**32, size=(B, W), dtype=np.uint64).astype(np.uint32)
    # sprinkle true duplicates and sentinel slots
    hi[:, -8:] = 0xFFFFFFFF
    lo[:, -8:] = 0xFFFFFFFF
    hi[:, 10] = hi[:, 11]
    lo[:, 10] = lo[:, 11]
    got_hi, got_lo = jax.jit(_sort_keys_64)(jnp.asarray(hi), jnp.asarray(lo))
    want_hi, want_lo = jax.jit(
        lambda a, b: jax.lax.sort((a, b), num_keys=2)
    )(jnp.asarray(hi), jnp.asarray(lo))
    assert np.array_equal(np.asarray(got_hi), np.asarray(want_hi))
    assert np.array_equal(np.asarray(got_lo), np.asarray(want_lo))

    # tie-free input must take the fast path and still be exact
    hi2 = rng.permutation(np.arange(B * W, dtype=np.uint32)).reshape(B, W)
    got_hi, got_lo = jax.jit(_sort_keys_64)(jnp.asarray(hi2), jnp.asarray(lo))
    want_hi, want_lo = jax.jit(
        lambda a, b: jax.lax.sort((a, b), num_keys=2)
    )(jnp.asarray(hi2), jnp.asarray(lo))
    assert np.array_equal(np.asarray(got_hi), np.asarray(want_hi))
    assert np.array_equal(np.asarray(got_lo), np.asarray(want_lo))
