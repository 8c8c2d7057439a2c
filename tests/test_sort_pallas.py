"""Bitonic row-sort kernel and the bitonic full-sketch path (interpret)."""

import jax.numpy as jnp
import numpy as np
import pytest

from kmerseek_tpu.ops import u64
from kmerseek_tpu.ops.sort_pallas import bitonic_sort_rows
from kmerseek_tpu.ops.sketch import sketch_batch
from kmerseek_tpu.ops.sketch_pallas import sketch_batch_pallas


@pytest.mark.parametrize("B,S", [(4, 128), (3, 256), (9, 512)])
def test_bitonic_matches_numpy(B, S):
    rng = np.random.default_rng(1)
    vals = rng.integers(0, 2**64, size=(B, S), dtype=np.uint64)
    vals[:, -5:] = 2**64 - 1  # sentinel padding
    vals[0, 0] = vals[0, 1]  # duplicates
    hi, lo = u64.split_np(vals)
    shi, slo = bitonic_sort_rows(jnp.asarray(hi), jnp.asarray(lo), interpret=True)
    got = u64.join_np(np.asarray(shi), np.asarray(slo))
    assert np.array_equal(got, np.sort(vals, axis=1))


def test_bitonic_rejects_non_power_of_two():
    hi = jnp.zeros((2, 100), jnp.uint32)
    with pytest.raises(AssertionError):
        bitonic_sort_rows(hi, hi, interpret=True)


def test_sketch_bitonic_path_matches_reference():
    rng = np.random.default_rng(2)
    letters = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", np.uint8)
    seqs = jnp.asarray(letters[rng.integers(0, 20, size=(5, 256))])
    lens = jnp.asarray(rng.integers(30, 257, size=(5,)).astype(np.int32))
    a = sketch_batch(seqs, lens, k=16, scaled=5, moltype="hp", capacity=128)
    b = sketch_batch_pallas(
        seqs,
        lens,
        k=16,
        scaled=5,
        moltype="hp",
        capacity=128,
        interpret=True,
        bitonic=True,
    )
    assert np.array_equal(np.asarray(a.counts), np.asarray(b.counts))
    assert np.array_equal(np.asarray(a.mins_hi), np.asarray(b.mins_hi))
    assert np.array_equal(np.asarray(a.mins_lo), np.asarray(b.mins_lo))
    assert np.array_equal(np.asarray(a.abund), np.asarray(b.abund))
