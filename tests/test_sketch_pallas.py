"""Pallas kernel (interpret mode on CPU) vs the pure-XLA reference path.

Bit-exact equality is required: both paths share the murmur tracing
code, but the kernel adds the LUT select-chain encode and rolled views.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from kmerseek_tpu.ops.sketch import sketch_batch, window_hashes
from kmerseek_tpu.ops.sketch_pallas import sketch_batch_pallas, window_hashes_pallas


def _random_batch(rng, B, L):
    letters = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", np.uint8)
    seqs = letters[rng.integers(0, len(letters), size=(B, L))]
    lens = rng.integers(1, L + 1, size=(B,)).astype(np.int32)
    return jnp.asarray(seqs), jnp.asarray(lens)


@pytest.mark.parametrize("moltype", ["protein", "dayhoff", "hp"])
@pytest.mark.parametrize("k,scaled", [(5, 1), (16, 5), (24, 5)])
def test_pallas_matches_xla(moltype, k, scaled):
    rng = np.random.default_rng(7)
    seqs, lens = _random_batch(rng, 6, 256)
    h_ref, keep_ref = window_hashes(seqs, lens, k, scaled, moltype)
    h_pl, keep_pl = window_hashes_pallas(
        seqs, lens, k=k, scaled=scaled, moltype=moltype, interpret=True
    )
    W = seqs.shape[1] - k + 1
    assert np.array_equal(np.asarray(keep_ref), np.asarray(keep_pl[:, :W]))
    km = np.asarray(keep_ref)
    assert np.array_equal(
        np.asarray(h_ref.hi)[km], np.asarray(h_pl.hi[:, :W])[km]
    )
    assert np.array_equal(
        np.asarray(h_ref.lo)[km], np.asarray(h_pl.lo[:, :W])[km]
    )


def test_full_sketch_pallas_matches():
    rng = np.random.default_rng(3)
    seqs, lens = _random_batch(rng, 4, 256)
    a = sketch_batch(seqs, lens, k=16, scaled=5, moltype="hp", capacity=128)
    b = sketch_batch_pallas(
        seqs, lens, k=16, scaled=5, moltype="hp", capacity=128, interpret=True
    )
    assert np.array_equal(np.asarray(a.counts), np.asarray(b.counts))
    assert np.array_equal(np.asarray(a.mins_hi), np.asarray(b.mins_hi))
    assert np.array_equal(np.asarray(a.mins_lo), np.asarray(b.mins_lo))
    assert np.array_equal(np.asarray(a.abund), np.asarray(b.abund))


def test_pallas_row_padding():
    """B not divisible by the block size must round-trip unchanged."""
    rng = np.random.default_rng(11)
    seqs, lens = _random_batch(rng, 3, 128)
    h, keep = window_hashes_pallas(
        seqs, lens, k=5, scaled=1, moltype="protein", interpret=True
    )
    assert h.hi.shape[0] == 3
    h_ref, keep_ref = window_hashes(seqs, lens, 5, 1, "protein")
    W = 128 - 5 + 1
    assert np.array_equal(np.asarray(keep_ref), np.asarray(keep[:, :W]))


def test_masked_kernel_matches_xla_sorted_path():
    """The fused masked-key kernel must reproduce sorted_window_hashes."""
    import jax

    from kmerseek_tpu.ops.sketch import sorted_window_hashes
    from kmerseek_tpu.ops.sketch_pallas import masked_window_keys_pallas

    rng = np.random.default_rng(5)
    seqs, lens = _random_batch(rng, 5, 256)
    for k, scaled in [(16, 5), (24, 5), (10, 1)]:
        ref = sorted_window_hashes(
            seqs, lens, k=k, scaled=scaled, moltype="hp", capacity=128,
            use_pallas=False,
        )
        key_hi, key_lo, n_kept = masked_window_keys_pallas(
            seqs, lens, k=k, scaled=scaled, moltype="hp", interpret=True
        )
        W = seqs.shape[1] - k + 1
        s_hi, s_lo = jax.lax.sort(
            (key_hi[:, :W], key_lo[:, :W]), num_keys=2, dimension=-1
        )
        assert np.array_equal(np.asarray(n_kept), np.asarray(ref[3])), (k, scaled)
        cap = min(128, W)
        assert np.array_equal(
            np.asarray(s_hi[:, :cap]), np.asarray(ref[0][:, :cap])
        ), (k, scaled)
        assert np.array_equal(
            np.asarray(s_lo[:, :cap]), np.asarray(ref[1][:, :cap])
        ), (k, scaled)
