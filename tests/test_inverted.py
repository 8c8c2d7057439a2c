"""Inverted-index search engine vs the per-pair reference engine."""

import jax.numpy as jnp
import numpy as np
import pytest

from kmerseek_tpu.ops import u64
from kmerseek_tpu.ops.intersect import pairwise_stats
from kmerseek_tpu.ops.inverted import (
    build_inverted_np,
    inverted_pair_stats,
)


def _make_indexes(rng, T, S_real, universe, dup_heavy=False):
    """Random target sketches; optionally force heavy hash sharing."""
    sketches = []
    for _ in range(T):
        n = rng.integers(max(S_real // 2, 1), S_real + 1)
        vals = np.unique(rng.integers(0, universe, n).astype(np.uint64) * np.uint64(2**32))
        sketches.append(vals)
    return sketches


def _csr(sketches):
    offsets = np.zeros(len(sketches) + 1, np.int64)
    for i, s in enumerate(sketches):
        offsets[i + 1] = offsets[i] + len(s)
    mins = np.concatenate(sketches) if sketches else np.zeros(0, np.uint64)
    ab = np.ones(len(mins), np.int64)
    return mins, ab, offsets


def _dense_q(sketches, S):
    Q = len(sketches)
    hi = np.full((Q, S), 0xFFFFFFFF, np.uint32)
    lo = np.full((Q, S), 0xFFFFFFFF, np.uint32)
    valid = np.zeros((Q, S), bool)
    for i, sk in enumerate(sketches):
        h, l = u64.split_np(np.sort(sk))
        hi[i, : len(sk)] = h
        lo[i, : len(sk)] = l
        valid[i, : len(sk)] = True
    return jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(valid)


@pytest.mark.parametrize("universe,tag", [(10_000, "sparse"), (50, "dup-heavy")])
def test_inverted_matches_pairwise(universe, tag):
    rng = np.random.default_rng(0)
    targets = _make_indexes(rng, 23, 24, universe)
    queries = _make_indexes(rng, 5, 16, universe)
    mins, ab, offsets = _csr(targets)
    inv = build_inverted_np(mins, ab, offsets)
    q_hi, q_lo, q_valid = _dense_q(queries, 32)

    counts, weights = inverted_pair_stats(
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

    # reference: per-pair engine
    St = max(len(t) for t in targets)
    t_hi = np.full((23, 32), 0xFFFFFFFF, np.uint32)
    t_lo = np.full((23, 32), 0xFFFFFFFF, np.uint32)
    t_ab = np.zeros((23, 32), np.int32)
    t_c = np.zeros(23, np.int32)
    for i, t in enumerate(targets):
        h, l = u64.split_np(np.sort(t))
        t_hi[i, : len(t)] = h
        t_lo[i, : len(t)] = l
        t_ab[i, : len(t)] = 1
        t_c[i] = len(t)
    q_counts = jnp.asarray(np.array([len(q) for q in queries], np.int32))
    ref = pairwise_stats(
        q_hi,
        q_lo,
        q_counts,
        jnp.asarray(t_hi),
        jnp.asarray(t_lo),
        jnp.asarray(t_ab),
        jnp.asarray(t_c),
    )
    assert np.array_equal(np.asarray(counts), np.asarray(ref.intersect)), tag
    assert np.array_equal(np.asarray(weights), np.asarray(ref.weighted)), tag
    if tag == "dup-heavy":
        assert inv.max_run > 3  # the run expansion is actually exercised


def test_inverted_empty_and_extremes():
    mins = np.array([0, 5, 2**64 - 2], np.uint64)
    ab = np.array([3, 1, 7], np.int64)
    offsets = np.array([0, 2, 3], np.int64)
    inv = build_inverted_np(mins, ab, offsets)
    q_hi, q_lo, q_valid = _dense_q([np.array([0, 2**64 - 2], np.uint64)], 8)
    counts, weights = inverted_pair_stats(
        jnp.asarray(inv.g_hi),
        jnp.asarray(inv.g_lo),
        jnp.asarray(inv.tid),
        jnp.asarray(inv.ab),
        q_hi,
        q_lo,
        q_valid,
        n_targets=2,
        max_run=inv.max_run,
    )
    assert np.asarray(counts).tolist() == [[1, 1]]
    assert np.asarray(weights).tolist() == [[3, 7]]
