"""Seeded synthetic corpus shared by the scale tests and the dryrun.

Same construction as ``__graft_entry__._dryrun_sparse_scale``: T targets
drawing S hashes from a 2^20 pool inside the scaled-5 occupied span
(realistic shared-hash posting runs), plus a query block drawing half
its hashes from the pool (hits) and half uniform (misses). Fully
deterministic — every process of a real ``jax.distributed`` group can
regenerate it locally instead of shipping arrays.
"""

from __future__ import annotations

import numpy as np


def _pool_and_span(seed: int):
    from kmerseek_tpu.parallel.sharded import occupied_span

    span = occupied_span(5)
    rng = np.random.default_rng(seed)
    return np.unique(rng.integers(0, span, size=1 << 20, dtype=np.uint64)), span


def synth_query(S: int = 24, Q: int = 64, seed: int = 3):
    """→ (q64, q_valid) — the query block ALONE (an independent rng
    stream, so load-only restarts regenerate it without paying the
    corpus construction — code-review r5)."""
    pool, span = _pool_and_span(seed)
    qrng = np.random.default_rng(seed + 7919)
    q64 = np.where(
        np.arange(S)[None, :] % 2 == 0,
        pool[qrng.integers(0, len(pool), size=(Q, S))],
        qrng.integers(0, span, size=(Q, S), dtype=np.uint64),
    )
    q64 = np.sort(q64, axis=1)
    qv = np.ones((Q, S), bool)
    qv[:, 1:] = q64[:, 1:] != q64[:, :-1]
    return q64, qv


def synth_corpus(T: int = 120_000, S: int = 24, Q: int = 64, seed: int = 3):
    """→ (mins, ab, offsets, q64, q_valid) at hp/k16/scaled5 statistics."""
    pool, _span = _pool_and_span(seed)
    crng = np.random.default_rng(seed + 104729)
    vals = np.sort(pool[crng.integers(0, len(pool), size=(T, S))], axis=1)
    keep = np.ones_like(vals, bool)
    keep[:, 1:] = vals[:, 1:] != vals[:, :-1]
    t_counts = keep.sum(axis=1).astype(np.int64)
    mins = vals[keep]
    offsets = np.concatenate([[0], np.cumsum(t_counts)]).astype(np.int64)
    ab = crng.integers(1, 9, size=len(mins)).astype(np.int64)
    q64, qv = synth_query(S, Q, seed)
    return mins, ab, offsets, q64, qv


def synth_query_index(S: int = 24, Q: int = 64, seed: int = 3):
    """→ query ProteomeIndex alone (for load-only restarts)."""
    from kmerseek_tpu.core.index import IndexConfig, ProteomeIndex

    q64, qv = synth_query(S, Q, seed)
    q_counts = qv.sum(axis=1).astype(np.int64)
    q_offsets = np.concatenate([[0], np.cumsum(q_counts)]).astype(np.int64)
    return ProteomeIndex(
        IndexConfig(16, 5, "hp"),
        [f"q{i}" for i in range(Q)],
        q64[qv],
        np.ones(int(q_counts.sum()), np.int64),
        q_offsets,
    )


def synth_indexes(T: int = 120_000, S: int = 24, Q: int = 64, seed: int = 3):
    """→ (target ProteomeIndex, query ProteomeIndex) over synth_corpus."""
    from kmerseek_tpu.core.index import IndexConfig, ProteomeIndex

    cfg = IndexConfig(16, 5, "hp")
    mins, ab, offsets, _q64, _qv = synth_corpus(T, S, Q, seed)
    target = ProteomeIndex(cfg, [f"t{i}" for i in range(T)], mins, ab, offsets)
    return target, synth_query_index(S, Q, seed)
