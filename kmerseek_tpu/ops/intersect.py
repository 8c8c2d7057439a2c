"""Pairwise sketch intersection on device — the search engine's core.

TPU-native replacement for branchwater's ``do_manysearch`` /
``do_multisearch`` inner loops (all query sigs × all target sigs,
SURVEY.md §2.5): sketches live as padded, sorted (T, S) uint32-pair
arrays in HBM; every (query, target) pair is scored by a vectorized
binary search (lower bound over the (hi, lo) composite key, unrolled
log2(S) gather/compare steps — pure VPU work, no data-dependent
shapes), producing the integer sufficient statistics that the host
turns into the full 22-column stat set in f64:

  per pair: |intersection|, Σ target-abundance over the intersection,
  Σ abundance², and 2×median of the intersecting abundances.

vmapped over queries × targets; the target axis is the natural
sharding dimension for multi-chip search (see ``parallel``): each
device scores its target shard against broadcast queries and results
concatenate with no cross-device reduction needed.

Padding convention: empty slots hold u64::MAX sentinels and are
excluded by count masks, so a sentinel can never create a false match.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

MAXU32 = jnp.uint32(0xFFFFFFFF)


class PairStats(NamedTuple):
    intersect: jnp.ndarray  # (Q, T) int32 — |sketch ∩ sketch|
    weighted: jnp.ndarray  # (Q, T) int32 — Σ target abund over intersection


def _lower_bound(t_hi, t_lo, t_count, q_hi, q_lo):
    """First index i in the sorted target row with target[i] >= query.

    Vectorized over the query axis; log2(S) unrolled steps of
    gather + compare on the (hi, lo) composite key.
    """
    S = t_hi.shape[0]
    steps = max(S.bit_length(), 1)
    lo = jnp.zeros(q_hi.shape, jnp.int32)
    hi = jnp.full(q_hi.shape, t_count, jnp.int32)
    for _ in range(steps):
        mid = (lo + hi) >> 1
        th = jnp.take(t_hi, mid)
        tl = jnp.take(t_lo, mid)
        less = (th < q_hi) | ((th == q_hi) & (tl < q_lo))
        lo = jnp.where(less, mid + 1, lo)
        hi = jnp.where(less, hi, mid)
    return lo


def _pair_stats(q_hi, q_lo, q_count, t_hi, t_lo, t_ab, t_count):
    """Stats for one (query sketch, target sketch) pair.

    Deliberately cheap: count + weighted sum only. Order statistics
    (median/std of the intersecting abundances, needed per *emitted*
    search row) are computed on host from the row's hash vectors — a
    per-pair device sort made the all-pairs sweep sort-bound
    (65k small sorts per chunk)."""
    Sq = q_hi.shape[0]
    q_idx = jax.lax.broadcasted_iota(jnp.int32, (Sq, 1), 0)[:, 0]
    q_valid = q_idx < q_count

    pos = _lower_bound(t_hi, t_lo, t_count, q_hi, q_lo)
    safe = jnp.minimum(pos, jnp.int32(t_hi.shape[0] - 1))
    hit = (
        q_valid
        & (pos < t_count)
        & (jnp.take(t_hi, safe) == q_hi)
        & (jnp.take(t_lo, safe) == q_lo)
    )
    ab = jnp.where(hit, jnp.take(t_ab, safe), 0)
    return hit.astype(jnp.int32).sum(), ab.sum()


@functools.partial(jax.jit, static_argnames=("target_chunk",))
def pairwise_stats(
    q_hi, q_lo, q_counts, t_hi, t_lo, t_ab, t_counts, target_chunk: int = 0
) -> PairStats:
    """All-pairs stats: queries (Q, Sq) × targets (T, St) → (Q, T).

    Equivalent of branchwater manysearch's all-pairs loop
    (search.py:125-141 → Rust FFI in the reference).

    The naive double-vmap materializes (Q, T, Sq) temporaries — at
    corpus scale that overflows HBM (observed: a 128×16k search crashed
    the TPU worker) — so the target axis is processed in ``lax.map``
    chunks bounding live memory to (Q, chunk, Sq). ``target_chunk=0``
    picks a chunk targeting ~256 MB of temporaries."""
    Q, Sq = q_hi.shape
    T = t_hi.shape[0]
    f_t = jax.vmap(_pair_stats, in_axes=(None, None, None, 0, 0, 0, 0))
    f_qt = jax.vmap(f_t, in_axes=(0, 0, 0, None, None, None, None))

    if target_chunk <= 0:
        budget = 256 * 1024 * 1024 // 4  # int32 elements
        target_chunk = max(budget // max(Q * Sq * 8, 1), 8)
    if T <= target_chunk:
        n, w = f_qt(q_hi, q_lo, q_counts, t_hi, t_lo, t_ab, t_counts)
        return PairStats(n, w)

    pad = (-T) % target_chunk
    big = jnp.uint32(0xFFFFFFFF)
    th = jnp.pad(t_hi, ((0, pad), (0, 0)), constant_values=big)
    tl = jnp.pad(t_lo, ((0, pad), (0, 0)), constant_values=big)
    ta = jnp.pad(t_ab, ((0, pad), (0, 0)))
    tc = jnp.pad(t_counts, (0, pad))
    nc = (T + pad) // target_chunk
    th = th.reshape(nc, target_chunk, -1)
    tl = tl.reshape(nc, target_chunk, -1)
    ta = ta.reshape(nc, target_chunk, -1)
    tc = tc.reshape(nc, target_chunk)

    def one_chunk(args):
        ch, cl, ca, cc = args
        return f_qt(q_hi, q_lo, q_counts, ch, cl, ca, cc)

    n, w = jax.lax.map(one_chunk, (th, tl, ta, tc))
    # (nc, Q, chunk) → (Q, T)
    def fix(x):
        return jnp.moveaxis(x, 0, 1).reshape(Q, T + pad)[:, :T]

    return PairStats(fix(n), fix(w))


def intersect_positions(q_hi, q_lo, q_count, t_hi, t_lo, t_count):
    """For one pair: per-query-slot hit mask + matched target slot.

    Used by the stitching path to recover which hashes matched."""
    pos = _lower_bound(t_hi, t_lo, t_count, q_hi, q_lo)
    Sq = q_hi.shape[0]
    q_idx = jax.lax.broadcasted_iota(jnp.int32, (Sq, 1), 0)[:, 0]
    safe = jnp.minimum(pos, jnp.int32(t_hi.shape[0] - 1))
    hit = (
        (q_idx < q_count)
        & (pos < t_count)
        & (jnp.take(t_hi, safe) == q_hi)
        & (jnp.take(t_lo, safe) == q_lo)
    )
    return hit, safe
