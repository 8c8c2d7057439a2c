"""Sparse hit-list search: bounded (query, target, count, weight) output.

The dense inverted engine (``ops.inverted``) scatter-adds into (Q, T)
count/weight matrices — perfect while Q·T fits HBM, but a UniProt-scale
index (BASELINE.json configs 4-5, T ~ 10^6) with a 1k-query block would
materialize multi-GB matrices for a hit set that is overwhelmingly
sparse.

This engine rethinks branchwater's per-pair hit accumulation
(do_manysearch, SURVEY.md §2.5) as a sort-segment pipeline — the same
scatter-free recipe as the sketch stage (``ops.sketch``), because on
TPU sort runs ~300M elts/s while scatter crawls at ~50M updates/s:

1. every query hash binary-searches the globally sorted posting array
   once (``_global_lower_bound``), exactly like the dense engine;
2. the ≤ ``max_run`` postings of each run expand to (q, t, abundance)
   tuples — a (max_run, Q, S) block, **independent of T**;
3. one ``lax.sort`` with two int32 keys groups equal (q, t) pairs into
   runs (non-matches carry a q = Q sentinel and sink to the end);
4. run heads are detected by comparing neighbours, prefix-summed into
   dense segment slots, and the per-pair count/weight reductions
   scatter into a **bounded** ``capacity``-slot output buffer
   (``mode="drop"`` — overflow pairs fall off and are reported via
   ``n_hits`` so callers can retry with a larger capacity).

Memory: O(Q·S·max_run + capacity). The dense engine stays preferable
when max_run·S ≫ T; ``core.search`` picks per call.
"""

from __future__ import annotations

import functools
from collections import OrderedDict
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .inverted import (
    DeviceInvertedIndex,
    InvertedIndex,
    _bisect_rounds_packed,
    _bucketed_lower_bound_packed,
    build_inverted_np,
    device_postings,
    max_abundance as _max_abundance,
)


def _combine_weight_limbs(w) -> np.ndarray:
    """(…, 2) int32 weight-limb array → exact int64 weighted sums
    (lo + (hi << 16); see the limb accumulation in _sparse_hits_core)."""
    w = np.asarray(w)
    return w[..., 0].astype(np.int64) + (w[..., 1].astype(np.int64) << 16)


def _weights_int64(w, wide: bool) -> np.ndarray:
    """Kernel weight buffer → exact int64 sums for either tail layout."""
    return _combine_weight_limbs(w) if wide else np.asarray(w).astype(np.int64)


def _wide_weights_needed(inv, S: int) -> bool:
    """True when a single int32 weight accumulator could saturate.

    A (q, t) segment holds at most one tuple per query-hash slot (≤ S),
    each weighted by a posting abundance ≤ max_abundance(inv), so the
    narrow path is exact whenever S · max_ab < 2^31 — every realistic
    corpus (the two-limb path costs one extra full-length scatter-add
    in the kernel tail, measured ~8% of the UniProt-scale search)."""
    from .inverted import max_abundance

    return S * max(max_abundance(inv), 1) >= 2**31


class SparseHits(NamedTuple):
    """Host-side trimmed hit list."""

    q: np.ndarray  # (H,) int32 query row of each hit pair
    t: np.ndarray  # (H,) int32 target id
    count: np.ndarray  # (H,) int32 shared-hash count
    weight: np.ndarray  # (H,) int64 summed target abundance
    n_hits: int  # true number of hit pairs (may exceed H on overflow)


def _sparse_hits_core(
    g4,
    bucket_starts,
    q_hi,
    q_lo,
    q_valid,
    rl=None,
    *,
    n_targets: int,
    max_run: int,
    capacity: int,
    span_steps: int,
    bucket_shift: int,
    run_offset,
    expand_e: int | None = None,
    wide_weights: bool = True,
    compact_io: bool = False,
    t16: bool = False,
    tc32: bool = False,
    w16: bool = False,
    q_bounds: bool = False,
    skip_weights: bool = False,
    true_max_run: int | None = None,
):
    """Traced body shared by the single-block and scan-chunked kernels.

    Two expansion strategies produce the flat (q_key, t, w) match
    tuples that the shared sort-segment tail consumes:

    * ``expand_e is None`` — rectangular: every probe expands
      ``max_run`` posting slots, (max_run, Q, S) tuples total. Simple,
      but sized by the corpus' WORST posting run: with mean run ~6 and
      max_run 41 (SwissProt-scale synthetic), ~90% of the sorted tuples
      are sentinels (measured on-chip: the sort dominates the kernel).
    * ``expand_e = E`` — compact: a second bucketed probe at hash+1
      yields each run's exact length; an exclusive cumsum lays the true
      matches out contiguously, a scatter-max of the (Q·S) segment
      starts + ``cummax`` fill assigns each of the E slots its probe,
      and only ~M = Σrun tuples are gathered and sorted. The host
      learns E per (index, block shape) and retries on E < M (the
      kernel reports the exact M).

    Returns (q_out, t_out, counts, weights, stats) where stats =
    [n_hits, m_total] (int32).
    """
    Q, S = q_hi.shape
    N = g4.shape[0]
    if true_max_run is None:
        true_max_run = max_run  # not tiling: the window IS the run bound
    if w16 and wide_weights:
        # the (capacity, 2) limb accumulators exist precisely because
        # lo-limb sums can reach S*0xFFFF; truncating them to int16
        # would corrupt exactly the corpora that need the wide path
        raise ValueError("w16=True requires wide_weights=False")
    if expand_e is not None and Q * S * max_run >= 2**31:
        # the compact expansion's offsets come from an int32 cumsum; a
        # probe block whose worst-case tuple count wraps int32 would
        # pass the m > expand_e undersize check spuriously and silently
        # drop matches. Callers bound Q (q_chunk) and max_run
        # (run-offset tiling) well below this; fail loudly if not.
        raise ValueError(
            f"compact expansion overflow risk: Q*S*max_run = "
            f"{Q * S * max_run} >= 2^31; lower q_chunk or run_chunk"
        )

    def lower_bound(hi, lo):
        # bucket_starts=None → full-range bisect (the mode used per
        # shard by the hash-range-sharded engine, whose local posting
        # slices have no bucket table; span_steps must cover log2(N))
        if bucket_starts is None:
            z = jnp.zeros(hi.shape, jnp.int32)
            return _bisect_rounds_packed(
                g4, hi, lo, z, jnp.full(hi.shape, N, jnp.int32), span_steps
            )
        return _bucketed_lower_bound_packed(
            g4, bucket_starts, hi, lo, span_steps, bucket_shift
        )

    pos = lower_bound(q_hi, q_lo)

    if expand_e is None:
        # rectangular expansion: (max_run, Q, S) match tuples
        r = jax.lax.broadcasted_iota(jnp.int32, (max_run, Q, S), 0)
        p = pos[None, :, :] + jnp.int32(run_offset) + r
        idx = jnp.minimum(p, N - 1)
        row = jnp.take(g4, idx, axis=0)  # (max_run, Q, S, 4) — one gather
        match = (
            q_valid[None]
            & (row[..., 0] == q_hi[None])
            & (row[..., 1] == q_lo[None])
            & (p < N)
        )
        t = jnp.where(match, row[..., 2].astype(jnp.int32), jnp.int32(n_targets))
        q = jax.lax.broadcasted_iota(jnp.int32, (max_run, Q, S), 1)
        q_key = jnp.where(match, q, jnp.int32(Q))  # sentinel: sinks to end
        w = (
            None
            if skip_weights
            else jnp.where(match, row[..., 3].astype(jnp.int32), 0).reshape(-1)
        )
        q_key, t = q_key.reshape(-1), t.reshape(-1)
        m_total = jnp.sum(match.astype(jnp.int32))
    else:
        E = expand_e
        if rl is not None:
            # run-length LOOKUP: rl[i] = length of the run containing
            # posting i (device-derived from g4 once per index,
            # ``device_run_lengths``). The lower bound lands on a run
            # start; one row gather confirms the hash matches and one
            # int32 gather reads the exact run length — replacing the
            # whole hash+1 upper-bound bisect (log2(max_run) row
            # gathers per probe ≈ a quarter of the kernel's gather
            # budget, ROADMAP r5 budget split).
            posc = jnp.clip(pos, 0, N - 1)
            row0 = jnp.take(g4, posc, axis=0)  # (Q, S, 4)
            matched = (
                q_valid
                & (row0[..., 0] == q_hi)
                & (row0[..., 1] == q_lo)
                & (pos < N)
            )
            cnt = jnp.where(matched, jnp.take(rl, posc), 0)
        else:
            # exact run length: lower_bound(hash+1) - lower_bound(hash).
            # (hash == u64::MAX wraps to 0 — its upper bound is N.)
            lo1 = q_lo + jnp.uint32(1)
            hi1 = q_hi + (lo1 == 0).astype(jnp.uint32)
            wrapped = (q_hi == jnp.uint32(0xFFFFFFFF)) & (
                q_lo == jnp.uint32(0xFFFFFFFF)
            )
            # the second probe needs only the span
            # [pos, pos + true_max_run]: a run of equal hashes can
            # never exceed the corpus' build-time max run, so ub always
            # lands there — log2(max_run) bisect rounds instead of
            # re-searching the whole bucket span. ``max_run`` here may
            # be a run-offset TILE width; the true run bound is the
            # index-wide ``true_max_run``.
            ub_steps = max(int(true_max_run).bit_length(), 1)
            ub = _bisect_rounds_packed(
                g4,
                hi1,
                lo1,
                pos,
                jnp.minimum(pos + jnp.int32(true_max_run), N),
                ub_steps,
            )
            ub = jnp.where(wrapped, jnp.int32(N), ub)
            cnt = jnp.where(q_valid, ub - pos, 0)
        # run-offset window [run_offset, run_offset + max_run)
        cnt = jnp.clip(cnt - jnp.int32(run_offset), 0, max_run)
        cntf = cnt.reshape(-1)  # (P,) probes, P = Q·S
        lbf = (pos + jnp.int32(run_offset)).reshape(-1)
        offs = jnp.cumsum(cntf) - cntf  # exclusive; M ≤ Q·S·max_run
        m_total = offs[-1] + cntf[-1]
        P = cntf.shape[0]
        pid = jnp.arange(P, dtype=jnp.int32)
        # segment-start ownership: probes sharing an offset are one
        # non-empty probe plus preceding empties — max pid wins
        seg0 = jnp.zeros(E, jnp.int32).at[offs].max(pid + 1, mode="drop")
        probe = jax.lax.cummax(seg0) - 1  # (E,) owning probe per slot
        rank = jnp.arange(E, dtype=jnp.int32) - jnp.take(offs, probe)
        valid_t = rank < jnp.take(cntf, probe)
        idx = jnp.take(lbf, probe) + rank
        row = jnp.take(g4, jnp.clip(idx, 0, N - 1), axis=0)  # (E, 4)
        t = jnp.where(valid_t, row[:, 2].astype(jnp.int32), jnp.int32(n_targets))
        q_key = jnp.where(valid_t, probe // jnp.int32(S), jnp.int32(Q))
        w = (
            None
            if skip_weights
            else jnp.where(valid_t, row[:, 3].astype(jnp.int32), 0)
        )

    # one lexicographic sort groups equal (q, t) pairs contiguously.
    # unstable: within-segment order of w is irrelevant (everything
    # downstream is a permutation-invariant segment sum). skip_weights
    # drops the weight payload from the sort entirely (weight ≡ count).
    if skip_weights:
        sq, st = jax.lax.sort((q_key, t), num_keys=2, is_stable=False)
        sw = None
    else:
        sq, st, sw = jax.lax.sort((q_key, t, w), num_keys=2, is_stable=False)
    valid = sq < Q
    prev_q = jnp.concatenate([jnp.full((1,), -1, sq.dtype), sq[:-1]])
    prev_t = jnp.concatenate([jnp.full((1,), -1, st.dtype), st[:-1]])
    head = valid & ((sq != prev_q) | (st != prev_t))
    seg = jnp.cumsum(head.astype(jnp.int32)) - 1  # segment slot per tuple
    n_hits = jnp.sum(head.astype(jnp.int32))

    slot = jnp.where(valid, seg, capacity)  # overflow + invalid: dropped
    counts = jnp.zeros(capacity, jnp.int32).at[slot].add(
        valid.astype(jnp.int32), mode="drop"
    )
    # 64-bit-exact weighted sums. Wide path: two 16-bit limb
    # accumulators — a segment holds ≤ S tuples (one per query-hash
    # slot), so the limb sums stay ≤ S·2^16 < 2^31 for any realistic
    # block width while the COMBINED value (host: lo + (hi << 16),
    # int64) is exact up to S·2^31 — no int32 saturation on
    # high-abundance corpora. Narrow path (callers prove
    # S · max_abundance < 2^31 via ``_wide_weights_needed``): one int32
    # scatter-add, saving a full-length scatter in the kernel tail.
    if skip_weights:
        # caller proved max_abundance == 1: every matched posting
        # contributes weight 1, so weight ≡ count exactly — the weight
        # scatter AND its host fetch vanish (hosts use the counts)
        weights = jnp.zeros((0,), jnp.int32)
    elif wide_weights:
        wv = jnp.where(valid, sw, 0)
        weights = jnp.zeros((capacity, 2), jnp.int32)
        weights = weights.at[slot, 0].add(wv & jnp.int32(0xFFFF), mode="drop")
        weights = weights.at[slot, 1].add(wv >> jnp.int32(16), mode="drop")
    else:
        wv = jnp.where(valid, sw, 0)
        weights = jnp.zeros(capacity, jnp.int32).at[slot].add(wv, mode="drop")
    head_slot = jnp.where(head, seg, capacity)
    t_out = jnp.full(capacity, n_targets, jnp.int32).at[head_slot].set(
        st, mode="drop"
    )
    stats = jnp.stack([n_hits, m_total.astype(jnp.int32)])
    if q_bounds:
        # per-query boundary vector b[i] = #hits with q ≤ i ((Q,)
        # int32, ~2 KB) replaces the (H,)-length q column over the
        # tunnel entirely — hosts reconstruct q by run lengths
        # (``_q_from_bounds``). Derived STRAIGHT from the sorted
        # tuples: tuples with q ≤ i are a prefix (sq ascending, Q
        # sentinels last), so b[i] = heads among the first
        # searchsorted(sq, i+1) tuples — one Q-lane bisect over E plus
        # the already-computed head cumsum. This removes the
        # (capacity,) q_out scatter from the kernel tail altogether
        # (~1/3 of its scatter updates). Values can exceed capacity on
        # overflow where the scatter formulation clamped; hosts clip at
        # the fetched hit count either way (``_q_from_bounds``).
        p = jnp.searchsorted(
            sq, jnp.arange(1, Q + 1, dtype=sq.dtype), side="left"
        )
        cum = (seg + 1).astype(jnp.int32)
        q_out = jnp.where(
            p > 0, jnp.take(cum, jnp.maximum(p - 1, 0)), 0
        ).astype(jnp.int32)
    else:
        q_out = jnp.full(capacity, Q, jnp.int32).at[head_slot].set(
            sq, mode="drop"
        )
    if compact_io:
        # host fetch rides a ~40 MB/s tunnel: q (≤ Q < 2^15) and count
        # (≤ S < 2^15) downcast to int16 AFTER the scatters (two
        # elementwise passes, ~free on device) — 25% fewer fetched
        # bytes per hit slot; hosts upcast on arrival. (The q-bounds
        # vector stays int32: boundary values reach the hit count.)
        if not q_bounds:
            q_out = q_out.astype(jnp.int16)
        counts = counts.astype(jnp.int16)
    if t16:  # n_targets < 2^15: target ids (sentinel included) fit too
        t_out = t_out.astype(jnp.int16)
    elif tc32:
        # n_targets < 2^24 and S < 256 (so count ≤ S fits a byte): pack
        # (t << 8) | count into ONE u32 — the dispatcher then skips the
        # counts fetch entirely, cutting 10 B/hit to 8 over the tunnel
        t_out = (t_out.astype(jnp.uint32) << jnp.uint32(8)) | counts.astype(
            jnp.uint32
        ) & jnp.uint32(0xFF)
    if w16:  # S·max_ab < 2^15: narrow weights fit int16 as well
        weights = weights.astype(jnp.int16)
    return q_out, t_out, counts, weights, stats


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_targets", "max_run", "capacity", "span_steps", "bucket_shift",
        "expand_e", "wide_weights", "compact_io", "t16", "tc32", "w16",
        "q_bounds", "skip_weights", "true_max_run",
    ),
)
def inverted_sparse_hits(
    g4,
    bucket_starts,
    q_hi,
    q_lo,
    q_valid,
    rl=None,
    *,
    n_targets: int,
    max_run: int,
    capacity: int,
    span_steps: int,
    bucket_shift: int = 48,
    run_offset=0,
    expand_e: int | None = None,
    wide_weights: bool = True,
    compact_io: bool = False,
    t16: bool = False,
    tc32: bool = False,
    w16: bool = False,
    q_bounds: bool = False,
    skip_weights: bool = False,
    true_max_run: int | None = None,
):
    """Device kernel: bounded sparse (q, t, count, weight) hit list.

    Consumes the packed (N, 4) interleaved posting array (the
    ``device_postings`` layout — every probe and run step is one
    16-byte gather row) with the bucketed lower bound.

    Returns (q_out, t_out, count_out, weight_limbs, stats) with the
    first ``min(n_hits, capacity)`` slots populated in (q, t) ascending
    order; slots beyond the hit count hold q = Q sentinels.
    ``weight_limbs`` is (capacity, 2) int32 — 16-bit lo/hi limb sums
    whose host combination (``_combine_weight_limbs``) is the exact
    int64 weighted sum (no int32 saturation at high abundance) — or,
    with ``wide_weights=False`` (callers prove saturation impossible
    via ``_wide_weights_needed``), a plain (capacity,) int32 sum.

    ``run_offset`` shifts the probe window within each posting run:
    the kernel examines run elements [run_offset, run_offset+max_run).
    Elements past a run's true end stop matching on the hash compare,
    so a caller can tile arbitrarily long runs with several calls and
    merge the partial hit lists (``sparse_search`` does; that bounds
    the tuple expansion for corpora whose worst hash occurs in huge
    numbers of targets).
    """
    return _sparse_hits_core(
        g4,
        bucket_starts,
        q_hi,
        q_lo,
        q_valid,
        rl,
        n_targets=n_targets,
        max_run=max_run,
        capacity=capacity,
        span_steps=span_steps,
        bucket_shift=bucket_shift,
        run_offset=run_offset,
        expand_e=expand_e,
        wide_weights=wide_weights,
        compact_io=compact_io,
        t16=t16,
        tc32=tc32,
        w16=w16,
        q_bounds=q_bounds,
        skip_weights=skip_weights,
        true_max_run=true_max_run,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_targets", "max_run", "capacity", "span_steps", "bucket_shift",
        "expand_e", "wide_weights", "compact_io", "t16", "tc32", "w16",
        "q_bounds", "skip_weights", "true_max_run",
    ),
)
def inverted_sparse_hits_chunks(
    g4,
    bucket_starts,
    q_hi3,
    q_lo3,
    q_valid3,
    rl=None,
    *,
    n_targets: int,
    max_run: int,
    capacity: int,
    span_steps: int,
    bucket_shift: int = 48,
    run_offset=0,
    expand_e: int | None = None,
    wide_weights: bool = True,
    compact_io: bool = False,
    t16: bool = False,
    tc32: bool = False,
    w16: bool = False,
    q_bounds: bool = False,
    skip_weights: bool = False,
    true_max_run: int | None = None,
):
    """All query chunks in ONE compiled program via ``lax.scan``.

    Inputs are (C, Qc, S) chunk stacks; outputs are (C, capacity) hit
    buffers + a (C,) true-hit-count vector. One kernel launch and one
    small host fetch replace C launches each followed by a synchronous
    ``n_hits`` round-trip — over the tunneled TPU those per-chunk
    round-trips dominated wall time (the device compute per chunk is
    single-digit ms; an RTT is tens of ms). Memory stays bounded: the
    scan body holds one chunk's (max_run, Qc, S) expansion at a time.
    """

    def step(carry, qs):
        qh, ql, qv = qs
        out = _sparse_hits_core(
            g4,
            bucket_starts,
            qh,
            ql,
            qv,
            rl,
            n_targets=n_targets,
            max_run=max_run,
            capacity=capacity,
            span_steps=span_steps,
            bucket_shift=bucket_shift,
            run_offset=run_offset,
            expand_e=expand_e,
            wide_weights=wide_weights,
            compact_io=compact_io,
            t16=t16,
            tc32=tc32,
            w16=w16,
            q_bounds=q_bounds,
            skip_weights=skip_weights,
            true_max_run=true_max_run,
        )
        return carry, out

    _, outs = jax.lax.scan(step, 0, (q_hi3, q_lo3, q_valid3))
    return outs


# per-kernel-call cap on the run expansion's leading dimension: corpora
# whose worst hash occurs in more targets than this are probed in
# ``_RUN_TILE``-wide offset windows and the partial hit lists merged on
# host — kernel memory stays O(Q·S·_RUN_TILE) no matter how pathological
# the posting runs are
_RUN_TILE = 2048

# learned compact-expansion budgets: (id(g_hi), Q, S) → (weakref to
# g_hi, pow2 slot count). Seeded at 4·Q·S (≈ mean run 4 over half-hit
# probes), then updated to 2× the observed match total M — the kernel
# reports exact M, so an undersized E is always detected and retried,
# never silently wrong. Entries hold a WEAK reference to the host
# array: a live array's id() is unique (no aliasing), and a retired
# index's corpus-scale array is not kept alive by a perf-hint cache.
_EXPAND_CACHE: "OrderedDict[tuple, tuple]" = OrderedDict()
_EXPAND_CACHE_SLOTS = 64
# compact expansion on by default; None falls back to the rectangular
# (max_run, Q, S) expansion (kept for A/B tests and tiny blocks)
COMPACT_EXPANSION = True
# run-length lookup: MEASURED AND REJECTED as the default (on-chip A/B
# at 512x524k, 2026-08-20: 3091 q/s vs 3819 with the bisect, bit-equal
# — the hash+1 upper-bound bisect's 6 rounds all land inside the
# probe's own ~41-row window, so its gathers are cache-local and
# nearly free, while the (N,) side-array gather pays a full random HBM
# access per probe). The path stays A/B-testable; the sharded
# chip-mesh path never uses it (no per-slice side array).
RL_LOOKUP = False
# q-bounds transport on by default: the per-hit q column is replaced by
# a (Q,) boundary vector over the tunnel (hosts reconstruct q by run
# lengths — exact). Off falls back to fetching the q column (A/B tests).
Q_BOUNDS_IO = True
# weight elision on unit-abundance corpora: when max_abundance == 1,
# weight ≡ count exactly — the kernel skips the weight sort payload +
# scatter and the host skips the weight fetch. Off for A/B tests.
SKIP_W_UNIT_AB = True


# device-derived (N,) int32 run lengths per index, keyed by the device
# g4 array's identity (same lifetime discipline as _DEVICE_CACHE)
_RL_CACHE: "OrderedDict[int, tuple]" = OrderedDict()
_RL_CACHE_SLOTS = 2


@jax.jit
def _run_lengths_jit(g4):
    """(N,) int32: length of the equal-hash run containing posting i,
    for EVERY i (probes only read it at run starts — the lower bound
    always lands there on a match)."""
    n = g4.shape[0]
    hi, lo = g4[:, 0], g4[:, 1]
    iota = jnp.arange(n, dtype=jnp.int32)
    isnew = jnp.concatenate(
        [jnp.ones((1,), bool), (hi[1:] != hi[:-1]) | (lo[1:] != lo[:-1])]
    )
    start = jax.lax.cummax(jnp.where(isnew, iota, 0))
    nxt = jnp.concatenate(
        [
            jnp.where(isnew, iota, n).astype(jnp.int32)[1:],
            jnp.full((1,), n, jnp.int32),
        ]
    )
    end = jax.lax.cummin(nxt[::-1])[::-1]  # first run start AFTER i
    return end - start


def device_run_lengths(inv):
    """Cached device (N,) run-length array for an index's postings —
    derived on device from the packed g4 (no upload, one O(N) scan
    program per index). Keyed by a WEAK reference to the index's cache
    owner (like the other hint caches) and swept on access, so a
    retired corpus releases its corpus-scale rl array instead of
    pinning ~4 B/posting of HBM until LRU eviction."""
    owner = _cache_owner(inv)
    for k in [k for k, (ref, _v) in list(_RL_CACHE.items()) if ref() is None]:
        del _RL_CACHE[k]
    rl = _cache_get(_RL_CACHE, (id(owner),), owner)
    if rl is not None:
        return rl
    _binv, g4, _starts = device_postings(inv)
    rl = _run_lengths_jit(g4)
    _cache_put(_RL_CACHE, _RL_CACHE_SLOTS, (id(owner),), owner, rl)
    return rl


def _pow2(x: int) -> int:
    return 1 << max(int(x) - 1, 0).bit_length()


def _qpow2(x: int) -> int:
    """Smallest quarter-power-of-two (mantissa {4,5,6,7} · 2^k) ≥ x.

    Kernel work scales with the static expansion budget E, so plain
    pow2 quantization pays up to 2x oversized sorts; quarter steps
    bound the overshoot at 25% for ≤ 4x the compile count (amortized
    by the persistent compile cache + persisted learned budgets)."""
    x = max(int(x), 1)
    k = max(x.bit_length() - 3, 0)
    return -(-x >> k) << k


def _trim_len(h: int, cap: int) -> int:
    """Fetch-slice length for ``h`` hits: smallest quarter-power-of-two
    (mantissa {4,5,6,7} · 2^k) ≥ h. Each distinct static slice length
    is its own compiled program, so lengths must quantize — but the
    tunnel's D2H bandwidth (~40 MB/s measured) makes plain pow2's up-to
    -2x over-fetch the costlier side; quarter steps bound over-fetch at
    25% for ≤ 4x the slice-program count (amortized by the persistent
    compile cache)."""
    return min(int(cap), max(128, _qpow2(h)))


def _cache_owner(inv):
    """Identity anchor for the learned-hint caches: the host ``g_hi``
    array, or the device ``g4_dev`` for a ``DeviceInvertedIndex`` —
    touching ``.g_hi`` there would force a corpus-sized download just
    to key a cache."""
    g4_dev = getattr(inv, "g4_dev", None)
    return g4_dev if g4_dev is not None else inv.g_hi


def _cache_get(cache: OrderedDict, key: tuple, owner):
    """Value if the entry's weakly-referenced owner is still ``owner``."""
    ent = cache.get(key)
    return ent[1] if ent is not None and ent[0]() is owner else None


def _cache_put(cache: OrderedDict, slots: int, key: tuple, owner, value):
    import weakref

    cache[key] = (weakref.ref(owner), value)
    cache.move_to_end(key)
    while len(cache) > slots:
        cache.popitem(last=False)


def export_learned_hints(inv) -> dict:
    """Snapshot the learned per-(block shape) performance hints of one
    index — the compact-expansion budget E and the pow2 trimmed-fetch
    lengths — for persistence in ``.ksx`` (``ProteomeIndex.save``).

    Wrong or stale hints are never wrong-results (an undersized E is
    detected via the kernel's exact match total and retried; a fetch
    hint only shapes transfer sizes), so persisting them is pure
    warm-start: a fresh process skips the first-call undersize retry
    and fetch re-sizing that otherwise double the first block's
    latency (VERDICT r2 item 6)."""
    owner = _cache_owner(inv)
    out = {"expand": {}, "hp": {}}
    for key, (ref, val) in _EXPAND_CACHE.items():
        if ref() is owner:
            out["expand"][",".join(str(x) for x in key[1:])] = int(val)
    for key, (ref, val) in _HP_CACHE.items():
        if ref() is owner:
            out["hp"][",".join(str(x) for x in key[1:])] = int(val)
    # measured-best dense query block (ops.inverted.autotune_dense_block)
    from .inverted import _DENSE_BLOCK_CACHE

    dense = _cache_get(_DENSE_BLOCK_CACHE, (id(owner),), owner)
    if dense:
        out["dense_block"] = int(dense)
    return out


def seed_learned_hints(inv, hints) -> None:
    """Seed the learned-hint caches for a freshly loaded index.

    Hints are advisory-only; a malformed file (non-dict top level,
    non-scalar values) must never abort an otherwise-valid index load,
    so every per-entry conversion sits inside the try."""
    if not isinstance(hints, dict):
        return
    owner = _cache_owner(inv)
    ex = hints.get("expand")
    for k, v in (ex.items() if isinstance(ex, dict) else ()):
        try:
            Q, S = (int(x) for x in k.split(","))
            v = int(v)
        except (ValueError, TypeError):
            continue
        _cache_put(
            _EXPAND_CACHE, _EXPAND_CACHE_SLOTS, (id(owner), Q, S), owner, v
        )
    hp = hints.get("hp")
    for k, v in (hp.items() if isinstance(hp, dict) else ()):
        try:
            shape = tuple(int(x) for x in k.split(","))
            v = int(v)
        except (ValueError, TypeError):
            continue
        _cache_put(
            _HP_CACHE, _HP_CACHE_SLOTS, (id(owner),) + shape, owner, v
        )
    dense = hints.get("dense_block")
    if isinstance(dense, (int, float)) and int(dense) > 0:
        from .inverted import note_dense_block

        note_dense_block(inv, int(dense))


def _expand_budget(inv: InvertedIndex, Q: int, S: int, max_run: int):
    """Static E for the compact expansion (None → rectangular path)."""
    if not COMPACT_EXPANSION:
        return None
    owner = _cache_owner(inv)
    e = _cache_get(_EXPAND_CACHE, (id(owner), Q, S), owner)
    if e is None:
        e = _qpow2(4 * Q * S)
    # never above the rectangular worst case, never trivial
    return max(128, min(e, _qpow2(Q * S * max_run)))


# thread-local warming flag: a warm_sparse_engine dummy block (zero
# matches) must not poison the learned budgets — _note_expand(m=0)
# would shrink E to the floor and the first REAL block would compile a
# different program AND pay the undersize retry (code-review r5)
import threading as _threading

_warming_state = _threading.local()


def _note_expand(inv: InvertedIndex, Q: int, S: int, m_seen: int) -> None:
    if getattr(_warming_state, "active", False):
        return
    owner = _cache_owner(inv)
    key = (id(owner), Q, S)
    prev = _cache_get(_EXPAND_CACHE, key, owner) or 0
    _cache_put(
        _EXPAND_CACHE,
        _EXPAND_CACHE_SLOTS,
        key,
        owner,
        max(prev, _qpow2(2 * max(m_seen, 64))),
    )


# learned trimmed-fetch lengths: (id(g_hi), block shape) → (weakref to
# g_hi, hp). Over the tunnel each host sync costs a full RTT; knowing
# last call's pow2-quantized hit length lets the next call start the
# trimmed hit fetches BEFORE syncing on the stats vector, overlapping
# the two round-trips. A wrong hint is never wrong-results: too small
# → the normal re-fetch path runs; too big → extra bytes only. Sized
# so run-offset tiling (one shape key per tile, up to ~32 tiles at
# _RUN_TILE over a 64k-deep posting run) doesn't thrash the LRU.
_HP_CACHE: "OrderedDict[tuple, tuple]" = OrderedDict()
_HP_CACHE_SLOTS = 64


def _hp_hint(inv: InvertedIndex, shape: tuple):
    owner = _cache_owner(inv)
    return _cache_get(_HP_CACHE, (id(owner),) + shape, owner)


def _note_hp(inv: InvertedIndex, shape: tuple, hp: int) -> None:
    if getattr(_warming_state, "active", False):
        return
    owner = _cache_owner(inv)
    _cache_put(
        _HP_CACHE, _HP_CACHE_SLOTS, (id(owner),) + shape, owner, int(hp)
    )


def _q_from_bounds(bounds: np.ndarray, h: int) -> np.ndarray:
    """Reconstruct the (h,) q column from the kernel's (Q,) boundary
    vector (bounds[i] = #hits with q ≤ i; hits are (q, t)-ascending, so
    run-length expansion is exact; a capacity-truncated list drops only
    tail hits, so clipping the cumulative bounds at h stays exact)."""
    b = np.minimum(bounds.astype(np.int64), int(h))
    reps = np.diff(np.concatenate([[0], b]))
    return np.repeat(np.arange(len(bounds), dtype=np.int32), reps)


def _hit_views(q_out, t_out, counts, weights, sl, tc_32, q_b, skip_w):
    """The device-side buffer views one fetch needs for hit slots
    [:sl]. The q-bounds vector is (Q,)-sized and fetched whole; the
    tc32 packed t carries counts; skip_w drops the weight fetch."""
    vs = [q_out if q_b else q_out[:sl], t_out[:sl]]
    if not tc_32:
        vs.append(counts[:sl])
    if not skip_w:
        vs.append(weights[:sl])
    return vs


def _mk_hits(vs, h, n, wide, tc_32, q_b, skip_w) -> SparseHits:
    """Fetched views (``_hit_views`` order) -> SparseHits: upcast the
    int16 transports, unpack (t << 8) | count, reconstruct q from the
    boundary vector, and materialize weight ≡ count when elided."""
    it = iter(vs)
    qa = np.asarray(next(it))
    ta = np.asarray(next(it))[:h]
    ca = None if tc_32 else np.asarray(next(it))[:h]
    wa = None if skip_w else np.asarray(next(it))[:h]
    qa = _q_from_bounds(qa, h) if q_b else qa[:h].astype(np.int32)
    if tc_32:
        t = (ta >> np.uint32(8)).astype(np.int32)
        c = (ta & np.uint32(0xFF)).astype(np.int32)
    else:
        t = ta.astype(np.int32)
        c = ca.astype(np.int32)
    w = c.astype(np.int64) if skip_w else _weights_int64(wa, wide)
    return SparseHits(qa, t, c, w, n)


def _start_async_fetch(views) -> None:
    for v in views:
        try:
            v.copy_to_host_async()
        except AttributeError:
            pass


def _sparse_launch(
    inv: InvertedIndex,
    q_hi,
    q_lo,
    q_valid,
    capacity: int | None,
    max_run: int,
    run_offset: int = 0,
) -> dict:
    """Dispatch one kernel invocation WITHOUT syncing.

    Returns a state dict for ``_sparse_finish``. Splitting launch from
    finish lets a stream of query blocks pipeline: while block i's hit
    buffers cross the tunnel and assemble on host, block i+1's kernel
    is already running (``sparse_search_stream``)."""
    Q, S = np.shape(q_hi)
    retry_on_overflow = capacity is None
    if capacity is None:
        # worst case (every probed posting a distinct pair) can be huge;
        # start bounded — the kernel reports the true hit count, so one
        # exact-capacity retry covers the rare overflow
        capacity = min(Q * S * max_run, 4 * 1024 * 1024)
    capacity = max(((capacity + 127) // 128) * 128, 128)
    binv, g4, bucket_starts = device_postings(inv)
    Qn, Sn = int(Q), int(S)
    expand_e = _expand_budget(inv, Qn, Sn, max_run)
    skip_w = SKIP_W_UNIT_AB and _max_abundance(inv) == 1
    wide = (not skip_w) and _wide_weights_needed(inv, Sn)
    c_io = Qn < 2**15 and Sn < 2**15  # int16 q/count transfer
    t_16 = binv.n_targets < 2**15
    tc_32 = (not t_16) and binv.n_targets < 2**24 and Sn < 256
    w_16 = (
        not skip_w and not wide and Sn * max(_max_abundance(inv), 1) < 2**15
    )
    q_b = Q_BOUNDS_IO
    rl = (
        device_run_lengths(inv)
        if RL_LOOKUP and expand_e is not None
        else None
    )

    def run(cap: int, e):
        return inverted_sparse_hits(
            g4,
            bucket_starts,
            q_hi,
            q_lo,
            q_valid,
            rl,
            n_targets=binv.n_targets,
            max_run=max_run,
            capacity=cap,
            span_steps=max(int(binv.max_span).bit_length(), 1),
            bucket_shift=binv.bucket_shift,
            run_offset=run_offset,
            expand_e=e,
            wide_weights=wide,
            compact_io=c_io,
            t16=t_16,
            tc32=tc_32,
            w16=w_16,
            q_bounds=q_b,
            skip_weights=skip_w,
            true_max_run=int(inv.max_run),
        )

    q_out, t_out, counts, weights, stats = run(int(capacity), expand_e)
    # optimistic trimmed fetch: start the hit-buffer transfers at the
    # LAST call's hit length before syncing on stats (one overlapped
    # round-trip instead of two sequential ones)
    shape_key = (Qn, Sn, run_offset, int(capacity))
    hv = _hp_hint(inv, shape_key)
    opt = None
    if hv is not None:
        hv = min(int(hv), int(capacity))
        opt = _hit_views(q_out, t_out, counts, weights, hv, tc_32, q_b, skip_w)
        _start_async_fetch(opt)
    return {
        "run": run,
        "buffers": (q_out, t_out, counts, weights, stats),
        "opt": opt,
        "hv": hv,
        "shape_key": shape_key,
        "capacity": int(capacity),
        "expand_e": expand_e,
        "retry_on_overflow": retry_on_overflow,
        "Qn": Qn,
        "Sn": Sn,
        "max_run": max_run,
        "flags": (wide, tc_32, q_b, skip_w),
    }


def _sparse_finish(inv: InvertedIndex, st: dict) -> SparseHits:
    """Sync + fetch + assemble one launched invocation (with the rare
    undersized-budget / overflow retries run synchronously)."""
    run = st["run"]
    q_out, t_out, counts, weights, stats = st["buffers"]
    opt, hv = st["opt"], st["hv"]
    capacity, expand_e = st["capacity"], st["expand_e"]
    Qn, Sn, max_run = st["Qn"], st["Sn"], st["max_run"]
    wide, tc_32, q_b, skip_w = st["flags"]
    n, m = (int(v) for v in np.asarray(stats))
    if expand_e is not None and m > expand_e:
        # compact budget undersized: retry at the exact match total
        expand_e = max(128, min(_qpow2(m), _qpow2(Qn * Sn * max_run)))
        q_out, t_out, counts, weights, stats = run(int(capacity), expand_e)
        n, m = (int(v) for v in np.asarray(stats))
        opt = None
    if expand_e is not None:
        _note_expand(inv, Qn, Sn, m)
    if st["retry_on_overflow"] and n > capacity:
        capacity = ((n + 127) // 128) * 128
        q_out, t_out, counts, weights, stats = run(int(capacity), expand_e)
        n = int(np.asarray(stats)[0])
        opt = None
    h = min(n, int(capacity))
    # slice on DEVICE before fetching: the buffers are capacity-sized
    # but only the first h slots carry hits — at UniProt scale fetching
    # the full buffers over the tunnel is ~6x more traffic than needed.
    # The slice length quantizes to a power of two so only O(log
    # capacity) distinct slice programs ever compile (each distinct
    # static length is its own XLA program — costly over the tunnel).
    hp = _trim_len(h, capacity)
    _note_hp(inv, st["shape_key"], hp)
    if opt is not None and h <= hv:
        return _mk_hits(opt, h, n, wide, tc_32, q_b, skip_w)
    views = _hit_views(q_out, t_out, counts, weights, hp, tc_32, q_b, skip_w)
    _start_async_fetch(views)
    return _mk_hits(views, h, n, wide, tc_32, q_b, skip_w)


def _sparse_single(
    inv: InvertedIndex,
    q_hi,
    q_lo,
    q_valid,
    capacity: int | None,
    max_run: int,
    run_offset: int = 0,
) -> SparseHits:
    """One kernel invocation (+ one exact-capacity retry on overflow)."""
    return _sparse_finish(
        inv,
        _sparse_launch(inv, q_hi, q_lo, q_valid, capacity, max_run, run_offset),
    )


# total output-slot budget for one scan launch (C · capacity): bounds
# the stacked (C, capacity) hit buffers to ~128 MB across the 4 arrays
_SCAN_SLOT_BUDGET = 8 * 1024 * 1024
# per-chunk auto-capacity floor (overridable in tests to exercise the
# exact-count overflow retry)
_CHUNK_CAP_FLOOR = 256 * 1024


def _sparse_chunks(
    inv: InvertedIndex,
    q_hi3: np.ndarray,
    q_lo3: np.ndarray,
    q_valid3: np.ndarray,
    capacity: int | None,
    max_run: int,
    run_offset: int = 0,
) -> list:
    """One scan launch over (C, Qc, S) query chunks → per-chunk hits.

    The whole chunk stack runs as a single compiled program
    (``inverted_sparse_hits_chunks``); the host then syncs ONCE on the
    (C,) hit-count vector and fetches all four hit buffers with
    overlapping async copies. Chunks whose auto-sized capacity
    overflowed are re-run individually at their now-known exact count.
    """
    import jax.numpy as jnp

    C, Qc, S = q_hi3.shape
    retry_on_overflow = capacity is None
    cap = capacity
    if cap is None:
        cap = min(Qc * S * max_run, max(_CHUNK_CAP_FLOOR, _SCAN_SLOT_BUDGET // C))
    elif C * cap > _SCAN_SLOT_BUDGET:
        # an explicit capacity large enough to blow the stacked
        # (C, capacity) scan buffers past the slot budget (the validate
        # path passes the exact hit count, which grows with the corpus):
        # fall back to sequential per-chunk calls — same results, device
        # memory stays O(capacity) instead of O(C·capacity)
        return [
            _sparse_single(
                inv,
                jnp.asarray(q_hi3[c]),
                jnp.asarray(q_lo3[c]),
                jnp.asarray(q_valid3[c]),
                capacity=cap,
                max_run=max_run,
                run_offset=run_offset,
            )
            for c in range(C)
        ]
    cap = max(((cap + 127) // 128) * 128, 128)
    binv, g4, bucket_starts = device_postings(inv)
    expand_e = _expand_budget(inv, int(Qc), int(S), max_run)
    skip_w = SKIP_W_UNIT_AB and _max_abundance(inv) == 1
    wide = (not skip_w) and _wide_weights_needed(inv, int(S))
    c_io = int(Qc) < 2**15 and int(S) < 2**15
    t_16 = binv.n_targets < 2**15
    tc_32 = (not t_16) and binv.n_targets < 2**24 and int(S) < 256
    w_16 = (
        not skip_w
        and not wide
        and int(S) * max(_max_abundance(inv), 1) < 2**15
    )
    q_b = Q_BOUNDS_IO
    rl = (
        device_run_lengths(inv)
        if RL_LOOKUP and expand_e is not None
        else None
    )

    def chunk_views(sl: int):
        # (C, ·) stacked views; the q-bounds matrix is (C, Q) and
        # fetched whole
        vs = [q_out if q_b else q_out[:, :sl], t_out[:, :sl]]
        if not tc_32:
            vs.append(counts[:, :sl])
        if not skip_w:
            vs.append(weights[:, :sl])
        return vs

    def run(e):
        return inverted_sparse_hits_chunks(
            g4,
            bucket_starts,
            jnp.asarray(q_hi3),
            jnp.asarray(q_lo3),
            jnp.asarray(q_valid3),
            rl,
            n_targets=binv.n_targets,
            max_run=max_run,
            capacity=int(cap),
            span_steps=max(int(binv.max_span).bit_length(), 1),
            bucket_shift=binv.bucket_shift,
            run_offset=run_offset,
            expand_e=e,
            wide_weights=wide,
            compact_io=c_io,
            t16=t_16,
            tc32=tc_32,
            w16=w_16,
            q_bounds=q_b,
            skip_weights=skip_w,
            true_max_run=int(inv.max_run),
        )

    q_out, t_out, counts, weights, stats = run(expand_e)
    # optimistic trimmed fetch at last call's hit length, overlapping
    # the stats sync (see _sparse_single)
    shape_key = (int(C), int(Qc), int(S), run_offset, int(cap))
    hv = _hp_hint(inv, shape_key)
    opt = None
    if hv is not None:
        hv = min(int(hv), int(cap))
        opt = chunk_views(hv)
        _start_async_fetch(opt)
    nm = np.asarray(stats)  # (C, 2): the single host sync for every chunk
    if expand_e is not None and int(nm[:, 1].max()) > expand_e:
        # compact budget undersized for some chunk: one exact retry
        expand_e = max(
            128,
            min(_qpow2(int(nm[:, 1].max())), _qpow2(int(Qc) * int(S) * max_run)),
        )
        q_out, t_out, counts, weights, stats = run(expand_e)
        nm = np.asarray(stats)
        opt = None
    if expand_e is not None:
        _note_expand(inv, int(Qc), int(S), int(nm[:, 1].max()))
    n = nm[:, 0]
    hs = np.minimum(n, int(cap))
    # shared power-of-two trim across chunks: one slice program per hp
    hp = _trim_len(int(hs.max()), cap)
    _note_hp(inv, shape_key, hp)
    if opt is not None and int(hs.max()) <= hv:
        views = opt
    else:
        views = chunk_views(hp)
        _start_async_fetch(views)  # overlap the transfers
    views_np = [np.asarray(v) for v in views]
    parts = []
    for c in range(C):
        nc, h = int(n[c]), int(hs[c])
        if retry_on_overflow and nc > int(cap):
            # exact-capacity retry for the rare overflowing chunk
            parts.append(
                _sparse_single(
                    inv,
                    jnp.asarray(q_hi3[c]),
                    jnp.asarray(q_lo3[c]),
                    jnp.asarray(q_valid3[c]),
                    capacity=nc,
                    max_run=max_run,
                    run_offset=run_offset,
                )
            )
            continue
        parts.append(
            _mk_hits(
                [v[c] for v in views_np], h, nc, wide, tc_32, q_b, skip_w
            )
        )
    return parts


def _merge_partial_hits(parts: list, capacity: int | None) -> SparseHits:
    """Sum partial hit lists produced by run-offset tiling.

    The same (q, t) pair can surface in several tiles (its shared
    hashes' runs straddle tile boundaries), so this is an additive
    merge: lexsort by (q, t), segment, sum counts/weights. Output stays
    (q, t)-ascending; ``capacity`` (if given) trims the merged list
    while ``n_hits`` keeps the true unique-pair count."""
    q = np.concatenate([p.q for p in parts])
    t = np.concatenate([p.t for p in parts])
    count = np.concatenate([p.count for p in parts])
    weight = np.concatenate([p.weight for p in parts])
    if len(q) == 0:
        return SparseHits(q, t, count, weight.astype(np.int64), 0)
    order = np.lexsort((t, q))
    q, t, count, weight = q[order], t[order], count[order], weight[order]
    head = np.empty(len(q), bool)
    head[0] = True
    head[1:] = (q[1:] != q[:-1]) | (t[1:] != t[:-1])
    starts = np.flatnonzero(head)
    merged = SparseHits(
        q[starts],
        t[starts],
        np.add.reduceat(count, starts).astype(np.int32),
        np.add.reduceat(weight, starts).astype(np.int64),
        len(starts),
    )
    if capacity is not None and len(starts) > capacity:
        merged = SparseHits(
            merged.q[:capacity],
            merged.t[:capacity],
            merged.count[:capacity],
            merged.weight[:capacity],
            merged.n_hits,
        )
    return merged


def sparse_search_host(
    index,
    q_hi,
    q_lo,
    q_valid,
    capacity: int | None = None,
) -> SparseHits:
    """Host-engine twin of ``sparse_search``: one vectorized numpy
    ``searchsorted`` join over the sorted posting array, same trimmed
    (q, t)-ascending ``SparseHits`` contract, bit-equal (tested).

    This is the COLD-START serve engine: a fresh process that just
    loaded a ``.ksx`` can answer its first query blocks from the host
    postings while the corpus-sized device upload + kernel compile
    proceed in the background (over a tunneled TPU the upload alone is
    tens of seconds). Steady-state throughput belongs to the device
    engine; this path's cost is O(Q·S·log N) host binary searches plus
    the expansion, with no device round-trips at all. The same join
    also backs the production ``manysearch`` host path
    (``core.search._host_join``), so serving from it is not a shortcut
    — it is the CLI's primary engine answering early.
    """
    inv = getattr(index, "inverted", None)
    if not isinstance(inv, (InvertedIndex, DeviceInvertedIndex)):
        inv = build_inverted_np(index.mins, index.abundances, index.offsets)
    from .u64 import join_np

    q64 = join_np(np.asarray(q_hi), np.asarray(q_lo))
    qv = np.asarray(q_valid)
    Q, S = q64.shape
    if inv.n_postings == 0:
        z = np.zeros(0, np.int32)
        return SparseHits(z, z, z, z.astype(np.int64), 0)
    # reuse the production host join (core.search._join_tuples): the
    # cached distinct-hash table + bucketed lookup + CSR expansion —
    # one engine, shared cache with manysearch (lazy import; no import
    # cycle: core.search imports this module lazily too)
    from ..core.search import _join_tuples

    counts_row = qv.sum(axis=1).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts_row)])

    class _QShim:
        mins = q64[qv]

        def __len__(self):
            return Q

    shim = _QShim()
    shim.offsets = offsets
    q, t, ab, _qhash, _posc = _join_tuples(shim, inv)
    m = len(q)
    if m == 0:
        z = np.zeros(0, np.int32)
        return SparseHits(z, z, z, z.astype(np.int64), 0)
    q = q.astype(np.int32)
    t = t.astype(np.int32)
    # aggregate per (q, t): tuples arrive q-ascending already (rows is
    # row-major over the valid mask), so lexsort by t within q
    order = np.lexsort((t, q))
    q, t, ab = q[order], t[order], ab[order]
    head = np.empty(m, bool)
    head[0] = True
    head[1:] = (q[1:] != q[:-1]) | (t[1:] != t[:-1])
    starts = np.flatnonzero(head)
    counts = np.diff(np.append(starts, m)).astype(np.int32)
    weights = np.add.reduceat(ab, starts).astype(np.int64)
    n_hits = len(starts)
    out = SparseHits(q[starts], t[starts], counts, weights, n_hits)
    if capacity is not None and n_hits > capacity:
        out = SparseHits(
            out.q[:capacity],
            out.t[:capacity],
            out.count[:capacity],
            out.weight[:capacity],
            n_hits,
        )
    return out


def sparse_search(
    index,
    q_hi,
    q_lo,
    q_valid,
    capacity: int | None = None,
    q_chunk: int | None = None,
    run_chunk: int | None = None,
) -> SparseHits:
    """ProteomeIndex + device query block → trimmed sparse hit list.

    ``capacity`` defaults to the worst-case tuple count (every probed
    posting a distinct pair), rounded up to a lane multiple; pass a
    tighter bound when the true hit count is known (e.g. from the host
    join) to shrink the output buffers.

    ``q_chunk`` bounds the kernel's (max_run, Q, S) tuple expansion for
    large query blocks: queries are processed in fixed-size chunks (one
    compiled program, last chunk padded) and the per-chunk hit lists
    concatenate — (q, t) order is preserved because chunks ascend in q.

    ``run_chunk`` (default ``_RUN_TILE``) bounds the expansion in the
    *run* dimension: when the corpus' longest posting run exceeds it,
    runs are probed in offset windows and the partial lists merged
    additively on host — a hash present in a million targets no longer
    inflates kernel memory.
    """
    inv = getattr(index, "inverted", None)
    if not isinstance(inv, (InvertedIndex, DeviceInvertedIndex)):
        inv = build_inverted_np(index.mins, index.abundances, index.offsets)
    Q, S = np.shape(q_hi)
    if inv.n_postings == 0:
        z = np.zeros(0, np.int32)
        return SparseHits(z, z, z, z.astype(np.int64), 0)
    if q_chunk is not None and Q > q_chunk:
        q_hi_np = np.asarray(q_hi)
        q_lo_np = np.asarray(q_lo)
        q_valid_np = np.asarray(q_valid)
        C = (Q + q_chunk - 1) // q_chunk
        # pow2-quantize the chunk count: one compiled scan program per
        # (C_pow2, Qc, S, capacity, max_run), not one per distinct C.
        # Padded chunks carry all-invalid queries → zero hits.
        C_pad = 1 << (C - 1).bit_length() if C > 1 else 1
        pad_rows = C_pad * q_chunk - Q
        ph = np.pad(
            q_hi_np, ((0, pad_rows), (0, 0)), constant_values=0xFFFFFFFF
        ).reshape(C_pad, q_chunk, -1)
        pl = np.pad(
            q_lo_np, ((0, pad_rows), (0, 0)), constant_values=0xFFFFFFFF
        ).reshape(C_pad, q_chunk, -1)
        pv = np.pad(
            q_valid_np, ((0, pad_rows), (0, 0)), constant_values=False
        ).reshape(C_pad, q_chunk, -1)
        tile = run_chunk if run_chunk is not None else _RUN_TILE
        # keep the worst-case tuple count int32-safe (see the guard in
        # _sparse_hits_core) — narrower tiles are merged additively, so
        # this only adds tiles, never changes results
        tile = max(1, min(tile, (2**31 - 1) // max(q_chunk * S, 1)))
        if inv.max_run > tile:
            # one scan launch per run-offset tile (each covers every
            # chunk), then per-chunk additive merge + capacity trim —
            # identical semantics to tiling within each chunk
            tiles = [
                _sparse_chunks(
                    inv, ph, pl, pv, capacity=None, max_run=tile, run_offset=off
                )
                for off in range(0, inv.max_run, tile)
            ]
            parts = [
                _merge_partial_hits([t[c] for t in tiles], capacity)
                for c in range(C)
            ]
        else:
            parts = _sparse_chunks(
                inv, ph, pl, pv, capacity=capacity, max_run=inv.max_run
            )[:C]
        return SparseHits(
            np.concatenate(
                [p.q + np.int32(c * q_chunk) for c, p in enumerate(parts)]
            ),
            np.concatenate([p.t for p in parts]),
            np.concatenate([p.count for p in parts]),
            np.concatenate([p.weight for p in parts]),
            sum(p.n_hits for p in parts),
        )
    tile = run_chunk if run_chunk is not None else _RUN_TILE
    tile = max(1, min(tile, (2**31 - 1) // max(Q * S, 1)))
    if inv.max_run > tile:
        # run-offset tiling: exact per-tile lists (auto capacity +
        # overflow retry), additive host merge
        parts = [
            _sparse_single(
                inv, q_hi, q_lo, q_valid,
                capacity=None, max_run=tile, run_offset=off,
            )
            for off in range(0, inv.max_run, tile)
        ]
        return _merge_partial_hits(parts, capacity)
    return _sparse_single(
        inv, q_hi, q_lo, q_valid, capacity=capacity, max_run=inv.max_run
    )


def sparse_search_stream(
    index,
    blocks,
    capacity: int | None = None,
    q_chunk: int | None = None,
    run_chunk: int | None = None,
):
    """Pipelined sparse search over a STREAM of query blocks.

    The production serving pattern: a loaded index answers query block
    after query block. Per-block ``sparse_search`` serializes kernel →
    stats sync → hit fetch → host assembly, so the device idles during
    every tunnel transfer; this generator keeps ONE block in flight —
    while block i's trimmed hit buffers cross the tunnel and assemble
    on host, block i+1's kernel is already dispatched (jax dispatch is
    async). Steady-state wall per block drops from kernel+fetch to
    ~max(kernel, fetch) (VERDICT r4 ask #2's "pipeline multiple query
    blocks per sync" option).

    ``blocks`` yields ``(q_hi, q_lo, q_valid)`` device (or host)
    arrays. Results are yielded in block order and are bit-identical to
    per-block ``sparse_search`` calls (tested). Blocks that need the
    non-pipelined machinery (query chunking above ``q_chunk``,
    run-offset tiling) fall back to ``sparse_search`` for that block —
    the stream stays correct, just unpipelined there.
    """
    import jax.numpy as jnp

    inv = getattr(index, "inverted", None)
    if not isinstance(inv, (InvertedIndex, DeviceInvertedIndex)):
        inv = build_inverted_np(index.mins, index.abundances, index.offsets)

    class _Shim:
        pass

    shim = _Shim()
    shim.inverted = inv
    pending = None
    tile = run_chunk if run_chunk is not None else _RUN_TILE
    for blk in blocks:
        q_hi, q_lo, q_valid = blk
        Q, S = np.shape(q_hi)
        simple = (
            inv.n_postings > 0
            and (q_chunk is None or Q <= q_chunk)
            and inv.max_run <= max(1, min(tile, (2**31 - 1) // max(Q * S, 1)))
        )
        if not simple:
            if pending is not None:
                yield _sparse_finish(inv, pending)
                pending = None
            yield sparse_search(
                shim, q_hi, q_lo, q_valid,
                capacity=capacity, q_chunk=q_chunk, run_chunk=run_chunk,
            )
            continue
        st = _sparse_launch(
            inv,
            jnp.asarray(q_hi),
            jnp.asarray(q_lo),
            jnp.asarray(q_valid),
            capacity,
            inv.max_run,
        )
        if pending is not None:
            yield _sparse_finish(inv, pending)
        pending = st
    if pending is not None:
        yield _sparse_finish(inv, pending)


def warm_sparse_engine(
    index, q_shape: tuple, q_chunk: int | None = None
) -> bool:
    """Upload the postings AND compile the sparse program for a given
    query-block shape, using an all-invalid dummy block (zero hits).

    The cold-start design serves the first blocks from the host engine
    while the device copy uploads in the background (DESIGN.md §6.9);
    without this, the device handover still pays the block-shape
    compile on its first REAL block — 85+ s over the tunnel on a cache
    miss (VERDICT r4 weak #2). A server that knows its serving block
    shape calls this right after load (the bench's cold child does),
    so the handover block pays execution only. The dummy block matches
    every static argument of the production program: corpus-derived
    flags (weight elision, transport widths), the learned expansion
    budget, and the default capacity — so the compiled program IS the
    production program. Hint LEARNING is suppressed for the dummy (its
    zero matches would otherwise shrink the learned budgets to the
    floor and un-warm the real block — code-review r5). Returns True
    when the dummy produced the expected empty hit list."""
    Q, S = q_shape
    q_hi = jnp.full((Q, S), 0xFFFFFFFF, jnp.uint32)
    q_lo = jnp.full((Q, S), 0xFFFFFFFF, jnp.uint32)
    q_valid = jnp.zeros((Q, S), bool)
    _warming_state.active = True
    try:
        hits = sparse_search(index, q_hi, q_lo, q_valid, q_chunk=q_chunk)
    finally:
        _warming_state.active = False
    return hits.n_hits == 0
