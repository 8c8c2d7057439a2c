"""Batched FracMinHash protein sketching on TPU (pure-JAX reference path).

This is the TPU-native re-design of kmerseek's hot loop — the window /
encode / murmur64 / scaled-filter pipeline that the reference runs once
inside sourmash's ``KmerMinHash::add_protein`` and again in
``ProteomeIndex::process_kmers`` (/root/reference/src/rust/index.rs:749-786,
signature.rs:273-282). Here the whole batch of sequences is processed in
one fused, shape-static XLA program:

  (B, L) uint8 residues ── LUT encode ──► (B, L) encoded bytes
        ── k shifted views ──► murmur3 x64_128 first-lane per window
        ── scaled filter (hash ≤ max_hash) ──► keep mask (B, W)
        ── sort + run-length dedup + scatter compaction ──►
  (B, S) sorted unique hashes ("mins") + int32 abundances + counts

Everything is elementwise/sort/scatter — VPU work; there is no
data-dependent shape anywhere (ragged outputs are carried as dense
(B, S) arrays + per-row counts, with S a static capacity).

A fused Pallas kernel version of the encode+hash+filter stage lives in
``ops.sketch_pallas``; this module is the bit-exactness anchor and the
fallback path, and both must agree exactly (tested).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .encoding import get_encoding_lut, max_hash_for_scaled
from .murmur3 import MURMUR_SEED, murmur64_kmer_windows
from .u64 import U64, le64, u64_const


class SketchBatch(NamedTuple):
    """Dense batch of per-sequence sketches.

    mins are sorted ascending per row; entries at index >= count are
    zero-filled padding. ``counts`` may exceed the static capacity S if
    the caller under-provisioned — check ``counts.max() <= S``.
    """

    mins_hi: jnp.ndarray  # (B, S) uint32
    mins_lo: jnp.ndarray  # (B, S) uint32
    abund: jnp.ndarray  # (B, S) int32
    counts: jnp.ndarray  # (B,) int32 — number of distinct retained hashes


def encode_batch(seqs: jnp.ndarray, moltype: str) -> jnp.ndarray:
    """Apply the moltype byte-LUT to a (..., L) uint8 batch."""
    lut = jnp.asarray(get_encoding_lut(moltype))
    return jnp.take(lut, seqs.astype(jnp.int32), axis=0)


def window_keep_mask(hashes: U64, lengths: jnp.ndarray, k: int, scaled: int) -> jnp.ndarray:
    """keep[b, i] = window i is inside sequence b AND hash ≤ max_hash."""
    W = hashes.hi.shape[-1]
    win_idx = jax.lax.broadcasted_iota(jnp.int32, hashes.hi.shape, hashes.hi.ndim - 1)
    n_windows = (lengths.astype(jnp.int32) - (k - 1))[..., None]
    in_range = win_idx < n_windows
    mh = u64_const(max_hash_for_scaled(scaled))
    return in_range & le64(hashes, U64(jnp.broadcast_to(mh.hi, hashes.hi.shape), jnp.broadcast_to(mh.lo, hashes.lo.shape)))


def window_hashes(
    seqs: jnp.ndarray,
    lengths: jnp.ndarray,
    k: int,
    scaled: int,
    moltype: str,
    seed: int = MURMUR_SEED,
):
    """Per-window hashes + keep mask (used by sketching and k-mer extraction).

    Returns ``(hashes: U64 (B, W), keep: bool (B, W))`` with W = L-k+1.
    """
    encoded = encode_batch(seqs, moltype)
    hashes = murmur64_kmer_windows(encoded, k, seed)
    keep = window_keep_mask(hashes, lengths, k, scaled)
    return hashes, keep


def _compact_valid_row(h_hi, h_lo, keep, capacity: int):
    """Gather the kept window hashes of one row into (S,) slots (no sort).

    Kept order is window order; slots ≥ n hold u64::MAX sentinels."""
    uid = jnp.cumsum(keep.astype(jnp.int32)) - 1
    n = keep.astype(jnp.int32).sum()
    idx = jnp.where(keep, uid, jnp.int32(capacity))
    big = jnp.uint32(0xFFFFFFFF)
    out_hi = jnp.full((capacity,), big).at[idx].set(h_hi, mode="drop")
    out_lo = jnp.full((capacity,), big).at[idx].set(h_lo, mode="drop")
    return out_hi, out_lo, n


def _dedup_sorted_row(s_hi, s_lo, n_valid, capacity: int):
    """Run-length dedup of one row's *sorted* hashes → mins + abundances."""
    S = s_hi.shape[0]
    idx1 = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0)[:, 0]
    valid = idx1 < n_valid
    prev_same = jnp.concatenate(
        [
            jnp.zeros((1,), bool),
            (s_hi[1:] == s_hi[:-1]) & (s_lo[1:] == s_lo[:-1]),
        ]
    )
    is_new = valid & ~prev_same
    uid = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    count = is_new.astype(jnp.int32).sum()
    drop = jnp.int32(capacity)
    new_idx = jnp.where(is_new, uid, drop)
    occ_idx = jnp.where(valid, uid, drop)
    mins_hi = jnp.zeros((capacity,), jnp.uint32).at[new_idx].set(s_hi, mode="drop")
    mins_lo = jnp.zeros((capacity,), jnp.uint32).at[new_idx].set(s_lo, mode="drop")
    abund = jnp.zeros((capacity,), jnp.int32).at[occ_idx].add(1, mode="drop")
    return mins_hi, mins_lo, abund, count


def _compact_row(h_hi, h_lo, keep, capacity: int):
    """Sort one row's kept window hashes, dedup runs, compact to (S,).

    Cost note: XLA's TPU sort is the expensive stage, so the row is
    first compacted to ``capacity`` slots (≈ W/scaled) and only then
    sorted, and the sort uses the two hash words alone — kept hashes
    can never equal the u64::MAX sentinel because max_hash < 2^64-1 for
    scaled > 1, and for scaled = 1 a colliding real hash has
    probability 2^-64 per k-mer (documented, ignored)."""
    c_hi, c_lo, n = _compact_valid_row(h_hi, h_lo, keep, capacity)
    # both operands are keys → an unstable sort is value-identical and
    # measurably cheaper (stable is lax.sort's default)
    s_hi, s_lo = jax.lax.sort((c_hi, c_lo), num_keys=2, is_stable=False)
    return _dedup_sorted_row(s_hi, s_lo, n, capacity)


@functools.partial(jax.jit, static_argnames=("k", "scaled", "moltype", "capacity"))
def sketch_batch(
    seqs: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    k: int,
    scaled: int,
    moltype: str,
    capacity: int,
) -> SketchBatch:
    """Sketch a padded batch of validated residue byte rows.

    Args:
      seqs: (B, L) uint8, already uppercased / ambiguity-resolved /
        stop-truncated (host ingest's job, see ``core.alphabet``).
      lengths: (B,) true lengths (stop codon, if any, included — the
        reference keeps the '*', aminoacid.rs:74-105).
      k: protein k-mer size (static).
      scaled: FracMinHash scaled (static).
      moltype: protein | dayhoff | hp (static).
      capacity: static per-row output slots S.
    """
    hashes, keep = window_hashes(seqs, lengths, k, scaled, moltype)
    mins_hi, mins_lo, abund, counts = jax.vmap(
        functools.partial(_compact_row, capacity=capacity)
    )(hashes.hi, hashes.lo, keep)
    return SketchBatch(mins_hi, mins_lo, abund, counts)


def _presort_compact_keys(key_hi, key_lo, n_kept, capacity: int):
    """Pack each row's surviving keys into the leading ``capacity`` slots
    before the sort — scatter-free (cumsum + binary-search gathers).

    MEASURED AND REJECTED on-chip (round 2, bench_exp_compact.py): this
    path is ~200x slower than the full-width sentinel sort (5.5M vs
    1104M kmers/s) — the per-row vmapped ``searchsorted`` lowers to
    serial gather chains on the VPU. Kept (bit-equal, tested) as a
    documented negative result; callers must leave it off.

    Rationale it tested: the 2-key sort is ~half the sketch stage on
    TPU and runs over the full window width W even though only
    ~W/scaled keys survive the scaled filter; compacting first shrinks
    the sort to the capacity width (~scaled× fewer elements). Survivor test is ``hi != 2^32-1``,
    exact for scaled > 1 (max_hash ≤ 2^63 keeps hi < 2^31; sentinels
    are u64::MAX) — callers must skip this path for scaled == 1.
    Surviving order is window order; the subsequent sort makes the
    result identical to sorting the full width (as long as
    n_kept ≤ capacity — beyond that both paths are an error that
    ``finalize_sorted_np`` raises on)."""
    B, W = key_hi.shape
    big = jnp.uint32(0xFFFFFFFF)
    csum = jnp.cumsum((key_hi != big).astype(jnp.int32), axis=-1)
    targets = jnp.arange(1, capacity + 1, dtype=csum.dtype)
    pos = jax.vmap(
        lambda row: jnp.searchsorted(
            row, targets, side="left", method="scan_unrolled"
        )
    )(csum)
    g = jnp.minimum(pos, W - 1)
    valid = jax.lax.broadcasted_iota(jnp.int32, (B, capacity), 1) < jnp.minimum(
        n_kept, capacity
    )[:, None]
    c_hi = jnp.where(valid, jnp.take_along_axis(key_hi, g, axis=1), big)
    c_lo = jnp.where(valid, jnp.take_along_axis(key_lo, g, axis=1), big)
    return c_hi, c_lo


def _sort_keys_64(key_hi, key_lo):
    """Row-sort (hi, lo) u32 pairs by their 64-bit value — fast path.

    The obvious formulation is one 2-key lexicographic ``lax.sort``; on
    the v5e that comparator is the single biggest term of the sketch
    stage. Measured on-chip (bench_exp_sort.py, corpus shapes, hp/k24/
    scaled5): stable 2-key ~1.1-1.3G kmers/s through the sort, unstable
    2-key ~1.7G, unstable SINGLE-key (hi as key, lo as payload) ~2.4G.
    So the fast path sorts by ``hi`` alone and *detects* the one case
    where that is not enough: an adjacent pair with equal hi but
    different lo. Absent such a pair, every equal-hi run is a single
    duplicate value (all-equal lo), i.e. the row is already in exact
    64-bit order with duplicates adjacent. When a tie IS present
    (P ≈ kept²/2^33 per row — ~1% of 2048-row batches at these shapes;
    also fires on a real hi of 2^32-1 colliding with the sentinel under
    scaled=1), a scalar ``lax.cond`` re-sorts the whole batch with the
    exact 2-key comparator — bit-equal output either way, and the
    double-sort cost is paid only on flagged batches.

    Stability is irrelevant throughout: equal (hi, lo) entries are
    indistinguishable duplicates (no payload beyond lo itself).
    """
    s_hi, s_lo = jax.lax.sort((key_hi, key_lo), num_keys=1, is_stable=False)
    tie = jnp.any(
        (s_hi[..., 1:] == s_hi[..., :-1]) & (s_lo[..., 1:] != s_lo[..., :-1])
    )
    return jax.lax.cond(
        tie,
        lambda: jax.lax.sort((key_hi, key_lo), num_keys=2, is_stable=False),
        lambda: (s_hi, s_lo),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "scaled", "moltype", "capacity", "use_pallas", "presort_compact",
    ),
)
def sorted_window_hashes(
    seqs: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    k: int,
    scaled: int,
    moltype: str,
    capacity: int,
    use_pallas: bool = False,
    presort_compact: bool = False,
):
    """Scatter-free device sketch stage: hash → sentinel mask → 2-key sort.

    XLA's TPU scatter runs at ~50M updates/s — an order of magnitude
    under the hash kernel — so the fast path never scatters: dropped
    windows get u64::MAX sentinel keys, one 2-operand sort per row puts
    the kept hashes (sorted, duplicates adjacent) in the leading lanes,
    and a ``first`` mask marks the first slot of each duplicate run.

    Returns ``(s_hi, s_lo, first, n_kept)`` each (B, capacity)/(B,):
      * slots j < n_kept hold the sorted kept hashes (with duplicates);
      * ``first[j]`` marks distinct values (Σ first = sketch size);
      * hosts finalize to unique mins + abundances by run length
        (``finalize_sorted_np``); device consumers (search) iterate
        only ``first`` slots.

    ``capacity`` bounds the per-row kept count; overflow is detectable
    as n_kept > capacity (counted pre-truncation).
    """
    big = jnp.uint32(0xFFFFFFFF)
    if use_pallas:
        # the fused kernel emits sentinel-masked keys + per-row counts
        # directly (no keep array in HBM)
        from .sketch_pallas import masked_window_keys_pallas

        key_hi, key_lo, n_kept = masked_window_keys_pallas(
            seqs, lengths, k=k, scaled=scaled, moltype=moltype
        )
        W = seqs.shape[-1] - k + 1
        key_hi = key_hi[:, :W]
        key_lo = key_lo[:, :W]
    else:
        hashes, keep = window_hashes(seqs, lengths, k, scaled, moltype)
        key_hi = jnp.where(keep, hashes.hi, big)
        key_lo = jnp.where(keep, hashes.lo, big)
        n_kept = keep.astype(jnp.int32).sum(axis=-1)
    W = key_hi.shape[-1]
    if presort_compact and scaled > 1 and capacity < W:
        key_hi, key_lo = _presort_compact_keys(key_hi, key_lo, n_kept, capacity)
    s_hi, s_lo = _sort_keys_64(key_hi, key_lo)
    W = s_hi.shape[-1]
    if W < capacity:  # short-sequence bucket: pad out to the full slot count
        padw = ((0, 0), (0, capacity - W))
        s_hi = jnp.pad(s_hi, padw, constant_values=big)
        s_lo = jnp.pad(s_lo, padw, constant_values=big)
    s_hi = s_hi[:, :capacity]
    s_lo = s_lo[:, :capacity]
    S = s_hi.shape[-1]
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    valid = idx < n_kept[:, None]
    prev_same = jnp.concatenate(
        [
            jnp.zeros((s_hi.shape[0], 1), bool),
            (s_hi[:, 1:] == s_hi[:, :-1]) & (s_lo[:, 1:] == s_lo[:, :-1]),
        ],
        axis=1,
    )
    first = valid & ~prev_same
    return s_hi, s_lo, first, n_kept


def finalize_sorted_np(s_hi, s_lo, first, n_kept):
    """Host finalize of ``sorted_window_hashes`` → (mins, abund) lists.

    Fully vectorized run-length dedup: one ``flatnonzero`` over the
    whole batch's ``first`` mask (row-major, so firsts stay grouped by
    row and ascending within a row); each run ends at the next first in
    the same row or the row's kept count. The returned per-row arrays
    are views into the two flat arrays — no per-row numpy calls (4x
    over the per-row loop at 2048 rows; what remains is the view
    slicing itself)."""
    s_hi = np.asarray(s_hi)
    s_lo = np.asarray(s_lo)
    first = np.asarray(first)
    n_kept = np.asarray(n_kept).astype(np.int64)
    B, S = s_hi.shape
    if n_kept.max(initial=0) > S:
        raise ValueError(
            f"sketch capacity overflow: {n_kept.max()} > {S}"
        )
    from .u64 import join_np

    h64 = join_np(s_hi, s_lo)
    flat_first = np.flatnonzero(first)
    rows = flat_first // S
    pos = flat_first - rows * S
    mins_flat = h64.reshape(-1)[flat_first]
    # run end: next first's position when it is in the same row, else
    # the row's kept count
    ends = np.empty(len(pos), np.int64)
    if len(pos):
        same_row = np.empty(len(pos), bool)
        same_row[:-1] = rows[1:] == rows[:-1]
        same_row[-1] = False
        ends[:-1] = np.where(same_row[:-1], pos[1:], n_kept[rows[:-1]])
        ends[-1] = n_kept[rows[-1]]
    ab_flat = ends - pos
    offs = np.zeros(B + 1, np.int64)
    np.cumsum(np.bincount(rows, minlength=B), out=offs[1:])
    mins_out = [mins_flat[offs[i]:offs[i + 1]] for i in range(B)]
    ab_out = [ab_flat[offs[i]:offs[i + 1]] for i in range(B)]
    return mins_out, ab_out


@functools.partial(jax.jit, static_argnames=("k", "scaled", "moltype", "capacity", "use_pallas"))
def compact_window_hashes(
    seqs: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    k: int,
    scaled: int,
    moltype: str,
    capacity: int,
    use_pallas: bool = False,
):
    """Device fast path: hash + filter + compact, **no sort**.

    Returns ``(hi, lo, counts)`` with the kept hashes of each row packed
    (in window order) into (B, S) slots. The per-row sort/unique/abund
    finalization is O(W/scaled) and is done on host by
    ``finalize_sketches_np`` — the device spends its time on the
    compute-bound murmur stage, and host transfer shrinks by ~scaled×.
    """
    if use_pallas:
        from .sketch_pallas import window_hashes_pallas

        hashes, keep = window_hashes_pallas(
            seqs, lengths, k=k, scaled=scaled, moltype=moltype
        )
        W = seqs.shape[-1] - k + 1
        hashes = U64(hashes.hi[:, :W], hashes.lo[:, :W])
        keep = keep[:, :W]
    else:
        hashes, keep = window_hashes(seqs, lengths, k, scaled, moltype)
    hi, lo, counts = jax.vmap(
        functools.partial(_compact_valid_row, capacity=capacity)
    )(hashes.hi, hashes.lo, keep)
    return hi, lo, counts


def finalize_sketches_np(hi, lo, counts):
    """Host finalize: per-row numpy sort + unique + abundance.

    Returns (list of sorted uint64 mins, list of int64 abundances)."""
    hi = np.asarray(hi)
    lo = np.asarray(lo)
    counts = np.asarray(counts)
    if counts.max(initial=0) > hi.shape[1]:
        raise ValueError(
            f"compact capacity overflow: {counts.max()} > {hi.shape[1]}"
        )
    from .u64 import join_np

    h64 = join_np(hi, lo)
    mins_out, ab_out = [], []
    for i in range(h64.shape[0]):
        uniq, cnt = np.unique(h64[i, : counts[i]], return_counts=True)
        mins_out.append(uniq)
        ab_out.append(cnt.astype(np.int64))
    return mins_out, ab_out


def sketch_capacity(max_len: int, k: int, scaled: int) -> int:
    """A safe static capacity for (max_len, k, scaled) batches.

    Expected retained fraction is 1/scaled; allow generous slack plus a
    constant floor so tiny inputs never overflow. scaled=1 keeps every
    window, so capacity must be the full window count.
    """
    w = max(max_len - k + 1, 1)
    if scaled <= 1:
        return w
    est = int(w * 3.0 / scaled) + 64
    return min(w, est)


# re-export: the implementation lives in the jax-free ops.sketch_np so
# numpy-only paths can use it without paying this module's jax import
from .sketch_np import merge_sketches_np  # noqa: E402,F401
