"""Multi-chip distribution: data-parallel sketching + sharded search.

The reference is single-node (rayon threads only, SURVEY.md §2.6); the
TPU-native scale-out plan (BASELINE.json north star) is:

* **Sketch build — data parallel**: the sequence batch axis is sharded
  across the mesh; every chip runs the fused sketch kernel on its rows.
  No communication.
* **Index sharding — the workload's "tensor parallelism"**: the target
  signature axis (T) is sharded across chips; each chip holds a slice
  of the padded (T, S) hash arrays in its HBM.
* **Search — broadcast + concat**: query sketches are all-gathered over
  ICI (queries are tiny: ~L/scaled hashes each), every chip intersects
  them against its local target shard, and the (Q, T/D) stat blocks
  concatenate — no cross-chip reduction is needed because each target
  lives on exactly one shard. Corpus-level reductions (e.g. total hash
  count, distinct-hash stats) use ``jax.lax.psum``.

Everything is expressed with ``shard_map`` over a 1-D ``Mesh`` so the
same program runs on 1 chip, an 8-device virtual CPU mesh (tests), or a
multi-host slice (``jax.distributed.initialize`` + the same mesh).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # JAX >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover — older JAX
    from jax.experimental.shard_map import shard_map

AXIS = "shards"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (AXIS,))


def pad_to_multiple(arr: np.ndarray, mult: int, axis: int = 0, fill=0) -> np.ndarray:
    pad = (-arr.shape[axis]) % mult
    if not pad:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return np.pad(arr, widths, constant_values=fill)


def shard_targets(mesh: Mesh, t_hi, t_lo, t_ab, t_counts):
    """Place padded target arrays with the T axis sharded over the mesh.

    Rows are padded to a multiple of the mesh size with empty sketches
    (count 0, u64::MAX sentinels) which can never match a query."""
    n = mesh.devices.size
    t_hi = pad_to_multiple(np.asarray(t_hi), n, fill=0xFFFFFFFF)
    t_lo = pad_to_multiple(np.asarray(t_lo), n, fill=0xFFFFFFFF)
    t_ab = pad_to_multiple(np.asarray(t_ab), n, fill=0)
    t_counts = pad_to_multiple(np.asarray(t_counts), n, fill=0)
    sh = NamedSharding(mesh, P(AXIS, None))
    sh1 = NamedSharding(mesh, P(AXIS))
    return (
        jax.device_put(t_hi, sh),
        jax.device_put(t_lo, sh),
        jax.device_put(t_ab, sh),
        jax.device_put(t_counts, sh1),
    )


def sharded_pairwise_stats(mesh: Mesh, q_hi, q_lo, q_counts, t_hi, t_lo, t_ab, t_counts):
    """(Q, T) pair stats with T sharded; queries replicated.

    Output is sharded over its T axis; callers usually pull it to host
    (it is Q×T int32 — tiny next to the index itself)."""
    from ..ops.intersect import pairwise_stats

    def local(q_hi, q_lo, q_counts, t_hi, t_lo, t_ab, t_counts):
        return pairwise_stats(q_hi, q_lo, q_counts, t_hi, t_lo, t_ab, t_counts)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, None), P(None, None), P(None), P(AXIS, None), P(AXIS, None), P(AXIS, None), P(AXIS)),
        out_specs=P(None, AXIS),
    )
    return fn(q_hi, q_lo, q_counts, t_hi, t_lo, t_ab, t_counts)


class DistPipelineOut(NamedTuple):
    intersect: jnp.ndarray  # (B_global, T_padded) int32
    weighted: jnp.ndarray
    total_retained: jnp.ndarray  # () int32 — psum over shards


def make_dist_pipeline_step(
    mesh: Mesh, *, k: int, scaled: int, moltype: str, capacity: int, use_pallas: bool = False
):
    """The full device step, sharded: sketch (dp) → all_gather queries
    (ICI) → intersect vs local target shard (index sharding).

    Returns a jitted function of
      (seqs (B, L) uint8 [B sharded], lengths (B,) [sharded],
       t_hi/t_lo/t_ab (T, S) [T sharded], t_counts (T,) [T sharded])
    """
    from ..ops.intersect import pairwise_stats
    from ..ops.sketch import sorted_window_hashes

    def local_step(seqs, lengths, t_hi, t_lo, t_ab, t_counts):
        # --- data-parallel sketch of the local sequence rows (the
        # scatter-free sentinel-sort stage) ---
        s_hi, s_lo, first, n_kept = sorted_window_hashes(
            seqs,
            lengths,
            k=k,
            scaled=scaled,
            moltype=moltype,
            capacity=capacity,
            use_pallas=use_pallas,
        )
        # duplicate slots → u64::MAX sentinels so the intersection counts
        # each distinct query hash exactly once
        big = jnp.uint32(0xFFFFFFFF)
        q_hi = jnp.where(first, s_hi, big)
        q_lo = jnp.where(first, s_lo, big)

        # --- broadcast query sketches over ICI ---
        g_hi = jax.lax.all_gather(q_hi, AXIS, tiled=True)
        g_lo = jax.lax.all_gather(q_lo, AXIS, tiled=True)
        g_n = jax.lax.all_gather(jnp.minimum(n_kept, capacity), AXIS, tiled=True)

        # --- intersect all queries against the local target shard ---
        stats = pairwise_stats(g_hi, g_lo, g_n, t_hi, t_lo, t_ab, t_counts)

        total = jax.lax.psum(first.astype(jnp.int32).sum(), AXIS)
        return stats.intersect, stats.weighted, total

    fn = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(
            P(AXIS, None),
            P(AXIS),
            P(AXIS, None),
            P(AXIS, None),
            P(AXIS, None),
            P(AXIS),
        ),
        out_specs=(P(None, AXIS), P(None, AXIS), P()),
    )
    return jax.jit(fn)


def sharded_inverted_search(mesh: Mesh, inv, q_hi, q_lo, q_valid):
    """Hash-range-sharded inverted search — the BASELINE.json north star.

    The globally sorted posting array is split into equal contiguous
    slices (= hash ranges; murmur uniformity balances them for free),
    one per chip. Queries are replicated (broadcast); every chip runs
    the inverted lookup against its slice and the per-shard (Q, T)
    count/weight matrices merge with ``jax.lax.psum`` — a target's
    postings may span shards, but each posting lives on exactly one, so
    the sum is exact (runs straddling a shard boundary are found by
    both shards' local lower bounds).
    """
    from ..ops.inverted import inverted_pair_stats_packed

    n = mesh.devices.size
    pad = (-len(inv.g_hi)) % n
    # packed (N, 4) production layout (single source of truth:
    # InvertedIndex.packed), position-sharded along the posting axis;
    # sentinel pad rows carry an out-of-range target id so the
    # scatter's mode="drop" discards them
    g4 = inv.packed()
    if pad:
        pad_row = np.array(
            [[0xFFFFFFFF, 0xFFFFFFFF, inv.n_targets, 0]], np.uint32
        )
        g4 = np.vstack([g4, np.repeat(pad_row, pad, axis=0)])
    sh = NamedSharding(mesh, P(AXIS, None))
    rep = NamedSharding(mesh, P(None, None))
    g4 = jax.device_put(g4, sh)
    q_hi = jax.device_put(np.asarray(q_hi), rep)
    q_lo = jax.device_put(np.asarray(q_lo), rep)
    q_valid = jax.device_put(np.asarray(q_valid), rep)
    local_n = g4.shape[0] // n

    def local(g4, q_hi, q_lo, q_valid):
        counts, weights = inverted_pair_stats_packed(
            g4,
            None,
            q_hi,
            q_lo,
            q_valid,
            n_targets=inv.n_targets,
            max_run=inv.max_run,
            span_steps=max(int(local_n).bit_length(), 1),
        )
        return (
            jax.lax.psum(counts, AXIS),
            jax.lax.psum(weights, AXIS),
        )

    fn = jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P(AXIS, None), P(None, None), P(None, None), P(None, None)),
            out_specs=(P(None, None), P(None, None)),
        )
    )
    return fn(g4, q_hi, q_lo, q_valid)


# (index, mesh) → (sharded device posting upload, local slice length,
# jitted shard_map program). Mirrors ops.inverted._DEVICE_CACHE: the
# production pattern is many query blocks against one loaded index, so
# re-uploading the ~0.8 GB packed array and re-creating the jit closure
# (= a fresh trace/compile) per call would dominate. Entries hold
# strong references to the host array and mesh so the ids stay valid;
# services retiring an index should call clear_sharded_sparse_cache
# (the sibling of ops.inverted.clear_device_postings) to release the
# pinned HBM. NOTE: the cache is per (index, mesh) — reuse ONE Mesh
# object across calls, or every call re-uploads the postings.
_SHARDED_SPARSE_CACHE: "OrderedDict[tuple, tuple]" = OrderedDict()
_SHARDED_SPARSE_SLOTS = 2


def clear_sharded_sparse_cache(inv=None) -> None:
    """Release cached sharded posting uploads + compiled programs.

    With ``inv`` given only that index's entries are dropped (any
    mesh); with no argument the whole cache clears."""
    if inv is None:
        _SHARDED_SPARSE_CACHE.clear()
        return
    for key in [
        k for k, v in _SHARDED_SPARSE_CACHE.items() if v[0] is inv.g_hi
    ]:
        _SHARDED_SPARSE_CACHE.pop(key, None)


def _sharded_sparse_program(mesh: Mesh, inv):
    import functools as _ft

    from ..ops.sparse_search import _sparse_hits_core

    key = (id(inv.g_hi), id(mesh))
    ent = _SHARDED_SPARSE_CACHE.get(key)
    if ent is not None and ent[0] is inv.g_hi and ent[1] is mesh:
        _SHARDED_SPARSE_CACHE.move_to_end(key)
        return ent[2]
    n = mesh.devices.size
    pad = (-len(inv.g_hi)) % n
    g4 = inv.packed()
    if pad:
        pad_row = np.array(
            [[0xFFFFFFFF, 0xFFFFFFFF, inv.n_targets, 0]], np.uint32
        )
        g4 = np.vstack([g4, np.repeat(pad_row, pad, axis=0)])
    local_n = g4.shape[0] // n
    max_run = min(inv.max_run, local_n) or 1
    g4 = jax.device_put(g4, NamedSharding(mesh, P(AXIS, None)))
    n_targets = inv.n_targets

    tmr = int(inv.max_run)  # index-wide run bound (ub-probe span)

    @_ft.partial(jax.jit, static_argnames=("cap", "e", "mr", "wide"))
    def run(g4, q_hi, q_lo, q_valid, off, cap: int, e, mr: int, wide: bool = True):
        # ``off`` is traced (one compiled program covers every run-offset
        # tile); ``mr`` is the static tile width
        def local(g4, q_hi, q_lo, q_valid, off):
            q_out, t_out, counts, weights, stats = _sparse_hits_core(
                g4,
                None,
                q_hi,
                q_lo,
                q_valid,
                n_targets=n_targets,
                max_run=mr,
                capacity=cap,
                span_steps=max(int(local_n).bit_length(), 1),
                bucket_shift=0,
                run_offset=off,
                expand_e=e,
                wide_weights=wide,
                true_max_run=tmr,
            )
            return (
                q_out[None],
                t_out[None],
                counts[None],
                weights[None],
                stats[None],
            )

        return shard_map(
            local,
            mesh=mesh,
            in_specs=(
                P(AXIS, None),
                P(None, None),
                P(None, None),
                P(None, None),
                P(),
            ),
            out_specs=(P(AXIS, None),) * 5,
        )(g4, q_hi, q_lo, q_valid, off)

    entry = (g4, local_n, run)
    _SHARDED_SPARSE_CACHE[key] = (inv.g_hi, mesh, entry)
    while len(_SHARDED_SPARSE_CACHE) > _SHARDED_SPARSE_SLOTS:
        _SHARDED_SPARSE_CACHE.popitem(last=False)
    return entry


def sharded_sparse_search(
    mesh: Mesh,
    inv,
    q_hi,
    q_lo,
    q_valid,
    capacity: int | None = None,
    expand_e: int | None = None,
    run_chunk: int | None = None,
):
    """Hash-range-sharded SPARSE hit-list search: million-target indexes
    across chips without a dense (Q, T) matrix anywhere.

    Same position-sharded posting layout as ``sharded_inverted_search``
    (contiguous slices of the packed (N, 4) array; sentinel pad rows
    carry target id ``n_targets``), but every chip emits its own bounded
    sparse (q, t, count, weight) hit list from its local slice via the
    shared sort-segment kernel (``ops.sparse_search._sparse_hits_core``
    in full-bisect mode — local slices have no bucket table). A (q, t)
    pair whose shared hashes span several hash ranges surfaces on each
    of those shards, so the per-shard lists merge ADDITIVELY on host
    (``_merge_partial_hits`` — the same merge as run-offset tiling).

    ``expand_e`` selects the compact exact-run-length expansion (see
    the kernel docstring); the per-shard match totals come back in the
    stats row, and an undersized budget triggers one exact retry.
    Returns a host ``SparseHits`` (t ascending per q, true pair count).

    Long posting runs are probed in ``_RUN_TILE``-wide offset windows
    (the window offset is a traced scalar — one compiled program covers
    every tile) and the per-(shard, tile) partial lists merge
    additively, exactly like the unsharded engine's run-offset tiling:
    kernel memory stays O(Q·S·_RUN_TILE) per chip even when one hash
    range holds a heavy-hitter hash present in most of the corpus.
    """
    from ..ops.sparse_search import (
        _RUN_TILE,
        SparseHits,
        _merge_partial_hits,
        _pow2,
        _weights_int64,
        _wide_weights_needed,
    )

    n = mesh.devices.size
    Q, S = np.asarray(q_hi).shape
    cap_arg = capacity  # caller's output bound (merged-list trim)
    if inv.n_postings == 0:
        z = np.zeros(0, np.int32)
        return SparseHits(z, z, z, z.astype(np.int64), 0)
    g4, local_n, run = _sharded_sparse_program(mesh, inv)
    max_run = min(inv.max_run, local_n) or 1
    tile = min(max_run, run_chunk if run_chunk is not None else _RUN_TILE)
    tile = max(1, min(tile, (2**31 - 1) // max(Q * S, 1)))
    if capacity is None:
        capacity = min(Q * S * tile, 2 * 1024 * 1024)
    capacity = max(((capacity + 127) // 128) * 128, 128)

    rep = NamedSharding(mesh, P(None, None))
    q_hi = jax.device_put(np.asarray(q_hi), rep)
    q_lo = jax.device_put(np.asarray(q_lo), rep)
    q_valid = jax.device_put(np.asarray(q_valid), rep)

    if expand_e is not None:
        expand_e = max(128, min(_pow2(expand_e), _pow2(Q * S * tile)))
    wide = _wide_weights_needed(inv, int(S))

    def run_tile(off: int, cap: int, e):
        """One offset window across every shard, with the same
        budget/capacity retries as the unsharded engine."""
        q_out, t_out, counts, weights, stats = run(
            g4, q_hi, q_lo, q_valid, jnp.int32(off), cap=cap, e=e, mr=tile, wide=wide
        )
        nm = np.asarray(stats)  # (n, 2)
        if e is not None and int(nm[:, 1].max()) > e:
            e = max(128, min(_pow2(int(nm[:, 1].max())), _pow2(Q * S * tile)))
            q_out, t_out, counts, weights, stats = run(
                g4, q_hi, q_lo, q_valid, jnp.int32(off), cap=cap, e=e, mr=tile, wide=wide
            )
            nm = np.asarray(stats)
        if int(nm[:, 0].max()) > cap:
            # rare per-shard overflow: one exact-capacity retry
            cap = ((int(nm[:, 0].max()) + 127) // 128) * 128
            q_out, t_out, counts, weights, stats = run(
                g4, q_hi, q_lo, q_valid, jnp.int32(off), cap=cap, e=e, mr=tile, wide=wide
            )
            nm = np.asarray(stats)
        qa, ta, ca, wa = (
            np.asarray(v) for v in (q_out, t_out, counts, weights)
        )
        parts = []
        for c in range(n):
            h = min(int(nm[c, 0]), cap)
            qs, ts, cs, ws = qa[c, :h], ta[c, :h], ca[c, :h], wa[c, :h]
            # drop sentinel-pad-row hits (t == n_targets): a pad row
            # matches only a query hash of u64::MAX, impossible under
            # scaled > 1 but filtered for exactness
            real = ts < inv.n_targets
            parts.append(
                SparseHits(
                    qs[real], ts[real], cs[real],
                    _weights_int64(ws[real], wide),
                    int(real.sum()),
                )
            )
        return parts

    parts = []
    for off in range(0, max_run, tile):
        parts.extend(run_tile(off, int(capacity), expand_e))
    # an explicit caller capacity also trims the MERGED list (n_hits
    # keeps the true unique-pair count) — same contract as the
    # unsharded engine's run-offset tiling
    return _merge_partial_hits(parts, cap_arg)


def distributed_manysearch_stats(query_index, target_index, mesh: Mesh | None = None):
    """Sharded version of the manysearch device stage.

    Returns host numpy (intersect, weighted) matching
    ``core.search._device_pair_stats`` — target padding rows are
    stripped before returning."""
    from ..ops.intersect import pairwise_stats

    mesh = mesh or make_mesh()
    q_hi, q_lo, _q_ab, q_counts = query_index.dense_device_arrays()
    th, tl, ta, tc = target_index.dense_device_arrays()
    T = len(target_index)
    t_hi, t_lo, t_ab, t_counts = shard_targets(mesh, th, tl, ta, tc)

    def local(q_hi, q_lo, q_counts, t_hi, t_lo, t_ab, t_counts):
        s = pairwise_stats(q_hi, q_lo, q_counts, t_hi, t_lo, t_ab, t_counts)
        return s.intersect, s.weighted

    fn = jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(
                P(None, None),
                P(None, None),
                P(None),
                P(AXIS, None),
                P(AXIS, None),
                P(AXIS, None),
                P(AXIS),
            ),
            out_specs=(P(None, AXIS),) * 2,
        )
    )
    n, w = fn(q_hi, q_lo, q_counts, t_hi, t_lo, t_ab, t_counts)
    return np.asarray(n)[:, :T], np.asarray(w)[:, :T]
