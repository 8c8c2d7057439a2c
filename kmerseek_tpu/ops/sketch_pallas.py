"""Fused Pallas TPU kernel: encode + murmur64 + scaled filter in VMEM.

The reference's hot loop (sourmash ``add_protein`` + ``process_kmers``,
/root/reference/src/rust/index.rs:749-786) walks each sequence twice per
protein on a CPU core. Here one kernel invocation processes a whole
block of sequences in VMEM with zero HBM round-trips between stages:

  (TB, L) uint8 residues → byte LUT (VPU select chain over 32 classes)
  → k rolled views → murmur3 x64_128 first lane (uint32-pair math from
  ``ops.murmur3`` — the *same* traced code as the XLA path, so
  bit-exactness is inherited) → keep = in-window ∧ hash ≤ max_hash.

Outputs per window: (hi, lo) uint32 + int8 keep mask. Sort/dedup stays
in XLA (``ops.sketch``) — it's O(W log W) VPU work that XLA already
schedules well; the murmur arithmetic is ~100 uint32 ops per window and
is the roofline term.

Grid: one program per row-block; rolled views keep every tensor at the
full (TB, L) lane-aligned shape (window j past the row end wraps
garbage, masked by the keep test). VMEM per program ≈ (k + 8) · TB · L
· 4 bytes — the launcher clamps TB to fit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .encoding import get_encoding_lut, max_hash_for_scaled
from .murmur3 import MURMUR_SEED
from .u64 import U64

# default VMEM budget (headroom under ~16 MB/core) lives in
# utils.config.PerformanceConfig.vmem_budget_bytes — _pick_block_rows
# reads the process-wide config


def _encode_in_kernel(e32: jnp.ndarray, lut) -> jnp.ndarray:
    """Apply the 256-byte LUT as a select chain over its distinct values.

    The moltype LUTs have ≤ 27 distinct outputs over valid inputs
    (protein is identity and skips this path), so a compare/select chain
    beats a gather on the VPU.
    """
    import numpy as np

    lut_np = np.asarray(lut)
    if (lut_np == np.arange(256)).all():
        return e32
    # Post-validation inputs are uppercase residues + '*'; anything not
    # explicitly mapped encodes to 'x' (sourmash's default), so the
    # chain only needs the bytes whose LUT value differs from 'x' —
    # 20 selects for hp/dayhoff instead of a 256-entry gather.
    out = jnp.full(e32.shape, ord("x"), jnp.uint32)
    for byte in range(ord("A"), ord("Z") + 1):
        val = int(lut_np[byte])
        if val != ord("x"):
            out = jnp.where(e32 == jnp.uint32(byte), jnp.uint32(val), out)
    return out


def _sketch_kernel(seq_ref, len_ref, hi_ref, lo_ref, keep_ref, *, k, lut, mh_hi, mh_lo, seed):
    from .murmur3 import murmur64_windows_from_u32views

    e32 = seq_ref[:].astype(jnp.uint32)
    enc = _encode_in_kernel(e32, lut)
    L_dim = enc.shape[1]

    # left-rotate by j == right-rotate by L-j (pltpu.roll needs shift >= 0)
    def rot(x, j):
        return pltpu.roll(x, (L_dim - j) % L_dim, 1) if j % L_dim else x

    # packed LE u32 per position (wrap garbage masked by the keep test /
    # the partial-word byte mask), then one roll per 4-byte word
    p4 = enc | (rot(enc, 1) << 8) | (rot(enc, 2) << 16) | (rot(enc, 3) << 24)
    n_words = (k + 3) // 4
    u32_views = [rot(p4, 4 * m) for m in range(n_words)]
    h = murmur64_windows_from_u32views(u32_views, k, seed)

    TB, L = e32.shape
    win_idx = jax.lax.broadcasted_iota(jnp.int32, (TB, L), 1)
    n_windows = len_ref[:].astype(jnp.int32) - (k - 1)
    in_range = win_idx < n_windows
    below = (h.hi < jnp.uint32(mh_hi)) | (
        (h.hi == jnp.uint32(mh_hi)) & (h.lo <= jnp.uint32(mh_lo))
    )
    keep = in_range & below

    hi_ref[:] = h.hi
    lo_ref[:] = h.lo
    keep_ref[:] = keep.astype(jnp.int8)


def _masked_sketch_kernel(
    seq_ref, len_ref, key_hi_ref, key_lo_ref, cnt_ref, *, k, lut, mh_hi, mh_lo, seed
):
    """Variant used by the production sketch stage: emits sentinel-masked
    sort keys (dropped windows → u64::MAX) and per-row kept counts
    directly, so the downstream stage is just slice + sort + run mask —
    no keep array ever touches HBM."""
    from .murmur3 import murmur64_windows_from_u32views

    e32 = seq_ref[:].astype(jnp.uint32)
    enc = _encode_in_kernel(e32, lut)
    L_dim = enc.shape[1]

    def rot(x, j):
        return pltpu.roll(x, (L_dim - j) % L_dim, 1) if j % L_dim else x

    p4 = enc | (rot(enc, 1) << 8) | (rot(enc, 2) << 16) | (rot(enc, 3) << 24)
    n_words = (k + 3) // 4
    u32_views = [rot(p4, 4 * m) for m in range(n_words)]
    h = murmur64_windows_from_u32views(u32_views, k, seed)

    TB, L = e32.shape
    win_idx = jax.lax.broadcasted_iota(jnp.int32, (TB, L), 1)
    n_windows = len_ref[:].astype(jnp.int32) - (k - 1)
    in_range = win_idx < n_windows
    below = (h.hi < jnp.uint32(mh_hi)) | (
        (h.hi == jnp.uint32(mh_hi)) & (h.lo <= jnp.uint32(mh_lo))
    )
    keep = in_range & below
    big = jnp.uint32(0xFFFFFFFF)
    key_hi_ref[:] = jnp.where(keep, h.hi, big)
    key_lo_ref[:] = jnp.where(keep, h.lo, big)
    cnt_ref[:] = keep.astype(jnp.int32).sum(axis=1, keepdims=True)


@functools.partial(
    jax.jit, static_argnames=("k", "scaled", "moltype", "seed", "interpret")
)
def masked_window_keys_pallas(
    seqs: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    k: int,
    scaled: int,
    moltype: str,
    seed: int = MURMUR_SEED,
    interpret: bool = False,
):
    """Fused kernel → (sentinel-masked key_hi/key_lo (B, L), n_kept (B,))."""
    B, L = seqs.shape
    TB = _pick_block_rows(B, L, k)
    pad_B = (-B) % TB
    if pad_B:
        seqs = jnp.pad(seqs, ((0, pad_B), (0, 0)))
        lengths = jnp.pad(lengths, (0, pad_B))
    Bp = B + pad_B

    mh = max_hash_for_scaled(scaled)
    kernel = functools.partial(
        _masked_sketch_kernel,
        k=k,
        lut=get_encoding_lut(moltype),
        mh_hi=(mh >> 32) & 0xFFFFFFFF,
        mh_lo=mh & 0xFFFFFFFF,
        seed=seed,
    )
    key_hi, key_lo, cnt = pl.pallas_call(
        kernel,
        grid=(Bp // TB,),
        in_specs=[
            pl.BlockSpec((TB, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TB, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, L), jnp.uint32),
            jax.ShapeDtypeStruct((Bp, L), jnp.uint32),
            jax.ShapeDtypeStruct((Bp, 1), jnp.int32),
        ],
        interpret=interpret,
    )(seqs, lengths.reshape(-1, 1).astype(jnp.int32))
    return key_hi[:B], key_lo[:B], cnt[:B, 0]


def _pick_block_rows(B: int, L: int, k: int, budget: int | None = None) -> int:
    if budget is None:
        from ..utils.config import get_default_performance_config

        budget = get_default_performance_config().vmem_budget_bytes
    per_row = (k + 10) * L * 4
    tb = max(budget // per_row, 1)
    tb = min(tb, B, 256)
    # favor sublane-aligned blocks
    for cand in (256, 128, 64, 32, 16, 8, 4, 2, 1):
        if cand <= tb:
            return cand
    return 1


@functools.partial(
    jax.jit, static_argnames=("k", "scaled", "moltype", "seed", "interpret")
)
def window_hashes_pallas(
    seqs: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    k: int,
    scaled: int,
    moltype: str,
    seed: int = MURMUR_SEED,
    interpret: bool = False,
):
    """Pallas twin of ``ops.sketch.window_hashes`` (same outputs).

    Returns (U64 hashes (B, L), keep mask (B, L) bool); window slots at
    index ≥ L-k+1 are always masked off.
    """
    B, L = seqs.shape
    TB = _pick_block_rows(B, L, k)
    pad_B = (-B) % TB
    if pad_B:
        seqs = jnp.pad(seqs, ((0, pad_B), (0, 0)))
        lengths = jnp.pad(lengths, (0, pad_B))
    Bp = B + pad_B

    mh = max_hash_for_scaled(scaled)
    kernel = functools.partial(
        _sketch_kernel,
        k=k,
        lut=get_encoding_lut(moltype),
        mh_hi=(mh >> 32) & 0xFFFFFFFF,
        mh_lo=mh & 0xFFFFFFFF,
        seed=seed,
    )
    grid = (Bp // TB,)
    hi, lo, keep = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TB, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, L), jnp.uint32),
            jax.ShapeDtypeStruct((Bp, L), jnp.uint32),
            jax.ShapeDtypeStruct((Bp, L), jnp.int8),
        ],
        interpret=interpret,
    )(seqs, lengths.reshape(-1, 1).astype(jnp.int32))
    return U64(hi[:B], lo[:B]), keep[:B].astype(bool)


@functools.partial(
    jax.jit,
    static_argnames=("k", "scaled", "moltype", "capacity", "interpret", "bitonic"),
)
def sketch_batch_pallas(
    seqs: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    k: int,
    scaled: int,
    moltype: str,
    capacity: int,
    interpret: bool = False,
    bitonic: bool = False,
):
    """Full sketch pipeline with the Pallas hash kernel + XLA compaction.

    Drop-in replacement for ``ops.sketch.sketch_batch`` (same SketchBatch
    result, bit-identical values). With ``bitonic=True`` the per-row
    sort runs as the in-VMEM bitonic kernel (``ops.sort_pallas``)
    instead of XLA's sort; requires power-of-two ``capacity``."""
    from .sketch import SketchBatch, _compact_row, _compact_valid_row, _dedup_sorted_row

    hashes, keep = window_hashes_pallas(
        seqs, lengths, k=k, scaled=scaled, moltype=moltype, interpret=interpret
    )
    W = seqs.shape[1] - k + 1
    if bitonic:
        from .sort_pallas import bitonic_sort_rows

        c_hi, c_lo, n = jax.vmap(
            functools.partial(_compact_valid_row, capacity=capacity)
        )(hashes.hi[:, :W], hashes.lo[:, :W], keep[:, :W])
        s_hi, s_lo = bitonic_sort_rows(c_hi, c_lo, interpret=interpret)
        mins_hi, mins_lo, abund, counts = jax.vmap(
            functools.partial(_dedup_sorted_row, capacity=capacity)
        )(s_hi, s_lo, n)
    else:
        mins_hi, mins_lo, abund, counts = jax.vmap(
            functools.partial(_compact_row, capacity=capacity)
        )(hashes.hi[:, :W], hashes.lo[:, :W], keep[:, :W])
    return SketchBatch(mins_hi, mins_lo, abund, counts)
