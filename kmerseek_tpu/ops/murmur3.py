"""Vectorized MurmurHash3 x64_128 (first 64 bits) for k-mer windows.

This is the hash at the heart of every kmerseek sketch: sourmash declares
``"hash_function": "0.murmur64"`` with seed 42, which is MurmurHash3
x64_128 over the (possibly alphabet-reduced) k-mer bytes, keeping the
first 64-bit lane. Golden u64 test vectors live in the reference at
/root/reference/src/rust/index.rs:1084-1103 (protein), 1187-1205
(dayhoff), 1309-1326 (hp) and are enforced by this repo's tests.

Two implementations:

* ``murmur64_kmer_windows`` — batched, shape-static JAX over all k-mer
  windows of a byte batch ``(B, L)``; each of the ``W = L-k+1`` windows
  is hashed independently with only elementwise uint32 VPU ops (the
  64-bit state is a (hi, lo) uint32 pair, see ``ops.u64``). The k-byte
  window is assembled from k shifted views of the row, so no gather and
  no k-times-blowup materialization is needed; XLA fuses the chain.
* ``murmur64_bytes_py`` — exact scalar Python reference used for host
  oracles and tests.

No torch, no host callbacks; runs under jit on CPU and TPU and inside
Pallas kernels (all ops are Mosaic-supported elementwise uint32).
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp

from .u64 import U64, add64, mul64, mul64x5, rotl64, shr64, u64_const, xor64

_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F
MURMUR_SEED = 42  # sourmash seed, /root/reference/src/rust/signature.rs:12


def _fmix64(k: U64) -> U64:
    k = xor64(k, shr64(k, 33))
    k = mul64(k, u64_const(0xFF51AFD7ED558CCD))
    k = xor64(k, shr64(k, 33))
    k = mul64(k, u64_const(0xC4CEB9FE1A85EC53))
    k = xor64(k, shr64(k, 33))
    return k


def _word_from_bytes(byte_views: Sequence[jnp.ndarray], start: int, nbytes: int) -> U64:
    """Little-endian u64 word from up to 8 single-byte (uint32) views."""
    lo = jnp.zeros_like(byte_views[0])
    hi = jnp.zeros_like(byte_views[0])
    for j in range(min(nbytes, 4)):
        lo = lo | (byte_views[start + j] << (8 * j))
    for j in range(4, min(nbytes, 8)):
        hi = hi | (byte_views[start + j] << (8 * (j - 4)))
    return U64(hi, lo)


def murmur64_windows_from_views(byte_views: List[jnp.ndarray], k: int, seed: int = MURMUR_SEED) -> U64:
    """Hash k-byte windows given k aligned byte views.

    ``byte_views[j]`` must be the uint32 tensor of byte ``j`` of every
    window (all views share one shape). Returns the first 64-bit lane of
    MurmurHash3 x64_128 as a (hi, lo) uint32 pair of the same shape.
    """
    assert len(byte_views) == k
    shape = byte_views[0].shape
    c1 = u64_const(_C1)
    c2 = u64_const(_C2)

    h1 = U64(jnp.zeros(shape, jnp.uint32), jnp.full(shape, seed, jnp.uint32))
    h2 = U64(jnp.zeros(shape, jnp.uint32), jnp.full(shape, seed, jnp.uint32))

    nblocks = k // 16
    for b in range(nblocks):
        k1 = _word_from_bytes(byte_views, b * 16, 8)
        k2 = _word_from_bytes(byte_views, b * 16 + 8, 8)

        k1 = mul64(k1, c1)
        k1 = rotl64(k1, 31)
        k1 = mul64(k1, c2)
        h1 = xor64(h1, k1)
        h1 = rotl64(h1, 27)
        h1 = add64(h1, h2)
        h1 = add64(mul64x5(h1), u64_const(0x52DCE729))

        k2 = mul64(k2, c2)
        k2 = rotl64(k2, 33)
        k2 = mul64(k2, c1)
        h2 = xor64(h2, k2)
        h2 = rotl64(h2, 31)
        h2 = add64(h2, h1)
        h2 = add64(mul64x5(h2), u64_const(0x38495AB5))

    tail_len = k % 16
    tail_start = nblocks * 16
    if tail_len > 8:
        k2 = _word_from_bytes(byte_views, tail_start + 8, tail_len - 8)
        k2 = mul64(k2, c2)
        k2 = rotl64(k2, 33)
        k2 = mul64(k2, c1)
        h2 = xor64(h2, k2)
    if tail_len > 0:
        k1 = _word_from_bytes(byte_views, tail_start, min(tail_len, 8))
        k1 = mul64(k1, c1)
        k1 = rotl64(k1, 31)
        k1 = mul64(k1, c2)
        h1 = xor64(h1, k1)

    length = u64_const(k)
    h1 = xor64(h1, length)
    h2 = xor64(h2, length)
    h1 = add64(h1, h2)
    h2 = add64(h2, h1)
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = add64(h1, h2)
    # full x64_128 also computes h2 += h1; only h1 (first lane) is kept.
    return h1


def murmur64_windows_from_u32views(
    u32_views: Sequence[jnp.ndarray], k: int, seed: int = MURMUR_SEED
) -> U64:
    """Hash k-byte windows given packed little-endian uint32 word views.

    ``u32_views[m]`` holds bytes [4m, 4m+4) of every window as one LE
    uint32 (the final view may carry garbage in bytes past k — it is
    masked here). Packing words once and shifting them is ~50 ops/window
    cheaper than assembling 3 u64 words from 24 single-byte views.
    """
    n_words = (k + 3) // 4
    assert len(u32_views) == n_words
    rem = k % 4
    views = list(u32_views)
    if rem:
        views[-1] = views[-1] & jnp.uint32((1 << (8 * rem)) - 1)

    def word(widx: int) -> U64:
        """u64 word at byte offset 8*widx (zero-extended past k)."""
        lo = views[2 * widx] if 2 * widx < n_words else None
        hi = views[2 * widx + 1] if 2 * widx + 1 < n_words else None
        assert lo is not None
        if hi is None:
            hi = jnp.zeros_like(lo)
        return U64(hi, lo)

    shape = views[0].shape
    c1 = u64_const(_C1)
    c2 = u64_const(_C2)
    h1 = U64(jnp.zeros(shape, jnp.uint32), jnp.full(shape, seed, jnp.uint32))
    h2 = U64(jnp.zeros(shape, jnp.uint32), jnp.full(shape, seed, jnp.uint32))

    nblocks = k // 16
    for b in range(nblocks):
        k1 = word(2 * b)
        k2 = word(2 * b + 1)
        k1 = mul64(k1, c1)
        k1 = rotl64(k1, 31)
        k1 = mul64(k1, c2)
        h1 = xor64(h1, k1)
        h1 = rotl64(h1, 27)
        h1 = add64(h1, h2)
        h1 = add64(mul64x5(h1), u64_const(0x52DCE729))
        k2 = mul64(k2, c2)
        k2 = rotl64(k2, 33)
        k2 = mul64(k2, c1)
        h2 = xor64(h2, k2)
        h2 = rotl64(h2, 31)
        h2 = add64(h2, h1)
        h2 = add64(mul64x5(h2), u64_const(0x38495AB5))

    tail_len = k % 16
    if tail_len > 8:
        k2 = word(2 * nblocks + 1)
        k2 = mul64(k2, c2)
        k2 = rotl64(k2, 33)
        k2 = mul64(k2, c1)
        h2 = xor64(h2, k2)
    if tail_len > 0:
        # word() zero-extends past k (absent views are zero, the last
        # real view is byte-masked above), matching the scalar tail
        k1 = word(2 * nblocks)
        k1 = mul64(k1, c1)
        k1 = rotl64(k1, 31)
        k1 = mul64(k1, c2)
        h1 = xor64(h1, k1)

    length = u64_const(k)
    h1 = xor64(h1, length)
    h2 = xor64(h2, length)
    h1 = add64(h1, h2)
    h2 = add64(h2, h1)
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = add64(h1, h2)
    return h1


def murmur64_kmer_windows(encoded: jnp.ndarray, k: int, seed: int = MURMUR_SEED) -> U64:
    """Hash every length-k window of each row of a byte batch.

    Args:
      encoded: ``(..., L)`` uint8/uint32 tensor of already-encoded bytes.
      k: static window length in bytes (1..100 per kmerseek's KmerSize).

    Returns:
      (hi, lo) uint32 pair of shape ``(..., L - k + 1)``. The caller masks
      windows that fall past each row's true length.
    """
    L = encoded.shape[-1]
    W = L - k + 1
    assert W >= 1, f"padded length {L} shorter than k={k}"
    e32 = encoded.astype(jnp.uint32)
    # packed LE u32 per position (zero-padded past the row end), shifted
    # views per 4-byte word — ~50 fewer ops/window than byte assembly
    pad = [(0, 0)] * (e32.ndim - 1) + [(0, 3)]
    ep = jnp.pad(e32, pad)
    p4 = (
        ep[..., :L]
        | (ep[..., 1 : L + 1] << 8)
        | (ep[..., 2 : L + 2] << 16)
        | (ep[..., 3 : L + 3] << 24)
    )
    n_words = (k + 3) // 4
    u32_views = [p4[..., 4 * m : 4 * m + W] for m in range(n_words)]
    return murmur64_windows_from_u32views(u32_views, k, seed)


# ---------------------------------------------------------------------------
# Host-side scalar reference (oracle)
# ---------------------------------------------------------------------------

_M64 = (1 << 64) - 1


def _rotl_py(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix_py(x: int) -> int:
    x ^= x >> 33
    x = (x * 0xFF51AFD7ED558CCD) & _M64
    x ^= x >> 33
    x = (x * 0xC4CEB9FE1A85EC53) & _M64
    x ^= x >> 33
    return x


def murmur64_bytes_py(data: bytes, seed: int = MURMUR_SEED) -> int:
    """Scalar MurmurHash3 x64_128 first lane — host oracle."""
    h1 = h2 = seed & _M64
    n = len(data)
    nblocks = n // 16
    for i in range(nblocks):
        k1 = int.from_bytes(data[i * 16 : i * 16 + 8], "little")
        k2 = int.from_bytes(data[i * 16 + 8 : i * 16 + 16], "little")
        k1 = (k1 * _C1) & _M64
        k1 = _rotl_py(k1, 31)
        k1 = (k1 * _C2) & _M64
        h1 ^= k1
        h1 = _rotl_py(h1, 27)
        h1 = (h1 + h2) & _M64
        h1 = (h1 * 5 + 0x52DCE729) & _M64
        k2 = (k2 * _C2) & _M64
        k2 = _rotl_py(k2, 33)
        k2 = (k2 * _C1) & _M64
        h2 ^= k2
        h2 = _rotl_py(h2, 31)
        h2 = (h2 + h1) & _M64
        h2 = (h2 * 5 + 0x38495AB5) & _M64
    tail = data[nblocks * 16 :]
    k1 = k2 = 0
    tl = len(tail)
    if tl > 8:
        for i in range(tl - 1, 7, -1):
            k2 ^= tail[i] << ((i - 8) * 8)
        k2 = (k2 * _C2) & _M64
        k2 = _rotl_py(k2, 33)
        k2 = (k2 * _C1) & _M64
        h2 ^= k2
    if tl > 0:
        for i in range(min(tl, 8) - 1, -1, -1):
            k1 ^= tail[i] << (i * 8)
        k1 = (k1 * _C1) & _M64
        k1 = _rotl_py(k1, 31)
        k1 = (k1 * _C2) & _M64
        h1 ^= k1
    h1 ^= n
    h2 ^= n
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    h1 = _fmix_py(h1)
    h2 = _fmix_py(h2)
    h1 = (h1 + h2) & _M64
    return h1
