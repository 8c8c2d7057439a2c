"""64-bit unsigned integer arithmetic on TPU, built from uint32 pairs.

TPU has no native 64-bit integer datatype (and Pallas/Mosaic rejects i64),
so every u64 value is carried as a pair of ``uint32`` arrays ``(hi, lo)``.
All helpers here are shape-polymorphic, elementwise, and usable both in
plain jitted JAX and inside Pallas TPU kernels.

The operation set is exactly what MurmurHash3 x64_128 needs (see
``kmerseek_tpu.ops.murmur3``): wrapping multiply, wrapping add, xor,
rotate-left by a constant, logical shift right, and unsigned compare.

Reference behavior being reproduced (not ported): sourmash's
``_hash_murmur`` as used by kmerseek's sketch path
(/root/reference/src/rust/index.rs:766, signature.rs:124-131).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple


class _LazyJnp:
    """``jax.numpy`` placeholder, resolved on first attribute access.

    Importing this module must not import jax: the pure-numpy helpers
    (``split_np``/``join_np``) are used by jax-free paths — notably the
    CLI's native small-corpus sketcher, whose whole point is skipping
    the ~2.4 s jax import + compiles for tiny inputs. The first device
    helper touched swaps the real module into the globals, so every
    later reference pays zero indirection."""

    def __getattr__(self, name):
        import jax.numpy as real

        globals()["jnp"] = real
        return getattr(real, name)


jnp = _LazyJnp()

U32_MASK = 0xFFFFFFFF


class U64(NamedTuple):
    """A u64 tensor as two uint32 tensors (hi<<32 | lo)."""

    hi: jnp.ndarray
    lo: jnp.ndarray


def u64_const(value: int, dtype=None) -> U64:
    """Broadcastable scalar constant."""
    if dtype is None:
        dtype = jnp.uint32
    value &= (1 << 64) - 1
    return U64(
        jnp.asarray((value >> 32) & U32_MASK, dtype=dtype),
        jnp.asarray(value & U32_MASK, dtype=dtype),
    )


def u64_full(shape, value: int) -> U64:
    value &= (1 << 64) - 1
    return U64(
        jnp.full(shape, (value >> 32) & U32_MASK, dtype=jnp.uint32),
        jnp.full(shape, value & U32_MASK, dtype=jnp.uint32),
    )


def mulhi32(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """High 32 bits of the 64-bit product of two uint32 tensors.

    Splits each operand into 16-bit halves so every partial product and
    carry fits in uint32 (max partial ``(2^16-1)^2 < 2^32``).
    """
    a = a.astype(jnp.uint32)
    b = b.astype(jnp.uint32)
    al = a & jnp.uint32(0xFFFF)
    ah = a >> 16
    bl = b & jnp.uint32(0xFFFF)
    bh = b >> 16
    albl = al * bl
    albh = al * bh
    ahbl = ah * bl
    ahbh = ah * bh
    # carry out of bits [16,32) of the full product
    carry = ((albl >> 16) + (albh & jnp.uint32(0xFFFF)) + (ahbl & jnp.uint32(0xFFFF))) >> 16
    return ahbh + (albh >> 16) + (ahbl >> 16) + carry


def mul64(a: U64, b: U64) -> U64:
    """Wrapping u64 multiply (mod 2^64)."""
    lo = a.lo * b.lo  # uint32 wrap == low 32 bits
    hi = mulhi32(a.lo, b.lo) + a.lo * b.hi + a.hi * b.lo
    return U64(hi, lo)


def shl64(a: U64, r: int) -> U64:
    """Logical shift left by a static amount ``0 < r < 64``."""
    r = int(r)
    assert 0 < r < 64
    if r == 32:
        return U64(a.lo, jnp.zeros_like(a.lo))
    if r < 32:
        hi = (a.hi << r) | (a.lo >> (32 - r))
        return U64(hi, a.lo << r)
    return U64(a.lo << (r - 32), jnp.zeros_like(a.lo))


def mul64x5(a: U64) -> U64:
    """Wrapping ``a * 5`` as ``a + (a << 2)`` — cheaper than ``mul64``.

    The murmur3 x64_128 mixing step multiplies the running state by 5
    twice per 16-byte block (``h = h*5 + const``). A generic ``mul64``
    by the constant 5 still costs ~3 uint32 multiplies after XLA folds
    the zero-high-word terms; shift-add needs no multiplies at all
    (3 shifts + 1 or + one add64), which is never worse on the VPU.
    """
    return add64(a, shl64(a, 2))


def add64(a: U64, b: U64) -> U64:
    """Wrapping u64 add (mod 2^64)."""
    lo = a.lo + b.lo
    carry = (lo < a.lo).astype(jnp.uint32)
    return U64(a.hi + b.hi + carry, lo)


def xor64(a: U64, b: U64) -> U64:
    return U64(a.hi ^ b.hi, a.lo ^ b.lo)


def rotl64(a: U64, r: int) -> U64:
    """Rotate left by a static amount ``0 < r < 64``."""
    r = int(r)
    assert 0 < r < 64
    if r == 32:
        return U64(a.lo, a.hi)
    if r < 32:
        hi = (a.hi << r) | (a.lo >> (32 - r))
        lo = (a.lo << r) | (a.hi >> (32 - r))
        return U64(hi, lo)
    s = r - 32  # rotate by 32 (swap) then by s
    hi = (a.lo << s) | (a.hi >> (32 - s))
    lo = (a.hi << s) | (a.lo >> (32 - s))
    return U64(hi, lo)


def shr64(a: U64, r: int) -> U64:
    """Logical shift right by a static amount ``0 < r < 64``."""
    r = int(r)
    assert 0 < r < 64
    if r == 32:
        return U64(jnp.zeros_like(a.hi), a.hi)
    if r < 32:
        lo = (a.lo >> r) | (a.hi << (32 - r))
        hi = a.hi >> r
        return U64(hi, lo)
    return U64(jnp.zeros_like(a.hi), a.hi >> (r - 32))


def le64(a: U64, b: U64) -> jnp.ndarray:
    """Unsigned a <= b."""
    return (a.hi < b.hi) | ((a.hi == b.hi) & (a.lo <= b.lo))


def lt64(a: U64, b: U64) -> jnp.ndarray:
    return (a.hi < b.hi) | ((a.hi == b.hi) & (a.lo < b.lo))


def eq64(a: U64, b: U64) -> jnp.ndarray:
    return (a.hi == b.hi) & (a.lo == b.lo)


def to_py(a: U64):
    """Device → host Python ints (numpy object-free), for tests/IO."""
    import numpy as np

    return join_np(
        np.asarray(a.hi, dtype=np.uint32), np.asarray(a.lo, dtype=np.uint32)
    )


def from_np(values) -> U64:
    """Host numpy uint64 array → device-friendly U64 pair."""
    hi, lo = split_np(values)
    return U64(jnp.asarray(hi), jnp.asarray(lo))


def split_np(values) -> Tuple:
    """Host numpy uint64 array → (hi, lo) numpy uint32 arrays.

    Implemented as a byte reinterpretation (little-endian: u64 bytes =
    lo word then hi word) rather than shift/mask arithmetic: numpy's
    64-bit shift and down-cast inner loops run at ~2M elts/s on this
    host class (measured: 54 s for one shift over 50M elements) while
    plain copies stream at full memory bandwidth — the view + strided
    copy is ~30x faster and bit-identical."""
    import numpy as np

    v = np.asarray(values, dtype=np.uint64)
    if v.ndim == 0 or not np.little_endian:
        return (
            (v >> np.uint64(32)).astype(np.uint32),
            (v & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        )
    w = np.ascontiguousarray(v).view(np.uint32).reshape(v.shape + (2,))
    return np.ascontiguousarray(w[..., 1]), np.ascontiguousarray(w[..., 0])


def join_np(hi, lo):
    """(hi, lo) numpy uint32 arrays → numpy uint64 (byte view; see
    ``split_np`` for why not shift arithmetic)."""
    import numpy as np

    hi = np.asarray(hi)
    lo = np.asarray(lo)
    if hi.ndim == 0 or not np.little_endian:
        return (hi.astype(np.uint64) << np.uint64(32)) | np.asarray(
            lo, dtype=np.uint64
        )
    out = np.empty(hi.shape + (2,), np.uint32)
    out[..., 0] = lo
    out[..., 1] = hi
    return out.view(np.uint64).reshape(hi.shape)
