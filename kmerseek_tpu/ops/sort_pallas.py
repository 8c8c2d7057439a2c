"""Pallas TPU bitonic row sort for u64 (hi, lo) pairs.

XLA's TPU sort runs at ~50M elements/s on the padded sketch arrays —
an order of magnitude below the fused hash kernel — so the per-row
sort that turns compacted window hashes into sorted sketch mins is
implemented here as an in-VMEM bitonic network over the lane dimension.

The lane-partner exchange of a bitonic stage (partner = lane XOR d) is
built from two rotations: ``x[i+d] = roll(x, -d)[i]`` for lanes with
bit d clear and ``x[i-d] = roll(x, +d)[i]`` for lanes with bit d set,
selected by the bit mask — every operation stays a full-width VPU
vector op, no gathers.

Each row is sorted independently (ascending, u64 lexicographic on
(hi, lo)); rows are a grid/sublane dimension. S must be a power of two
— callers pad with u64::MAX sentinels which sort to the end.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 10 * 1024 * 1024


def _bitonic_kernel(hi_ref, lo_ref, out_hi_ref, out_lo_ref, *, S: int):
    hi = hi_ref[:]
    lo = lo_ref[:]
    TB = hi.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (TB, S), 1)

    import math

    for p in range(1, int(math.log2(S)) + 1):
        # direction: ascending when bit p of the lane index is 0
        up_i = (lane >> p) & 1  # 0 = ascending block, 1 = descending
        for s in range(p, 0, -1):
            d = 1 << (s - 1)
            bit_i = (lane >> (s - 1)) & 1  # 1 = high lane of the pair
            is_high = bit_i == 1
            # partner lane = i XOR d, built from two rotations
            p_hi = jnp.where(is_high, pltpu.roll(hi, d, 1), pltpu.roll(hi, S - d, 1))
            p_lo = jnp.where(is_high, pltpu.roll(lo, d, 1), pltpu.roll(lo, S - d, 1))
            # self < partner (u64 lex); equality keeps self on both lanes.
            # All mask logic in int32 — Mosaic cannot lower i1-valued
            # selects/xors (trunci i8→i1).
            less_i = (
                (hi < p_hi) | ((hi == p_hi) & (lo < p_lo))
            ).astype(jnp.int32)
            eq_i = ((hi == p_hi) & (lo == p_lo)).astype(jnp.int32)
            flip = (bit_i + 1 - up_i) & 1  # bit XOR ascending
            keep_i = (flip * less_i + (1 - flip) * (1 - less_i)) | eq_i
            keep = keep_i == 1
            hi = jnp.where(keep, hi, p_hi)
            lo = jnp.where(keep, lo, p_lo)
    out_hi_ref[:] = hi
    out_lo_ref[:] = lo


@functools.partial(jax.jit, static_argnames=("interpret",))
def bitonic_sort_rows(hi: jnp.ndarray, lo: jnp.ndarray, interpret: bool = False):
    """Sort each row of (B, S) u64 pairs ascending. S must be a power of 2."""
    B, S = hi.shape
    assert S & (S - 1) == 0, f"S={S} must be a power of two"
    per_row = 6 * S * 4
    TB = max(min(_VMEM_BUDGET // per_row, B, 512), 1)
    for cand in (512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
        if cand <= TB:
            TB = cand
            break
    pad = (-B) % TB
    if pad:
        hi = jnp.pad(hi, ((0, pad), (0, 0)))
        lo = jnp.pad(lo, ((0, pad), (0, 0)))
    Bp = B + pad
    out_hi, out_lo = pl.pallas_call(
        functools.partial(_bitonic_kernel, S=S),
        grid=(Bp // TB,),
        in_specs=[
            pl.BlockSpec((TB, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TB, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, S), jnp.uint32),
            jax.ShapeDtypeStruct((Bp, S), jnp.uint32),
        ],
        interpret=interpret,
    )(hi, lo)
    return out_hi[:B], out_lo[:B]
