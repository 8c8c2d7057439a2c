"""Multi-host orchestration: process groups + host-sharded ingest.

The multi-host story (BASELINE.json north star): each host reads its
own shard of the FASTA (data-parallel ingest), sketches it on its local
chips, and owns a hash/target range of the global index; queries are
broadcast and scored shard-locally (``parallel.dist``). This module
provides the process-group bootstrap and the deterministic host-shard
assignment; on one host it degrades to the identity.

Multi-chip hardware is not reachable from this environment, so these
paths are validated structurally (sharding compiles + executes on a
virtual mesh via ``__graft_entry__.dryrun_multichip``) rather than by
wall-clock scaling runs.
"""

from __future__ import annotations

import os
from typing import Iterator, List, Optional, Sequence, Tuple


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """``jax.distributed.initialize`` wrapper; no-op on a single host.

    Returns (process_index, process_count)."""
    import jax

    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def host_record_shard(
    n_records: int, process_index: int, process_count: int
) -> range:
    """Contiguous record range owned by this host (balanced ±1)."""
    base = n_records // process_count
    extra = n_records % process_count
    start = process_index * base + min(process_index, extra)
    size = base + (1 if process_index < extra else 0)
    return range(start, start + size)


def iter_host_shard_batches(
    fasta: str,
    process_index: int,
    process_count: int,
    batch_size: int = 1000,
):
    """Stream only this host's records (round-robin by record ordinal —
    contiguous ranges would need a two-pass count for a stream)."""
    from ..core.fasta import iter_fasta

    batch = []
    for i, rec in enumerate(iter_fasta(fasta)):
        if i % process_count != process_index:
            continue
        batch.append(rec)
        if len(batch) >= batch_size:
            yield batch
            batch = []
    if batch:
        yield batch


def hash_range_for_shard(shard: int, n_shards: int) -> Tuple[int, int]:
    """[lo, hi) u64 hash range owned by a shard (hash-range sharding of
    the index; murmur is uniform so ranges balance — SURVEY.md §7.1)."""
    width = (1 << 64) // n_shards
    lo = shard * width
    hi = (shard + 1) * width if shard < n_shards - 1 else 1 << 64
    return lo, hi
