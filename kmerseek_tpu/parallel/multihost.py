"""Multi-host orchestration: process groups + host-sharded index build.

The multi-host story (BASELINE.json north star): each host reads its
own shard of the FASTA (data-parallel ingest), sketches it on its local
chips, and the per-host signature shards are exchanged so every process
holds the identical global index (which `parallel.dist` then shards
over the chip mesh for search). The reference is single-node
(rayon threads only, SURVEY.md §2.6) — this subsystem has no
counterpart to port; it is the TPU-native scale-out design.

Record ownership is **round-robin by record ordinal** everywhere
(`host_owns_record`): a FASTA stream has no cheap record count, so
contiguous ranges would need a wasted first pass, and round-robin
additionally load-balances length-skewed proteomes for free.

Multi-chip hardware is not reachable from this environment, but the
exchange IS executed for real: ``tests/test_multihost_real.py`` forms
an actual 2-process ``jax.distributed`` group over localhost
(Gloo-backed CPU collectives) and asserts the merged index is
bit-equal to a single-host build. The pack/merge steps are additionally
pure functions tested by simulating several hosts' payloads, and
`__graft_entry__.dryrun_multichip` pushes a real fixture through
`build_distributed` + the sharded search path on a virtual mesh.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np


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


def host_owns_record(ordinal: int, process_index: int, process_count: int) -> bool:
    """Round-robin record ownership — the single sharding rule for every
    multi-host ingest path."""
    return ordinal % process_count == process_index


def iter_host_shard_batches(
    fasta: str,
    process_index: int,
    process_count: int,
    batch_size: int = 1000,
):
    """Stream only this host's records, with each record's global
    ordinal: yields batches of (ordinal, FastaRecord) pairs."""
    from ..core.fasta import iter_fasta

    batch = []
    for i, rec in enumerate(iter_fasta(fasta)):
        if not host_owns_record(i, process_index, process_count):
            continue
        batch.append((i, rec))
        if len(batch) >= batch_size:
            yield batch
            batch = []
    if batch:
        yield batch


def hash_range_for_shard(
    shard: int, n_shards: int, span: int = 1 << 64
) -> Tuple[int, int]:
    """[lo, hi) u64 hash range owned by a shard (hash-range sharding of
    the index; murmur is uniform so ranges balance — SURVEY.md §7.1).

    ``span`` is the occupied hash space: the FracMinHash scaled filter
    keeps only hashes ≤ max_hash(scaled), so production sharding passes
    ``max_hash_for_scaled(scaled) + 1`` — splitting the full u64 line
    would leave every shard above 2^64/scaled empty (e.g. shard 1 of 2
    at scaled 5 would own nothing)."""
    width = span // n_shards
    lo = shard * width
    hi = (shard + 1) * width if shard < n_shards - 1 else span
    return lo, hi


def shard_of_hash(mins: np.ndarray, n_shards: int, span: int = 1 << 64) -> np.ndarray:
    """Owning shard of each u64 hash under ``hash_range_for_shard``
    ranges (vectorized; the partition step of the posting exchange)."""
    if n_shards == 1:
        return np.zeros(len(mins), np.int64)
    bounds = np.asarray(
        [hash_range_for_shard(d, n_shards, span)[0] for d in range(1, n_shards)],
        np.uint64,
    )
    return np.searchsorted(bounds, np.asarray(mins, np.uint64), side="right")


# ----------------------------------------------------------------------
# signature-shard exchange: pack each host's sketches into flat arrays,
# all-gather, merge back in global record order. Pure functions so the
# multi-host merge is testable without a process group.
# ----------------------------------------------------------------------


def pack_local_shard(ordinals: List[int], signatures) -> dict:
    """Flatten one host's (ordinal, Signature) shard into numpy arrays
    (the only types a cross-host allgather can move)."""
    name_bytes = [s.name.encode("utf-8") for s in signatures]
    name_off = np.zeros(len(name_bytes) + 1, np.int64)
    for i, b in enumerate(name_bytes):
        name_off[i + 1] = name_off[i] + len(b)
    sk_off = np.zeros(len(signatures) + 1, np.int64)
    for i, s in enumerate(signatures):
        sk_off[i + 1] = sk_off[i] + len(s.mins)
    return {
        "ordinals": np.asarray(ordinals, np.int64),
        "names": np.frombuffer(b"".join(name_bytes), np.uint8).copy(),
        "name_offsets": name_off,
        "mins": (
            np.concatenate([s.mins for s in signatures])
            if signatures
            else np.zeros(0, np.uint64)
        ),
        "abundances": (
            np.concatenate([s.abundances for s in signatures])
            if signatures
            else np.zeros(0, np.int64)
        ),
        "sketch_offsets": sk_off,
    }


def merge_shards(payloads: List[dict], config, source_fasta: str = ""):
    """Merge every host's packed shard into one ProteomeIndex in global
    record order (inverse of the round-robin split — bit-identical to a
    single-host build)."""
    from ..core.index import ProteomeIndex
    from ..core.signature import Signature

    entries = []
    for p in payloads:
        names_blob = p["names"].tobytes()
        no, so = p["name_offsets"], p["sketch_offsets"]
        for i, ordinal in enumerate(p["ordinals"].tolist()):
            entries.append(
                (
                    ordinal,
                    Signature(
                        name=names_blob[no[i] : no[i + 1]].decode("utf-8"),
                        mins=p["mins"][so[i] : so[i + 1]],
                        abundances=p["abundances"][so[i] : so[i + 1]],
                        ksize=config.ksize,
                        scaled=config.scaled,
                        moltype=config.moltype,
                        filename=source_fasta,
                    ),
                )
            )
    entries.sort(key=lambda e: e[0])
    if [e[0] for e in entries] != list(range(len(entries))):
        raise RuntimeError(
            "multi-host merge: record ordinals are not a dense 0..N-1 "
            "range — a host shard is missing or duplicated"
        )
    return ProteomeIndex.from_signatures(
        [e[1] for e in entries], config, source_fasta=source_fasta
    )


def _allgather_payloads(local: dict) -> List[dict]:
    """Exchange packed shards across the process group.

    Variable-length arrays are moved with one size-allgather followed by
    per-field padded allgathers (jax.experimental.multihost_utils).

    Fields transit as raw **byte views**: the group usually runs with
    x64 disabled, where ``process_allgather`` would silently truncate
    u64 hash / i64 offset arrays to 32 bits (caught by the real
    2-process group test, tests/test_multihost_real.py) — a uint8
    transport is wraparound-proof for every field dtype."""
    import jax

    if jax.process_count() == 1:
        return [local]
    from jax.experimental import multihost_utils as mhu

    keys = sorted(local)
    byte_views = {k: np.ascontiguousarray(local[k]).view(np.uint8) for k in keys}
    sizes = np.asarray([len(byte_views[k]) for k in keys], np.int32)
    all_sizes = np.asarray(mhu.process_allgather(sizes))  # (P, K)
    payloads: List[dict] = [dict() for _ in range(all_sizes.shape[0])]
    for ki, k in enumerate(keys):
        width = max(int(all_sizes[:, ki].max()), 1)
        padded = np.zeros(width, np.uint8)
        padded[: len(byte_views[k])] = byte_views[k]
        gathered = np.asarray(mhu.process_allgather(padded))  # (P, width)
        for pi in range(all_sizes.shape[0]):
            n = int(all_sizes[pi, ki])
            payloads[pi][k] = (
                np.ascontiguousarray(gathered[pi, :n]).view(local[k].dtype)
            )
    return payloads


def sketch_local_shard(
    fasta: str,
    config,
    pidx: int,
    pcount: int,
    *,
    batch_size: int = 1000,
    ambiguity_policy: str = "first",
) -> Tuple[List[int], list]:
    """Stream + sketch THIS process's round-robin record shard on its
    local devices. Returns (global ordinals, Signatures) — the shared
    data-parallel ingest stage of both multi-host builds."""
    import jax

    from ..core.alphabet import validate_resolve_batch
    from ..core.fasta import prefetch
    from ..core.index import sketch_batch_signatures

    use_pallas = jax.default_backend() not in ("cpu",)
    ordinals: List[int] = []
    signatures = []
    for batch in prefetch(iter_host_shard_batches(fasta, pidx, pcount, batch_size)):
        names = [r.name for _o, r in batch]
        resolved = validate_resolve_batch(
            [r.seq for _o, r in batch], names, policy=ambiguity_policy
        )
        signatures.extend(
            sketch_batch_signatures(
                names,
                resolved,
                config,
                use_pallas=use_pallas,
                filename=os.path.abspath(fasta),
            )
        )
        ordinals.extend(o for o, _r in batch)
    return ordinals, signatures


def build_distributed_index(
    fasta: str,
    config=None,
    *,
    batch_size: int = 1000,
    ambiguity_policy: str = "first",
):
    """Multi-host data-parallel index build — full-replica mode.

    Each process streams its round-robin record shard, sketches it on
    its local devices, and the shards are all-gathered so every process
    returns the identical full ProteomeIndex (bit-equal to a
    single-host `ProteomeIndex.build`). On one process this degrades to
    the plain build path with zero communication.

    For indexes larger than one host's RAM use
    ``parallel.sharded.build_sharded_index`` — it keeps only this
    process's hash range resident (the BASELINE.json north-star
    layout); this full-replica mode remains for corpora where every
    host wants zero-communication searches afterwards."""
    from ..core.index import IndexConfig

    config = config or IndexConfig()
    pidx, pcount = initialize_distributed()
    ordinals, signatures = sketch_local_shard(
        fasta, config, pidx, pcount,
        batch_size=batch_size, ambiguity_policy=ambiguity_policy,
    )
    payloads = _allgather_payloads(pack_local_shard(ordinals, signatures))
    return merge_shards(payloads, config, source_fasta=fasta)
