"""K-mer table extraction — the (hash → k-mer string, position) sidecar.

Produces the same parquet contract as the reference's sig2kmer path
(/root/reference/src/python/kmerseek/sig2kmer.py:158-183 +
extract_kmers.py): columns ``sequence_file, sequence_name, kmer,
hashval, encoded, start`` with one row per window occurrence whose hash
survives the scaled filter. Validated against the committed
``….hp.k24.scaled5.sig.TRUE.zip.kmers.pq`` fixture (1712 rows).

Where the reference re-kmerizes every sequence in Python via sourmash's
CLI-as-library (``sourmash.sig.__main__.kmers``) and joins in polars,
here the device already computed every window's hash and keep-mask
during sketching — the table falls out of one masked transfer plus
numpy string slicing. Strings stay on host (SURVEY.md §7.3: payloads
don't belong in HBM).

hp/dayhoff collisions (several original k-mers → one encoded hash,
index.rs:1322-1325) are naturally multimap rows here.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..ops import u64
from ..ops.encoding import encode_bytes_np
from .fasta import pack_batch

KMERS_SCHEMA = pa.schema(
    [
        ("sequence_file", pa.large_string()),
        ("sequence_name", pa.large_string()),
        ("kmer", pa.large_string()),
        ("hashval", pa.uint64()),
        ("encoded", pa.large_string()),
        ("start", pa.uint32()),
    ]
)


def kmer_table_filename(sig_path: str) -> str:
    """sig2kmer.py:27-28 convention."""
    return f"{sig_path}.kmers.pq"


def iter_kmer_batches(
    names: Sequence[str],
    resolved_seqs: Sequence[bytes],
    *,
    ksize: int,
    scaled: int,
    moltype: str,
    sequence_file: str,
    batch_rows: int = 512,
):
    """Yield the k-mer table in ``batch_rows``-sequence pa.Table chunks.

    Generator form of :func:`extract_kmer_table` so huge sidecars
    (UniProt-scale ``--extract-kmers``) can stream to parquet row
    groups without ever materializing the full table — the reference
    gets the same memory bound from polars LazyFrames
    (entity.py:61-71)."""
    import functools

    import jax
    import jax.numpy as jnp

    from ..ops.sketch import window_hashes

    # k-mer extraction is host-centric string work; its hash pass is
    # jitted (window_hashes alone would dispatch eagerly, op by op) and
    # pinned to the CPU backend — running it over the TPU tunnel costs
    # minutes of remote compiles for no benefit.
    cpu0 = jax.local_devices(backend="cpu")[0]

    @functools.partial(jax.jit, static_argnames=("k", "scaled", "moltype"))
    def _hash_pass_jit(arr, lens, k, scaled, moltype):
        hashes, keep = window_hashes(arr, lens, k, scaled, moltype)
        return hashes.hi, hashes.lo, keep

    def _hash_pass(arr, lens, k, scaled, moltype):
        with jax.default_device(cpu0):
            return _hash_pass_jit(
                jax.device_put(arr, cpu0), jax.device_put(lens, cpu0), k, scaled, moltype
            )

    from numpy.lib.stride_tricks import sliding_window_view

    for lo in range(0, len(names), batch_rows):
        chunk_names = names[lo : lo + batch_rows]
        chunk_seqs = resolved_seqs[lo : lo + batch_rows]
        arr, lens = pack_batch(chunk_seqs, min_len=max(ksize + 1, 128))
        hi, lo_w, keep = _hash_pass(
            jnp.asarray(arr), jnp.asarray(lens), ksize, scaled, moltype
        )
        keep_np = np.asarray(keep)
        h64 = u64.join_np(np.asarray(hi), np.asarray(lo_w))
        # all surviving (row, window) occurrences at once — window bytes
        # come from sliding views over the padded byte grid and decode as
        # fixed-width S<k> columns; no per-window Python
        rows, starts = np.nonzero(keep_np[:, : arr.shape[1] - ksize + 1])
        if len(rows) == 0:
            continue
        enc_arr = encode_bytes_np(arr, moltype)
        win = sliding_window_view(arr, ksize, axis=1)
        enc_win = sliding_window_view(enc_arr, ksize, axis=1)
        kmers = (
            np.ascontiguousarray(win[rows, starts])
            .view(f"S{ksize}")
            .ravel()
            .astype(f"U{ksize}")
        )
        encs = (
            np.ascontiguousarray(enc_win[rows, starts])
            .view(f"S{ksize}")
            .ravel()
            .astype(f"U{ksize}")
        )
        name_col = np.asarray(chunk_names, dtype=object)[rows]
        yield pa.Table.from_arrays(
            [
                pa.array(
                    np.full(len(rows), sequence_file, object),
                    pa.large_string(),
                ),
                pa.array(name_col, pa.large_string()),
                pa.array(kmers, pa.large_string()),
                pa.array(h64[rows, starts], pa.uint64()),
                pa.array(encs, pa.large_string()),
                pa.array(starts.astype(np.uint32), pa.uint32()),
            ],
            schema=KMERS_SCHEMA,
        )


def extract_kmer_table(
    names: Sequence[str],
    resolved_seqs: Sequence[bytes],
    **kw,
) -> pa.Table:
    """Build the k-mer table for already-validated sequences (eager)."""
    chunks: List[pa.Table] = list(iter_kmer_batches(names, resolved_seqs, **kw))
    if not chunks:
        return KMERS_SCHEMA.empty_table()
    return pa.concat_tables(chunks)


# parquet row-group size (rows). Bounds the unit the streaming reader
# (core.stitch join) must hold in memory at once: 2^18 rows of this
# schema ≈ 20-30 MB decoded.
KMERS_ROW_GROUP = 1 << 18


def write_kmer_table(table: pa.Table, path: str) -> str:
    pq.write_table(table, path, row_group_size=KMERS_ROW_GROUP)
    return path


def read_kmer_table(path: str) -> pa.Table:
    return pq.read_table(path)


def _resolved_sequences_for_index(index):
    """Stored raw sequences, or re-read + validate the source FASTA
    (mirroring the reference, which re-kmerizes from saved sequences,
    sig2kmer.py:186-219)."""
    sequences = index.sequences
    if sequences is None:
        if not index.source_fasta or not os.path.exists(index.source_fasta):
            raise ValueError(
                "index has neither stored sequences nor a readable "
                "source_fasta; re-build with store_raw_sequences=True"
            )
        from .alphabet import validate_resolve_batch
        from .fasta import read_fasta

        records = read_fasta(index.source_fasta)
        by_name = {r.name: r.seq for r in records}
        sequences = validate_resolve_batch(
            [by_name[n] for n in index.names], index.names
        )
    return sequences


def kmer_table_for_index(index, sequence_file: Optional[str] = None) -> pa.Table:
    """Extract the table for a built ProteomeIndex (eager)."""
    return extract_kmer_table(
        index.names,
        _resolved_sequences_for_index(index),
        ksize=index.config.ksize,
        scaled=index.config.scaled,
        moltype=index.config.moltype,
        sequence_file=sequence_file or os.path.abspath(index.source_fasta),
    )


def write_kmer_table_for_index(
    index, path: str, sequence_file: Optional[str] = None
) -> str:
    """Stream the index's k-mer table straight to ``path`` one row
    group per sequence batch — peak memory is one batch, not the table
    (the reference's LazyFrame-shaped write, entity.py:49-59). Bytes on
    disk decode identically to ``write_kmer_table(kmer_table_for_index(
    index), path)`` (pinned by tests/test_entity.py)."""
    batches = iter_kmer_batches(
        index.names,
        _resolved_sequences_for_index(index),
        ksize=index.config.ksize,
        scaled=index.config.scaled,
        moltype=index.config.moltype,
        sequence_file=sequence_file or os.path.abspath(index.source_fasta),
    )
    with pq.ParquetWriter(path, KMERS_SCHEMA) as writer:
        pending: List[pa.Table] = []
        n_pending = 0
        for chunk in batches:
            pending.append(chunk)
            n_pending += len(chunk)
            if n_pending >= KMERS_ROW_GROUP:
                writer.write_table(
                    pa.concat_tables(pending), row_group_size=KMERS_ROW_GROUP
                )
                pending, n_pending = [], 0
        if pending:
            writer.write_table(
                pa.concat_tables(pending), row_group_size=KMERS_ROW_GROUP
            )
    return path
