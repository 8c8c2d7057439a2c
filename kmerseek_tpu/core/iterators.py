"""Typed iteration & functional utilities over k-mer tables.

Reference parity for src/rust/iterators.rs: the reference exposes typed
iterators over per-hash KmerInfo records plus functional helpers
(`group_kmers_by_count`, `find_multi_position_kmers`,
`calculate_kmer_density`, `find_overlapping_kmers` —
iterators.rs:116-169). Here the k-mer sidecar is a columnar table
(``core.kmers``), so the same capabilities are vectorized pandas/numpy
operations keyed on the parquet contract columns
(sequence_name, kmer, hashval, encoded, start).
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Tuple

import numpy as np
import pandas as pd


def iter_kmer_infos(table: pd.DataFrame) -> Iterator[Tuple[int, pd.DataFrame]]:
    """Iterate (hashval, rows) — KmerInfoIterator equivalent
    (iterators.rs:6-26). Several original k-mers can share one hash
    under hp/dayhoff (kmer.rs:6-12)."""
    for hashval, group in table.groupby("hashval", sort=False):
        yield int(hashval), group


def unique_kmer_count(table: pd.DataFrame, hashval: int) -> int:
    """kmer.rs:33-36 equivalent."""
    return table.loc[table["hashval"] == np.uint64(hashval), "kmer"].nunique()


def total_occurrences(table: pd.DataFrame, hashval: int) -> int:
    """kmer.rs:38-41 equivalent (one row per occurrence position)."""
    return int((table["hashval"] == np.uint64(hashval)).sum())


def has_position(table: pd.DataFrame, hashval: int, position: int) -> bool:
    """kmer.rs:43-46 equivalent."""
    sel = table[table["hashval"] == np.uint64(hashval)]
    return bool((sel["start"] == np.uint32(position)).any())


def group_kmers_by_count(table: pd.DataFrame) -> Dict[int, List[int]]:
    """occurrence-count → [hashval] (iterators.rs:116-127)."""
    counts = table.groupby("hashval", sort=False).size()
    out: Dict[int, List[int]] = {}
    for hashval, n in counts.items():
        out.setdefault(int(n), []).append(int(hashval))
    return out


def find_multi_position_kmers(table: pd.DataFrame) -> List[int]:
    """Hashes whose k-mers occur at >1 position (iterators.rs:129-137)."""
    counts = table.groupby("hashval", sort=False)["start"].nunique()
    return [int(h) for h, n in counts.items() if n > 1]


def calculate_kmer_density(
    table: pd.DataFrame, sequence_name: str, sequence_length: int, ksize: int
) -> float:
    """Retained-window density of one sequence (iterators.rs:139-151):
    distinct retained positions / total windows."""
    w = max(sequence_length - ksize + 1, 0)
    if w == 0:
        return 0.0
    sel = table[table["sequence_name"] == sequence_name]
    return float(sel["start"].nunique()) / w


def find_overlapping_kmers(
    table: pd.DataFrame, sequence_name: str, ksize: int
) -> List[Tuple[int, int]]:
    """Pairs of starts whose windows overlap (iterators.rs:153-169),
    returned as sorted (start_a, start_b) with start_a < start_b."""
    starts = np.sort(
        table.loc[table["sequence_name"] == sequence_name, "start"].unique()
    ).astype(np.int64)
    out: List[Tuple[int, int]] = []
    j = 0
    for i in range(len(starts)):
        for j in range(i + 1, len(starts)):
            if starts[j] - starts[i] < ksize:
                out.append((int(starts[i]), int(starts[j])))
            else:
                break
    return out
