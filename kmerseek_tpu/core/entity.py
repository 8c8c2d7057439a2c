"""Lazy file-product orchestration: sketch / index / k-mer artifacts.

Mirror of the reference's KmerseekEntity / KmerseekQuery /
KmerseekIndex classes (/root/reference/src/python/kmerseek/entity.py:8-71,
index.py:13-40, query.py:4-5): artifacts are cached on disk under
filename conventions and reused unless ``force``:

* ``{fasta}.{moltype}.k{k}.scaled{s}.sig.zip``   (sketch.py:24-26)
* ``{sig}.kmers.pq``                             (sig2kmer.py:27-28)
* ``{sig}.ksx``  — columnar index dir, replacing ``{sig}.rocksdb``
  (index.py:52-53; RocksDB has no TPU-side role here)
"""

from __future__ import annotations

import os
from typing import Optional


from ..utils.logging import logger
from .index import IndexConfig, ProteomeIndex
from .kmers import (
    kmer_table_filename,
    read_kmer_table,
    write_kmer_table_for_index,
)


def make_sigfile(fasta: str, moltype: str, ksize: int, scaled: int) -> str:
    return f"{fasta}.{moltype}.k{ksize}.scaled{scaled}.sig.zip"


def make_index_dirname(sig: str) -> str:
    return f"{sig}.ksx"


def make_manysketch_csv(fasta: str) -> str:
    """``{fasta}.manysketch.csv`` side artifact, byte-identical to the
    reference's sketch helper (sketch.py:14-22) — observable output of
    `kmerseek index` (tests/test_index.py:14-19)."""
    csv = f"{fasta}.manysketch.csv"
    basename = os.path.basename(fasta)
    with open(csv, "w") as f:
        f.write("name,genome_filename,protein_filename\n")
        # proteins only — genome (DNA) filename column stays empty
        f.write(f"{basename},,{fasta}\n")
    return csv


def make_siglist_file(sig: str) -> str:
    """``{sig}.siglist`` (one path, no trailing newline), index.py:44-48."""
    siglist = f"{sig}.siglist"
    with open(siglist, "w") as f:
        f.write(f"{sig}")
    return siglist


class KmerseekEntity:
    """Base: lazily produces .sig.zip / .kmers.pq / in-memory index."""

    def __init__(
        self,
        fasta: str,
        moltype: str = "hp",
        ksize: int = 24,
        scaled: int = 5,
        force: bool = False,
        extract_kmers: bool = False,
        engine: str = "auto",
    ):
        self.fasta = fasta
        self.config = IndexConfig(ksize=ksize, scaled=scaled, moltype=moltype)
        self.force = force
        self.extract_kmers = extract_kmers
        self.engine = engine
        self._index: Optional[ProteomeIndex] = None
        self._sig: Optional[str] = None
        self._kmers_pq: Optional[str] = None

    @property
    def index(self) -> ProteomeIndex:
        """The in-memory ProteomeIndex (built on device or loaded)."""
        if self._index is None:
            sig = make_sigfile(
                self.fasta,
                self.config.moltype,
                self.config.ksize,
                self.config.scaled,
            )
            idx_dir = make_index_dirname(sig)
            if not self.force and os.path.isdir(idx_dir):
                logger.info("Found index %s, loading (re-make with '--force')", idx_dir)
                self._index = ProteomeIndex.load(idx_dir)
            else:
                self._index = ProteomeIndex.build(
                    self.fasta,
                    self.config,
                    store_raw_sequences=self.extract_kmers,
                    engine=self.engine,
                )
        return self._index

    @property
    def sig(self) -> str:
        """Path to the .sig.zip product (entity.py:20-34 semantics)."""
        if self._sig is None:
            sigfile = make_sigfile(
                self.fasta,
                self.config.moltype,
                self.config.ksize,
                self.config.scaled,
            )
            if self.force or not os.path.exists(sigfile):
                if os.path.exists(sigfile):
                    logger.info(
                        "Found %s file, but re-making with '--force'", sigfile
                    )
                make_manysketch_csv(self.fasta)
                self.index.to_sig_zip(sigfile)
            else:
                logger.info(
                    "Found signature file %s, skipping! Re-make with '--force'",
                    sigfile,
                )
            self._sig = sigfile
        return self._sig

    @property
    def kmers_pq(self) -> Optional[str]:
        """Path to the k-mer parquet (entity.py:49-59 semantics)."""
        if not self.extract_kmers:
            logger.info("Skipping k-mer extraction")
            return None
        if self._kmers_pq is None:
            pq_path = kmer_table_filename(self.sig)
            if self.force or not os.path.exists(pq_path):
                if os.path.exists(pq_path):
                    logger.info("Found %s file, but re-making with '--force'", pq_path)
                # row-group streaming write: peak memory is one
                # sequence batch, not the full sidecar (entity.py:49-59
                # lazy semantics at UniProt scale)
                write_kmer_table_for_index(self.index, pq_path)
            else:
                logger.info(
                    "Found k-mer parquet %s, skipping! Re-make with '--force'",
                    pq_path,
                )
            self._kmers_pq = pq_path
        return self._kmers_pq

    @property
    def kmers_dataframe(self) -> "Optional[pd.DataFrame]":
        # pandas is imported lazily: it costs ~0.8 s at CLI start and
        # only this accessor needs it
        import pandas as pd  # noqa: F401
        pq_path = self.kmers_pq
        if pq_path is None:
            return None
        return read_kmer_table(pq_path).to_pandas()


class KmerseekQuery(KmerseekEntity):
    """query.py:4-5 — pure subclass."""


class KmerseekIndex(KmerseekEntity):
    """Index-side entity; persists the columnar index next to the sig."""

    def __init__(
        self,
        fasta,
        moltype="hp",
        ksize=24,
        scaled=5,
        force=False,
        extract_kmers=False,
        engine="auto",
    ):
        super().__init__(
            fasta,
            moltype,
            ksize,
            scaled,
            force=force,
            extract_kmers=extract_kmers,
            engine=engine,
        )

    @property
    def ksx(self) -> str:
        """Persisted columnar index (stands in for index.py:13-17 rocksdb)."""
        idx_dir = make_index_dirname(self.sig)
        if self.force or not os.path.isdir(idx_dir):
            make_siglist_file(self.sig)
            self.index.save(idx_dir)
        return idx_dir
