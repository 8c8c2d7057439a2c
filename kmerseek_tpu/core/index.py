"""ProteomeIndex — the central index, built on device, stored columnar.

TPU-native redesign of the reference's ``ProteomeIndex``
(/root/reference/src/rust/index.rs:58-96): where the reference keeps a
RocksDB handle, a DashMap of per-protein signatures, and a mutexed
combined KmerMinHash, this index is a set of flat arrays:

* per-protein sketches as one concatenated uint64 ``mins`` array with
  CSR offsets (host) / padded dense (T, S) uint32-pair arrays (device);
* the combined minhash as a sorted unique hash array + doc frequencies;
* the k-mer string/position sidecar as a parquet table (columns
  ``sequence_file, sequence_name, kmer, hashval, encoded, start`` —
  byte-identical contract to the reference's ``.kmers.pq``,
  sig2kmer.py:19-28,158-183), kept on host: strings don't belong in HBM
  (SURVEY.md §7.3).

Persistence replaces RocksDB/bincode chunks (index.rs:227-265) with a
directory of raw ``.npy`` members + a manifest + JSON metadata +
parquet sidecar — ``load()`` mmaps the members (O(1) open, pages fault
in on first touch), there is no chunk-reassembly step, and it is
reliable (the reference's was documented broken, index.rs:428-430).

Build path (index.rs:907-1016 redesigned): stream FASTA record batches
→ host validate/resolve → length-bucketed padded device batches →
``ops.sketch.sketch_batch`` (one fused XLA program per bucket shape) →
host signature assembly. Parallelism is the device's vector lanes
instead of rayon threads.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..ops import u64
from ..ops.sketch_np import merge_sketches_np
from .alphabet import validate_resolve_batch
from .fasta import iter_record_batches
from .signature import Signature

# format 2: corpus-scale arrays live as individual raw .npy members
# next to a manifest.json and load with mmap_mode="r" — a fresh process
# opens the index in milliseconds and pages arrays in from the OS page
# cache on first touch (this VM class faults fresh anonymous pages at
# ~100 MB/s, so the old eager-npz load spent ~20 s copying 1.6 GB at
# UniProt scale before the first answer; see DESIGN.md §6.10). Format 1
# (arrays.npz / inverted.npz) still loads via the legacy branch.
INDEX_FORMAT_VERSION = 2


INDEX_SUFFIX = "kmerseek.ksx"  # replaces "...kmerseek.rocksdb" (index.rs:647-652)

def generate_index_path(fasta: str, moltype: str, ksize: int, scaled: int) -> str:
    """Auto filename, index.rs:647-652 convention with a ksx suffix."""
    return f"{fasta}.{moltype}.k{ksize}.scaled{scaled}.{INDEX_SUFFIX}"


class ProteomeIndexBuilder:
    """Fluent builder (index.rs:2975-3061 parity)."""

    def __init__(self) -> None:
        self._ksize = 24
        self._scaled = 5
        self._moltype = "hp"
        self._store_raw = False
        self._batch_size = 1000
        self._progress_interval = 0

    def ksize(self, k: int) -> "ProteomeIndexBuilder":
        self._ksize = k
        return self

    def scaled(self, s: int) -> "ProteomeIndexBuilder":
        self._scaled = s
        return self

    def moltype(self, m: str) -> "ProteomeIndexBuilder":
        self._moltype = m
        return self

    def store_raw_sequences(self, on: bool = True) -> "ProteomeIndexBuilder":
        self._store_raw = on
        return self

    def batch_size(self, n: int) -> "ProteomeIndexBuilder":
        self._batch_size = n
        return self

    def progress_interval(self, n: int) -> "ProteomeIndexBuilder":
        self._progress_interval = n
        return self

    def build(self, fasta: str) -> "ProteomeIndex":
        return ProteomeIndex.build(
            fasta,
            IndexConfig(self._ksize, self._scaled, self._moltype),
            batch_size=self._batch_size,
            store_raw_sequences=self._store_raw,
            progress_interval=self._progress_interval,
        )


@dataclass
class IndexConfig:
    """Typed, validated config (types.rs / config.rs:70-103 parity)."""

    ksize: int = 24
    scaled: int = 5
    moltype: str = "hp"

    def __post_init__(self):
        # KmerSize 1..=100 (types.rs:10-18); Scaled 1..=10 for proteins
        # (types.rs:52-64). Unlike the reference, the index actually
        # enforces its config (the Rust ProteomeIndex::new skipped
        # validation, SURVEY.md §2.3 #12) — but keep the Rust tests'
        # looser range usable by allowing scaled up to 10000.
        if not 1 <= self.ksize <= 100:
            raise ValueError(f"ksize must be in 1..=100, got {self.ksize}")
        if not 1 <= self.scaled <= 10000:
            raise ValueError(f"scaled must be in 1..=10000, got {self.scaled}")
        if self.moltype not in ("protein", "dayhoff", "hp"):
            raise ValueError(
                f"Invalid moltype: {self.moltype}, only 'protein', 'hp', or "
                "'dayhoff' are supported"
            )


def sketch_batch_signatures(
    names: List[str],
    resolved: Sequence[bytes],
    config: "IndexConfig",
    *,
    use_pallas: bool = False,
    filename: str = "",
) -> List[Signature]:
    """Device-sketch one batch of validated sequences into Signatures.

    The shared device stage of `build` and `build_distributed`:
    fixed-grid packing (bounded recompiles) → fused scatter-free
    sentinel-sort sketch → host run-length dedup."""
    import jax.numpy as jnp

    from ..ops.sketch import (
        finalize_sorted_np,
        sketch_capacity,
        sorted_window_hashes,
    )
    from .fasta import pack_fixed_grid

    k, scaled, moltype = config.ksize, config.scaled, config.moltype
    batch_sigs: List = [None] * len(names)
    for arr, lens, idxs in pack_fixed_grid(resolved, min_len=max(k + 1, 256)):
        cap = sketch_capacity(arr.shape[1], k, scaled)
        cap = max((cap + 127) // 128 * 128, 128)
        while True:
            out = sorted_window_hashes(
                jnp.asarray(arr),
                jnp.asarray(lens),
                k=k,
                scaled=scaled,
                moltype=moltype,
                capacity=cap,
                use_pallas=use_pallas,
            )
            if int(np.asarray(out[3]).max(initial=0)) <= cap:
                break
            cap *= 2  # rare under-provision: retry with more slots
        mins_list, ab_list = finalize_sorted_np(*out)
        for r, i in enumerate(idxs):
            batch_sigs[i] = Signature(
                name=names[i],
                mins=mins_list[r],
                abundances=ab_list[r],
                ksize=k,
                scaled=scaled,
                moltype=moltype,
                filename=filename,
            )
    return batch_sigs


def sketch_batch_signatures_native(
    names: List[str],
    resolved: Sequence[bytes],
    config: "IndexConfig",
    *,
    filename: str = "",
) -> Optional[List[Signature]]:
    """Native C++ CPU sketch of one batch — bit-equal to the device
    stage (same encode LUT + murmur64 + scaled filter; oracle-tested in
    tests/test_native.py), with no jax import and no XLA compile.

    The small-corpus CLI fast path: for tiny inputs (the reference's
    CLI bench corpora are 1-25 sequences) the device path's fixed costs
    (jax import ~2.4 s + per-shape compiles) dwarf the sketch itself.
    Returns None when libkseek is unavailable so callers fall back to
    the device path."""
    from .. import native

    if not native.available():
        return None
    from ..ops.encoding import encode_bytes_np, max_hash_for_scaled

    k, scaled, moltype = config.ksize, config.scaled, config.moltype
    mh = max_hash_for_scaled(scaled)
    sigs: List[Signature] = []
    for name, seq in zip(names, resolved):
        enc = encode_bytes_np(
            np.frombuffer(seq, np.uint8), moltype
        ).tobytes()
        h, a = native.sketch_cpu(enc, k, mh)
        sigs.append(
            Signature(
                name=name,
                mins=h,
                abundances=a.astype(np.int64),
                ksize=k,
                scaled=scaled,
                moltype=moltype,
                filename=filename,
            )
        )
    return sigs


# below this many windows in a batch the "auto" engine sketches on the
# native CPU path: the device sketch runs ~1G kmers/s but its fixed
# costs (jax import, per-shape compiles — minutes over a remote tunnel)
# only amortize at corpus scale
_NATIVE_BUILD_MAX_KMERS = 1_000_000


class ProteomeIndex:
    """Sketches + combined minhash + optional k-mer sidecar for one proteome."""

    def __init__(
        self,
        config: IndexConfig,
        names: List[str],
        mins: np.ndarray,
        abundances: np.ndarray,
        offsets: np.ndarray,
        source_fasta: str = "",
        sequences: Optional[List[bytes]] = None,
    ):
        self.config = config
        self.names = list(names)
        self.mins = np.asarray(mins, dtype=np.uint64)
        self.abundances = np.asarray(abundances, dtype=np.int64)
        self.offsets = np.asarray(offsets, dtype=np.int64)  # (T+1,)
        self.source_fasta = source_fasta
        self.sequences = sequences  # raw (resolved) sequences when stored
        self._combined = None
        self._kmer_table = None
        self._inverted = None
        self._md5s = None
        self._name_ranks = None
        self._md5_array = None
        self._names_array = None

    # ------------------------------------------------------------------
    # construction
    # ------------------------------------------------------------------

    @classmethod
    def from_signatures(
        cls,
        signatures: Sequence[Signature],
        config: Optional[IndexConfig] = None,
        source_fasta: str = "",
        sequences: Optional[List[bytes]] = None,
    ) -> "ProteomeIndex":
        if not signatures:
            raise ValueError("cannot build an index from zero signatures")
        sig0 = signatures[0]
        config = config or IndexConfig(sig0.ksize, sig0.scaled, sig0.moltype)
        names = [s.name for s in signatures]
        offsets = np.zeros(len(signatures) + 1, np.int64)
        for i, s in enumerate(signatures):
            offsets[i + 1] = offsets[i] + len(s)
        mins = (
            np.concatenate([s.mins for s in signatures])
            if len(signatures)
            else np.zeros(0, np.uint64)
        )
        ab = np.concatenate([s.abundances for s in signatures])
        return cls(config, names, mins, ab, offsets, source_fasta, sequences)

    @classmethod
    def build(
        cls,
        fasta: str,
        config: Optional[IndexConfig] = None,
        *,
        batch_size: Optional[int] = None,
        store_raw_sequences: bool = False,
        progress_interval: Optional[int] = None,
        ambiguity_policy: str = "first",
        engine: str = "auto",
    ) -> "ProteomeIndex":
        """Sketch every record of ``fasta`` on the accelerator.

        Device stage: fused hash + sentinel-sort (scatter-free,
        ``ops.sketch.sorted_window_hashes``); host stage: run-length
        dedup into Signature records. The Pallas kernel is used
        automatically on TPU backends.

        ``engine``: ``"device"`` forces the accelerator path,
        ``"native"`` forces the C++ CPU sketcher (bit-equal, raises if
        libkseek is unavailable), ``"auto"`` (default) decides per
        CORPUS: only when the whole file is a single batch under
        ``_NATIVE_BUILD_MAX_KMERS`` windows does it sketch natively
        (so small CLI runs never pay the jax import + compile fixed
        costs); any multi-batch corpus goes to the device engine."""
        if engine not in ("auto", "device", "native"):
            raise ValueError(f"unknown sketch engine: {engine!r}")
        from ..utils.config import get_default_performance_config

        config = config or IndexConfig()
        perf = get_default_performance_config()
        if batch_size is None:
            batch_size = perf.batch_size
        if progress_interval is None:
            # progress logging only when metrics are opted into — the CLI
            # stderr contract stays byte-stable by default
            progress_interval = perf.progress_interval if perf.enable_metrics else 0
        use_pallas = None  # resolved lazily on the first device batch
        signatures: List[Signature] = []
        sequences: List[bytes] = [] if store_raw_sequences else None
        n_done = 0
        from .fasta import prefetch

        # background-thread ingest: FASTA read/decompress of batch i+1
        # overlaps the device sketch of batch i. One batch of lookahead
        # tells 'auto' whether the corpus is single-batch (the prefetch
        # thread has usually read it already).
        import itertools

        batches = prefetch(iter_record_batches(fasta, batch_size))
        first = next(batches, None)
        second = next(batches, None) if first is not None else None
        single_batch = first is not None and second is None
        stream = itertools.chain(
            (b for b in (first, second) if b is not None), batches
        )
        for records in stream:
            names = [r.name for r in records]
            resolved = validate_resolve_batch(
                [r.seq for r in records], names, policy=ambiguity_policy
            )
            batch_sigs = None
            # 'auto' fast-paths natively ONLY when the whole corpus is
            # one under-threshold batch. A per-batch test would route
            # EVERY batch of a corpus-scale build to the serial CPU
            # sketcher — ~1000 typical proteins is only ~330k windows,
            # always under the threshold.
            if engine == "native" or (
                engine == "auto"
                and single_batch
                and sum(
                    max(len(s) - config.ksize + 1, 0) for s in resolved
                )
                < _NATIVE_BUILD_MAX_KMERS
            ):
                batch_sigs = sketch_batch_signatures_native(
                    names, resolved, config, filename=os.path.abspath(fasta)
                )
                if batch_sigs is None and engine == "native":
                    raise RuntimeError(
                        "engine='native' requested but libkseek is unavailable"
                    )
            if batch_sigs is None:
                if use_pallas is None:
                    import jax

                    use_pallas = jax.default_backend() not in ("cpu",)
                batch_sigs = sketch_batch_signatures(
                    names,
                    resolved,
                    config,
                    use_pallas=use_pallas,
                    filename=os.path.abspath(fasta),
                )
            signatures.extend(batch_sigs)
            if store_raw_sequences:
                sequences.extend(resolved)
            n_done += len(records)
            if progress_interval and n_done % progress_interval == 0:
                from ..utils.logging import logger

                logger.info("processed %d sequences", n_done)
        return cls.from_signatures(
            signatures, config, source_fasta=fasta, sequences=sequences
        )

    @classmethod
    def build_distributed(
        cls,
        fasta: str,
        config: Optional["IndexConfig"] = None,
        *,
        batch_size: int = 1000,
        ambiguity_policy: str = "first",
    ) -> "ProteomeIndex":
        """Multi-host data-parallel build (parallel.multihost): each
        process sketches its round-robin record shard locally and the
        shards are all-gathered — every process returns the identical
        index, bit-equal to a single-host `build`."""
        from ..parallel.multihost import build_distributed_index

        return build_distributed_index(
            fasta,
            config,
            batch_size=batch_size,
            ambiguity_policy=ambiguity_policy,
        )

    # ------------------------------------------------------------------
    # views
    # ------------------------------------------------------------------

    def __len__(self) -> int:
        return len(self.names)

    def signature(self, i: int) -> Signature:
        lo, hi = self.offsets[i], self.offsets[i + 1]
        return Signature(
            name=self.names[i],
            mins=self.mins[lo:hi],
            abundances=self.abundances[lo:hi],
            ksize=self.config.ksize,
            scaled=self.config.scaled,
            moltype=self.config.moltype,
            filename=self.source_fasta,
        )

    def signatures(self) -> List[Signature]:
        return [self.signature(i) for i in range(len(self))]

    @property
    def counts(self) -> np.ndarray:
        return np.diff(self.offsets).astype(np.int32)

    @property
    def combined(self) -> Tuple[np.ndarray, np.ndarray]:
        """Union of all sketches: (sorted unique hashes, summed abundances).

        The reference's combined KmerMinHash (index.rs:823-827)."""
        if self._combined is None:
            # the CSR arrays are already the concatenation of every
            # sketch — merge directly, no per-signature slicing
            self._combined = merge_sketches_np([self.mins], [self.abundances])
        return self._combined

    def _kmer_table_derivable(self) -> bool:
        """True when ``kmer_table`` can materialize (stored sequences or
        a readable source FASTA) — the equivalence oracle derives the
        counterpart's sidecar instead of silently skipping the clause."""
        import os as _os

        return self.sequences is not None or bool(
            self.source_fasta and _os.path.exists(self.source_fasta)
        )

    @property
    def kmer_table(self):
        """Cached k-mer sidecar table (``core.kmers`` parquet contract),
        built on first access from stored sequences or the source FASTA."""
        if self._kmer_table is None:
            from .kmers import kmer_table_for_index

            self._kmer_table = kmer_table_for_index(self)
        return self._kmer_table

    def md5_for(self, i: int) -> str:
        """Sourmash md5 of signature ``i``, computed once per index and
        persisted in ``.ksx`` metadata (the reference keeps md5s in its
        sig.zip manifest; recomputing per search row is O(total mins)
        Python at proteome scale)."""
        if self._md5s is None:
            self._md5s = [None] * len(self)
        if self._md5s[i] is None:
            self._md5s[i] = self.signature(i).md5sum
        return self._md5s[i]

    @property
    def md5_array(self) -> np.ndarray:
        """All signature md5s as an object array (fancy-indexable).
        Materializes every md5 on first touch; per-row emission then
        indexes directly instead of looping Python per unique id."""
        if self._md5_array is None:
            self._md5_array = np.array(
                [self.md5_for(i) for i in range(len(self))], object
            )
        return self._md5_array

    @property
    def names_array(self) -> np.ndarray:
        """Signature names as an object array (fancy-indexable)."""
        if self._names_array is None:
            self._names_array = np.array(self.names, object)
        return self._names_array

    @property
    def name_ranks(self) -> np.ndarray:
        """Dense lexicographic rank of each signature's name (equal
        names share a rank). Search result emission sorts rows by
        (query_name, match_name); ranking once per index turns that
        per-block string lexsort into an integer lexsort (measured
        46 ms -> ~4 ms per 10^5-row block at 20k targets)."""
        if self._name_ranks is None:
            arr = np.asarray(self.names)
            order = np.argsort(arr, kind="stable")
            snames = arr[order]
            dense = np.cumsum(
                np.concatenate([[0], (snames[1:] != snames[:-1]).astype(np.int64)])
            ) if len(snames) else np.zeros(0, np.int64)
            ranks = np.empty(len(arr), np.int64)
            ranks[order] = dense
            self._name_ranks = ranks
        return self._name_ranks

    @property
    def inverted(self):
        """Globally sorted posting arrays for the inverted search engine.

        Built once per index and cached; ``save``/``load`` persist it so
        a loaded ``.ksx`` never re-sorts — the build-once revindex
        semantics of branchwater's ``do_index``
        (/root/reference/src/python/kmerseek/index.py:55-74).

        Engine dispatch (``ops.inverted.build_inverted``): corpus-scale
        posting counts sort ON DEVICE (``lax.sort`` + device-resident
        packed postings — the host argsort build is fault/sort-bound at
        ~10^7+ postings); small corpora keep the host argsort.
        ``KMERSEEK_INVERTED_BUILD`` ∈ {auto, host, device} overrides."""
        if self._inverted is None:
            from ..ops.inverted import build_inverted

            self._inverted = build_inverted(
                self.mins, self.abundances, self.offsets
            )
        return self._inverted

    def dense_device_arrays(self, pad_multiple: int = 128):
        """Padded (T, S) device arrays for the search kernels.

        Returns (hi, lo, abund, counts) with S = max sketch size rounded
        to a lane multiple; padding rows hold u64::MAX sentinels so they
        never match a real hash during searchsorted probing."""
        import jax.numpy as jnp

        T = len(self)
        counts = self.counts
        S = int(counts.max(initial=1))
        S = max(((S + pad_multiple - 1) // pad_multiple) * pad_multiple, pad_multiple)
        hi = np.full((T, S), 0xFFFFFFFF, np.uint32)
        lo = np.full((T, S), 0xFFFFFFFF, np.uint32)
        ab = np.zeros((T, S), np.int32)
        # vectorized ragged→dense: flat destination index per source element
        rows = np.repeat(np.arange(T), counts)
        cols = np.arange(len(self.mins)) - np.repeat(self.offsets[:-1], counts)
        h_all, l_all = u64.split_np(self.mins)
        hi[rows, cols] = h_all
        lo[rows, cols] = l_all
        ab[rows, cols] = self.abundances
        return (
            jnp.asarray(hi),
            jnp.asarray(lo),
            jnp.asarray(ab),
            jnp.asarray(counts.astype(np.int32)),
        )

    # ------------------------------------------------------------------
    # equivalence oracle (index.rs:524-625 parity)
    # ------------------------------------------------------------------

    def is_equivalent_to(self, other: "ProteomeIndex") -> bool:
        if (
            self.config != other.config
            or len(self) != len(other)
            or sorted(self.names) != sorted(other.names)
        ):
            return False
        order_a = np.argsort(np.asarray(self.names))
        order_b = np.argsort(np.asarray(other.names))
        for ia, ib in zip(order_a, order_b):
            sa, sb = self.signature(int(ia)), other.signature(int(ib))
            if not (
                np.array_equal(sa.mins, sb.mins)
                and np.array_equal(sa.abundances, sb.abundances)
            ):
                return False
        ca, cb = self.combined, other.combined
        if not (np.array_equal(ca[0], cb[0]) and np.array_equal(ca[1], cb[1])):
            return False
        # sequence clause: the k-mer sidecar derives deterministically
        # from (sequences, config) and config equality is established
        # above, so byte-equal name-aligned sequences imply equal
        # sidecars without materializing them
        if self.sequences is not None and other.sequences is not None:
            for ia, ib in zip(order_a, order_b):
                if self.sequences[int(ia)] != other.sequences[int(ib)]:
                    return False
        # kmer-sidecar clause (index.rs:562-605: per-hash ksize/hashval/
        # encoded-kmer/positions): compare whenever both sides have a
        # table or can derive one — not only when a caller happened to
        # pre-materialize both (round-2 verdict weak #8). A side that
        # can't produce a table (no sequences, no source FASTA) keeps
        # the old both-materialized behavior.
        ta, tb = self._kmer_table, other._kmer_table
        if ta is None and tb is not None and self._kmer_table_derivable():
            ta = self.kmer_table
        if tb is None and ta is not None and other._kmer_table_derivable():
            tb = other.kmer_table
        if ta is not None and tb is not None:
            cols = ["sequence_name", "kmer", "hashval", "encoded", "start"]
            sa = ta.select(cols).to_pandas().sort_values(cols).reset_index(drop=True)
            sb = tb.select(cols).to_pandas().sort_values(cols).reset_index(drop=True)
            if not sa.equals(sb):
                return False
        return True

    # ------------------------------------------------------------------
    # persistence (replaces save_state/load_state, index.rs:227-426)
    # ------------------------------------------------------------------

    def save(self, path: str) -> str:
        import time

        t_total = time.perf_counter()
        timings: dict = {}
        os.makedirs(path, exist_ok=True)

        # persist the inverted posting arrays (search index) so loads
        # skip the global argsort — branchwater do_index parity. Big
        # arrays go as individual raw .npy members (format 2): loads
        # mmap them, so a fresh process answers from the page cache
        # instead of eagerly copying ~1.6 GB (DESIGN.md §6.10).
        #
        # Fully overlapped pipeline (decomposition recorded below; the
        # r4 save was 51 s of strictly serial steps):
        #   1. CSR member writes start immediately (3-thread pool —
        #      file I/O releases the GIL);
        #   2. the inverted host columns derive meanwhile (for a
        #      device-built index: tunnel-free host radix argsort of
        #      the CSR source, bit-equal to the device order — the
        #      packed-row download it replaces cost 20-90 s per save
        #      depending on tunnel weather);
        #   3. the inverted members then write while the main thread
        #      computes checksums + the per-signature md5 metadata
        #      (~14 s of GIL-bound string work at 50M postings).
        def _write(item):
            # temp + os.replace: atomic, and re-saving a LOADED index
            # into its own directory never truncates the inode backing
            # a live memmap (np.save's "wb" on the final name would —
            # SIGBUS under the mapping; the old inode stays alive until
            # the mapping drops). Code-review r5.
            name, arr = item
            t1 = time.perf_counter()
            fp = os.path.join(path, f"{name}.npy")
            tmp = f"{fp}.tmp-{os.getpid()}"
            with open(tmp, "wb") as f:  # np.save on a PATH appends .npy
                np.save(f, np.ascontiguousarray(arr))
            os.replace(tmp, fp)
            return name, {
                "bytes": os.path.getsize(fp),
                "len": int(len(arr)),
                "dtype": str(np.asarray(arr).dtype),
            }, time.perf_counter() - t1

        from concurrent.futures import ThreadPoolExecutor

        manifest_files: dict = {}
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=3) as pool:
            csr = {
                "mins": self.mins,
                "abundances": self.abundances,
                "offsets": self.offsets,
            }
            futures = [pool.submit(_write, it) for it in csr.items()]

            t1 = time.perf_counter()
            inv = self.inverted.with_buckets()
            if hasattr(inv, "ensure_host_from_source"):
                inv.ensure_host_from_source(
                    self.mins, self.abundances, self.offsets
                )
            inv_members = {
                "inv_g_hi": inv.g_hi,
                "inv_g_lo": inv.g_lo,
                "inv_tid": inv.tid,
                "inv_ab": inv.ab,
                "inv_bucket_starts": inv.bucket_starts,
            }
            timings["inv_materialize_s"] = time.perf_counter() - t1
            futures += [pool.submit(_write, it) for it in inv_members.items()]

            # content checksums, computed while the arrays are hot: the
            # full-content load verify (KMERSEEK_LOAD_VERIFY=full)
            # compares against these; the default load verifies sizes +
            # shapes only (mmap keeps the open O(1)). Postings are a
            # permutation of mins by construction, so one sum covers
            # both sides of the legacy arrays-vs-inverted guard.
            t1 = time.perf_counter()
            sums = {
                "mins": int(self.mins.sum(dtype=np.uint64)),
                "abundances": int(self.abundances.sum(dtype=np.int64)),
                "inv_g64": int(inv.g64().sum(dtype=np.uint64)),
                "inv_ab": int(inv.ab.sum(dtype=np.int64)),
            }
            timings["checksums_s"] = time.perf_counter() - t1

            t1 = time.perf_counter()
            meta = {
                "format_version": INDEX_FORMAT_VERSION,
                "ksize": self.config.ksize,
                "scaled": self.config.scaled,
                "moltype": self.config.moltype,
                "n_signatures": len(self),
                "source_fasta": self.source_fasta,
                "names": self.names,
                "has_sequences": self.sequences is not None,
                "md5s": [self.md5_for(i) for i in range(len(self))],
            }
            with open(os.path.join(path, "metadata.json"), "w") as f:
                json.dump(meta, f)
            timings["md5_metadata_s"] = time.perf_counter() - t1

            for fut in futures:
                name, rec, dt = fut.result()
                manifest_files[name] = rec
                timings.setdefault("member_write_s", {})[name] = round(dt, 3)
        timings["members_total_s"] = time.perf_counter() - t0
        manifest = {
            "inverted_shape": [
                int(inv.n_targets),
                int(inv.max_run),
                int(inv.max_span),
                int(inv.bucket_shift),
            ],
            "files": manifest_files,
            "sums": sums,
        }
        manifest["save_timings"] = {
            k: (v if isinstance(v, dict) else round(v, 3))
            for k, v in timings.items()
        }
        self._last_save_timings = manifest["save_timings"]
        # manifest lands LAST (atomic rename): a crashed half-save
        # leaves no manifest → the legacy/absent branch, never a
        # manifest describing files that were not fully written
        mtmp = os.path.join(path, "manifest.json.tmp")
        with open(mtmp, "w") as f:
            json.dump(manifest, f)
        os.replace(mtmp, os.path.join(path, "manifest.json"))
        # drop stale format-1 members a previous save may have left in
        # this directory (load prefers the manifest, but mixed
        # generations must not survive a re-save)
        for legacy in ("arrays.npz", "inverted.npz"):
            lp = os.path.join(path, legacy)
            if os.path.exists(lp):
                os.remove(lp)
        # learned sparse-engine hints (expansion budget E, trimmed-fetch
        # lengths): pure warm-start for a fresh process — wrong hints
        # are detected and retried, never wrong-results
        from ..ops.sparse_search import export_learned_hints

        hints = export_learned_hints(inv)
        # written unconditionally (possibly empty): re-saving a
        # different index into an existing .ksx directory must not
        # leave a previous index's hints behind to be seeded as
        # foreign budgets on the next load
        with open(os.path.join(path, "hints.json"), "w") as f:
            json.dump(hints, f)
        if self.sequences is not None:
            # sequences DO compress (protein text) — always deflate
            seq_off = np.zeros(len(self.sequences) + 1, np.int64)
            for i, s in enumerate(self.sequences):
                seq_off[i + 1] = seq_off[i] + len(s)
            np.savez_compressed(
                os.path.join(path, "sequences.npz"),
                data=np.frombuffer(b"".join(self.sequences), np.uint8),
                offsets=seq_off,
            )
        self._last_save_timings["grand_total_s"] = round(
            time.perf_counter() - t_total, 3
        )
        return path

    @classmethod
    def load(cls, path: str) -> "ProteomeIndex":
        meta_path = os.path.join(path, "metadata.json")
        if not os.path.exists(meta_path):
            from ..utils.errors import NoSavedState

            raise NoSavedState(f"no saved index at {path}")
        with open(meta_path) as f:
            meta = json.load(f)
        if meta["format_version"] > INDEX_FORMAT_VERSION:
            raise ValueError(f"index format {meta['format_version']} too new")
        sequences = None
        seq_path = os.path.join(path, "sequences.npz")
        if meta.get("has_sequences") and os.path.exists(seq_path):
            sq = np.load(seq_path)
            data, offs = sq["data"].tobytes(), sq["offsets"]
            sequences = [data[offs[i] : offs[i + 1]] for i in range(len(offs) - 1)]
        manifest_path = os.path.join(path, "manifest.json")
        if os.path.exists(manifest_path):
            return cls._load_npy(path, meta, manifest_path, sequences)
        arrays = np.load(os.path.join(path, "arrays.npz"))
        idx = cls(
            IndexConfig(meta["ksize"], meta["scaled"], meta["moltype"]),
            meta["names"],
            arrays["mins"],
            arrays["abundances"],
            arrays["offsets"],
            source_fasta=meta.get("source_fasta", ""),
            sequences=sequences,
        )
        if meta.get("md5s"):
            idx._md5s = list(meta["md5s"])
        inv_path = os.path.join(path, "inverted.npz")
        if os.path.exists(inv_path):
            from ..ops.inverted import InvertedIndex

            iz = np.load(inv_path)
            shape = [int(v) for v in iz["shape"]]
            n_targets, max_run = shape[0], shape[1]
            inv = InvertedIndex(
                iz["g_hi"], iz["g_lo"], iz["tid"], iz["ab"], n_targets, max_run
            )
            # derived-state consistency: the postings must be a
            # permutation of the CSR arrays (guards stale/truncated
            # inverted.npz next to a rewritten arrays.npz — both the
            # host join and the device cross-check read these postings,
            # so corruption here would otherwise validate against
            # itself). Order-independent O(N) sums catch length,
            # content, and pairing drift.
            ok = (
                len(inv.g_hi) == len(idx.mins)
                and n_targets == len(idx)
                and int(inv.ab.sum(dtype=np.int64))
                == int(idx.abundances.sum(dtype=np.int64))
                and int(inv.g64().sum(dtype=np.uint64))
                == int(idx.mins.sum(dtype=np.uint64))
            )
            if not ok:
                from ..utils.logging import logger

                logger.warning(
                    "persisted inverted index at %s is inconsistent with "
                    "the sketch arrays — rebuilding postings",
                    inv_path,
                )
                idx._inverted = None  # lazy rebuild from CSR arrays
                return idx
            if "bucket_starts" in iz.files and len(shape) >= 4:
                inv = inv._replace(
                    bucket_starts=iz["bucket_starts"],
                    max_span=shape[2],
                    bucket_shift=shape[3],
                )
            else:  # older .ksx without the bucket table: rebuild it (cheap)
                inv = inv.with_buckets()
            idx._inverted = inv
            hints_path = os.path.join(path, "hints.json")
            if os.path.exists(hints_path):
                from ..ops.sparse_search import seed_learned_hints

                try:
                    with open(hints_path) as f:
                        seed_learned_hints(inv, json.load(f))
                except Exception:
                    pass  # hints are advisory; a bad file is ignored
        return idx

    @classmethod
    def _load_npy(cls, path, meta, manifest_path, sequences) -> "ProteomeIndex":
        """Format-2 load: mmap the raw .npy members (O(1) open; pages
        fault in from the OS page cache on first touch — the cold-start
        serve answers its first block while most of the index is still
        on disk, DESIGN.md §6.10).

        Default integrity check is structural (on-disk byte sizes +
        lengths vs the manifest written atomically at save): catches
        truncation and mixed save generations without reading array
        content. ``KMERSEEK_LOAD_VERIFY=full`` additionally compares
        the content checksums recorded at save time (reads everything —
        the format-1 behavior)."""
        from ..ops.inverted import InvertedIndex

        with open(manifest_path) as f:
            manifest = json.load(f)
        files = manifest["files"]
        arrs = {}
        for name, rec in files.items():
            fp = os.path.join(path, f"{name}.npy")
            if not os.path.exists(fp) or os.path.getsize(fp) != rec["bytes"]:
                raise ValueError(
                    f"corrupt .ksx: {name}.npy missing or size-mismatched "
                    f"vs manifest at {path}"
                )
            arrs[name] = np.load(fp, mmap_mode="r")
            if len(arrs[name]) != rec["len"]:
                raise ValueError(
                    f"corrupt .ksx: {name}.npy length mismatch at {path}"
                )
        if (
            int(arrs["offsets"][-1]) != len(arrs["mins"])
            or len(arrs["inv_g_hi"]) != len(arrs["mins"])
            or len(arrs["offsets"]) != len(meta["names"]) + 1
        ):
            raise ValueError(f"corrupt .ksx: member shapes disagree at {path}")
        idx = cls(
            IndexConfig(meta["ksize"], meta["scaled"], meta["moltype"]),
            meta["names"],
            arrs["mins"],
            arrs["abundances"],
            arrs["offsets"],
            source_fasta=meta.get("source_fasta", ""),
            sequences=sequences,
        )
        if meta.get("md5s"):
            idx._md5s = list(meta["md5s"])
        shape = manifest["inverted_shape"]
        inv = InvertedIndex(
            arrs["inv_g_hi"],
            arrs["inv_g_lo"],
            arrs["inv_tid"],
            arrs["inv_ab"],
            shape[0],
            shape[1],
            bucket_starts=arrs["inv_bucket_starts"],
            max_span=shape[2],
            bucket_shift=shape[3],
        )
        if os.environ.get("KMERSEEK_LOAD_VERIFY") == "full":
            sums = manifest.get("sums", {})
            ok = (
                int(idx.mins.sum(dtype=np.uint64)) == sums.get("mins")
                and int(idx.abundances.sum(dtype=np.int64))
                == sums.get("abundances")
                and int(inv.g64().sum(dtype=np.uint64)) == sums.get("inv_g64")
                and int(inv.ab.sum(dtype=np.int64)) == sums.get("inv_ab")
                and sums.get("mins") == sums.get("inv_g64")
                and sums.get("abundances") == sums.get("inv_ab")
            )
            if not ok:
                from ..utils.logging import logger

                logger.warning(
                    "full verify: posting content at %s disagrees with the "
                    "manifest checksums — rebuilding postings",
                    path,
                )
                idx._inverted = None
                return idx
        idx._inverted = inv
        hints_path = os.path.join(path, "hints.json")
        if os.path.exists(hints_path):
            from ..ops.sparse_search import seed_learned_hints

            try:
                with open(hints_path) as f:
                    seed_learned_hints(inv, json.load(f))
            except Exception:
                pass  # hints are advisory; a bad file is ignored
        return idx

    # ------------------------------------------------------------------
    # sourmash interop
    # ------------------------------------------------------------------

    def to_sig_zip(self, path: str) -> str:
        from .sigzip import write_sig_zip

        return write_sig_zip(path, self.signatures())

    @classmethod
    def from_sig_zip(cls, path: str) -> "ProteomeIndex":
        from .sigzip import read_sig_zip

        return cls.from_signatures(read_sig_zip(path))

    @classmethod
    def build_with_auto_filename(
        cls, fasta: str, config: Optional["IndexConfig"] = None, **kwargs
    ) -> Tuple["ProteomeIndex", str]:
        """Build + save under the auto filename (index.rs:655-673)."""
        config = config or IndexConfig()
        idx = cls.build(fasta, config, **kwargs)
        path = generate_index_path(fasta, config.moltype, config.ksize, config.scaled)
        idx.save(path)
        return idx, path

    def print_stats(self) -> str:
        """index.rs:628-639 equivalent."""
        comb, _ = self.combined
        lines = [
            f"ProteomeIndex: {len(self)} signatures",
            f"  moltype={self.config.moltype} ksize={self.config.ksize} "
            f"scaled={self.config.scaled}",
            f"  total hashes: {len(self.mins)}",
            f"  combined minhash size: {len(comb)}",
        ]
        return "\n".join(lines)
