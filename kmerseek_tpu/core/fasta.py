"""FASTA ingest with transparent compression and batch packing.

TPU-native equivalent of the reference's needletail + niffler stack
(/root/reference/src/rust/index.rs:907-961, io.rs:54-126): streaming
records, gzip/zstd/bzip2/xz auto-detection by magic bytes, ``"-"`` for
stdin, record id = the full header after ``>``.

The hot parsing path is optionally served by the native C++ extension
(``kmerseek_tpu.native``); this module provides the always-available
Python implementation plus the device batch packer that converts ragged
records into padded ``(B, L)`` uint8 arrays for the sketch kernels.
"""

from __future__ import annotations

import bz2
import gzip
import io
import lzma
import sys
from dataclasses import dataclass
from typing import Iterator, List, Sequence, Tuple

import numpy as np

_MAGICS = (
    (b"\x1f\x8b", "gzip"),
    (b"\x28\xb5\x2f\xfd", "zstd"),
    (b"BZh", "bzip2"),
    (b"\xfd7zXZ\x00", "xz"),
)


@dataclass
class FastaRecord:
    name: str  # full header after '>'
    seq: bytes


def _detect_compression(head: bytes) -> str:
    for magic, name in _MAGICS:
        if head.startswith(magic):
            return name
    return "plain"


def open_maybe_compressed(path: str) -> io.BufferedReader:
    """Open ``path`` with compression auto-detect (io.rs:54-59 parity).

    ``"-"`` reads stdin (io.rs:74-76)."""
    if path == "-":
        raw = sys.stdin.buffer.read()
        comp = _detect_compression(raw[:8])
        data = _decompress_bytes(raw, comp)
        return io.BufferedReader(io.BytesIO(data))
    with open(path, "rb") as f:
        head = f.read(8)
    comp = _detect_compression(head)
    if comp == "plain":
        return open(path, "rb")
    if comp == "gzip":
        return io.BufferedReader(gzip.open(path, "rb"))
    if comp == "bzip2":
        return io.BufferedReader(bz2.open(path, "rb"))
    if comp == "xz":
        return io.BufferedReader(lzma.open(path, "rb"))
    if comp == "zstd":
        import zstandard

        with open(path, "rb") as f:
            data = zstandard.ZstdDecompressor().decompress(
                f.read(), max_output_size=1 << 34
            )
        return io.BufferedReader(io.BytesIO(data))
    raise ValueError(f"unknown compression for {path}")


def _decompress_bytes(raw: bytes, comp: str) -> bytes:
    if comp == "plain":
        return raw
    if comp == "gzip":
        return gzip.decompress(raw)
    if comp == "bzip2":
        return bz2.decompress(raw)
    if comp == "xz":
        return lzma.decompress(raw)
    if comp == "zstd":
        import zstandard

        return zstandard.ZstdDecompressor().decompress(raw, max_output_size=1 << 34)
    raise ValueError(comp)


def iter_fasta(path: str) -> Iterator[FastaRecord]:
    """Stream records; multi-line sequences are concatenated."""
    native = _try_native(path)
    if native is not None:
        yield from native
        return
    name = None
    chunks: List[bytes] = []
    with open_maybe_compressed(path) as f:
        for raw_line in f:
            line = raw_line.rstrip(b"\r\n")
            if line.startswith(b">"):
                if name is not None:
                    yield FastaRecord(name, b"".join(chunks))
                name = line[1:].decode("utf-8")
                chunks = []
            elif line:
                if name is None:
                    raise ValueError(f"{path}: sequence data before first header")
                chunks.append(line)
    if name is not None:
        yield FastaRecord(name, b"".join(chunks))


def _try_native(path: str):
    """Use the C++ parser when available (plain/gzip files on disk)."""
    if path == "-":
        return None
    try:
        from kmerseek_tpu import native
    except Exception:
        return None
    if not native.available():
        return None
    try:
        parsed = native.parse_fasta(path)
    except native.NativeUnsupported:
        return None
    return (FastaRecord(n, s) for n, s in parsed)


def read_fasta(path: str) -> List[FastaRecord]:
    records = list(iter_fasta(path))
    if not records:
        raise ValueError(f"{path}: no FASTA records found")
    return records


def pack_batch(
    seqs: Sequence[bytes], pad_to_multiple: int = 128, min_len: int = 128
) -> Tuple[np.ndarray, np.ndarray]:
    """Ragged byte records → padded (B, L) uint8 + (B,) int32 lengths.

    L is rounded up to a lane multiple so downstream window tensors tile
    cleanly on the VPU (8x128 lanes).
    """
    B = len(seqs)
    L = max([len(s) for s in seqs] + [min_len])
    L = ((L + pad_to_multiple - 1) // pad_to_multiple) * pad_to_multiple
    arr = np.zeros((B, L), dtype=np.uint8)
    lens = np.zeros((B,), dtype=np.int32)
    for i, s in enumerate(seqs):
        arr[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
        lens[i] = len(s)
    return arr, lens


LENGTH_GRID = (256, 512, 1024, 2048, 4096, 8192, 16384, 32768, 65536)
ROW_GRID = (8, 32, 128, 512, 1024)


def _grid_up(value: int, grid) -> int:
    for g in grid:
        if value <= g:
            return g
    return grid[-1] * ((value + grid[-1] - 1) // grid[-1])


def pack_fixed_grid(seqs: Sequence[bytes], min_len: int = 256):
    """Pack records into padded batches with shapes from a fixed grid.

    Free-form shapes would force an XLA recompile for every ingest
    batch; snapping (rows, length) to a small grid bounds the number of
    distinct compiled programs over an entire corpus. Rows are padded
    with empty sequences (length 0 → zero windows). Returns a list of
    ``(arr, lens, record_indices)``.
    """
    buckets: dict = {}
    for i, s in enumerate(seqs):
        L = _grid_up(max(len(s), min_len), LENGTH_GRID)
        buckets.setdefault(L, []).append(i)
    out = []
    for L, idxs in sorted(buckets.items()):
        rows = _grid_up(len(idxs), ROW_GRID)
        arr = np.zeros((rows, L), dtype=np.uint8)
        lens = np.zeros((rows,), dtype=np.int32)
        for r, i in enumerate(idxs):
            s = seqs[i]
            arr[r, : len(s)] = np.frombuffer(s, dtype=np.uint8)
            lens[r] = len(s)
        out.append((arr, lens, idxs))
    return out


def iter_record_batches(
    path: str, batch_size: int = 1000
) -> Iterator[List[FastaRecord]]:
    """Bounded batches for streaming ingest (index.rs:927-947 parity;
    default batch 1000 like PerformanceConfig, config.rs:26-57)."""
    batch: List[FastaRecord] = []
    for rec in iter_fasta(path):
        batch.append(rec)
        if len(batch) >= batch_size:
            yield batch
            batch = []
    if batch:
        yield batch


def prefetch(iterable, depth: int = 2):
    """Background-thread prefetch: overlap host-side FASTA reading /
    decompression with device compute (the async double-buffered ingest
    of SURVEY §2.6 — the reference overlaps via rayon worker threads,
    index.rs:924-1005). ``depth`` bounds the queue so a slow consumer
    never buffers the whole corpus. Exceptions in the producer re-raise
    in the consumer."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()
    stop = threading.Event()  # consumer abandoned: unblock + exit producer

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for item in iterable:
                if not _put(item):
                    return  # consumer gone — release the source promptly
            _put(_END)
        except BaseException as e:  # re-raised on the consumer side
            _put(e)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        # GeneratorExit / consumer exception: stop the producer so the
        # thread (and its open file handle) doesn't leak
        stop.set()


def length_buckets(
    lengths: Sequence[int], bucket_edges: Sequence[int] = (256, 512, 1024, 2048, 4096, 8192, 16384, 40960)
) -> List[List[int]]:
    """Group record indices by length bucket to bound padding waste."""
    buckets: dict = {}
    for i, ln in enumerate(lengths):
        for edge in bucket_edges:
            if ln <= edge:
                buckets.setdefault(edge, []).append(i)
                break
        else:
            buckets.setdefault("xl", []).append(i)
    return [buckets[k] for k in sorted(buckets, key=lambda x: (isinstance(x, str), x))]
