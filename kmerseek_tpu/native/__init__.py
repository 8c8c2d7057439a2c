"""ctypes bindings for the native C++ runtime (libkseek).

The native library provides the host-side runtime pieces that the
reference implements in Rust (needletail FASTA parsing, rayon-parallel
CPU sketching, RocksDB-free persistence helpers): see ``fastio.cc``.
Everything degrades gracefully to the pure-Python implementations when
the shared library has not been built.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Tuple

_LIB = None
_LOAD_TRIED = False


class NativeUnsupported(RuntimeError):
    """Input not handled by the native path (caller should fall back)."""


def _lib_path() -> str:
    return os.path.join(os.path.dirname(__file__), "libkseek.so")


def _load():
    global _LIB, _LOAD_TRIED
    if _LOAD_TRIED:
        return _LIB
    _LOAD_TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        _try_build()
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    _configure(lib)
    _LIB = lib
    return _LIB


def _try_build() -> None:
    """Build libkseek.so in place on first use (g++ is in the image)."""
    import subprocess

    try:
        subprocess.run(
            ["make", "-C", os.path.dirname(__file__)],
            check=True,
            capture_output=True,
            timeout=120,
        )
    except Exception:
        pass  # callers degrade to the pure-Python paths


def _configure(lib):
    lib.ks_parse_fasta.restype = ctypes.c_void_p
    lib.ks_parse_fasta.argtypes = [
        ctypes.c_char_p,
        ctypes.c_size_t,
    ]
    lib.ks_result_n_records.restype = ctypes.c_int64
    lib.ks_result_n_records.argtypes = [ctypes.c_void_p]
    lib.ks_result_error.restype = ctypes.c_char_p
    lib.ks_result_error.argtypes = [ctypes.c_void_p]
    lib.ks_result_name.restype = ctypes.c_char_p
    lib.ks_result_name.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.ks_result_seq.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.ks_result_seq.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.ks_result_seq_len.restype = ctypes.c_int64
    lib.ks_result_seq_len.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.ks_result_free.argtypes = [ctypes.c_void_p]
    lib.ks_sketch_cpu.restype = ctypes.c_int64
    lib.ks_sketch_cpu.argtypes = [
        ctypes.c_char_p,  # encoded bytes
        ctypes.c_int64,  # length
        ctypes.c_int32,  # k
        ctypes.c_uint64,  # max_hash
        ctypes.POINTER(ctypes.c_uint64),  # out hashes (capacity W)
        ctypes.POINTER(ctypes.c_uint32),  # out abundances
    ]
    lib.ks_sketch_cpu_batch.restype = ctypes.c_double
    lib.ks_sketch_cpu_batch.argtypes = [
        ctypes.c_char_p,  # concatenated encoded bytes
        ctypes.POINTER(ctypes.c_int64),  # offsets (n+1)
        ctypes.c_int64,  # n sequences
        ctypes.c_int32,  # k
        ctypes.c_uint64,  # max_hash
        ctypes.c_int32,  # n_threads
        ctypes.POINTER(ctypes.c_int64),  # out: total kmers hashed
    ]
    if hasattr(lib, "ks_argsort_u64"):  # older cached .so may lack it
        lib.ks_argsort_u64.restype = ctypes.c_int32
        lib.ks_argsort_u64.argtypes = [
            ctypes.POINTER(ctypes.c_uint64),  # keys
            ctypes.c_int64,  # n
            ctypes.POINTER(ctypes.c_int64),  # out order
            ctypes.c_int32,  # n_threads
        ]


def available() -> bool:
    return _load() is not None


def parse_fasta(path: str) -> List[Tuple[str, bytes]]:
    """Parse a FASTA file (plain or gzip) with the C++ parser."""
    lib = _load()
    if lib is None:
        raise NativeUnsupported("libkseek.so not built")
    # zstd/bz2/xz: decompress in Python, parse buffer natively
    from .. import core  # noqa: F401 — lazy to avoid cycles
    from ..core.fasta import _detect_compression, _decompress_bytes

    with open(path, "rb") as f:
        raw = f.read()
    comp = _detect_compression(raw[:8])
    data = _decompress_bytes(raw, comp)
    res = lib.ks_parse_fasta(data, len(data))
    if not res:
        raise NativeUnsupported("native parser returned null")
    try:
        err = lib.ks_result_error(res)
        if err:
            raise ValueError(f"{path}: {err.decode()}")
        n = lib.ks_result_n_records(res)
        out = []
        for i in range(n):
            name = lib.ks_result_name(res, i).decode("utf-8")
            ln = lib.ks_result_seq_len(res, i)
            ptr = lib.ks_result_seq(res, i)
            out.append((name, ctypes.string_at(ptr, ln)))
        return out
    finally:
        lib.ks_result_free(res)


def sketch_cpu(encoded: bytes, k: int, max_hash: int):
    """Single-sequence CPU sketch (sorted unique hashes + abundances)."""
    import numpy as np

    lib = _load()
    if lib is None:
        raise NativeUnsupported("libkseek.so not built")
    w = max(len(encoded) - k + 1, 0)
    if w == 0:
        return np.zeros(0, np.uint64), np.zeros(0, np.uint32)
    out_h = np.zeros(w, np.uint64)
    out_a = np.zeros(w, np.uint32)
    n = lib.ks_sketch_cpu(
        encoded,
        len(encoded),
        k,
        max_hash,
        out_h.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        out_a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
    )
    return out_h[:n], out_a[:n]


def argsort_u64(keys, n_threads=None):
    """Stable multithreaded radix argsort of a uint64 array.

    Drop-in for ``np.argsort(keys, kind="stable")`` on u64 inputs — the
    inverted posting build's dominant cost at corpus scale (four 16-bit
    LSD passes, parallel histogram + stable scatter; constant digits
    skipped). Raises :class:`NativeUnsupported` when the library is
    missing or the input exceeds the u32 index range, so callers fall
    back to numpy."""
    import numpy as np

    lib = _load()
    if lib is None or not hasattr(lib, "ks_argsort_u64"):
        raise NativeUnsupported("libkseek.so not built (or stale)")
    if n_threads is None:
        from ..utils.config import get_default_performance_config

        n_threads = get_default_performance_config().effective_thread_count
    k = np.ascontiguousarray(keys, dtype=np.uint64)
    out = np.empty(len(k), np.int64)
    rc = lib.ks_argsort_u64(
        k.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        len(k),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        int(n_threads),
    )
    if rc != 0:
        raise NativeUnsupported("input exceeds native argsort index range")
    return out


def sketch_cpu_batch_throughput(
    encoded_concat: bytes, offsets, k: int, max_hash: int, n_threads=None
):
    """Multithreaded CPU sketch of a whole corpus; returns (seconds, kmers).

    This is the measured CPU baseline standing in for the reference's
    rayon path (Rust toolchain is unavailable in this environment —
    BASELINE.md). ``n_threads`` defaults to the process-wide
    PerformanceConfig's effective thread count."""
    import numpy as np

    if n_threads is None:
        from ..utils.config import get_default_performance_config

        n_threads = get_default_performance_config().effective_thread_count

    lib = _load()
    if lib is None:
        raise NativeUnsupported("libkseek.so not built")
    offs = np.asarray(offsets, dtype=np.int64)
    total = ctypes.c_int64(0)
    secs = lib.ks_sketch_cpu_batch(
        encoded_concat,
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(offs) - 1,
        k,
        max_hash,
        n_threads,
        ctypes.byref(total),
    )
    return secs, total.value
