"""Host allocator tuning for corpus-scale numpy work.

This VM class faults fresh anonymous pages at ~100 MB/s (measured:
a first-touch 400 MB numpy copy takes 4-40 s; the same op on reused
arena pages runs at >4 GB/s). glibc serves every allocation above the
mmap threshold (128 KB default) with a fresh mmap and munmaps it on
free, so EVERY corpus-sized numpy temporary repays the fault cost —
at 50M postings the inverted-index build spent ~90% of its 295 s in
page faults, not arithmetic.

``tune_host_allocator`` raises the malloc mmap/trim thresholds via
``mallopt`` so large buffers are served from the retained brk heap:
the first corpus-sized pass still faults its pages once, but every
temporary after that reuses them at memory speed (measured: the same
build drops to ~35 s). Trade-off: the process keeps its peak
temp-arena RSS until exit — correct for benches, index builds, and
services (which hold the index anyway); call sites that prefer a
small RSS simply don't opt in.
"""

from __future__ import annotations

import ctypes
import sys

# glibc mallopt parameter ids (malloc.h)
_M_TRIM_THRESHOLD = -1
_M_TOP_PAD = -2
_M_MMAP_THRESHOLD = -3

_tuned = False
_prefaulted = 0


def prefault_arena(n_bytes: int, threads: int | None = None) -> bool:
    """Fault ``n_bytes`` of heap pages with parallel threads, then hand
    the buffer back to the (retained) arena.

    First-touch page faults on this VM run ~8 MB/s/thread but scale
    with threads (measured: 800 MB faulted serially in 103 s, in 14.6 s
    with 4 threads — ``fill`` releases the GIL). Corpus-scale numpy
    pipelines otherwise pay that serial fault cost inline, allocation
    by allocation; pre-faulting the working-set once in parallel and
    letting ``tune_host_allocator``'s retained arena recycle the warm
    pages cuts the inverted-index build's cold-start dominance.

    Keeps a high-water mark: repeated calls only fault the delta. The
    faulted pages stay in the process RSS until exit — callers size
    ``n_bytes`` to their actual temporary working set."""
    global _prefaulted
    if n_bytes <= _prefaulted or not tune_host_allocator():
        return False
    import os
    import threading
    import time

    import numpy as np

    # The VM's fault rate swings more than 10x minute to minute (noisy
    # neighbor phases): probe it on 32 MB first and skip the prefault
    # when faults are currently cheap — the parallel touch only pays
    # for itself in the slow phases. The probe runs fresh every call:
    # only corpus-scale builds reach here (callers gate on size), the
    # 32 MB fill costs at most a few seconds even in a slow phase, and
    # a memoized 'fast' verdict carried into a slow phase would skip a
    # prefault worth minutes.
    probe = np.empty(32 << 20, np.uint8)
    t0 = time.perf_counter()
    probe.fill(1)
    rate = (32 << 20) / max(time.perf_counter() - t0, 1e-9)
    del probe
    if rate > 400e6:  # > 400 MB/s 1-thread: inline faults are fine
        return False

    want = int(n_bytes)
    try:
        buf = np.empty(want, np.uint8)
    except MemoryError:
        return False
    n = max(min((os.cpu_count() or 1), 16), 1)
    step = (want + n - 1) // n

    def touch(lo: int) -> None:
        buf[lo : lo + step].fill(1)

    ts = [threading.Thread(target=touch, args=(i * step,)) for i in range(n)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    del buf  # back to the retained arena, pages stay faulted
    _prefaulted = max(_prefaulted, want)
    return True


def tune_host_allocator() -> bool:
    """Raise glibc's malloc mmap/trim thresholds (idempotent).

    Returns True when the thresholds were (already) applied, False on
    non-glibc platforms — failure is harmless, everything still runs,
    just with per-allocation page-fault cost."""
    global _tuned
    if _tuned:
        return True
    if not sys.platform.startswith("linux"):
        return False
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        ok = 1
        # big allocations from the retained heap, never trimmed back
        ok &= libc.mallopt(_M_MMAP_THRESHOLD, 2**31 - 1)
        ok &= libc.mallopt(_M_TRIM_THRESHOLD, 2**31 - 1)
        # grow the heap in 256 MB steps: fewer brk calls at corpus scale
        ok &= libc.mallopt(_M_TOP_PAD, 256 * 1024 * 1024)
        _tuned = bool(ok)
        return _tuned
    except Exception:
        return False
