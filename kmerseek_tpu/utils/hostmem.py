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
