"""Metrics & timing — reference parity for src/rust/metrics.rs.

`IndexMetrics` (metrics.rs:7-69), atomic-style `MetricsCollector`
(metrics.rs:72-140), `PerformanceTimer` (metrics.rs:149-172), and a
`time_operation` context manager standing in for the `time_operation!`
macro (metrics.rs:175-183). The derived `kmers_per_second` /
`signatures_per_second` rates (metrics.rs:53-68) are the reference's
own throughput metrics and match bench.py's headline metric.

Additionally `device_profile` wraps ``jax.profiler`` traces — the TPU
replacement for the reference's wall-clock-only instrumentation
(SURVEY.md §5.1).
"""

from __future__ import annotations

import contextlib
import threading
import time
from dataclasses import dataclass
from typing import Dict, Optional


@dataclass
class IndexMetrics:
    signatures_processed: int = 0
    kmers_processed: int = 0
    processing_time_secs: float = 0.0
    cache_hits: int = 0
    cache_misses: int = 0

    @property
    def kmers_per_second(self) -> float:
        if self.processing_time_secs <= 0:
            return 0.0
        return self.kmers_processed / self.processing_time_secs

    @property
    def signatures_per_second(self) -> float:
        if self.processing_time_secs <= 0:
            return 0.0
        return self.signatures_processed / self.processing_time_secs

    @property
    def cache_hit_rate(self) -> float:
        total = self.cache_hits + self.cache_misses
        return self.cache_hits / total if total else 0.0


class MetricsCollector:
    """Thread-safe counter collector (metrics.rs:72-140)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._metrics = IndexMetrics()
        self._t0 = time.perf_counter()

    def record_signatures(self, n: int = 1) -> None:
        with self._lock:
            self._metrics.signatures_processed += n

    def record_kmers(self, n: int) -> None:
        with self._lock:
            self._metrics.kmers_processed += n

    def record_cache(self, hit: bool) -> None:
        with self._lock:
            if hit:
                self._metrics.cache_hits += 1
            else:
                self._metrics.cache_misses += 1

    def snapshot(self) -> IndexMetrics:
        with self._lock:
            m = IndexMetrics(**vars(self._metrics))
            m.processing_time_secs = time.perf_counter() - self._t0
            return m


class PerformanceTimer:
    """Named wall timer (metrics.rs:149-172)."""

    def __init__(self, name: str):
        self.name = name
        self._start = time.perf_counter()

    def elapsed(self) -> float:
        return time.perf_counter() - self._start

    def report(self) -> str:
        return f"{self.name}: {self.elapsed() * 1e3:.2f} ms"


@contextlib.contextmanager
def time_operation(name: str, sink: Optional[Dict[str, float]] = None):
    """`time_operation!` macro equivalent (metrics.rs:175-183)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        if sink is not None:
            sink[name] = sink.get(name, 0.0) + dt


@contextlib.contextmanager
def device_profile(trace_dir: Optional[str]):
    """jax.profiler trace scope; no-op when trace_dir is None."""
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
