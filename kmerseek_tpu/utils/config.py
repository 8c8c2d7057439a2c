"""Performance / memory configuration — reference parity for config.rs.

`PerformanceConfig` (config.rs:26-57), `MemoryConfig` (config.rs:38-68),
`effective_thread_count` (config.rs:139-143), and fluent builders
(config.rs:151-216). Unlike the reference — where these structs were
declared but largely unwired (SURVEY.md §2.3 #13) — the TPU build
consumes them through the process-wide default
(`set_default_performance_config`): `batch_size`/`progress_interval`
feed `ProteomeIndex.build`'s ingest loop, `host_threads` is the native
CPU sketcher's thread default (`native.sketch_cpu_batch_throughput`),
and `vmem_budget_bytes` bounds the Pallas kernel's block picker
(`ops.sketch_pallas._pick_block_rows`).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, replace


@dataclass(frozen=True)
class PerformanceConfig:
    host_threads: int = 0  # 0 = all cores (effective_thread_count)
    batch_size: int = 1000  # sequences per ingest batch (config.rs default)
    enable_metrics: bool = False
    progress_interval: int = 1000
    vmem_budget_bytes: int = 12 * 1024 * 1024

    @property
    def effective_thread_count(self) -> int:
        return self.host_threads if self.host_threads > 0 else (os.cpu_count() or 1)

    def validate(self) -> "PerformanceConfig":
        if self.batch_size <= 0:
            raise ValueError(f"batch_size must be positive, got {self.batch_size}")
        if self.progress_interval < 0:
            raise ValueError("progress_interval must be >= 0")
        return self


@dataclass(frozen=True)
class MemoryConfig:
    max_memory_mb: int = 0  # 0 = unlimited
    enable_monitoring: bool = False
    kmer_cache_size: int = 10000

    def validate(self) -> "MemoryConfig":
        if self.max_memory_mb < 0 or self.kmer_cache_size < 0:
            raise ValueError("memory limits must be non-negative")
        return self


# process-wide default consumed by ingest, the native sketcher, and the
# Pallas block picker; replace it with set_default_performance_config
_default_perf = PerformanceConfig()


def get_default_performance_config() -> PerformanceConfig:
    return _default_perf


def set_default_performance_config(cfg: PerformanceConfig) -> PerformanceConfig:
    global _default_perf
    _default_perf = cfg.validate()
    return _default_perf


class PerformanceConfigBuilder:
    """Fluent builder (config.rs:151-216 style)."""

    def __init__(self) -> None:
        self._cfg = PerformanceConfig()

    def host_threads(self, n: int) -> "PerformanceConfigBuilder":
        self._cfg = replace(self._cfg, host_threads=n)
        return self

    def batch_size(self, n: int) -> "PerformanceConfigBuilder":
        self._cfg = replace(self._cfg, batch_size=n)
        return self

    def enable_metrics(self, on: bool = True) -> "PerformanceConfigBuilder":
        self._cfg = replace(self._cfg, enable_metrics=on)
        return self

    def progress_interval(self, n: int) -> "PerformanceConfigBuilder":
        self._cfg = replace(self._cfg, progress_interval=n)
        return self

    def build(self) -> PerformanceConfig:
        return self._cfg.validate()
