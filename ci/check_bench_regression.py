#!/usr/bin/env python
"""Benchmark regression gate (reference ci.yml parity: criterion job
with a 150% alert threshold, /root/reference/.github/workflows/ci.yml).

Reads the bench JSON line from stdin or a file, compares the metric
against the committed CPU baseline, and fails when throughput drops
below baseline / THRESHOLD (i.e. the run takes >150% of baseline time).
Update the baseline deliberately by editing ci/bench_baseline_cpu.json.
"""

from __future__ import annotations

import json
import pathlib
import sys

THRESHOLD = 1.5  # fail when > 150% slower than baseline


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else None
    text = pathlib.Path(src).read_text() if src else sys.stdin.read()
    line = next(
        (l for l in reversed(text.strip().splitlines()) if l.startswith("{")),
        None,
    )
    if line is None:
        print("no bench JSON line found", file=sys.stderr)
        return 2
    result = json.loads(line)
    baseline_path = pathlib.Path(__file__).parent / "bench_baseline_cpu.json"
    baseline = json.loads(baseline_path.read_text())
    value = float(result["value"])
    floor = baseline["value"] / THRESHOLD
    status = "OK" if value >= floor else "REGRESSION"
    print(
        f"{status}: {result['metric']} = {value:,.0f} {result['unit']} "
        f"(baseline {baseline['value']:,.0f}, floor {floor:,.0f})"
    )
    qps = result.get("detail", {}).get("search_queries_per_second")
    if qps is not None and "search_queries_per_second" in baseline:
        sfloor = baseline["search_queries_per_second"] / THRESHOLD
        sstat = "OK" if qps >= sfloor else "REGRESSION"
        print(f"{sstat}: search_queries_per_second = {qps:,.0f} (floor {sfloor:,.0f})")
        if qps < sfloor:
            return 1
    return 0 if value >= floor else 1


if __name__ == "__main__":
    sys.exit(main())
