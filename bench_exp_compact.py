#!/usr/bin/env python
"""One-shot on-chip experiment: presort_compact off vs on.

Decides ROADMAP #3's open question — does compacting survivors to the
capacity width before the 2-key sort (shrinking the sort ~scaled x) beat
the full-width sentinel sort on the real chip? Bit-equality of the two
paths is already pinned by tests/test_sketch.py; this measures only.

Run:  timeout -k 10 900 python bench_exp_compact.py
Prints one JSON line with both rates.
"""

import json
import sys
import time

import bench


def main():
    deadline = time.monotonic() + 840
    backoff = iter((30, 45, 60, 90, 120, 120, 150))
    while True:
        if bench._device_healthy(deadline_s=75):
            break
        wait = next(backoff, 180)
        if time.monotonic() + wait + 240 >= deadline:
            print(json.dumps({"ok": False, "reason": "accelerator unhealthy"}))
            return
        print(f"probe failed; retry in {wait}s", file=sys.stderr)
        time.sleep(wait)

    from kmerseek_tpu.utils.device import enable_compilation_cache

    enable_compilation_cache()
    seqs = bench.load_corpus()
    buckets = bench.pack_buckets(seqs)
    out = {"ok": True}
    # interleave measurements to cancel slow drift of the tunnel
    rates = {"off": [], "on": []}
    for rep in range(2):
        for tag, flag in (("off", False), ("on", True)):
            rate, total = bench.tpu_throughput(
                buckets, iters=10, presort_compact=flag
            )
            rates[tag].append(rate)
            print(f"rep{rep} {tag}: {rate/1e6:.1f} M kmers/s", file=sys.stderr)
    out["off_best"] = max(rates["off"])
    out["on_best"] = max(rates["on"])
    out["speedup_on_vs_off"] = out["on_best"] / out["off_best"]
    out["corpus_kmers"] = total
    import jax

    out["backend"] = jax.default_backend()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
