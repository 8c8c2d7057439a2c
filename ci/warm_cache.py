#!/usr/bin/env python
"""Rebuild the shipped pre-warmed XLA compile cache (.jax_compile_cache/).

Run on the target TPU hardware after a full bench pass has populated the
live cache (~/.cache/kmerseek_jax by default). Unlike the old `cp -u`
flow this REBUILDS the artifact directory from scratch, so entries whose
cache keys went stale (any jax/jaxlib/flag change reissues every key)
are pruned from the worktree instead of accumulating, and trivial
one-liner programs (jit_f, jit_convert_element_type, ...) that only
bloat the artifact are excluded by an allowlist of production program
name prefixes.

Provenance: a PROVENANCE.json is written next to the blobs recording the
jax/jaxlib versions, backend, and source entry list. The blobs are
serialized XLA executables keyed by (jaxlib version, backend, flags);
on any key mismatch JAX silently falls back to a normal compile, so a
stale shipped cache is dead weight but never incorrect.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

# production program shapes a cold process actually compiles; everything
# else (bench helpers, jnp one-liners) recompiles in <1s and is pruned
ALLOW_PREFIXES = (
    "jit__device_build_sorted",   # device inverted-index build
    "jit__hash_pass_jit",         # sketch hash pass
    "jit_sorted_window_hashes",   # fused sketch pipeline (per bucket shape)
    "jit_inverted_pair_stats_packed",  # dense search engine
    "jit_inverted_sparse_hits",   # sparse search engine
    "jit__sparse_finalize",       # device-side per-pair stats finalize
)


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    live = os.environ.get(
        "KMERSEEK_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "kmerseek_jax"),
    )
    dst = os.path.join(repo, ".jax_compile_cache")
    if not os.path.isdir(live):
        print(f"live cache {live} does not exist; nothing to ship", file=sys.stderr)
        return 1
    entries = sorted(
        n
        for n in os.listdir(live)
        if n.endswith("-cache") and n.startswith(ALLOW_PREFIXES)
    )
    skipped = sorted(
        n
        for n in os.listdir(live)
        if n.endswith("-cache") and not n.startswith(ALLOW_PREFIXES)
    )
    if not entries:
        print("no production entries in the live cache; leaving artifact as-is",
              file=sys.stderr)
        return 1
    tmp = dst + ".new"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    total = 0
    for n in entries:
        shutil.copy2(os.path.join(live, n), os.path.join(tmp, n))
        total += os.path.getsize(os.path.join(tmp, n))
    prov = {
        "built_unix": int(time.time()),
        "source": live,
        "entries": len(entries),
        "bytes": total,
        "pruned_trivial": len(skipped),
        "note": (
            "Serialized XLA executables for the production program shapes;"
            " keys bake in jaxlib version/backend/flags — on mismatch JAX"
            " recompiles normally. Rebuild with `make warm-cache` on the"
            " target hardware after a bench pass. Seeding into the live"
            " cache is hole-filling + atomic (utils/device.py), opt out"
            " with KMERSEEK_NO_CACHE_SEED=1."
        ),
    }
    try:
        import jax

        prov["jax"] = jax.__version__
        prov["backend"] = jax.default_backend()
    except Exception:
        pass
    with open(os.path.join(tmp, "PROVENANCE.json"), "w") as f:
        json.dump(prov, f, indent=1)
    shutil.rmtree(dst, ignore_errors=True)
    os.rename(tmp, dst)
    print(
        f"shipped {len(entries)} entries ({total >> 20} MiB), "
        f"pruned {len(skipped)} trivial"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
