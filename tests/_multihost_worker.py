"""Worker process for the REAL 2-process ``jax.distributed`` tests.

Spawned by ``tests/test_multihost_real.py``: forms an actual process
group over localhost (Gloo-backed CPU collectives) and runs one of two
multi-host paths end to end:

* ``replica`` (default): ``build_distributed_index`` — round-robin
  shard ingest, local sketching, ``_allgather_payloads`` exchange,
  global merge — and dumps the resulting full-replica index arrays.
* ``sharded``: ``build_sharded_index`` (hash-range posting exchange —
  this process retains ONLY its range) followed by the full
  process-level ``sharded_manysearch_columns`` /
  ``sharded_multisearch_columns`` search — collectives in both build
  and search — and dumps the local shard plus the merged search
  columns for the parent to compare against single-host results.

Usage: python _multihost_worker.py <coordinator> <nprocs> <pid> <fasta>
       <out.npz> [replica|sharded <query_fasta>]
"""

import os
import sys


def main() -> None:
    coordinator, nprocs, pid, fasta, out = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
        sys.argv[4],
        sys.argv[5],
    )
    mode = sys.argv[6] if len(sys.argv) > 6 else "replica"
    import jax

    # the axon sitecustomize force-sets jax_platforms at interpreter
    # start; a CPU intent must be enforced through jax.config
    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from kmerseek_tpu.core.index import IndexConfig
    from kmerseek_tpu.parallel.multihost import initialize_distributed

    pidx, pcount = initialize_distributed(
        coordinator_address=coordinator, num_processes=nprocs, process_id=pid
    )
    assert (pidx, pcount) == (pid, nprocs), (pidx, pcount)

    if mode == "replica":
        from kmerseek_tpu.parallel.multihost import build_distributed_index

        idx = build_distributed_index(fasta, IndexConfig(16, 5, "hp"))
        np.savez(
            out,
            mins=idx.mins,
            abundances=idx.abundances,
            offsets=idx.offsets,
            # fixed-width unicode dtype — loads without pickle
            names=np.asarray(idx.names, dtype=np.str_),
        )
        return

    if mode in ("sharded_scale_build", "sharded_scale_load"):
        _sharded_scale(pid, nprocs, out, mode, save_path=sys.argv[7])
        return

    assert mode == "sharded", mode
    query_fasta = sys.argv[7]
    from kmerseek_tpu.core.index import ProteomeIndex
    from kmerseek_tpu.parallel.sharded import (
        build_sharded_index,
        sharded_manysearch_columns,
        sharded_multisearch_columns,
    )

    cfg = IndexConfig(16, 5, "hp")
    sharded = build_sharded_index(fasta, cfg)
    # queries are replicated: each process sketches the query FASTA
    query = ProteomeIndex.build(query_fasta, cfg)
    many = sharded_manysearch_columns(query, sharded)
    multi = sharded_multisearch_columns(query, sharded)

    payload = {
        "shard": np.asarray([sharded.shard, sharded.n_shards]),
        "local_g": sharded.local.g64(),
        "local_tid": sharded.local.tid,
        "local_ab": sharded.local.ab,
        "t_sizes": sharded.t_sizes,
        "t_weight": sharded.t_weight,
        "names": np.asarray(sharded.names, dtype=np.str_),
        "md5s": np.asarray(sharded.md5s, dtype=np.str_),
    }
    for k, v in many.items():
        payload[f"many_{k}"] = (
            np.asarray(v)
            if isinstance(v, np.ndarray)
            else np.asarray(v, dtype=np.str_ if v and isinstance(v[0], str) else None)
        )
    for k, v in multi.items():
        payload[f"multi_{k}"] = (
            np.asarray(v)
            if isinstance(v, np.ndarray)
            else np.asarray(v, dtype=np.str_ if v and isinstance(v[0], str) else None)
        )
    np.savez(out, **payload)


def _sharded_scale(pid, nprocs, out, mode, save_path):
    """~10^5-target REAL-group run (VERDICT r4 asks #3 + #8).

    ``sharded_scale_build``: regenerate the seeded synthetic corpus,
    run the real range-restricted posting exchange (this process
    retains only its hash range), SAVE the shard, search.
    ``sharded_scale_load``: a FRESH process group reloads its shard
    from disk — no sketching, no exchange — and reproduces the merged
    search. Both dump the merged manysearch columns + residency +
    peak-RSS facts for the parent to compare bit-for-bit against the
    single-host engine."""
    import resource
    import time

    import numpy as np

    from kmerseek_tpu.core.index import IndexConfig
    from kmerseek_tpu.parallel.multihost import _allgather_payloads
    from kmerseek_tpu.parallel.sharded import (
        ShardedProteomeIndex,
        build_local_inverted,
        load_sharded_index,
        merge_target_meta,
        occupied_span,
        pack_range_postings,
        pack_target_meta,
        sharded_manysearch_columns,
    )

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _synth import synth_indexes, synth_query_index

    cfg = IndexConfig(16, 5, "hp")
    t_build = time.perf_counter()
    if mode == "sharded_scale_build":
        target, query = synth_indexes()
        sigs = target.signatures()
        ordinals = list(range(pid, len(sigs), nprocs))
        my_sigs = [sigs[i] for i in ordinals]
        names, sizes, weights, md5s = merge_target_meta(
            _allgather_payloads(pack_target_meta(ordinals, my_sigs))
        )
        span = occupied_span(cfg.scaled)
        local = None
        for d in range(nprocs):
            payloads = _allgather_payloads(
                pack_range_postings(ordinals, my_sigs, d, nprocs, span)
            )
            if d == pid:
                local = build_local_inverted(payloads, len(names))
        sharded = ShardedProteomeIndex(
            cfg, names, sizes, weights, md5s, local, pid, nprocs
        )
        build_s = time.perf_counter() - t_build
        t0 = time.perf_counter()
        sharded.save(save_path)
        save_s = time.perf_counter() - t0
        load_s = 0.0
    else:
        # query block only (replicated) — a load-only restart must not
        # pay the 120k-target corpus construction (code-review r5)
        query = synth_query_index()
        t0 = time.perf_counter()
        sharded = load_sharded_index(save_path, pid, nprocs)
        load_s = time.perf_counter() - t0
        build_s = save_s = 0.0

    t0 = time.perf_counter()
    many = sharded_manysearch_columns(query, sharded)
    search_s = time.perf_counter() - t0

    payload = {
        "shard": np.asarray([sharded.shard, sharded.n_shards]),
        "local_postings": np.asarray([sharded.n_local_postings]),
        "local_bytes": np.asarray(
            [
                sum(
                    np.asarray(a).nbytes
                    for a in (
                        sharded.local.g_hi,
                        sharded.local.g_lo,
                        sharded.local.tid,
                        sharded.local.ab,
                    )
                )
            ]
        ),
        "maxrss_kb": np.asarray(
            [resource.getrusage(resource.RUSAGE_SELF).ru_maxrss]
        ),
        "timers": np.asarray([build_s, save_s, load_s, search_s]),
        "local_g_min": np.asarray(
            [int(sharded.local.g64().min()) if sharded.n_local_postings else 0]
        ),
        "local_g_max": np.asarray(
            [int(sharded.local.g64().max()) if sharded.n_local_postings else 0]
        ),
    }
    for k, v in many.items():
        payload[f"many_{k}"] = (
            np.asarray(v)
            if isinstance(v, np.ndarray)
            else np.asarray(v, dtype=np.str_ if v and isinstance(v[0], str) else None)
        )
    np.savez(out, **payload)


if __name__ == "__main__":
    main()
