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


if __name__ == "__main__":
    main()
