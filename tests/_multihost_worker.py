"""Worker process for the REAL 2-process ``jax.distributed`` test.

Spawned by ``tests/test_multihost_real.py``: forms an actual process
group over localhost (Gloo-backed CPU collectives), runs the full
``build_distributed_index`` path — round-robin shard ingest, local
sketching, ``_allgather_payloads`` exchange, global merge — and dumps
the resulting index arrays for the parent to compare against a
single-host build.

Usage: python _multihost_worker.py <coordinator> <nprocs> <pid> <fasta> <out.npz>
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
    import jax

    # the axon sitecustomize force-sets jax_platforms at interpreter
    # start; a CPU intent must be enforced through jax.config
    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from kmerseek_tpu.core.index import IndexConfig
    from kmerseek_tpu.parallel.multihost import (
        build_distributed_index,
        initialize_distributed,
    )

    pidx, pcount = initialize_distributed(
        coordinator_address=coordinator, num_processes=nprocs, process_id=pid
    )
    assert (pidx, pcount) == (pid, nprocs), (pidx, pcount)

    idx = build_distributed_index(fasta, IndexConfig(16, 5, "hp"))
    np.savez(
        out,
        mins=idx.mins,
        abundances=idx.abundances,
        offsets=idx.offsets,
        # fixed-width unicode dtype — loads without pickle
        names=np.asarray(idx.names, dtype=np.str_),
    )


if __name__ == "__main__":
    main()
