"""REAL 2-process ``jax.distributed`` execution test.

Unlike ``test_multihost.py`` (pure-function exchange simulation), this
forms an actual process group: two spawned CPU processes initialize
``jax.distributed`` against a localhost coordinator, run the full
``build_distributed_index`` path — Gloo-backed ``process_allgather``
included — and the parent asserts both processes' merged indexes are
bit-equal to a single-host build of the same fixture. This executes
SURVEY §5.8's ``jax.distributed.initialize`` requirement for real on
one machine.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from kmerseek_tpu.core.index import IndexConfig, ProteomeIndex

FIXTURE = (
    "/root/reference/tests/testdata/fasta/"
    "bcl2_first25_uniprotkb_accession_O43236_OR_accession_2025_02_06.fasta.gz"
)
WORKER = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    try:
        s.bind(("localhost", 0))
        return s.getsockname()[1]
    finally:
        s.close()


def _run_group(tmp_path, extra_args, tag: str):
    """Spawn a real 2-process jax.distributed group; return out paths."""
    try:
        port = _free_port()
    except OSError as e:  # pragma: no cover - sandbox-dependent
        pytest.skip(f"sandbox forbids localhost sockets: {e!r}")

    coordinator = f"localhost:{port}"
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    outs = [str(tmp_path / f"{tag}{i}.npz") for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, "2", str(i), FIXTURE, outs[i]]
            + extra_args,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    results = [p.communicate(timeout=300) for p in procs]
    for i, (p, (out, err)) in enumerate(zip(procs, results)):
        assert p.returncode == 0, (
            f"worker {i} failed (rc={p.returncode}):\n{out[-1500:]}\n{err[-3000:]}"
        )
    return outs


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="fixture missing")
def test_two_process_group_builds_bit_equal_index(tmp_path):
    outs = _run_group(tmp_path, [], "proc")

    plain = ProteomeIndex.build(FIXTURE, IndexConfig(16, 5, "hp"))
    for i, path in enumerate(outs):
        got = np.load(path)
        assert got["names"].tolist() == plain.names, f"proc {i} names differ"
        assert np.array_equal(got["mins"], plain.mins), f"proc {i} mins differ"
        assert np.array_equal(got["abundances"], plain.abundances), (
            f"proc {i} abundances differ"
        )
        assert np.array_equal(got["offsets"], plain.offsets), (
            f"proc {i} offsets differ"
        )


QUERY = "/root/reference/tests/testdata/fasta/ced9.fasta"


@pytest.mark.skipif(
    not (os.path.exists(FIXTURE) and os.path.exists(QUERY)),
    reason="fixture missing",
)
def test_two_process_hash_range_sharded_build_and_search(tmp_path):
    """The north-star layout under a REAL process group: each process
    retains only its hash range (per-process posting memory ≈ N/2), and
    the process-level sharded manysearch/multisearch — collectives in
    build AND search — is bit-equal to the single-host engine."""
    outs = _run_group(tmp_path, ["sharded", QUERY], "shard")
    got = [np.load(p) for p in outs]

    from kmerseek_tpu.core.search import (
        manysearch_columns,
        multisearch_columns,
    )
    from kmerseek_tpu.parallel.multihost import hash_range_for_shard
    from kmerseek_tpu.parallel.sharded import occupied_span

    cfg = IndexConfig(16, 5, "hp")
    plain = ProteomeIndex.build(FIXTURE, cfg)
    inv = plain.inverted
    n_total = inv.n_postings
    span = occupied_span(cfg.scaled)

    # --- per-process posting residency: a strict partition by range ---
    for i, g in enumerate(got):
        assert g["shard"].tolist() == [i, 2]
        lo, hi = hash_range_for_shard(i, 2, span)
        assert int(g["local_g"].min()) >= lo
        assert int(g["local_g"].max()) < hi
        # ≈ N/2 resident postings per process (murmur uniformity)
        assert 0.3 * n_total < len(g["local_g"]) < 0.7 * n_total
    assert len(got[0]["local_g"]) + len(got[1]["local_g"]) == n_total
    assert np.array_equal(
        np.concatenate([got[0]["local_g"], got[1]["local_g"]]), inv.g64()
    )
    assert np.array_equal(
        np.concatenate([got[0]["local_tid"], got[1]["local_tid"]]), inv.tid
    )

    # --- merged search results: bit-equal on both processes ---
    query = ProteomeIndex.build(QUERY, cfg)
    many = manysearch_columns(query, plain)
    multi = multisearch_columns(query, plain)
    assert len(many["query_name"]) > 0
    for g in got:
        for k, e in many.items():
            gv = g[f"many_{k}"]
            if isinstance(e, np.ndarray):
                assert np.array_equal(gv, e), f"many.{k}"
            else:  # string columns (names / md5s / moltype)
                assert gv.tolist() == e, f"many.{k}"
        for k, e in multi.items():
            gv = g[f"multi_{k}"]
            if isinstance(e, np.ndarray):
                assert np.array_equal(gv, e), f"multi.{k}"
            else:  # string columns (names / md5s / moltype)
                assert gv.tolist() == e, f"multi.{k}"


def test_two_process_sharded_scale_persist_reload(tmp_path):
    """~10^5-target corpus under a REAL 2-process group: build with the
    range-restricted exchange, SAVE each shard, then a FRESH process
    group reloads from disk (no sketch, no exchange) — both groups'
    merged manysearch bit-equal to the single-host engine, residency ≈
    half the postings per process (VERDICT r4 asks #3 + #8)."""
    import time

    sys.path.insert(0, os.path.dirname(__file__))
    from _synth import synth_indexes

    save_path = str(tmp_path / "scale.ksx")
    t0 = time.perf_counter()
    outs_b = _run_group(tmp_path, ["sharded_scale_build", save_path], "sb")
    build_wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs_l = _run_group(tmp_path, ["sharded_scale_load", save_path], "sl")
    load_wall = time.perf_counter() - t0

    from kmerseek_tpu.core.search import manysearch_columns

    target, query = synth_indexes()
    expected = manysearch_columns(query, target)
    assert len(expected["query_name"]) > 0
    n_total = target.inverted.n_postings

    got_b = [np.load(p) for p in outs_b]
    got_l = [np.load(p) for p in outs_l]
    for tag, got in (("build", got_b), ("load", got_l)):
        assert (
            int(got[0]["local_postings"][0]) + int(got[1]["local_postings"][0])
            == n_total
        ), tag
        for i, g in enumerate(got):
            assert g["shard"].tolist() == [i, 2], tag
            # residency: ≈ N/2 resident postings AND bytes per process
            # (murmur uniformity); RSS is recorded for the report but
            # dominated by the interpreter at this corpus size
            frac = int(g["local_postings"][0]) / n_total
            assert 0.4 < frac < 0.6, (tag, i, frac)
            assert int(g["local_bytes"][0]) < 0.6 * 16 * n_total, (tag, i)
            for k, e in expected.items():
                gv = g[f"many_{k}"]
                if isinstance(e, np.ndarray):
                    assert np.array_equal(gv, e), f"{tag}.many.{k}"
                else:
                    assert gv.tolist() == e, f"{tag}.many.{k}"
    # the load group must be pure load+search: per-process load under
    # 5 s (mmap open is O(1)) and no build/save time at all
    for g in got_l:
        build_s, save_s, load_s, search_s = g["timers"].tolist()
        assert build_s == 0.0 and save_s == 0.0
        assert load_s < 5.0
    # fits the CI budget the verdict set (<~2 min for the whole leg)
    assert build_wall + load_wall < 120, (build_wall, load_wall)
