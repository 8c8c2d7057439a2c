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


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="fixture missing")
def test_two_process_group_builds_bit_equal_index(tmp_path):
    try:
        port = _free_port()
    except OSError as e:  # pragma: no cover - sandbox-dependent
        pytest.skip(f"sandbox forbids localhost sockets: {e!r}")

    coordinator = f"localhost:{port}"
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    outs = [str(tmp_path / f"proc{i}.npz") for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, "2", str(i), FIXTURE, outs[i]],
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
