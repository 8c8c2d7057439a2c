#!/usr/bin/env python
"""CLI wall-time benchmark — reference benches/benchmark_cli.rs parity.

Measures `index` end-to-end wall time (process spawn → artifacts on
disk) for the reference's two CLI bench corpora (ced9.fasta, 1 seq;
bcl2_first25, 25 seqs) over k ∈ {5, 10, 15} × 3 encodings, plus the
output index size (benchmark_cli.rs:88-124). Prints one JSON line per
config. CPU backend by default (hermetic); the accelerator path is the
domain of bench.py.
"""

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
FIXTURES = [
    ("ced9", "/root/reference/tests/testdata/fasta/ced9.fasta"),
    (
        "bcl2_first25",
        "/root/reference/tests/testdata/fasta/"
        "bcl2_first25_uniprotkb_accession_O43236_OR_accession_2025_02_06.fasta.gz",
    ),
]


def dir_size(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    for tag, src in FIXTURES:
        if not os.path.exists(src):
            continue
        for moltype in ("protein", "dayhoff", "hp"):
            for k in (5, 10, 15):
                with tempfile.TemporaryDirectory() as tmp:
                    fasta = os.path.join(tmp, os.path.basename(src))
                    shutil.copy(src, fasta)
                    # per-child peak RSS (reference: /usr/bin/time -l,
                    # benchmark_cli.rs:55-87): the child reports its own
                    # RUSAGE_SELF high-water mark at exit —
                    # RUSAGE_CHILDREN in the parent would be a
                    # cross-config cumulative maximum
                    wrapper = (
                        "import sys, runpy, resource, atexit\n"
                        "atexit.register(lambda: print('KS_RSS_KIB',"
                        " resource.getrusage(resource.RUSAGE_SELF).ru_maxrss,"
                        " file=sys.stderr))\n"
                        "sys.argv = ['kmerseek'] + sys.argv[1:]\n"
                        "runpy.run_module('kmerseek_tpu.main',"
                        " run_name='__main__')\n"
                    )
                    t0 = time.perf_counter()
                    r = subprocess.run(
                        [
                            sys.executable, "-c", wrapper, "index",
                            "--moltype", moltype, "--ksize", str(k), fasta,
                        ],
                        capture_output=True,
                        text=True,
                        env=env,
                        cwd=tmp,
                        timeout=600,
                    )
                    dt = time.perf_counter() - t0
                    peak_rss = None
                    for line in r.stderr.splitlines():
                        if line.startswith("KS_RSS_KIB "):
                            peak_rss = int(line.split()[1])
                    sig = f"{fasta}.{moltype}.k{k}.scaled5.sig.zip"
                    ksx = f"{sig}.ksx"
                    print(
                        json.dumps(
                            {
                                "metric": "index_cli_wall_seconds",
                                "corpus": tag,
                                "moltype": moltype,
                                "k": k,
                                "value": dt,
                                "rc": r.returncode,
                                "peak_rss_kib": peak_rss,
                                "index_bytes": (
                                    dir_size(ksx) if os.path.isdir(ksx) else None
                                ),
                                "sig_bytes": (
                                    os.path.getsize(sig)
                                    if os.path.exists(sig)
                                    else None
                                ),
                            }
                        ),
                        flush=True,
                    )


if __name__ == "__main__":
    main()
