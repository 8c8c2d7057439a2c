"""Native C++ library (libkseek) vs the Python/JAX reference paths."""


import numpy as np
import pytest

from kmerseek_tpu import native
from kmerseek_tpu.ops.encoding import encode_bytes_np, max_hash_for_scaled
from kmerseek_tpu.ops.murmur3 import murmur64_bytes_py

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libkseek.so not built (make -C kmerseek_tpu/native)"
)


def test_native_parse_fasta_matches_python(bcl2_first25):
    from kmerseek_tpu.core.fasta import open_maybe_compressed

    # python reference parse (force non-native by reading the stream)
    name = None
    chunks = []
    py_records = []
    with open_maybe_compressed(bcl2_first25) as f:
        for raw in f:
            line = raw.rstrip(b"\r\n")
            if line.startswith(b">"):
                if name is not None:
                    py_records.append((name, b"".join(chunks)))
                name = line[1:].decode()
                chunks = []
            elif line:
                chunks.append(line)
    py_records.append((name, b"".join(chunks)))

    native_records = native.parse_fasta(bcl2_first25)
    assert native_records == py_records


def test_native_sketch_matches_oracle():
    rng = np.random.default_rng(5)
    letters = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", np.uint8)
    seq = bytes(letters[rng.integers(0, 20, size=300)])
    enc = encode_bytes_np(np.frombuffer(seq, np.uint8), "hp").tobytes()
    k, scaled = 16, 5
    mh = max_hash_for_scaled(scaled)
    hashes, abund = native.sketch_cpu(enc, k, mh)

    from collections import Counter

    c = Counter()
    for i in range(len(enc) - k + 1):
        h = murmur64_bytes_py(enc[i : i + k])
        if h <= mh:
            c[h] += 1
    expect = sorted(c)
    assert [int(h) for h in hashes] == expect
    assert [int(a) for a in abund] == [c[h] for h in expect]


def test_native_batch_throughput_runs():
    rng = np.random.default_rng(5)
    letters = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", np.uint8)
    seqs = [bytes(letters[rng.integers(0, 20, size=200)]) for _ in range(50)]
    enc = [encode_bytes_np(np.frombuffer(s, np.uint8), "hp").tobytes() for s in seqs]
    concat = b"".join(enc)
    offsets = np.zeros(len(enc) + 1, np.int64)
    for i, e in enumerate(enc):
        offsets[i + 1] = offsets[i] + len(e)
    secs, total = native.sketch_cpu_batch_throughput(
        concat, offsets, 16, max_hash_for_scaled(5), 2
    )
    assert total == sum(len(e) - 16 + 1 for e in enc)
    assert secs > 0


def test_fasta_reader_uses_native(bcl2_first25):
    """read_fasta must produce the same records whether or not the
    native parser is in play."""
    from kmerseek_tpu.core.fasta import read_fasta

    records = read_fasta(bcl2_first25)
    assert len(records) == 25
    assert records[0].name.startswith("sp|O43236|SEPT4_HUMAN")
