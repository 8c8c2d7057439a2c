"""Edge cases for the device intersection engine."""

import jax.numpy as jnp
import numpy as np

from kmerseek_tpu.ops import u64
from kmerseek_tpu.ops.intersect import pairwise_stats


def _dense(sketches, S, abund=None):
    """list of sorted u64 lists → padded (T, S) arrays + counts."""
    T = len(sketches)
    hi = np.full((T, S), 0xFFFFFFFF, np.uint32)
    lo = np.full((T, S), 0xFFFFFFFF, np.uint32)
    ab = np.zeros((T, S), np.int32)
    counts = np.zeros(T, np.int32)
    for i, sk in enumerate(sketches):
        v = np.asarray(sorted(sk), np.uint64)
        h, l = u64.split_np(v)
        hi[i, : len(v)] = h
        lo[i, : len(v)] = l
        ab[i, : len(v)] = (abund[i] if abund else [1] * len(v))[: len(v)] or 1
        counts[i] = len(v)
    return (
        jnp.asarray(hi),
        jnp.asarray(lo),
        jnp.asarray(ab),
        jnp.asarray(counts),
    )


def _np_stats(q, t):
    inter = sorted(set(q) & set(t))
    return len(inter)


def test_pairwise_random_vs_numpy():
    rng = np.random.default_rng(0)
    queries = [sorted(rng.integers(0, 1000, 30) * 2**40) for _ in range(5)]
    targets = [sorted(rng.integers(0, 1000, 50) * 2**40) for _ in range(7)]
    queries = [list(dict.fromkeys(q)) for q in queries]
    targets = [list(dict.fromkeys(t)) for t in targets]
    qh, ql, _, qc = _dense(queries, 64)
    th, tl, ta, tc = _dense(targets, 64)
    stats = pairwise_stats(qh, ql, qc, th, tl, ta, tc)
    got = np.asarray(stats.intersect)
    for i, q in enumerate(queries):
        for j, t in enumerate(targets):
            assert got[i, j] == _np_stats(q, t), (i, j)


def test_empty_sketches():
    qh, ql, _, qc = _dense([[], [1, 2, 3]], 8)
    th, tl, ta, tc = _dense([[2, 3], []], 8)
    stats = pairwise_stats(qh, ql, qc, th, tl, ta, tc)
    n = np.asarray(stats.intersect)
    assert n[0, 0] == 0 and n[0, 1] == 0 and n[1, 1] == 0
    assert n[1, 0] == 2


def test_extreme_hash_values():
    """Hashes at 0 and near u64::MAX must match correctly despite the
    MAX sentinel padding (sentinel slots excluded via counts)."""
    big = 2**64 - 2
    qh, ql, _, qc = _dense([[0, big]], 8)
    th, tl, ta, tc = _dense([[0], [big], [1]], 8)
    stats = pairwise_stats(qh, ql, qc, th, tl, ta, tc)
    n = np.asarray(stats.intersect)
    assert n.tolist() == [[1, 1, 0]]


def test_chunked_matches_unchunked():
    rng = np.random.default_rng(1)
    targets = [
        list(dict.fromkeys(sorted(rng.integers(0, 500, 20) * 2**40)))
        for _ in range(37)
    ]
    queries = [list(dict.fromkeys(sorted(rng.integers(0, 500, 20) * 2**40)))]
    qh, ql, _, qc = _dense(queries, 32)
    th, tl, ta, tc = _dense(targets, 32)
    a = pairwise_stats(qh, ql, qc, th, tl, ta, tc)
    b = pairwise_stats(qh, ql, qc, th, tl, ta, tc, target_chunk=8)
    for x, y in zip(a, b):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_weighted_and_host_order_stats():
    q = [[10, 20, 30, 40]]
    t = [[10, 20, 30, 99]]
    ab = [[5, 1, 2, 7]]
    qh, ql, _, qc = _dense(q, 8)
    th, tl, ta, tc = _dense(t, 8, abund=ab)
    s = pairwise_stats(qh, ql, qc, th, tl, ta, tc)
    assert int(s.intersect[0, 0]) == 3
    assert int(s.weighted[0, 0]) == 8  # 5+1+2

    # order statistics now come from the vectorized host join
    from kmerseek_tpu.core.index import IndexConfig, ProteomeIndex
    from kmerseek_tpu.core.search import _host_join
    from kmerseek_tpu.core.signature import Signature

    def mk_index(mins, abund):
        return ProteomeIndex.from_signatures(
            [
                Signature(
                    name="x",
                    mins=np.asarray(mins, np.uint64),
                    abundances=np.asarray(abund, np.int64),
                    ksize=16,
                    scaled=5,
                    moltype="hp",
                )
            ],
            IndexConfig(16, 5, "hp"),
        )

    qi = mk_index(q[0], [1, 1, 1, 1])
    ti = mk_index(t[0], ab[0])
    js = _host_join(qi, ti, inner="ab")
    assert len(js.seg_n) == 1 and int(js.seg_n[0]) == 3
    vec = js.pab[js.starts[0] : js.starts[0] + js.seg_n[0]]
    assert vec.tolist() == [1, 2, 5]  # ascending — segmented median works
    mid = js.starts[0] + (js.seg_n[0] - 1) // 2
    assert float(js.pab[mid]) == 2.0
