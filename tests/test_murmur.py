"""Golden-vector tests for the vectorized murmur64 and u64 arithmetic.

The (hash, kmer, position) tables are the reference's own bit-exactness
oracle: /root/reference/src/rust/index.rs:1084-1103 (protein, k=5),
1187-1205 (dayhoff), 1309-1326 (hp), all over TEST_PROTEIN
"PLANTANDANIMALGENQMES" with seed 42.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from kmerseek_tpu.ops import u64
from kmerseek_tpu.ops.encoding import encode_kmer
from kmerseek_tpu.ops.murmur3 import (
    murmur64_bytes_py,
    murmur64_kmer_windows,
)

TEST_PROTEIN = "PLANTANDANIMALGENQMES"

# index.rs:1084-1103 — protein moltype, k=5: hash, kmer, position
GOLDEN_PROTEIN = [
    (2140811952770908281, "GENQM", 14),
    (4381446250900425522, "ENQME", 15),
    (5798339600059429290, "DANIM", 7),
    (7681438632487987439, "ANIMA", 8),
    (12896310179337320481, "LANTA", 1),
    (2542642819229379552, "NTAND", 3),
    (11965201914550078735, "TANDA", 4),
    (5893010049374798421, "PLANT", 0),
    (110005740849399217, "NDANI", 6),
    (3791883307084689782, "LGENQ", 13),
    (14610011480386804007, "ALGEN", 12),
    (6941015416212662126, "ANTAN", 2),
    (12636705882654324958, "NQMES", 16),
    (11154024130290913208, "IMALG", 10),
    (1225702037828834387, "MALGE", 11),
    (12274863873578753245, "NIMAL", 9),
    (13616372540306653069, "ANDAN", 5),
]

# index.rs:1187-1205 — dayhoff k=5: hash, encoded, original, position
GOLDEN_DAYHOFF = [
    (17444159595263538048, "ceebe", "NIMAL", 9),
    (2945598193614695589, "cccec", "ENQME", 15),
    (4548757849819812604, "bbccb", "TANDA", 4),
    (6463872878592804545, "ebccc", "LGENQ", 13),
    (4030406117949362159, "cbcee", "DANIM", 7),
    (7014407397606522347, "ebcbb", "LANTA", 1),
    (5045972850709227854, "bebcb", "PLANT", 0),
    (11417072151730334367, "bcbbc", "ANTAN", 2),
    (13574922562423607435, "bceeb", "ANIMA", 8),
    (15050500149255106627, "bccce", "GENQM", 14),
    (5430883729707969951, "eebeb", "IMALG", 10),
    (13894194422852851851, "bebcc", "ALGEN", 12),
    (9604281550621775790, "bccbc", "ANDAN", 5),
    (6161374941338912337, "ccecb", "NQMES", 16),
    (655307631517862365, "ccbce", "NDANI", 6),
    (360995089333906261, "ebebc", "MALGE", 11),
    (15056713696431004031, "cbbcc", "NTAND", 3),
]

# index.rs:1309-1326 — hp k=5 (14 distinct; hp collapses collisions)
GOLDEN_HP = [
    (17248460043117039725, "hhhhp", ["MALGE"], [11]),
    (5673218808929106268, "phhhh", ["NIMAL"], [9]),
    (16969835101383990681, "hhpph", ["LANTA"], [1]),
    (7345312524621807974, "pphph", ["NDANI"], [6]),
    (16370543730027378051, "phpph", ["TANDA"], [4]),
    (3278382041688965244, "hphhh", ["ANIMA"], [8]),
    (8541583772724823208, "hhhhh", ["IMALG"], [10]),
    (16158526221854164806, "hppph", ["GENQM"], [14]),
    (11553019557737058697, "hhppp", ["LGENQ"], [13]),
    (9081059129327932468, "ppphp", ["ENQME"], [15]),
    (2863220259252354754, "phphh", ["DANIM"], [7]),
    (4230974618842309829, "hhhpp", ["PLANT", "ALGEN"], [0, 12]),
    (13058023948041027181, "pphpp", ["NQMES", "NTAND"], [16, 3]),
    (4144736064335623701, "hpphp", ["ANDAN", "ANTAN"], [5, 2]),
]


def test_py_oracle_matches_golden_protein():
    for h, kmer, _pos in GOLDEN_PROTEIN:
        assert murmur64_bytes_py(kmer.encode()) == h


def test_py_oracle_matches_golden_encoded():
    for h, enc, _orig, _pos in GOLDEN_DAYHOFF:
        assert murmur64_bytes_py(enc.encode()) == h
    for h, enc, _origs, _pos in GOLDEN_HP:
        assert murmur64_bytes_py(enc.encode()) == h


def test_encode_kmer_golden():
    # encoding.rs:187-212 golden vectors
    assert encode_kmer("LIVINGALIVE", "dayhoff") == "eeeecbbeeec"
    assert encode_kmer("LIVINGALIVE", "hp") == "hhhhphhhhhp"
    assert encode_kmer("PLANT", "protein") == "PLANT"
    for _h, enc, orig, _pos in GOLDEN_DAYHOFF:
        assert encode_kmer(orig, "dayhoff") == enc


@pytest.mark.parametrize("k", [5, 10, 16, 24, 31])
def test_jax_windows_match_py_oracle(k):
    rng = np.random.default_rng(0)
    B, L = 3, 64
    seqs = rng.integers(low=65, high=90, size=(B, L), dtype=np.uint8)
    got = murmur64_kmer_windows(jnp.asarray(seqs), k)
    got64 = u64.to_py(got)
    for b in range(B):
        for i in range(L - k + 1):
            expect = murmur64_bytes_py(bytes(seqs[b, i : i + k]))
            assert int(got64[b, i]) == expect, (b, i, k)


def test_jax_windows_golden_protein():
    seq = np.frombuffer(TEST_PROTEIN.encode(), dtype=np.uint8)[None, :]
    got = u64.to_py(murmur64_kmer_windows(jnp.asarray(seq), 5))[0]
    for h, _kmer, pos in GOLDEN_PROTEIN:
        assert int(got[pos]) == h


def test_u64_roundtrip_and_compare():
    vals = np.array(
        [0, 1, 2**32 - 1, 2**32, 2**63, 2**64 - 1, 1234567890123456789],
        dtype=np.uint64,
    )
    pair = u64.from_np(vals)
    assert (u64.to_py(pair) == vals).all()
    mh = u64.u64_const(3689348814741910528)
    le = u64.le64(pair, u64.U64(jnp.broadcast_to(mh.hi, pair.hi.shape), jnp.broadcast_to(mh.lo, pair.lo.shape)))
    expect = vals <= np.uint64(3689348814741910528)
    assert (np.asarray(le) == expect).all()


def test_mul_add_wraps_like_u64():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 2**64, size=128, dtype=np.uint64)
    b = rng.integers(0, 2**64, size=128, dtype=np.uint64)
    pa, pb = u64.from_np(a), u64.from_np(b)
    got_mul = u64.to_py(u64.mul64(pa, pb))
    got_add = u64.to_py(u64.add64(pa, pb))
    exp_mul = (a.astype(object) * b.astype(object)) % (2**64)
    exp_add = (a.astype(object) + b.astype(object)) % (2**64)
    assert [int(x) for x in got_mul] == [int(x) for x in exp_mul]
    assert [int(x) for x in got_add] == [int(x) for x in exp_add]
