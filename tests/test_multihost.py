"""Multi-host build entry point: single-process degradation and the
pack/allgather/merge exchange simulated for several hosts.
"""

import numpy as np
import pytest

from kmerseek_tpu.core.index import IndexConfig, ProteomeIndex
from kmerseek_tpu.parallel.multihost import (
    host_owns_record,
    merge_shards,
    pack_local_shard,
)


@pytest.fixture()
def small_fasta(tmp_path):
    p = tmp_path / "mini.fasta"
    p.write_text(
        ">p1\nMKVLAANDPLANTANDANIMALGENQMESTRYINGTOGETHER\n"
        ">p2\nLIVINGALIVEANDKICKINGPROTEINS\n"
        ">p3\nSEQVENCESARELIKESENTENCES\n"
        ">p4\nTINYPEPTIDEMATTERS\n"
        ">p5\nANQTHERPRQTEINFQRTHECQRPUS\n"
    )
    return str(p)


def test_build_distributed_single_process(small_fasta):
    cfg = IndexConfig(8, 2, "hp")
    dist = ProteomeIndex.build_distributed(small_fasta, cfg)
    plain = ProteomeIndex.build(small_fasta, cfg)
    # bit-equal, not just equivalent: same order, same arrays
    assert dist.names == plain.names
    assert np.array_equal(dist.mins, plain.mins)
    assert np.array_equal(dist.abundances, plain.abundances)
    assert np.array_equal(dist.offsets, plain.offsets)


def test_merge_shards_reassembles_global_order(small_fasta):
    """Simulate 3 hosts: round-robin split of a built index, pack each
    shard, merge — the result must be bit-equal to the original."""
    cfg = IndexConfig(8, 2, "hp")
    full = ProteomeIndex.build(small_fasta, cfg)
    sigs = full.signatures()
    payloads = []
    for pid in range(3):
        ords = [i for i in range(len(sigs)) if host_owns_record(i, pid, 3)]
        payloads.append(pack_local_shard(ords, [sigs[i] for i in ords]))
    # merge in arbitrary payload order
    merged = merge_shards(payloads[::-1], cfg, source_fasta=full.source_fasta)
    assert merged.names == full.names
    assert np.array_equal(merged.mins, full.mins)
    assert np.array_equal(merged.abundances, full.abundances)
    assert np.array_equal(merged.offsets, full.offsets)
    assert merged.is_equivalent_to(full)


def test_merge_shards_detects_missing_shard(small_fasta):
    cfg = IndexConfig(8, 2, "hp")
    full = ProteomeIndex.build(small_fasta, cfg)
    sigs = full.signatures()
    p0 = pack_local_shard([0, 2, 4], [sigs[0], sigs[2], sigs[4]])
    with pytest.raises(RuntimeError, match="missing or duplicated"):
        merge_shards([p0], cfg)


def test_empty_host_shard_packs_cleanly():
    p = pack_local_shard([], [])
    assert len(p["ordinals"]) == 0
    assert len(p["mins"]) == 0
