"""BCL2 corpus processing demo — examples/test_bcl2_processing.rs analog.

Indexes the BCL2-first-25 corpus across a parameter grid and prints
per-protein sketch sizes and combined-minhash sizes.
Run: JAX_PLATFORMS=cpu python examples/bcl2_processing.py
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

# the container sitecustomize pins the axon accelerator platform even
# when the env var says cpu; demos always force CPU (fast, hermetic)
if os.environ.get("KMERSEEK_EXAMPLE_BACKEND") != "accelerator":
    jax.config.update("jax_platforms", "cpu")

from kmerseek_tpu.core.index import IndexConfig, ProteomeIndex

FASTA = (
    "/root/reference/tests/testdata/fasta/"
    "bcl2_first25_uniprotkb_accession_O43236_OR_accession_2025_02_06.fasta.gz"
)

# the reference example's grid (test_bcl2_processing.rs:19-21) plus the
# golden-count configs
GRID = [
    ("protein", 7, 1),
    ("dayhoff", 10, 1),
    ("hp", 14, 1),
    ("protein", 5, 1),
    ("dayhoff", 5, 1),
    ("hp", 12, 1),
]

for moltype, k, scaled in GRID:
    idx = ProteomeIndex.build(FASTA, IndexConfig(k, scaled, moltype))
    comb, _ = idx.combined
    print(
        f"{moltype} k={k} scaled={scaled}: {len(idx)} proteins, "
        f"combined={len(comb)}"
    )
    for name, count in list(zip(idx.names, idx.counts))[:3]:
        print(f"  {name.split(' ')[0]}: {count} distinct k-mers")

    # self-search sanity: every protein contains itself fully
    from kmerseek_tpu.core.search import manysearch

    rows = manysearch(idx, idx)
    selfc = [
        r["containment"] for r in rows if r["query_name"] == r["match_name"]
    ]
    assert len(selfc) == len(idx) and all(c == 1.0 for c in selfc)
    print(f"  self-search: {len(rows)} hit pairs, all self-containments 1.0")
