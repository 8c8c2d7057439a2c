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

for moltype, k in [("protein", 5), ("dayhoff", 5), ("hp", 12)]:
    idx = ProteomeIndex.build(FASTA, IndexConfig(k, 1, moltype))
    comb, _ = idx.combined
    print(f"{moltype} k={k}: {len(idx)} proteins, combined={len(comb)}")
    for name, count in list(zip(idx.names, idx.counts))[:3]:
        print(f"  {name.split(' ')[0]}: {count} distinct k-mers")
