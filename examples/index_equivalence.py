"""Index equivalence oracle demo — examples/test_equivalence.rs analog."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

# the container sitecustomize pins the axon accelerator platform even
# when the env var says cpu; demos always force CPU (fast, hermetic)
if os.environ.get("KMERSEEK_EXAMPLE_BACKEND") != "accelerator":
    jax.config.update("jax_platforms", "cpu")

import tempfile
from kmerseek_tpu.core.index import IndexConfig, ProteomeIndex

with tempfile.NamedTemporaryFile("w", suffix=".fasta", delete=False) as f:
    f.write(">p1\nPLANTANDANIMALGENQMES\n>p2\nLIVINGALIVE\n")
    path = f.name

a = ProteomeIndex.build(path, IndexConfig(5, 1, "protein"))
b = ProteomeIndex.build(path, IndexConfig(5, 1, "protein"))
print("fresh rebuild equivalent:", a.is_equivalent_to(b))

with tempfile.TemporaryDirectory() as d:
    a.save(os.path.join(d, "idx"))
    c = ProteomeIndex.load(os.path.join(d, "idx"))
    print("save/load equivalent:", a.is_equivalent_to(c))

d2 = ProteomeIndex.build(path, IndexConfig(5, 1, "hp"))
print("different moltype equivalent:", a.is_equivalent_to(d2))
