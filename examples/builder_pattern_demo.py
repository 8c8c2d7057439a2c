"""Builder-pattern demo — examples/builder_pattern_demo.rs analog."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

# the container sitecustomize pins the axon accelerator platform even
# when the env var says cpu; demos always force CPU (fast, hermetic)
if os.environ.get("KMERSEEK_EXAMPLE_BACKEND") != "accelerator":
    jax.config.update("jax_platforms", "cpu")

from kmerseek_tpu.core.index import ProteomeIndexBuilder
from kmerseek_tpu.utils.config import PerformanceConfigBuilder

perf = PerformanceConfigBuilder().host_threads(2).batch_size(500).build()
print("perf config:", perf)

import tempfile
with tempfile.NamedTemporaryFile("w", suffix=".fasta", delete=False) as f:
    f.write(">demo\nPLANTANDANIMALGENQMES\n")
    path = f.name

idx = (
    ProteomeIndexBuilder()
    .ksize(5)
    .scaled(1)
    .moltype("dayhoff")
    .store_raw_sequences()
    .build(path)
)
print(idx.print_stats())
