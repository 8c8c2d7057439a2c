"""kmerseek-tpu: TPU-native protein domain annotation search.

A from-scratch JAX/XLA/Pallas re-design of seanome/kmerseek's
capabilities: reduced amino-acid alphabet FracMinHash sketching,
proteome index construction, sketch-vs-sketch containment search, and
k-mer stitching domain reports — with the hot encode/hash/filter loop
as a fused TPU kernel and the index shardable across a device mesh.
"""

__version__ = "0.1.0"
