"""kmerseek-tpu: TPU-native protein domain annotation search.

A from-scratch JAX/XLA/Pallas re-design of seanome/kmerseek's
capabilities: reduced amino-acid alphabet FracMinHash sketching,
proteome index construction, sketch-vs-sketch containment search, and
k-mer stitching domain reports — with the hot encode/hash/filter loop
as a fused TPU kernel and the index shardable across a device mesh.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API: kmerseek_tpu.ProteomeIndex etc. without
    importing jax at package import time."""
    if name in ("ProteomeIndex", "IndexConfig", "ProteomeIndexBuilder"):
        from .core import index as _index

        return getattr(_index, name)
    if name in (
        "manysearch",
        "multisearch",
        "do_manysearch",
        "do_multisearch",
        "manysearch_columns",
        "multisearch_columns",
        "write_search_csv_columns",
        "write_search_parquet",
    ):
        from .core import search as _search

        return getattr(_search, name)
    if name == "Signature":
        from .core.signature import Signature

        return Signature
    raise AttributeError(name)
