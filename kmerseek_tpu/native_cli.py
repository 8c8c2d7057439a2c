"""Low-level index CLI — the reference's Rust CLI surface.

Mirrors `kmerseek-rust index` (/root/reference/src/rust/main.rs:6-67):
same flags and defaults (--ksize 10, --scaled 1, --encoding protein,
--progress-interval 10000, --store-raw-sequences, optional --output
with the auto filename convention of index.rs:647-652). Instead of a
RocksDB directory the product is the columnar .ksx index.

Run: ``python -m kmerseek_tpu.native_cli index --input proteins.fasta``
"""

from __future__ import annotations


import click

from .core.index import IndexConfig, ProteomeIndex
from .utils.metrics import PerformanceTimer


@click.group()
def cli():
    """kmerseek-tpu low-level indexer (Rust-CLI-compatible surface)."""


@cli.command()
@click.option("--input", "input_", required=True, help="Input FASTA file")
@click.option(
    "--output",
    default=None,
    help="Output index path (default: {input}.{encoding}.k{k}.scaled{s}.kmerseek.ksx)",
)
@click.option("--ksize", type=int, default=10, show_default=True)
@click.option("--scaled", type=int, default=1, show_default=True)
@click.option(
    "--encoding",
    type=click.Choice(["protein", "dayhoff", "hp"]),
    default="protein",
    show_default=True,
)
@click.option("--progress-interval", type=int, default=10000, show_default=True)
@click.option("--store-raw-sequences", is_flag=True, default=False)
def index(input_, output, ksize, scaled, encoding, progress_interval, store_raw_sequences):
    """Index a proteome FASTA (main.rs:72-138 flow)."""
    from .core.index import generate_index_path

    config = IndexConfig(ksize=ksize, scaled=scaled, moltype=encoding)
    out_path = output or generate_index_path(input_, encoding, ksize, scaled)
    timer = PerformanceTimer("index build")
    idx = ProteomeIndex.build(
        input_,
        config,
        store_raw_sequences=store_raw_sequences,
        progress_interval=progress_interval,
    )
    idx.save(out_path)
    elapsed = timer.elapsed()
    total_kmers = int(idx.abundances.sum())
    click.echo(idx.print_stats(), err=True)
    click.echo(
        f"indexed {len(idx)} sequences ({total_kmers} retained k-mer "
        f"occurrences) in {elapsed:.2f}s "
        f"({total_kmers / elapsed if elapsed else 0:.0f} kmers/s) -> {out_path}",
        err=True,
    )


if __name__ == "__main__":
    cli()
