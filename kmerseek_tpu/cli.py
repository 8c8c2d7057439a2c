"""kmerseek-compatible click CLI: ``index`` and ``search`` commands.

Same surface as the reference (/root/reference/src/python/kmerseek/
main.py:8-14, index.py:77-118, search.py:287-373): same subcommands,
flags, defaults (moltype=hp, ksize=24, scaled=5), filename conventions,
stdout/stderr contract, and --force semantics. The compute underneath
is the TPU engine instead of sourmash/branchwater FFI.
"""

from __future__ import annotations

import sys

import click

from .core.entity import KmerseekIndex, KmerseekQuery
from .core.search import (
    MANYSEARCH_COLUMNS,
    manysearch,
    write_search_csv,
)
from .utils.logging import logger, setup_logging

# .core.stitch (pandas-backed) is imported inside the search command:
# pandas costs ~0.8 s at startup and `index` never needs it


@click.group()
def cli():
    """kmerseek-tpu: protein domain annotation search with reduced
    amino acid k-mers, TPU-native."""
    from .utils.hostmem import tune_host_allocator

    tune_host_allocator()  # corpus-scale numpy: reuse arena pages


@cli.command()
@click.argument("fasta")
@click.option("--moltype", default="hp")
@click.option("--ksize", type=int, default=24)
@click.option("--scaled", type=int, default=5)
@click.option("--extract-kmers", is_flag=True, default=False)
@click.option("--profile", default=None, help="Write a jax.profiler trace to this directory")
@click.option(
    "--engine",
    type=click.Choice(["auto", "device", "native"]),
    default="auto",
    help="Sketch engine: 'device' (accelerator), 'native' (C++ CPU, "
    "bit-equal), 'auto' sketches single-batch tiny corpora natively",
)
@click.option("--debug", is_flag=True, help="Enable debug logging")
@click.option(
    "--force",
    is_flag=True,
    help="Force creation of signature, kmer parquet, and index even if "
    "they're already there",
)
def index(fasta, moltype, ksize, scaled, extract_kmers, profile, engine, debug, force):
    """Index a proteome FASTA (reference index.py:77-118 contract)."""
    setup_logging(debug)
    from .utils.device import ensure_usable_backend
    from .utils.metrics import device_profile

    if engine != "native" or extract_kmers or profile:
        # the probe exists to protect jax-touching paths from a wedged
        # accelerator tunnel; a plain forced-native index never imports
        # jax, so don't spend the (up to 120 s) probe on it — but
        # --extract-kmers (CPU-jax hash pass) and --profile
        # (jax.profiler) do initialize jax even under --engine native
        ensure_usable_backend()

    profiler = device_profile(profile)
    profiler.__enter__()
    entity = KmerseekIndex(
        fasta,
        moltype=moltype,
        ksize=ksize,
        scaled=scaled,
        force=force,
        extract_kmers=extract_kmers,
        engine=engine,
    )
    if extract_kmers:
        logger.info("K-mer extraction will be performed during indexing.")
    else:
        logger.info("K-mer extraction will be skipped during indexing.")
    _ = entity.sig
    _ = entity.ksx
    if extract_kmers:
        logger.info("K-mers stored in: %s", entity.kmers_pq)
    profiler.__exit__(None, None, None)
    if profile:
        logger.info("profiler trace written to %s", profile)


@cli.command()
@click.argument("query_fasta")
@click.argument("target_fasta")
@click.option("--moltype", default="hp")
@click.option("--ksize", type=int, default=24)
@click.option("--scaled", type=int, default=5)
@click.option("--extract-kmers", is_flag=True, default=False)
@click.option(
    "--output", default=None, help="If not specified, then output results to stdout"
)
@click.option(
    "--sourmash-search-csv",
    default=None,
    help=(
        "Store sourmash search results in this CSV. If not specified, then "
        "a temporary file is created. Mostly for debugging purposes"
    ),
)
@click.option(
    "--annotate-domains",
    default=None,
    help=(
        "UniProt XML export (optionally .gz): log domain/region features "
        "overlapping each stitched match interval (completes the "
        "reference's unfinished show_results path, search.py:21-34). "
        "Requires --extract-kmers"
    ),
)
@click.option(
    "--stitch-per-query",
    is_flag=True,
    default=False,
    help=(
        "Group stitched rows by (match, query) pair instead of the "
        "reference's match-name-only grouping (which interleaves "
        "different queries' k-mers into one row when several queries "
        "hit the same target, search.py:222-240). Off by default for "
        "output parity"
    ),
)
@click.option(
    "--engine",
    type=click.Choice(["auto", "device", "native"]),
    default="auto",
    help="Sketch engine for query/target (see `index --engine`)",
)
@click.option("--debug", is_flag=True, help="Enable debug logging")
@click.option(
    "--force",
    is_flag=True,
    help="Force creation of signature, kmer parquet, and index even if "
    "they're already there",
)
def search(
    query_fasta,
    target_fasta,
    moltype,
    ksize,
    scaled,
    extract_kmers,
    output,
    sourmash_search_csv,
    annotate_domains,
    stitch_per_query,
    engine,
    debug,
    force,
):
    """Search for k-mers in target sequences (search.py:287-373 contract)."""
    if annotate_domains and not extract_kmers:
        raise click.UsageError(
            "--annotate-domains requires --extract-kmers (domains are "
            "looked up for stitched match intervals)"
        )
    setup_logging(debug)
    from .utils.device import ensure_usable_backend

    ensure_usable_backend()

    query = KmerseekQuery(
        query_fasta,
        moltype=moltype,
        ksize=ksize,
        scaled=scaled,
        force=force,
        extract_kmers=extract_kmers,
        engine=engine,
    )
    _ = query.sig
    _ = query.kmers_pq
    target = KmerseekIndex(
        target_fasta,
        moltype=moltype,
        ksize=ksize,
        scaled=scaled,
        force=force,
        extract_kmers=extract_kmers,
        engine=engine,
    )
    _ = target.sig

    rows = manysearch(query.index, target.index)

    if sourmash_search_csv:
        write_search_csv(rows, MANYSEARCH_COLUMNS, sourmash_search_csv)

    if extract_kmers:
        from .core.stitch import stitch_results_streaming, stitched_to_csv

        # streams both sidecar parquets through a name + hash-join
        # filter (reference: polars LazyFrame scan, search.py:179-181)
        # — memory stays bounded at UniProt-scale sidecars; output is
        # byte-identical to the eager join
        stitched, report = stitch_results_streaming(
            rows,
            query.kmers_pq,
            target.kmers_pq,
            group_by_pair=stitch_per_query,
        )
        click.echo(report, err=True)
        sys.stderr.flush()
        if annotate_domains:
            from .core.uniprot import get_domains
            from .utils.logging import logger

            for row in stitched.itertuples():
                domains = get_domains(
                    row.match_name,
                    int(row.match_start),
                    int(row.match_end),
                    xml_path=annotate_domains,
                )
                for d in domains or ():
                    logger.info(f"Found: {d.name} in {d.start}-{d.end}")
        data = stitched_to_csv(stitched)
        if output is None:
            sys.stdout.write(data)
            sys.stdout.flush()
        else:
            with open(output, "w") as f:
                f.write(data)
    else:
        write_search_csv(rows, MANYSEARCH_COLUMNS, output)


if __name__ == "__main__":
    cli()
