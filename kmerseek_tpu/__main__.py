"""``python -m kmerseek_tpu`` — CLI entry (reference: kmerseek.main:cli)."""
from .cli import cli

cli()
