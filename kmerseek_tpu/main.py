"""Alias module so ``python -m kmerseek_tpu.main`` works like the
reference's ``python -m kmerseek.main`` (tests/test_search.py:10-23)."""
from .cli import cli

if __name__ == "__main__":
    cli()
