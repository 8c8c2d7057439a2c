"""Test configuration: force a CPU backend with 8 virtual devices.

Multi-chip sharding is validated on a virtual CPU mesh
(``xla_force_host_platform_device_count``), mirroring the reference's
strategy of running everything single-process on small FASTAs
(SURVEY.md §4.2) while still exercising the pjit/shard_map paths.
"""

import os

# The container environment pins JAX_PLATFORMS=axon and pre-imports jax
# via sitecustomize, so plain env overrides are too late — force the CPU
# backend through jax.config before any backend initialization.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE = pathlib.Path("/root/reference")
REF_TESTDATA = REFERENCE / "tests" / "testdata"


def _ref_path(*parts) -> pathlib.Path:
    p = REF_TESTDATA.joinpath(*parts)
    if not p.exists():
        pytest.skip(f"reference fixture not available: {p}")
    return p


@pytest.fixture
def bcl2_first25():
    """25-protein BCL2 FASTA — the reference's main golden corpus."""
    return str(
        _ref_path(
            "fasta",
            "bcl2_first25_uniprotkb_accession_O43236_OR_accession_2025_02_06.fasta.gz",
        )
    )


@pytest.fixture
def ced9():
    return str(_ref_path("fasta", "ced9.fasta"))


@pytest.fixture
def bcl2_hp_k16_sig_zip():
    return str(
        _ref_path(
            "index",
            "bcl2_first25_uniprotkb_accession_O43236_OR_accession_2025_02_06.fasta.gz.hp.k16.scaled5.sig.zip",
        )
    )


@pytest.fixture
def bcl2_hp_k24_true_sig_zip():
    return str(
        _ref_path(
            "fasta",
            "bcl2_first25_uniprotkb_accession_O43236_OR_accession_2025_02_06.fasta.gz.hp.k24.scaled5.sig.TRUE.zip",
        )
    )


@pytest.fixture
def bcl2_hp_k24_true_kmers_pq():
    return str(
        _ref_path(
            "fasta",
            "bcl2_first25_uniprotkb_accession_O43236_OR_accession_2025_02_06.fasta.gz.hp.k24.scaled5.sig.TRUE.zip.kmers.pq",
        )
    )


@pytest.fixture
def uncharacterized_fasta():
    return str(
        _ref_path("fasta", "uniprotkb_protein_name_Uncharacterized_2025_04_15.fasta.gz")
    )


@pytest.fixture
def tmp_out(tmp_path):
    return tmp_path
