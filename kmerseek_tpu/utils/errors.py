"""Typed error hierarchy — reference parity for src/rust/errors.rs:3-55.

The reference's IndexError enum variants map to Python exceptions:
Database→StorageError, Serialization→StorageError, InvalidAminoAcid
(re-exported from core.alphabet, carries char + 1-based position),
NoSavedState, FastaParsing→FastaError, ConfigurationError (field +
message). The `IndexResultExt` context trait (errors.rs:60-95) maps to
`with_context`.
"""

from __future__ import annotations

from ..core.alphabet import InvalidAminoAcid  # noqa: F401  (re-export)


class KmerseekError(Exception):
    """Base for all framework errors."""


class StorageError(KmerseekError):
    """Index persistence failure (Database/Serialization variants)."""


class NoSavedState(StorageError):
    """No saved index found at the given path (errors.rs NoSavedState)."""


class FastaError(KmerseekError):
    """FASTA parsing failure (errors.rs FastaParsing)."""


class ConfigurationError(KmerseekError):
    """Invalid configuration (errors.rs ConfigurationError{field,message})."""

    def __init__(self, field: str, message: str):
        self.field = field
        self.message = message
        super().__init__(f"configuration error in '{field}': {message}")


def with_context(exc: Exception, context: str) -> KmerseekError:
    """IndexResultExt::context equivalent — wrap with a message."""
    err = KmerseekError(f"{context}: {exc}")
    err.__cause__ = exc
    return err
