"""Engine error types (parity: reference ``src/moonlink_error`` crate)."""

from __future__ import annotations


class MoonlinkError(Exception):
    """Base class for engine errors."""


class SchemaError(MoonlinkError):
    """Invalid schema DSL / schema evolution request."""


class TableConfigError(MoonlinkError):
    """Invalid table configuration, e.g. append_only with a row identity
    (invariant from reference src/moonlink_backend/src/table_config.rs:31-45).
    """


class IdentityError(MoonlinkError):
    """Operation not allowed for the table's row-identity mode, e.g. delete
    on an append-only table (reference mooncake_table.rs:1241-1246)."""


class LsnError(MoonlinkError):
    """Non-monotonic LSN or read-wait timeout (reference consistency rule,
    mooncake_table.rs:440-444)."""


class TransactionError(MoonlinkError):
    """Streaming-transaction misuse (unknown xact, double commit/abort)."""


class CommitConflictError(MoonlinkError):
    """Optimistic manifest commit lost the race to a concurrent writer."""
