"""Change data feed: row-level changes between two LSN snapshots.

The consumer-facing form of the reference's LSN-pinned reads (SURVEY.md
§3.2): a downstream system that synced at LSN A asks "what changed by LSN
B" and gets insert/update/delete rows with before/after images — the same
contract Delta's Change Data Feed and Iceberg's changelog scans expose,
here computed from the engine's own snapshot algebra (no extra state
written at commit time; any two retained snapshots can be diffed after
the fact).

Updates are value-wise: a re-upsert of an identical row is NOT a change,
so the feed reflects semantic deltas no matter how many no-op writes
happened in between. NULL payloads are handled via null-safe comparison
and explicit existence markers, never payload-nullness inference.

Scale: one full-outer equi-join on the identity key between the two
snapshots — pruned by manifest stats/LSN lineage to files that differ —
followed by a map-side classification. O(|rows in changed files|), not
O(|table|), and embarrassingly partitionable on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from moonlink_spark.errors import TableConfigError
from moonlink_spark.table.table import MoonlinkTable

CHANGE_COL = "_change_type"


def table_changes(
    table: MoonlinkTable, from_lsn: int, to_lsn: int | None = None
) -> DataFrame:
    """Row-level changes between ``scan(from_lsn)`` and ``scan(to_lsn)``
    (default: latest). Returns the identity key columns plus
    ``_change_type`` (insert | update | delete), ``before`` and ``after``
    structs of the non-key payload columns."""
    if table.identity.mode not in ("single", "keys"):
        raise TableConfigError(
            "change feed needs key identity (single/keys); "
            f"got {table.identity.mode!r}"
        )
    keys = table.identity.key_columns([])
    payload = [c for c in table.schema.fieldNames() if c not in keys]

    old = table.scan(lsn=from_lsn).select(
        *keys,
        *[F.col(c).alias(f"__old_{c}") for c in payload],
        F.lit(True).alias("__in_old"),
    )
    new = table.scan(lsn=to_lsn).select(
        *keys,
        *[F.col(c).alias(f"__new_{c}") for c in payload],
        F.lit(True).alias("__in_new"),
    )
    j = old.join(new, keys, "full_outer")

    value_changed = F.lit(False)
    for c in payload:
        value_changed = value_changed | ~F.col(f"__old_{c}").eqNullSafe(
            F.col(f"__new_{c}")
        )
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("insert"))
        .when(F.col("__in_new").isNull(), F.lit("delete"))
        .when(value_changed, F.lit("update"))
    )
    before = F.when(
        F.col("__in_old").isNotNull(),
        F.struct(*[F.col(f"__old_{c}").alias(c) for c in payload]),
    )
    after = F.when(
        F.col("__in_new").isNotNull(),
        F.struct(*[F.col(f"__new_{c}").alias(c) for c in payload]),
    )
    return (
        j.withColumn(CHANGE_COL, change)
        .filter(F.col(CHANGE_COL).isNotNull())
        .select(*keys, CHANGE_COL, before.alias("before"), after.alias("after"))
    )
