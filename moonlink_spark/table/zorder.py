"""Z-order (Morton curve) clustering for multi-dimension file pruning.

Range clustering (`cluster_by` + `repartitionByRange`) makes per-file
min/max stats selective on the FIRST cluster column only — a filter on the
second column still touches every file. Interleaving the bits of the
cluster columns into one Morton key and range-partitioning on THAT gives
every file a narrow hyper-rectangle in all dimensions at once, so the
manifest stats prune on any clustered column (the public technique behind
Delta ``OPTIMIZE ZORDER BY`` and Iceberg sort-order z-ordering).

Mechanics: each write batch normalizes every cluster column to a 16-bit
integer grid via its own (min, max) — computed inside the same plan as a
1-row broadcast, no extra job — then interleaves the bits. Per-batch
normalization is sound because clustering only ever applies within one
write's file set (optimize re-clusters globally with the same code path).
The interleave is an unrolled shift/mask expression: pure map-side
whole-stage-codegen work, one pass, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from moonlink_spark.errors import TableConfigError

Z_BITS = 16
ZCOL = "__zorder"

_NUMERIC = {"byte", "short", "int", "integer", "long", "bigint",
            "float", "double", "date", "timestamp", "timestamp_ntz"}


def _bits_per_column(k: int) -> int:
    """Interleaved key must stay a non-negative bigint: k * bits <= 63
    (bit 63 is the sign bit — touching it makes the top bucket sort FIRST,
    and shift amounts >= 64 wrap mod 64 and scramble the key)."""
    return min(Z_BITS, 63 // k)


def validate_zorder_columns(schema, cluster_by: list[str]) -> None:
    if len(cluster_by) < 2:
        raise TableConfigError(
            "zorder clustering needs >=2 columns (use range for one)"
        )
    if _bits_per_column(len(cluster_by)) < 4:
        raise TableConfigError(
            f"zorder supports at most 15 columns ({len(cluster_by)} given): "
            "fewer than 4 bits per dimension no longer clusters usefully"
        )
    for c in cluster_by:
        t = schema[c].dataType.typeName()
        if t not in _NUMERIC and not t.startswith("decimal"):
            raise TableConfigError(
                f"zorder column {c!r} has non-orderable-numeric type {t!r}"
            )


def _as_double(c: str, type_name: str):
    if type_name in ("timestamp", "timestamp_ntz"):
        return F.unix_micros(F.col(c).cast("timestamp")).cast("double")
    if type_name == "date":
        return F.datediff(F.col(c), F.lit("1970-01-01")).cast("double")
    return F.col(c).cast("double")


def with_zorder_key(df: DataFrame, cluster_by: list[str]) -> DataFrame:
    """Append the Morton key column ``__zorder`` for this batch."""
    z_bits = _bits_per_column(len(cluster_by))
    types = {f.name: f.dataType.typeName() for f in df.schema.fields}
    aggs = []
    for c in cluster_by:
        v = _as_double(c, types[c])
        aggs.append(F.min(v).alias(f"__mn_{c}"))
        aggs.append(F.max(v).alias(f"__mx_{c}"))
    stats = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(stats))

    grid_max = (1 << z_bits) - 1
    scaled = []
    for c in cluster_by:
        v = _as_double(c, types[c])
        mn = F.col(f"__mn_{c}")
        mx = F.col(f"__mx_{c}")
        rng = F.when(mx > mn, mx - mn).otherwise(F.lit(1.0))
        s = F.floor((v - mn) / rng * grid_max).cast("bigint")
        s = F.coalesce(F.least(F.lit(grid_max), F.greatest(F.lit(0), s)), F.lit(0))
        scaled.append(s)

    k = len(cluster_by)
    z = F.lit(0).cast("bigint")
    for bit in range(z_bits):
        for j, s in enumerate(scaled):
            z = z + F.shiftleft(
                F.shiftright(s, bit).bitwiseAND(F.lit(1)), bit * k + j
            )
    drop = [f"__mn_{c}" for c in cluster_by] + [f"__mx_{c}" for c in cluster_by]
    return out.withColumn(ZCOL, z).drop(*drop)
