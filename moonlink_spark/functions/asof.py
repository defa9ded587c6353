"""As-of (nearest-earlier) join — an operator Spark lacks natively.

Implemented as the union-sort-window algorithm rather than a range join:
tag both sides, union, and for each left row take the last right value seen
in a single per-key ordered pass. This is the scale-correct plan — ONE
shuffle on the join key (same as any join) and no range-condition row
explosion; a naive ``l.ts >= r.ts`` theta join is O(n*m) per key and dies at
100 TB. Pattern matches how Flink/kdb implement as-of semantics.

Reference parity: the reference delegates range/as-of queries to its read
engines (SURVEY.md §2c joins row); DuckDB's ASOF JOIN is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    right_values: list[str],
    strict: bool = True,
    how: str = "left",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_time`` <= (or < if ``strict``) ``left_time``, matching on ``on``.

    ``right_values`` are the right columns to carry (renamed as-is; they must
    not collide with left columns). ``how='inner'`` drops unmatched lefts.
    """
    lcols = left.columns
    l = left.withColumn("__t", F.col(left_time)).withColumn("__side", F.lit(1))
    for v in right_values:
        l = l.withColumn(v, F.lit(None).cast(right.schema[v].dataType))
    r = right.withColumn("__t", F.col(right_time)).withColumn("__side", F.lit(0))
    for c in lcols:
        if c not in on and c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    sel = on + [c for c in lcols if c not in on] + right_values + ["__t", "__side"]
    # strict: left rows sort BEFORE right rows at equal time, so an
    # equal-time right row is excluded from the running frame; non-strict:
    # right rows sort first and are included.
    tag = F.when(F.col("__side") == 1, F.lit(0 if strict else 1)).otherwise(
        F.lit(1 if strict else 0)
    )
    u = l.select(*sel).unionByName(r.select(*sel)).withColumn("__tag", tag)
    w = (
        Window.partitionBy(*on)
        .orderBy("__t", "__tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # the carried values ride in ONE struct that is non-null exactly for
    # right rows: last(..., ignorenulls) then tracks the nearest earlier
    # MATCH, so a matched right row whose value column is NULL stays NULL
    # (bare last(v, ignorenulls) would skip it and leak an older row's
    # value), and match-ness is testable independently of value nullness
    # a constant marker field keeps the struct non-empty when
    # right_values=[] (existence-only as-of join) and guarantees the
    # struct itself is non-null for every right row regardless of value
    # nullness, so `matched` below is always meaningful
    out = (
        u.withColumn(
            "__rv",
            F.when(
                F.col("__side") == 0,
                F.struct(
                    F.lit(True).alias("__asof_m"),
                    *[F.col(v) for v in right_values],
                ),
            ),
        )
        .withColumn("__rvl", F.last("__rv", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    for v in right_values:
        out = out.withColumn(v, F.col("__rvl")[v])
    matched = F.col("__rvl").isNotNull()
    out = out.drop("__t", "__side", "__tag", "__rv", "__rvl") if how != "inner" else (
        out.filter(matched).drop("__t", "__side", "__tag", "__rv", "__rvl")
    )
    return out
