"""Explicit scale patterns, expressed as oracle-checkable queries.

These operators exist to make shuffle-level techniques first-class,
testable code rather than lore: the result is identical to the naive
plan (so the DuckDB oracle is the naive SQL), but the physical shape is
the one that survives pathological skew at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from moonlink_spark.operators import load, register

N_SALTS = 16
DEC = "decimal(15,4)"


@register(
    "skew_salted_aggregation",
    oracle="""
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(15,4))) AS DOUBLE) AS total_value
FROM events
GROUP BY user_id
ORDER BY user_id
""",
    category="aggregation",
)
def skew_salted_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation: pre-aggregate on (user_id, salt) so a
    hot key spreads over N_SALTS reducers, then combine the partials per
    key. Result is bit-identical to the plain group-by (the oracle); the
    first-shuffle key space is what changes. Spark's map-side combine
    handles mild skew already — explicit salting is the fix when ONE key
    exceeds a single reducer (AQE skew-join handles joins, not aggs).
    The salt is derived from event_id, so it is deterministic and spreads
    uniformly regardless of the key distribution."""
    ev = load(spark, sf_dir, "events")
    partial = (
        ev.withColumn("salt", F.pmod(F.col("event_id"), F.lit(N_SALTS)))
        .groupBy("user_id", "salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.col("value").cast(DEC)).alias("pv"),
        )
    )
    return (
        partial.groupBy("user_id")
        .agg(
            F.sum("pn").alias("n_events"),
            F.sum("pv").cast("double").alias("total_value"),
        )
        .orderBy("user_id")
    )
