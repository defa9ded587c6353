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
    "skew_salted_join",
    oracle="""
SELECT e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(15,4))) AS DOUBLE) AS total_value,
       CAST(MAX(c.c_acctbal) AS DOUBLE) AS max_acctbal
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY e.event_type
ORDER BY e.event_type
""",
    category="join",
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join for a skewed fact key: the big (events) side gets a
    deterministic salt in [0, N_SALTS); the small-but-unbroadcastable
    (customer) side is exploded N_SALTS ways so every salted fact key still
    finds its match. A hot user_id now spreads over N_SALTS reducers
    instead of melting one. Result identical to the naive equi-join (the
    oracle). AQE's skew-join split handles moderate skew after the fact;
    explicit salting is the a-priori fix when one key is known to dominate
    (and composes with bucketed storage, which AQE's split does not)."""
    ev = load(spark, sf_dir, "events")
    cust = load(spark, sf_dir, "customer")
    salted_ev = ev.withColumn("salt", F.pmod(F.col("event_id"), F.lit(N_SALTS)))
    exploded_cust = cust.select(
        "c_custkey",
        "c_acctbal",
        F.explode(
            F.array(*[F.lit(i) for i in range(N_SALTS)])
        ).alias("salt"),
    )
    joined = salted_ev.join(
        exploded_cust,
        (F.col("user_id") == F.col("c_custkey")) & (salted_ev["salt"] == exploded_cust["salt"]),
    )
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
            F.max("c_acctbal").cast("double").alias("max_acctbal"),
        )
        .orderBy("event_type")
    )


# interval-join bucket width == window length, so each interval spans at
# most two buckets and the bucket equi-join loses no matches
WINDOW_S = 600


@register(
    "interval_range_join",
    oracle=f"""
WITH i AS (SELECT event_id, ts FROM events WHERE event_type = 'error'),
p AS (SELECT ts, value FROM events WHERE event_type = 'purchase')
SELECT i.event_id,
       CAST(COUNT(p.ts) AS BIGINT) AS n_purchases,
       CAST(COALESCE(SUM(CAST(p.value AS DECIMAL(15,4))), 0) AS DOUBLE)
         AS total_value
FROM i LEFT JOIN p
  ON p.ts >= i.ts AND p.ts < i.ts + INTERVAL {WINDOW_S} SECOND
GROUP BY i.event_id
ORDER BY i.event_id
""",
    category="join",
)
def interval_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure time-range join (no equi key): purchases falling inside the
    10-minute window after each error event. The naive plan — the oracle's
    theta join — is a nested-loop cartesian, O(intervals x probes); at
    100 TB it never finishes. The scale plan buckets time at the window
    width: each interval covers exactly two buckets (explode), each probe
    one, so the join becomes a bucket EQUI-join (hash-partitionable,
    AQE-skew-splittable) followed by the exact range filter. A matching
    pair agrees on exactly one bucket, so no dedup is needed. Empty windows
    are restored by a final equi-join back to the interval side."""
    ev = load(spark, sf_dir, "events")
    bucket = F.expr(f"unix_timestamp(ts) DIV {WINDOW_S}")
    intervals = (
        ev.filter(F.col("event_type") == "error")
        .select("event_id", F.col("ts").alias("its"), bucket.alias("b0"))
        .withColumn("bucket", F.explode(F.array(F.col("b0"), F.col("b0") + 1)))
        .drop("b0")
    )
    probes = (
        ev.filter(F.col("event_type") == "purchase")
        .select(F.col("ts").alias("pts"), "value", bucket.alias("bucket"))
    )
    matched = (
        intervals.join(probes, "bucket")
        .filter(
            (F.col("pts") >= F.col("its"))
            & (F.col("pts") < F.col("its") + F.expr(f"INTERVAL {WINDOW_S} SECOND"))
        )
        .groupBy("event_id")
        .agg(
            F.count(F.lit(1)).alias("mn"),
            F.sum(F.col("value").cast(DEC)).alias("mv"),
        )
    )
    all_intervals = ev.filter(F.col("event_type") == "error").select("event_id")
    return (
        all_intervals.join(matched, "event_id", "left")
        .select(
            "event_id",
            F.coalesce(F.col("mn"), F.lit(0)).cast("bigint").alias("n_purchases"),
            F.coalesce(F.col("mv"), F.lit(0).cast(DEC))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("event_id")
    )


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
