"""Window-function operator surface + as-of join + sessionization + pivot.

SURVEY.md §2c window row: the reference delegates window functions to its
read engines; here they are native Spark ``Window`` specs. Every ordering
includes a unique tie-break column so results are deterministic and
hash-match the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from moonlink_spark.functions.asof import asof_join
from moonlink_spark.operators import load, register

DEC = "decimal(15,4)"


@register(
    "window_topk_parts_per_brand",
    oracle="""
SELECT p_brand, p_partkey, p_name, CAST(p_retailprice AS DOUBLE) AS price, rn
FROM (
  SELECT p_brand, p_partkey, p_name, p_retailprice,
         CAST(row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS rn
  FROM part
) t WHERE rn <= 3
""",
    category="window",
)
def window_topk_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group: the window formulation (vs. groupBy+sort+limit) keeps
    one shuffle and no driver collection — the 100 TB-safe top-k."""
    part = load(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.desc("p_retailprice"), F.asc("p_partkey")
    )
    return (
        part.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .select(
            "p_brand",
            "p_partkey",
            "p_name",
            F.col("p_retailprice").cast("double").alias("price"),
            "rn",
        )
    )


@register(
    "window_running_user_totals",
    oracle="""
SELECT event_id, user_id,
       CAST(row_number() OVER w AS BIGINT)                          AS rn,
       CAST(SUM(CAST(value AS DECIMAL(15,4))) OVER w AS DOUBLE)     AS running_value,
       CAST(lag(value) OVER w AS DOUBLE)                            AS prev_value,
       CAST(lead(value) OVER w AS DOUBLE)                           AS next_value
FROM events
WHERE user_id < 50
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    category="window",
)
def window_running_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregates + lag/lead over an event stream."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    running = w.rowsBetween(Window.unboundedPreceding, 0)
    return ev.select(
        "event_id",
        "user_id",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.sum(F.col("value").cast(DEC)).over(running).cast("double").alias("running_value"),
        F.lag("value").over(w).cast("double").alias("prev_value"),
        F.lead("value").over(w).cast("double").alias("next_value"),
    )


@register(
    "window_rank_dense_ntile",
    oracle="""
SELECT p_partkey, p_brand, p_size,
       CAST(rank()       OVER (PARTITION BY p_brand ORDER BY p_size) AS BIGINT) AS rnk,
       CAST(dense_rank() OVER (PARTITION BY p_brand ORDER BY p_size) AS BIGINT) AS drnk,
       CAST(ntile(4)     OVER (PARTITION BY p_brand ORDER BY p_size, p_partkey) AS BIGINT) AS quartile,
       CAST(percent_rank() OVER (PARTITION BY p_brand ORDER BY p_size) AS DOUBLE) AS pct_rank
FROM part
WHERE p_brand IN ('Brand#1','Brand#2','Brand#3')
""",
    category="window",
)
def window_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/ntile/percent_rank incl. genuine ties on p_size."""
    part = load(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
    )
    w = Window.partitionBy("p_brand").orderBy("p_size")
    wu = Window.partitionBy("p_brand").orderBy("p_size", "p_partkey")
    return part.select(
        "p_partkey",
        "p_brand",
        "p_size",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.ntile(4).over(wu).cast("bigint").alias("quartile"),
        F.percent_rank().over(w).cast("double").alias("pct_rank"),
    )


@register(
    "window_order_gaps",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS orderdate,
       CAST(lag(o_orderdate)  OVER w AS DATE) AS prev_orderdate,
       CAST(date_diff('day', lag(o_orderdate) OVER w, o_orderdate) AS INTEGER) AS gap_days
FROM orders
WHERE o_custkey < 200
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
    category="window",
)
def window_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag + date arithmetic: days between consecutive orders per customer."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("orderdate"),
        prev.cast("date").alias("prev_orderdate"),
        F.datediff(F.col("o_orderdate"), prev).cast("int").alias("gap_days"),
    )


@register(
    "sessionize_events",
    oracle="""
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events WHERE user_id < 100
), sessions AS (
  SELECT user_id, ts, event_id,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       COUNT(*) AS n_events, MIN(ts) AS session_start, MAX(ts) AS session_end
FROM sessions
GROUP BY user_id, session_id
""",
    category="window",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization (30-min inactivity gap) — the batch
    shape of streaming session windows (SURVEY.md §2c streaming row is a
    superset of the reference, which has no event-time windows)."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    is_new = F.when(
        prev_ts.isNull()
        | (F.col("ts").cast("long") - prev_ts.cast("long") > 1800),
        1,
    ).otherwise(0)
    running = w.rowsBetween(Window.unboundedPreceding, 0)
    return (
        ev.withColumn("is_new", is_new)
        .withColumn("session_id", F.sum("is_new").over(running).cast("bigint"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


@register(
    "asof_join_purchase_click",
    oracle="""
SELECT p.event_id, p.user_id, p.ts, c.ts AS last_click_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase' AND user_id < 100) p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts > c.ts
""",
    category="join",
)
def asof_join_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent strictly
    earlier click. Union-sort-window plan (functions/asof.py) — one shuffle,
    no range-join explosion; DuckDB native ASOF JOIN is the oracle."""
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") < 100)
    ).select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("last_click_ts")
    )
    return asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_time="ts",
        right_time="last_click_ts",
        right_values=["last_click_ts"],
        strict=True,
    ).select("event_id", "user_id", "ts", "last_click_ts")


@register(
    "pivot_event_type_values",
    oracle="""
SELECT CAST(user_id % 10 AS BIGINT) AS user_bucket,
       CAST(SUM(CASE WHEN event_type = 'click'    THEN CAST(value AS DECIMAL(15,4)) END) AS DOUBLE) AS click,
       CAST(SUM(CASE WHEN event_type = 'error'    THEN CAST(value AS DECIMAL(15,4)) END) AS DOUBLE) AS error,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(15,4)) END) AS DOUBLE) AS purchase,
       CAST(SUM(CASE WHEN event_type = 'signup'   THEN CAST(value AS DECIMAL(15,4)) END) AS DOUBLE) AS signup,
       CAST(SUM(CASE WHEN event_type = 'view'     THEN CAST(value AS DECIMAL(15,4)) END) AS DOUBLE) AS view
FROM events
GROUP BY user_id % 10
""",
    category="aggregation",
)
def pivot_event_type_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with explicit value list (explicit list avoids the extra
    distinct-values job — required practice at scale)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.withColumn("user_bucket", (F.col("user_id") % 10).cast("bigint"))
        .groupBy("user_bucket")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.sum(F.col("value").cast(DEC)).cast("double"))
    )
