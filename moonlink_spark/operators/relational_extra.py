"""Second batch of relational breadth: subqueries, list aggregation,
lateral explode, robust statistics, gap filling, histograms, value windows.

Each query extends SURVEY.md §2c's delegated-relational rows (DataFusion
surface the reference hands its scans to) with shapes the first batch did
not cover. All oracles follow the NOTES_r1 determinism rules: total ORDER
BY on both sides, BIGINT casts where DuckDB would return HUGEINT, money
sums in DECIMAL(15,4) cast back to DOUBLE, round(…, 6) on float ratios.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from moonlink_spark.operators import load, register


# --------------------------------------------------------------------------- #
# correlated EXISTS subquery
# --------------------------------------------------------------------------- #
@register(
    "exists_suppliers_with_heavy_lines",
    oracle="""
SELECT s_suppkey, s_name
FROM supplier s
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 48
)
ORDER BY s_suppkey
""",
    category="subquery",
)
def exists_suppliers_with_heavy_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS — planned as a left-semi join (the same physical
    shape DataFusion/the reference produce for EXISTS)."""
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    heavy = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 48)
        .select("l_suppkey")
    )
    return (
        sup.join(heavy, sup.s_suppkey == heavy.l_suppkey, "left_semi")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------- #
# NOT IN subquery with null-safe semantics
# --------------------------------------------------------------------------- #
@register(
    "not_in_parts_never_shipped",
    oracle="""
SELECT p_partkey, p_name
FROM part
WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45)
ORDER BY p_partkey
""",
    category="subquery",
)
def not_in_parts_never_shipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN over a non-null subquery — left-anti join (null-safe NOT IN
    needs the extra null guard only when the subquery can yield NULL;
    l_partkey is non-null here, matching the anti-join plan exactly)."""
    part = load(spark, sf_dir, "part").select("p_partkey", "p_name")
    heavy = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select("l_partkey")
    )
    return (
        part.join(heavy, part.p_partkey == heavy.l_partkey, "left_anti")
        .orderBy("p_partkey")
    )


# --------------------------------------------------------------------------- #
# string aggregation (listagg)
# --------------------------------------------------------------------------- #
@register(
    "string_agg_top_customers_per_nation",
    oracle="""
WITH top_c AS (
  SELECT c_nationkey, c_name,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
)
SELECT c_nationkey,
       string_agg(c_name, ',' ORDER BY rn) AS top_names,
       CAST(COUNT(*) AS BIGINT) AS n
FROM top_c WHERE rn <= 3
GROUP BY c_nationkey
ORDER BY c_nationkey
""",
    category="aggregation",
)
def string_agg_top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """listagg/string_agg with a deterministic ORDER BY inside the
    aggregate — Spark expresses it as sort-by-struct + array_join (stable,
    engine-portable), the standard way to get ordered string aggregation
    without relying on shuffle order."""
    cust = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    top = cust.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)
    return (
        top.groupBy("c_nationkey")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", "c_name"))),
                    lambda s: s["c_name"],
                ),
                ",",
            ).alias("top_names"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("c_nationkey")
    )


# --------------------------------------------------------------------------- #
# lateral explode with ordinality
# --------------------------------------------------------------------------- #
@register(
    "explode_token_positions",
    oracle="""
WITH tokd AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok,
         generate_subscripts(regexp_extract_all(lower(text), '[a-z0-9]+'), 1) AS pos
  FROM documents WHERE doc_id < 20
)
SELECT doc_id, CAST(pos AS INT) AS pos, tok
FROM tokd WHERE pos <= 5
ORDER BY doc_id, pos
""",
    category="lateral",
)
def explode_token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral view with ordinality: posexplode over the token array —
    the Spark twin of UNNEST WITH ORDINALITY."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    toks = docs.select(
        "doc_id",
        F.posexplode(F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).alias(
            "pos0", "tok"
        ),
    )
    return (
        toks.select(
            "doc_id", (F.col("pos0") + 1).cast("int").alias("pos"), "tok"
        )
        .filter(F.col("pos") <= 5)
        .orderBy("doc_id", "pos")
    )


# --------------------------------------------------------------------------- #
# median / deterministic mode
# --------------------------------------------------------------------------- #
@register(
    "median_mode_order_stats",
    oracle="""
WITH counts AS (
  SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS c
  FROM orders GROUP BY o_orderstatus, o_orderpriority
),
modes AS (
  SELECT o_orderstatus, o_orderpriority AS mode_priority
  FROM (SELECT *, row_number() OVER (PARTITION BY o_orderstatus
                                     ORDER BY c DESC, o_orderpriority) AS rn
        FROM counts) t
  WHERE rn = 1
)
SELECT o.o_orderstatus,
       CAST(median(o.o_totalprice) AS DOUBLE) AS median_price,
       m.mode_priority,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders o JOIN modes m ON o.o_orderstatus = m.o_orderstatus
GROUP BY o.o_orderstatus, m.mode_priority
ORDER BY o.o_orderstatus
""",
    category="aggregation",
)
def median_mode_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median + mode per group. Mode is computed deterministically (count
    desc, value asc) rather than via the engines' mode() builtins, whose
    tie-breaking is engine-dependent — the cross-engine-safe formulation."""
    orders = load(spark, sf_dir, "orders")
    counts = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("c"), F.asc("o_orderpriority")
    )
    modes = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderstatus", F.col("o_orderpriority").alias("mode_priority"))
    )
    return (
        orders.join(F.broadcast(modes), "o_orderstatus")
        .groupBy("o_orderstatus", "mode_priority")
        .agg(
            F.expr("median(o_totalprice)").cast("double").alias("median_price"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("o_orderstatus", "median_price", "mode_priority", "n")
        .orderBy("o_orderstatus")
    )


# --------------------------------------------------------------------------- #
# time-series gap filling
# --------------------------------------------------------------------------- #
@register(
    "gap_fill_daily_order_counts",
    oracle="""
WITH days AS (
  SELECT CAST(unnest(generate_series(DATE '1995-01-01', DATE '1995-03-31',
                                      INTERVAL 1 DAY)) AS DATE) AS d
),
daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1995-04-01 00:00:00'
  GROUP BY CAST(o_orderdate AS DATE)
)
SELECT days.d, COALESCE(daily.n_orders, 0) AS n_orders,
       CASE WHEN daily.d IS NULL THEN TRUE ELSE FALSE END AS filled
FROM days LEFT JOIN daily ON days.d = daily.d
ORDER BY days.d
""",
    category="timeseries",
)
def gap_fill_daily_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense calendar gap-fill: generate the day spine with sequence()
    (no driver loop), left-join sparse aggregates, fill zeros. The spine
    generation is a single-row explode — scale-free."""
    orders = load(spark, sf_dir, "orders")
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("date"),
                F.lit("1995-03-31").cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("d")
    )
    daily = (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1995-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return (
        days.join(daily, "d", "left_outer")
        .select(
            "d",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.col("n_orders").isNull().alias("filled"),
        )
        .orderBy("d")
    )


# --------------------------------------------------------------------------- #
# histogram via width_bucket
# --------------------------------------------------------------------------- #
# width_bucket spelled out as explicit arithmetic (DuckDB has no
# width_bucket builtin, and identical FLOOR arithmetic on both sides
# avoids engine-specific edge handling at bucket boundaries)
_BUCKET_SQL = (
    "CASE WHEN c_acctbal < -1000.0 THEN 0 "
    "WHEN c_acctbal >= 10000.0 THEN 12 "
    "ELSE CAST(FLOOR((c_acctbal - (-1000.0)) / 11000.0 * 11.0) AS BIGINT) + 1 END"
)


@register(
    "width_bucket_balance_histogram",
    oracle=f"""
SELECT CAST({_BUCKET_SQL} AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(round(MIN(c_acctbal), 2) AS DOUBLE) AS lo,
       CAST(round(MAX(c_acctbal), 2) AS DOUBLE) AS hi
FROM customer
GROUP BY 1
ORDER BY bucket
""",
    category="aggregation",
)
def width_bucket_balance_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram: the bucket id is a pure map expression, so
    the histogram is one partial+final aggregation — the canonical
    distributed histogram plan."""
    cust = load(spark, sf_dir, "customer")
    bucket = F.expr(_BUCKET_SQL)
    return (
        cust.groupBy(bucket.cast("bigint").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("c_acctbal"), 2).alias("lo"),
            F.round(F.max("c_acctbal"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------- #
# value windows: first/last/nth with frames
# --------------------------------------------------------------------------- #
@register(
    "first_last_nth_event_values",
    oracle="""
SELECT user_id,
       CAST(round(first_value(value) OVER w, 6) AS DOUBLE) AS first_v,
       CAST(round(last_value(value) OVER w, 6) AS DOUBLE) AS last_v,
       CAST(round(nth_value(value, 2) OVER w, 6) AS DOUBLE) AS second_v,
       event_id
FROM events
WHERE user_id < 50
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY user_id, event_id
""",
    category="window",
)
def first_last_nth_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value over an explicit unbounded frame (the default
    frame for last_value is UNBOUNDED..CURRENT — a classic cross-engine
    trap; pinning the frame makes both engines agree)."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        F.round(F.first("value").over(w), 6).alias("first_v"),
        F.round(F.last("value").over(w), 6).alias("last_v"),
        F.round(F.nth_value("value", 2).over(w), 6).alias("second_v"),
        "event_id",
    ).orderBy("user_id", "event_id")


# --------------------------------------------------------------------------- #
# JSON column extraction
# --------------------------------------------------------------------------- #
@register(
    "json_props_extraction",
    oracle="""
SELECT event_type,
       CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
       CAST(COUNT(CASE WHEN CAST(json_extract(props, '$.k') AS INTEGER) > 50
                       THEN 1 END) AS BIGINT) AS n_high,
       CAST(MIN(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS min_k,
       CAST(MAX(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    category="scalar",
)
def json_props_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON column: path extraction stays JVM-side
    (get_json_object), then ordinary aggregation — no Python, no schema
    inference pass; the 100 TB-safe way to query JSON properties."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.groupBy("event_type")
        .agg(
            F.sum(k).cast("bigint").alias("sum_k"),
            F.count(F.when(k > 50, 1)).alias("n_high"),
            F.min(k).cast("bigint").alias("min_k"),
            F.max(k).cast("bigint").alias("max_k"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------- #
# TPC-H analog gap-fill: q4 / q8 / q20 / q21 shapes (adapted to the
# synthetic schema, which has no commit/receipt dates)
# --------------------------------------------------------------------------- #

_SQL_DISC = (
    "CAST(l_extendedprice AS DECIMAL(15,4)) * "
    "(CAST(1.0 AS DECIMAL(15,4)) - CAST(l_discount AS DECIMAL(15,4)))"
)


def _disc_price():
    dec = "decimal(15,4)"
    return F.col("l_extendedprice").cast(dec) * (
        F.lit(1.0).cast(dec) - F.col("l_discount").cast(dec)
    )


@register(
    "q4_order_priority_check",
    oracle="""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    category="subquery",
)
def q4_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: quarter filter + correlated EXISTS + priority
    count (EXISTS condition adapted: discounted lines instead of the
    absent late-receipt predicate). Plan: filter -> left-semi join ->
    single agg shuffle."""
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    disc = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_discount") > 0.05)
        .select("l_orderkey")
    )
    return (
        orders.join(disc, orders.o_orderkey == disc.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q8_market_share",
    oracle=f"""
WITH volumes AS (
  SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
         {_SQL_DISC} AS volume,
         n.n_name AS supp_nation
  FROM lineitem l
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  WHERE o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
)
SELECT CAST(o_year AS BIGINT) AS o_year,
       CAST(round(CAST(SUM(CASE WHEN supp_nation = 'BRAZIL' THEN volume
                                ELSE CAST(0 AS DECIMAL(15,4)) END) AS DOUBLE)
            / CAST(SUM(volume) AS DOUBLE), 6) AS DOUBLE) AS mkt_share
FROM volumes
GROUP BY o_year
ORDER BY o_year
""",
    category="join",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of yearly order volume —
    multi-join star with broadcast dims, decimal-exact conditional sums,
    one agg shuffle."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    vol = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            _disc_price().alias("volume"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    zero = F.lit(0).cast("decimal(15,4)")
    return (
        vol.groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "BRAZIL", F.col("volume"))
                      .otherwise(zero)).cast("double")
                / F.sum("volume").cast("double"),
                6,
            ).alias("mkt_share")
        )
        .select(F.col("o_year").cast("bigint").alias("o_year"), "mkt_share")
        .orderBy("o_year")
    )


@register(
    "q20_part_supplier_candidates",
    oracle="""
SELECT s.s_suppkey, s.s_name
FROM supplier s
WHERE s.s_suppkey IN (
  SELECT l.l_suppkey
  FROM lineitem l
  WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%')
  GROUP BY l.l_suppkey
  HAVING SUM(l.l_quantity) > 1500.0
)
ORDER BY s.s_suppkey
""",
    category="subquery",
)
def q20_part_supplier_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN subqueries — suppliers who moved more
    than a threshold quantity of matching parts. Inner IN -> semi join,
    HAVING -> post-agg filter, outer IN -> semi join."""
    part = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%bolt%"))
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem")
    heavy_sups = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 1500.0)
        .select("l_suppkey")
    )
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sup.join(heavy_sups, sup.s_suppkey == heavy_sups.l_suppkey, "left_semi")
        .orderBy("s_suppkey")
    )


@register(
    "q21_multi_line_order_suppliers",
    oracle="""
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o    ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
""",
    category="subquery",
)
def q21_multi_line_order_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the only supplier at fault — EXISTS (another
    supplier on the order) + NOT EXISTS (another supplier also flagged).
    Returned-flag stands in for the absent receipt-late predicate. Plan:
    semi + anti join on the same key, no correlation re-execution."""
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    # EXISTS: some other supplier on the same order
    others = li.alias("l2")
    exists_cond = (
        (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey"))
    )
    # NOT EXISTS: no other supplier with a flagged line on the order
    flagged_others = li.filter(F.col("l_returnflag") == "R").alias("l3")
    notexists_cond = (
        (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey"))
    )
    base = (
        l1.join(orders, F.col("l1.l_orderkey") == orders.o_orderkey, "left_semi")
        .join(others, exists_cond, "left_semi")
        .join(flagged_others, notexists_cond, "left_anti")
    )
    return (
        base.join(F.broadcast(sup), F.col("l1.l_suppkey") == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
    )


# --------------------------------------------------------------------------- #
# full outer join (mismatched key sets on both sides)
# --------------------------------------------------------------------------- #
@register(
    "full_outer_urgent_vs_returns",
    oracle="""
WITH u AS (
  SELECT o_custkey AS ck, CAST(COUNT(*) AS BIGINT) AS n_urgent
  FROM orders WHERE o_orderpriority = '1-URGENT'
  GROUP BY o_custkey
), r AS (
  SELECT o.o_custkey AS ck, CAST(COUNT(*) AS BIGINT) AS n_return_lines
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_returnflag = 'R'
  GROUP BY o.o_custkey
)
SELECT CAST(COALESCE(u.ck, r.ck) AS BIGINT) AS custkey,
       CAST(COALESCE(u.n_urgent, 0) AS BIGINT) AS n_urgent,
       CAST(COALESCE(r.n_return_lines, 0) AS BIGINT) AS n_return_lines,
       CASE WHEN u.ck IS NULL THEN 'returns_only'
            WHEN r.ck IS NULL THEN 'urgent_only'
            ELSE 'both' END AS side
FROM u FULL OUTER JOIN r ON u.ck = r.ck
ORDER BY custkey
""",
    category="join",
)
def full_outer_urgent_vs_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER JOIN with genuinely mismatched key sets: customers who
    placed urgent orders vs customers with returned line items; either side
    can be missing. Completes the outer-join family (left outer is q13).

    Scale shape: both inputs are pre-aggregated to one row per customer
    before the join, so the full-outer is a shuffle hash/sort-merge join on
    the customer key over already-reduced data — full outer can never
    broadcast, so reducing before joining is the 100 TB plan.
    """
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy(F.col("o_custkey").alias("u_ck"))
        .agg(F.count(F.lit(1)).alias("n_urgent"))
    )
    returns = (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("o_custkey").alias("r_ck"))
        .agg(F.count(F.lit(1)).alias("n_return_lines"))
    )
    joined = urgent.join(returns, urgent.u_ck == returns.r_ck, "full_outer")
    return (
        joined.select(
            F.coalesce("u_ck", "r_ck").alias("custkey"),
            F.coalesce("n_urgent", F.lit(0)).alias("n_urgent"),
            F.coalesce("n_return_lines", F.lit(0)).alias("n_return_lines"),
            F.when(F.col("u_ck").isNull(), F.lit("returns_only"))
            .when(F.col("r_ck").isNull(), F.lit("urgent_only"))
            .otherwise(F.lit("both"))
            .alias("side"),
        )
        .orderBy("custkey")
    )
