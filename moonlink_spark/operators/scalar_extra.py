"""Extended scalar/aggregate surface: percentiles, arg-min/max, statistics,
correlated-subquery shapes, conditional expressions, regexp ops, date
arithmetic, vector stats, predicate deletes.

Fills out SURVEY.md §2c scalar/aggregation rows beyond the TPC-H shapes.
Order-sensitive float aggregates (corr/stddev/var) are rounded to 6 decimals
on both engines; percentile interpolation and arg-min with a unique-ified
ordering value are bit-exact (verified)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from moonlink_spark.operators import ensure_parallelism, load, register

DEC = "decimal(15,4)"


@register(
    "percentiles_by_flag",
    oracle="""
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.5)  AS median_price,
       quantile_cont(l_extendedprice, 0.95) AS p95_price,
       quantile_cont(l_quantity, 0.5)       AS median_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
""",
    category="aggregation",
)
def percentiles_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark percentile == DuckDB
    quantile_cont, bit-for-bit — verified).

    SCALE NOTE: exact ``percentile`` buffers a per-group value->count
    map that merges into one final reducer task per group — with only 3
    distinct ``l_returnflag`` values, 100x the distinct-price set
    concentrates a multi-GB aggregation buffer in 3 tasks. This exact
    variant exists for oracle parity at small sf; the 100 TB path is
    ``approx_percentiles_by_flag`` below (t-digest sketch: mergeable,
    bounded state per partial), same rule as SCALE.md §1 "bounded
    aggregation state".

    ensure_parallelism: single-row-group fixtures scan as one split, so
    the per-partition value->count buffer build ran on one core; the
    conditional floor spreads the partial phase (1.603 -> 1.389 s
    interleaved, r13; no-op at real split counts) and percentile buffer
    merges are exact and order-independent."""
    li = ensure_parallelism(load(spark, sf_dir, "lineitem"))
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("median_price"),
        F.percentile("l_extendedprice", F.lit(0.95)).alias("p95_price"),
        F.percentile("l_quantity", F.lit(0.5)).alias("median_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "approx_percentiles_by_flag",
    oracle="""
SELECT l_returnflag,
       CAST(quantile_cont(l_extendedprice, 0.5) AS DOUBLE)  AS median_exact,
       CAST(quantile_cont(l_extendedprice, 0.95) AS DOUBLE) AS p95_exact,
       TRUE AS approx_within_tol,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
""",
    category="aggregation",
)
def approx_percentiles_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB percentile path: ``percentile_approx`` (Greenwald-
    Khanna/t-digest-style sketch) keeps BOUNDED mergeable state per
    partial aggregate regardless of the distinct-value count, so a
    3-value group key never concentrates a value->count map in 3
    reducer tasks the way exact ``percentile`` does.

    Verified against the exact percentile inside the query itself: the
    ``approx_within_tol`` column asserts the sketch answer is within
    0.5% relative error of the exact one (accuracy=10000 bounds rank
    error at 1/10000, far tighter than 0.5% in value space on this
    distribution), and the oracle pins it to TRUE — a hash-exact check
    that the approx path actually lands within its declared tolerance."""
    li = load(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("m_exact"),
        F.percentile("l_extendedprice", F.lit(0.95)).alias("p_exact"),
        F.percentile_approx(
            "l_extendedprice", F.lit(0.5), F.lit(10000)
        ).alias("m_approx"),
        F.percentile_approx(
            "l_extendedprice", F.lit(0.95), F.lit(10000)
        ).alias("p_approx"),
        F.count(F.lit(1)).alias("n"),
    )
    tol = 0.005
    within = (
        (F.abs(F.col("m_approx") - F.col("m_exact")) / F.col("m_exact") < tol)
        & (F.abs(F.col("p_approx") - F.col("p_exact")) / F.col("p_exact") < tol)
    )
    # RAW doubles, no round: Spark `percentile` equals DuckDB
    # quantile_cont bit-for-bit (the exact twin's verified contract), but
    # round(x, 2) does NOT cross engines on half-cent boundaries — an
    # interpolated percentile landing 1 ulp below x.xx5 (e.g.
    # 52724.244999999995 at sf0.001) rounds down in Spark's HALF_UP on
    # the true double and up in DuckDB (inherited landmine, fixed r13;
    # both sides changed together, oracle stays hash-exact)
    return agg.select(
        "l_returnflag",
        F.col("m_exact").cast("double").alias("median_exact"),
        F.col("p_exact").cast("double").alias("p95_exact"),
        within.alias("approx_within_tol"),
        "n",
    )


@register(
    "argminmax_parts_per_brand",
    oracle="""
SELECT p_brand,
       arg_min(p_partkey, p_retailprice * 1e9 + p_partkey) AS cheapest_part,
       arg_max(p_partkey, p_retailprice * 1e9 + p_partkey) AS priciest_part,
       CAST(MIN(p_retailprice) AS DOUBLE) AS min_price,
       CAST(MAX(p_retailprice) AS DOUBLE) AS max_price
FROM part
GROUP BY p_brand
""",
    category="aggregation",
)
def argminmax_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by with the ordering value unique-ified (price*1e9 +
    unique key) so ties cannot make the winner engine-dependent."""
    p = load(spark, sf_dir, "part")
    v = F.col("p_retailprice") * 1e9 + F.col("p_partkey")
    return p.groupBy("p_brand").agg(
        F.min_by("p_partkey", v).alias("cheapest_part"),
        F.max_by("p_partkey", v).alias("priciest_part"),
        F.min("p_retailprice").cast("double").alias("min_price"),
        F.max("p_retailprice").cast("double").alias("max_price"),
    )


@register(
    "event_value_statistics",
    oracle="""
SELECT event_type,
       CAST(round(avg(value), 6) AS DOUBLE)           AS mean_v,
       CAST(round(stddev_samp(value), 6) AS DOUBLE)   AS sd_v,
       CAST(round(var_samp(value), 6) AS DOUBLE)      AS var_v,
       CAST(round(corr(value, CAST(user_id AS DOUBLE)), 6) AS DOUBLE) AS corr_vu,
       CAST(round(covar_samp(value, CAST(user_id AS DOUBLE)), 6) AS DOUBLE) AS cov_vu
FROM events
GROUP BY event_type
""",
    category="aggregation",
)
def event_value_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates, rounded to absorb summation-order noise."""
    ev = load(spark, sf_dir, "events")
    u = F.col("user_id").cast("double")
    return ev.groupBy("event_type").agg(
        F.round(F.avg("value"), 6).alias("mean_v"),
        F.round(F.stddev_samp("value"), 6).alias("sd_v"),
        F.round(F.var_samp("value"), 6).alias("var_v"),
        F.round(F.corr("value", u), 6).alias("corr_vu"),
        F.round(F.covar_samp("value", u), 6).alias("cov_vu"),
    )


@register(
    "customers_above_nation_avg",
    oracle="""
WITH nation_avg AS (
  SELECT c_nationkey,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(15,4))) AS DOUBLE)
           / COUNT(*) AS avg_bal
  FROM customer GROUP BY c_nationkey
)
SELECT c_custkey, c_nationkey,
       CAST(c_acctbal AS DOUBLE) AS acctbal,
       CAST(round(avg_bal, 6) AS DOUBLE) AS nation_avg_bal
FROM customer JOIN nation_avg USING (c_nationkey)
WHERE c_acctbal > avg_bal
""",
    category="aggregation",
)
def customers_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery shape (customer above its nation's average) as a
    window aggregate — one shuffle, no re-join of the fact table."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey")
    avg_bal = (
        F.sum(F.col("c_acctbal").cast(DEC)).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    return (
        c.withColumn("avg_bal", avg_bal)
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .select(
            "c_custkey",
            "c_nationkey",
            F.col("c_acctbal").cast("double").alias("acctbal"),
            F.round("avg_bal", 6).alias("nation_avg_bal"),
        )
    )


@register(
    "conditional_expressions",
    oracle="""
SELECT c_custkey,
       coalesce(nullif(c_mktsegment, 'BUILDING'), 'REDACTED')   AS seg_masked,
       CASE WHEN c_acctbal < 0 THEN 'debt'
            WHEN c_acctbal < 5000 THEN 'low'
            WHEN c_acctbal < 8000 THEN 'mid'
            ELSE 'high' END                                     AS bal_band,
       CAST(greatest(c_acctbal, 0.0) AS DOUBLE)                 AS bal_floor,
       CAST(least(c_acctbal, 9999.0) AS DOUBLE)                 AS bal_cap,
       (c_nationkey BETWEEN 5 AND 15)                           AS mid_nation
FROM customer
""",
    category="scalar",
)
def conditional_expressions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("REDACTED")
        ).alias("seg_masked"),
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .when(F.col("c_acctbal") < 8000, "mid")
        .otherwise("high")
        .alias("bal_band"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).cast("double").alias("bal_floor"),
        F.least(F.col("c_acctbal"), F.lit(9999.0)).cast("double").alias("bal_cap"),
        F.col("c_nationkey").between(5, 15).alias("mid_nation"),
    )


@register(
    "regexp_string_ops",
    oracle="""
SELECT doc_id,
       regexp_extract(text, '([a-z]+) ([a-z]+)', 1)      AS first_word,
       regexp_replace(substr(text, 1, 64), '[aeiou]', '_', 'g') AS devoweled_head,
       lpad(CAST(doc_id AS VARCHAR), 8, '0')             AS padded_id,
       reverse(substr(text, 1, 12))                      AS rev_head,
       split_part(text, ' ', 3)                          AS third_token,
       CAST(length(translate(substr(text, 1, 64), 'abc', 'xy')) AS BIGINT) AS translated_len
FROM documents WHERE doc_id < 200
""",
    category="scalar",
)
def regexp_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        F.regexp_extract("text", "([a-z]+) ([a-z]+)", 1).alias("first_word"),
        F.regexp_replace(F.substring("text", 1, 64), "[aeiou]", "_").alias(
            "devoweled_head"
        ),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("padded_id"),
        F.reverse(F.substring("text", 1, 12)).alias("rev_head"),
        F.split_part("text", F.lit(" "), F.lit(3)).alias("third_token"),
        F.length(F.translate(F.substring("text", 1, 64), "abc", "xy"))
        .cast("bigint")
        .alias("translated_len"),
    )


@register(
    "date_arithmetic",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderdate AS DATE)                         AS od,
       CAST(o_orderdate AS DATE) + INTERVAL 30 DAY       AS due_date,
       CAST(o_orderdate AS DATE) - INTERVAL 7 DAY        AS week_before,
       last_day(CAST(o_orderdate AS DATE))               AS month_end,
       CAST(date_trunc('week', o_orderdate) AS DATE)     AS week_start,
       CAST(isodow(o_orderdate) AS INTEGER)              AS iso_dow,
       CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INTEGER) AS days_since_95
FROM orders WHERE o_orderkey < 500
""",
    category="scalar",
)
def date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    od = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        od.alias("od"),
        F.date_add(od, 30).cast("timestamp").alias("due_date"),
        F.date_sub(od, 7).cast("timestamp").alias("week_before"),
        F.last_day(od).alias("month_end"),
        F.date_trunc("week", "o_orderdate").cast("date").alias("week_start"),
        (F.weekday("o_orderdate") + 1).cast("int").alias("iso_dow"),
        F.datediff(od, F.lit("1995-01-01").cast("date")).cast("int").alias(
            "days_since_95"
        ),
    )


@register(
    "union_all_with_dup_counts",
    oracle="""
SELECT o_custkey, COUNT(*) AS appearances
FROM (
  SELECT o_custkey FROM orders WHERE o_totalprice > 300000
  UNION ALL
  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
) u
GROUP BY o_custkey
HAVING COUNT(*) >= 3
""",
    category="setop",
)
def union_all_with_dup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    u = o.filter(F.col("o_totalprice") > 300000).select("o_custkey").unionAll(
        o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    )
    return (
        u.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("appearances"))
        .filter(F.col("appearances") >= 3)
    )


@register(
    "embedding_vector_stats",
    oracle="""
SELECT vec_id, label,
       CAST(len(embedding) AS INTEGER) AS dim,
       CAST(round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                        CAST(embedding AS DOUBLE[]))), 6) AS DOUBLE) AS l2_norm,
       CAST(round(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x))
             / len(embedding), 6) AS DOUBLE) AS mean_elem,
       CAST(round(list_min(CAST(embedding AS DOUBLE[])), 6) AS DOUBLE) AS min_elem,
       CAST(round(list_max(CAST(embedding AS DOUBLE[])), 6) AS DOUBLE) AS max_elem
FROM embeddings WHERE vec_id < 100
""",
    category="similarity",
)
def embedding_vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions over the embedding column."""
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with("embedding", F.col("embedding"), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    elem_sum = F.aggregate(dbl, F.lit(0.0), lambda a, x: a + x)
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").cast("int").alias("dim"),
        F.round(F.sqrt(dot), 6).alias("l2_norm"),
        F.round(elem_sum / F.size("embedding"), 6).alias("mean_elem"),
        F.round(F.array_min(dbl), 6).alias("min_elem"),
        F.round(F.array_max(dbl), 6).alias("max_elem"),
    )


@register(
    "ingest_delete_where_scan",
    oracle="""
SELECT event_id, event_type, CAST(value AS DOUBLE) AS value
FROM events
WHERE NOT (event_type = 'error' OR value < 5.0)
""",
    category="ingest",
)
def ingest_delete_where_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate delete (engine extension beyond identity deletes): load
    events, delete_where, scan survivors."""
    import tempfile

    from moonlink_spark.table.identity import IdentityProp
    from moonlink_spark.table.table import MoonlinkTable

    ev = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    t = MoonlinkTable.create(
        spark,
        tempfile.mkdtemp(prefix="moonlink-delwhere-") + "/t",
        [
            {"name": "event_id", "data_type": "int64", "nullable": False},
            {"name": "event_type", "data_type": "string"},
            {"name": "value", "data_type": "float64"},
        ],
        IdentityProp.single("event_id"),
    )
    t.append_df(ev)
    t.commit(lsn=1)
    t.delete_where("event_type = 'error' OR value < 5.0")
    t.commit(lsn=2)
    return t.scan()


@register(
    "regression_per_event_type",
    oracle="""
SELECT event_type,
       CAST(round(regr_slope(value, CAST(user_id AS DOUBLE)), 6) AS DOUBLE)     AS slope,
       CAST(round(regr_intercept(value, CAST(user_id AS DOUBLE)), 6) AS DOUBLE) AS intercept,
       CAST(round(regr_r2(value, CAST(user_id AS DOUBLE)), 6) AS DOUBLE)        AS r2,
       CAST(regr_count(value, CAST(user_id AS DOUBLE)) AS BIGINT)               AS n
FROM events
GROUP BY event_type
""",
    category="aggregation",
)
def regression_per_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregates (regr_slope/intercept/r2) per group —
    rounded for summation-order noise like the other moment aggregates."""
    ev = load(spark, sf_dir, "events")
    u = F.col("user_id").cast("double")
    return ev.groupBy("event_type").agg(
        F.round(F.regr_slope(F.col("value"), u), 6).alias("slope"),
        F.round(F.regr_intercept(F.col("value"), u), 6).alias("intercept"),
        F.round(F.regr_r2(F.col("value"), u), 6).alias("r2"),
        F.regr_count(F.col("value"), u).cast("bigint").alias("n"),
    )


@register(
    "approx_sketches",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS hll_ok, TRUE AS kll_median_ok, TRUE AS kll_p99_ok
FROM events GROUP BY event_type ORDER BY event_type
""",
    category="aggregation",
)
def approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates for 100 TB cardinality work: HLL++ distinct
    counts and KLL-style percentile sketches — constant memory per group
    where the exact versions shuffle all distinct values.

    Oracle-checkable via the exact-recount pattern (same as
    ``approx_heavy_hitters``): sketch values are implementation-specific
    (Spark HLL++ vs DuckDB HyperLogLog legitimately disagree), so the
    sketches run for real but the OUTPUT carries the exact quantities plus
    booleans asserting each sketch landed inside its published error bound
    (HLL rsd=0.01 -> 5-sigma band; percentile_approx accuracy=10000 ->
    rank error 1e-4, checked against the exact p40/p60 and p98/max
    brackets). The oracle pins the booleans TRUE: a broken sketch flips
    the flag and fails the gate."""
    ev = load(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.countDistinct("user_id").cast("bigint").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.01).alias("hll_users"),
        F.percentile_approx("value", F.lit(0.5), F.lit(10000)).alias("kll_median"),
        F.percentile_approx("value", F.lit(0.99), F.lit(10000)).alias("kll_p99"),
        F.expr("percentile(value, 0.40D)").alias("p40"),
        F.expr("percentile(value, 0.60D)").alias("p60"),
        F.expr("percentile(value, 0.98D)").alias("p98"),
        F.max("value").alias("vmax"),
    )
    return (
        agg.select(
            "event_type",
            "n",
            "exact_users",
            (
                F.abs(F.col("hll_users") - F.col("exact_users"))
                <= F.col("exact_users") * F.lit(0.05) + F.lit(1)
            ).alias("hll_ok"),
            F.col("kll_median").between(F.col("p40"), F.col("p60")).alias(
                "kll_median_ok"
            ),
            F.col("kll_p99").between(F.col("p98"), F.col("vmax")).alias(
                "kll_p99_ok"
            ),
        )
        .orderBy("event_type")
    )
