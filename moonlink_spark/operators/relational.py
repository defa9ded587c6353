"""Relational operator surface: scans, joins, aggregations, set ops, sorts.

The reference delegates this surface to its read engines (DataFusion REPL
``src/moonlink_datafusion/src/main.rs:22-26``; DuckDB/Spark/Postgres per
``README.md:88-91``) — SURVEY.md §2c maps each category to the Spark
primitive. These queries ARE that surface, expressed Spark-first: declarative
DataFrame plans, broadcast hints on dimension joins, decimal-exact money
aggregation (so results hash-match the DuckDB oracle bit-for-bit), filters
placed for parquet pushdown.

Scale notes (100 TB):
- Dimension tables (region/nation/supplier/part/customer at TPC-H ratios) are
  broadcast — no shuffle of lineitem for those joins.
- Aggregations are partial+final by construction (groupBy on DataFrames);
  AQE coalesces post-shuffle partitions.
- Every filter is on a scanned column -> parquet predicate pushdown; every
  query selects only needed columns -> column pruning in the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from moonlink_spark.operators import ensure_parallelism, load, register

# Money arithmetic is done in DECIMAL so Spark and DuckDB sums are exact and
# order-independent; final results are cast back to DOUBLE on both sides.
DEC = "decimal(15,4)"


def _m(c: str):
    return F.col(c).cast(DEC)


def _disc_price():
    return _m("l_extendedprice") * (F.lit(1.0).cast(DEC) - _m("l_discount"))


_SQL_DISC = (
    "CAST(l_extendedprice AS DECIMAL(15,4)) * "
    "(CAST(1.0 AS DECIMAL(15,4)) - CAST(l_discount AS DECIMAL(15,4)))"
)


# --------------------------------------------------------------------------- #
# q1: pricing summary (TPC-H Q1 shape): scan + filter + hash agg
# --------------------------------------------------------------------------- #
@register(
    "q1_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(15,4))) AS DOUBLE)       AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,4))) AS DOUBLE)  AS sum_base_price,
       CAST(SUM({_SQL_DISC}) AS DOUBLE)                             AS sum_disc_price,
       CAST(SUM({_SQL_DISC} * (CAST(1.0 AS DECIMAL(15,4)) + CAST(l_tax AS DECIMAL(15,4)))) AS DOUBLE) AS sum_charge,
       COUNT(*)                                                     AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-08-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    category="aggregation",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-scan hash aggregation with computed measures (delegated surface;
    reference scan parity: moonlink_datafusion table_provider.rs:74-172).

    ensure_parallelism: the sf fixtures scan as ONE split (single row
    group), so the heavy decimal partial aggregation ran on one core; the
    conditional floor spreads it (measured 1.205 -> 0.893 s interleaved,
    r13) and is a strict no-op at real split counts. Decimal sums and
    count are exact and commutative, so the result is partition-
    independent (value-identical verified at sf0.1)."""
    li = ensure_parallelism(load(spark, sf_dir, "lineitem"))
    charge = _disc_price() * (F.lit(1.0).cast(DEC) + _m("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-08-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_m("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_m("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(_disc_price()).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------- #
# q3: shipping priority (join + agg + top-k)
# --------------------------------------------------------------------------- #
@register(
    "q3_shipping_priority",
    oracle=f"""
SELECT l_orderkey,
       CAST(SUM({_SQL_DISC}) AS DOUBLE) AS revenue,
       CAST(o_orderdate AS DATE)        AS orderdate,
       o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    category="join",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join; customer side broadcast (small dim at TPC-H ratio)."""
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    return (
        li.join(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------- #
# q5: local supplier volume (5-way join through region)
# --------------------------------------------------------------------------- #
@register(
    "q5_local_supplier_volume",
    oracle=f"""
SELECT n_name, CAST(SUM({_SQL_DISC}) AS DOUBLE) AS revenue
FROM customer
  JOIN orders   ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
""",
    category="join",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: the classic snowflake join; all dims broadcast."""
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nr = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nr), supp.s_nationkey == nr.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )


# --------------------------------------------------------------------------- #
# q6: forecast revenue (pure filter + sum: predicate pushdown showcase)
# --------------------------------------------------------------------------- #
@register(
    "q6_forecast_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,4)) * CAST(l_discount AS DECIMAL(15,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
""",
    category="filter",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All predicates reach the parquet scan (PushedFilters); single partial+
    final agg, no shuffle of data rows."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_m("l_extendedprice") * _m("l_discount"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------- #
# q7: volume by nation pair + year
# --------------------------------------------------------------------------- #
@register(
    "q7_nation_volume",
    oracle=f"""
SELECT supp_nation, cust_nation, l_year, CAST(SUM(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INTEGER) AS l_year,
         {_SQL_DISC} AS volume
  FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                JOIN orders   ON o_orderkey = l_orderkey
                JOIN customer ON c_custkey = o_custkey
                JOIN nation n1 ON s_nationkey = n1.n_nationkey
                JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE n1.n_name IN ('NATION_1','NATION_2') AND n2.n_name IN ('NATION_1','NATION_2')
    AND n1.n_name <> n2.n_name
) shipping
GROUP BY supp_nation, cust_nation, l_year
""",
    category="join",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join of nation on both join legs (theta condition n1 <> n2)."""
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    names = ["NATION_1", "NATION_2"]
    n1 = n1.filter(F.col("supp_nation").isin(names))
    n2 = n2.filter(F.col("cust_nation").isin(names))
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(
            F.broadcast(n2),
            (F.col("c_nationkey") == F.col("n2_key"))
            & (F.col("supp_nation") != F.col("cust_nation")),
        )
        .withColumn("l_year", F.year("l_shipdate").cast("int"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )


# --------------------------------------------------------------------------- #
# q9: product-type profit by nation and year
# --------------------------------------------------------------------------- #
@register(
    "q9_product_profit",
    oracle=f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(SUM({_SQL_DISC}) AS DOUBLE) AS sum_profit
FROM lineitem JOIN part     ON p_partkey = l_partkey
              JOIN supplier ON s_suppkey = l_suppkey
              JOIN orders   ON o_orderkey = l_orderkey
              JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, CAST(year(o_orderdate) AS INTEGER)
""",
    category="join",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    ).select("p_partkey")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            _disc_price().alias("volume"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("volume").cast("double").alias("sum_profit"))
    )


# --------------------------------------------------------------------------- #
# q10: returned-item reporting (top 20 customers by lost revenue)
# --------------------------------------------------------------------------- #
@register(
    "q10_returned_items",
    oracle=f"""
SELECT c_custkey, c_name, CAST(SUM({_SQL_DISC}) AS DOUBLE) AS revenue,
       n_name, c_acctbal
FROM customer JOIN orders   ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
              JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    category="join",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name", "c_acctbal")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------- #
# q12: priority classes by line status (join + conditional agg)
# --------------------------------------------------------------------------- #
@register(
    "q12_priority_lines",
    oracle="""
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
GROUP BY l_linestatus
ORDER BY l_linestatus
""",
    category="aggregation",
)
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


# --------------------------------------------------------------------------- #
# q13: customer order-count distribution (left outer join + double agg)
# --------------------------------------------------------------------------- #
@register(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
""",
    category="join",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    ).select("o_custkey", "o_orderkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


# --------------------------------------------------------------------------- #
# q14: promo revenue share (conditional agg ratio)
# --------------------------------------------------------------------------- #
@register(
    "q14_promo_effect",
    oracle=f"""
SELECT CAST(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_SQL_DISC} ELSE CAST(0 AS DECIMAL(15,4)) END) AS DOUBLE)
            / CAST(SUM({_SQL_DISC}) AS DOUBLE) AS DOUBLE) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
""",
    category="aggregation",
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    promo = F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(
        F.lit(0).cast(DEC)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(_disc_price()).cast("double")
            )
            .cast("double")
            .alias("promo_revenue")
        )
    )


# --------------------------------------------------------------------------- #
# q16: supplier counts by part attrs (distinct agg + anti filter)
# --------------------------------------------------------------------------- #
@register(
    "q16_parts_suppliers",
    oracle="""
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#13' AND p_size IN (1, 10, 20, 30, 42)
GROUP BY p_brand, p_type, p_size
""",
    category="aggregation",
)
def q16_parts_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13") & F.col("p_size").isin(1, 10, 20, 30, 42)
    )
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------- #
# q18: large-volume customers (agg + having + semi join back)
# --------------------------------------------------------------------------- #
@register(
    "q18_large_orders",
    oracle="""
SELECT c_custkey, c_name, o_orderkey,
       CAST(o_totalprice AS DOUBLE) AS totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(15,4))) AS DOUBLE) AS sum_qty
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
HAVING SUM(CAST(l_quantity AS DECIMAL(15,4))) > 150
""",
    category="aggregation",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
        .agg(F.sum(_m("l_quantity")).alias("qty_dec"))
        .filter(F.col("qty_dec") > 150)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("totalprice"),
            F.col("qty_dec").cast("double").alias("sum_qty"),
        )
    )


# --------------------------------------------------------------------------- #
# q19: discounted revenue (disjunctive multi-attribute predicate)
# --------------------------------------------------------------------------- #
@register(
    "q19_discounted_revenue",
    oracle=f"""
SELECT CAST(SUM({_SQL_DISC}) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity >= 20 AND l_quantity <= 30)
""",
    category="filter",
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    c = F.col
    pred = (
        ((c("p_brand") == "Brand#12") & c("p_size").between(1, 15) & c("l_quantity").between(1, 11))
        | ((c("p_brand") == "Brand#23") & c("p_size").between(1, 25) & c("l_quantity").between(10, 20))
        | ((c("p_brand") == "Brand#34") & c("p_size").between(1, 35) & c("l_quantity").between(20, 30))
    )
    return j.filter(pred).agg(F.sum(_disc_price()).cast("double").alias("revenue"))


# --------------------------------------------------------------------------- #
# semi / anti joins (EXISTS / NOT EXISTS)
# --------------------------------------------------------------------------- #
@register(
    "semi_join_customers_with_urgent_orders",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
                AND o_totalprice > 400000)
""",
    category="join",
)
def semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 400000)
    ).select("o_custkey")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    )


@register(
    "anti_join_customers_without_orders",
    oracle="""
SELECT c_custkey, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
    category="join",
)
def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = load(spark, sf_dir, "orders").select("o_custkey")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")


# --------------------------------------------------------------------------- #
# set operations
# --------------------------------------------------------------------------- #
@register(
    "set_ops_order_status",
    oracle="""
WITH o_cust AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'),
     f_cust AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
     p_cust AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'P')
SELECT o_custkey, 'both_O_F' AS tag FROM (SELECT * FROM o_cust INTERSECT SELECT * FROM f_cust)
UNION ALL
SELECT o_custkey, 'O_not_P' AS tag FROM (SELECT * FROM o_cust EXCEPT SELECT * FROM p_cust)
""",
    category="setop",
)
def set_ops_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersect / except / union surface (SURVEY.md §2c set ops)."""
    orders = load(spark, sf_dir, "orders")
    by = lambda s: orders.filter(F.col("o_orderstatus") == s).select("o_custkey").distinct()
    both = by("O").intersect(by("F")).withColumn("tag", F.lit("both_O_F"))
    onp = by("O").exceptAll(by("P")).withColumn("tag", F.lit("O_not_P"))
    return both.unionByName(onp)


# --------------------------------------------------------------------------- #
# rollup / cube / grouping sets
# --------------------------------------------------------------------------- #
@register(
    "rollup_orders",
    oracle="""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(15,4))) AS DOUBLE) AS total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
    category="aggregation",
)
def rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_m("o_totalprice")).cast("double").alias("total"),
    )


@register(
    "cube_lineitem_flags",
    oracle="""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(15,4))) AS DOUBLE) AS qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    category="aggregation",
)
def cube_lineitem_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_m("l_quantity")).cast("double").alias("qty"),
    )


# --------------------------------------------------------------------------- #
# scalar function surface: string/date/math/json
# --------------------------------------------------------------------------- #
@register(
    "scalar_functions",
    oracle="""
SELECT event_id,
       upper(event_type)                                   AS etype_upper,
       substr(event_type, 1, 3)                            AS etype_pfx,
       concat(event_type, ':', CAST(user_id AS VARCHAR))   AS tagged,
       length(event_type)                                  AS etype_len,
       CAST(year(ts) AS INTEGER)                           AS y,
       CAST(month(ts) AS INTEGER)                          AS m,
       CAST(dayofmonth(ts) AS INTEGER)                     AS d,
       date_trunc('hour', ts)                              AS ts_hour,
       CAST(abs(value - 50.0) AS DOUBLE)                   AS dist50,
       CAST(floor(value) AS BIGINT)                        AS vfloor,
       CAST(user_id % 7 AS BIGINT)                         AS bucket7,
       CAST(json_extract_string(props, '$.k') AS INTEGER)  AS k_val
FROM events
WHERE event_type IN ('click', 'purchase') AND user_id < 100
""",
    category="scalar",
)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date/math/JSON scalar surface (SURVEY.md §2c scalar row;
    JSON stored as string like the reference's Utf8+ext json columns,
    pg_replicate/util.rs:82)."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase") & (F.col("user_id") < 100)
    )
    return ev.select(
        "event_id",
        F.upper("event_type").alias("etype_upper"),
        F.substring("event_type", 1, 3).alias("etype_pfx"),
        F.concat_ws(":", "event_type", F.col("user_id").cast("string")).alias("tagged"),
        F.length("event_type").cast("bigint").alias("etype_len"),
        F.year("ts").cast("int").alias("y"),
        F.month("ts").cast("int").alias("m"),
        F.dayofmonth("ts").cast("int").alias("d"),
        F.date_trunc("hour", "ts").alias("ts_hour"),
        F.abs(F.col("value") - 50.0).cast("double").alias("dist50"),
        F.floor("value").cast("bigint").alias("vfloor"),
        (F.col("user_id") % 7).cast("bigint").alias("bucket7"),
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
    )


# --------------------------------------------------------------------------- #
# point lookup (parity: index point lookup -> WHERE pk = x with file pruning,
# persisted_bucket_hash_map.rs:276-302)
# --------------------------------------------------------------------------- #
@register(
    "point_lookup_order",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderstatus, CAST(o_totalprice AS DOUBLE) AS totalprice
FROM orders WHERE o_orderkey = 4242
""",
    category="scan",
)
def point_lookup_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") == 4242)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.col("o_totalprice").cast("double").alias("totalprice"),
        )
    )


# --------------------------------------------------------------------------- #
# distinct aggregates
# --------------------------------------------------------------------------- #
@register(
    "distinct_aggregates",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id) AS uniq_users,
       COUNT(*)                AS n_events,
       CAST(MIN(value) AS DOUBLE) AS min_v,
       CAST(MAX(value) AS DOUBLE) AS max_v
FROM events
GROUP BY event_type
""",
    category="aggregation",
)
def distinct_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("uniq_users"),
        F.count(F.lit(1)).alias("n_events"),
        F.min("value").cast("double").alias("min_v"),
        F.max("value").cast("double").alias("max_v"),
    )


# --------------------------------------------------------------------------- #
# tumbling time-window aggregation (batch equivalent of the streaming window;
# the reference has no event-time windows at all — superset, SURVEY.md §2c)
# --------------------------------------------------------------------------- #
@register(
    "tumbling_window_hourly",
    oracle="""
SELECT date_trunc('hour', ts) AS window_start, event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(15,4))) AS DOUBLE) AS total_value
FROM events
WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-12 00:00:00'
GROUP BY date_trunc('hour', ts), event_type
""",
    category="streaming",
)
def tumbling_window_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(
        (F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-12 00:00:00").cast("timestamp"))
    )
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_m("value")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


# --------------------------------------------------------------------------- #
# q15: top supplier by revenue (agg + max join-back)
# --------------------------------------------------------------------------- #
@register(
    "q15_top_supplier",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, CAST(SUM({_SQL_DISC}) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
    category="aggregation",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: scalar-subquery max via a rank-1 window (one pass,
    no self-join of the aggregate)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_disc_price()).cast("double").alias("total_revenue"))
    )
    w = Window.orderBy(F.desc("total_revenue"))
    top = (
        revenue.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") == 1)
        .drop("rnk")
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return supp.join(
        F.broadcast(top), supp.s_suppkey == top.supplier_no
    ).select("s_suppkey", "s_name", "total_revenue")


# --------------------------------------------------------------------------- #
# q17: small-quantity-order revenue (correlated avg subquery)
# --------------------------------------------------------------------------- #
@register(
    "q17_small_qty_revenue",
    oracle="""
WITH part_avg AS (
  SELECT l_partkey AS pk,
         0.5 * (CAST(SUM(CAST(l_quantity AS DECIMAL(15,4))) AS DOUBLE) / COUNT(*)) AS half_avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,4))) AS DOUBLE) / 7.0 AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
              JOIN part_avg ON pk = l_partkey
WHERE p_brand = 'Brand#21' AND l_quantity < half_avg_qty
""",
    category="aggregation",
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: per-part average as a window aggregate instead of a
    correlated subquery (avoids the re-join of lineitem to itself)."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    w = Window.partitionBy("l_partkey")
    half_avg = 0.5 * (
        F.sum(_m("l_quantity")).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#21").select(
        "p_partkey"
    )
    return (
        li.withColumn("half_avg_qty", half_avg)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            (F.sum(_m("l_extendedprice")).cast("double") / 7.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------- #
# q22: customers with above-average balance and no orders
# --------------------------------------------------------------------------- #
@register(
    "q22_sales_opportunity",
    oracle="""
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(15,4))) AS DOUBLE) / COUNT(*) AS ab
  FROM customer WHERE c_acctbal > 0.0
)
, order_counts AS (
  SELECT c_custkey, c_nationkey, c_acctbal, COUNT(o_orderkey) AS n_orders
  FROM customer LEFT OUTER JOIN orders ON o_custkey = c_custkey
  GROUP BY c_custkey, c_nationkey, c_acctbal
)
SELECT c_nationkey,
       COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(15,4))) AS DOUBLE) AS totacctbal
FROM order_counts, avg_bal
WHERE c_acctbal > ab AND n_orders < 3
GROUP BY c_nationkey
""",
    category="join",
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: global scalar aggregate broadcast + outer-join count
    filter (customers with above-average balance and fewer than 3 orders)."""
    cust = load(spark, sf_dir, "customer")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(_m("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("ab")
        )
    )
    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    order_counts = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey", "c_nationkey", "c_acctbal")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        order_counts.crossJoin(F.broadcast(avg_bal))
        .filter((F.col("c_acctbal") > F.col("ab")) & (F.col("n_orders") < 3))
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_m("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


# --------------------------------------------------------------------------- #
# q11-ish: revenue share per part with HAVING over a global total
# --------------------------------------------------------------------------- #
@register(
    "q11_important_parts",
    oracle=f"""
WITH per_part AS (
  SELECT l_partkey, CAST(SUM({_SQL_DISC}) AS DOUBLE) AS part_rev
  FROM lineitem GROUP BY l_partkey
),
total AS (SELECT CAST(SUM(part_rev) AS DOUBLE) AS t FROM per_part)
SELECT l_partkey, part_rev,
       CAST(round(part_rev / t, 9) AS DOUBLE) AS rev_share
FROM per_part, total
WHERE part_rev > t * 0.0008
""",
    category="aggregation",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: HAVING against a global-total scalar (broadcast)."""
    li = load(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(_disc_price()).cast("double").alias("part_rev")
    )
    total = per_part.agg(F.sum("part_rev").cast("double").alias("t"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_rev") > F.col("t") * 0.0008)
        .select(
            "l_partkey",
            "part_rev",
            F.round(F.col("part_rev") / F.col("t"), 9).alias("rev_share"),
        )
    )


# --------------------------------------------------------------------------- #
# q2-ish: best supplier per nation (min join-back through dims)
# --------------------------------------------------------------------------- #
@register(
    "q2_min_balance_supplier",
    oracle="""
WITH ranked AS (
  SELECT n_name, s_suppkey, s_name, s_acctbal,
         row_number() OVER (PARTITION BY n_nationkey
                            ORDER BY s_acctbal, s_suppkey) AS rn
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
)
SELECT n_name, s_suppkey, s_name, CAST(s_acctbal AS DOUBLE) AS acctbal
FROM ranked WHERE rn = 1
""",
    category="join",
)
def q2_min_balance_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted: no partsupp table): min-per-group resolved
    with a window rank instead of an aggregate self-join."""
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    j = supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
    w = Window.partitionBy("n_nationkey").orderBy(F.asc("s_acctbal"), F.asc("s_suppkey"))
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "n_name",
            "s_suppkey",
            "s_name",
            F.col("s_acctbal").cast("double").alias("acctbal"),
        )
    )


@register(
    "grouping_sets_returns",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
         AS grp_id,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,4))) AS DOUBLE) AS revenue
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
ORDER BY grp_id, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
""",
    category="aggregation",
)
def grouping_sets_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the shape ROLLUP/CUBE are sugar for) with
    grouping_id disambiguating real NULL group keys from subtotal rows —
    the remaining §2c grouping-sets surface beyond rollup_orders /
    cube_lineitem_flags. One Expand + single partial/final aggregate;
    subtotals cost one extra replicated row per set, never a second scan.
    """
    li = load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("mls_gs_lineitem")
    return li.sparkSession.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
                 AS grp_id,
               COUNT(*) AS n_lines,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,4))) AS DOUBLE)
                 AS revenue
        FROM mls_gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY grp_id, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
        """
    )


# --------------------------------------------------------------------------- #
# bucket-co-located join (shuffle paid once at WRITE time, never per query)
# --------------------------------------------------------------------------- #
def ensure_bucketed_warehouse(spark: SparkSession, sf_dir: str) -> str:
    """Materialize orders/lineitem as 8-bucket bucket-sorted tables ONCE
    per (sf_dir, source mtime) and register them in the session catalog.

    First call pays the bucketing shuffle (the write); every later call —
    same session or a fresh one on the same host — finds the marker and
    only (re)registers the catalog entries over the existing files via
    ``CREATE TABLE .. CLUSTERED BY .. LOCATION``, so the "pay the
    shuffle once at write time" claim is realized, not just stated.
    Keyed by source mtime so re-stamped testdata invalidates cleanly.
    Concurrent first calls race safely: each writes to a unique temp dir
    and atomically renames into place; the loser adopts the winner's."""
    import hashlib
    import os
    import tempfile
    import uuid

    src_orders = os.path.join(sf_dir, "orders.parquet")
    src_li = os.path.join(sf_dir, "lineitem.parquet")
    stamp = f"{os.path.abspath(sf_dir)}|{os.stat(src_orders).st_mtime_ns}|{os.stat(src_li).st_mtime_ns}"
    key = hashlib.sha1(stamp.encode()).hexdigest()[:12]
    wh = os.path.join(tempfile.gettempdir(), f"moonlink-buckets-{key}")
    marker = os.path.join(wh, "_BUCKETS_READY")

    def _register() -> None:
        for tbl, sub, ddl, bkey in (
            (
                "mls_orders_bucketed",
                "orders_b",
                "o_orderkey BIGINT, o_orderstatus STRING, "
                "o_orderpriority STRING",
                "o_orderkey",
            ),
            (
                "mls_lineitem_bucketed",
                "lineitem_b",
                "l_orderkey BIGINT, l_extendedprice DOUBLE, "
                "l_discount DOUBLE",
                "l_orderkey",
            ),
        ):
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
            spark.sql(
                f"CREATE TABLE {tbl} ({ddl}) USING parquet "
                f"CLUSTERED BY ({bkey}) SORTED BY ({bkey}) INTO 8 BUCKETS "
                f"LOCATION '{wh}/{sub}'"
            )

    def _registered_into_wh() -> bool:
        # BOTH tables must exist and point INTO this warehouse — a
        # half-registered catalog (one table dropped, or one left over
        # from another sf_dir) must be repaired, not trusted
        for tbl in ("mls_orders_bucketed", "mls_lineitem_bucketed"):
            if not spark.catalog.tableExists(tbl):
                return False
            loc = None
            for r in spark.sql(f"DESCRIBE FORMATTED {tbl}").collect():
                if r[0] == "Location":
                    loc = r[1].replace("file:", "")
                    break
            if loc is None or not loc.startswith(wh):
                return False
        return True

    if os.path.exists(marker):
        # re-register unless the catalog entries already point INTO
        # this warehouse — a session that ran at another sf_dir (or
        # against re-stamped testdata) has tables registered at a
        # DIFFERENT location, and reusing them would silently serve
        # wrong data
        if not _registered_into_wh():
            _register()
        return wh

    build = os.path.join(
        tempfile.gettempdir(), f"moonlink-buckets-build-{uuid.uuid4().hex}"
    )
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
        "o_orderstatus",
        "o_orderpriority",
    )
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").cast("bigint").alias("l_orderkey"),
        F.col("l_extendedprice").cast("double").alias("l_extendedprice"),
        F.col("l_discount").cast("double").alias("l_discount"),
    )
    # write through throwaway catalog names: saveAsTable is the only
    # public API that writes Spark's bucketed layout (+ .sortBy)
    for df, sub, tmp_tbl, bkey in (
        (orders, "orders_b", f"mls_b_{uuid.uuid4().hex[:8]}", "o_orderkey"),
        (li, "lineitem_b", f"mls_b_{uuid.uuid4().hex[:8]}", "l_orderkey"),
    ):
        (
            df.write.format("parquet")
            .bucketBy(8, bkey)
            .sortBy(bkey)
            .option("path", f"{build}/{sub}")
            .mode("overwrite")
            .saveAsTable(tmp_tbl)
        )
        spark.sql(f"DROP TABLE IF EXISTS {tmp_tbl}")
    open(os.path.join(build, "_BUCKETS_READY"), "w").close()
    try:
        os.rename(build, wh)
    except OSError:
        # Either we lost the publish race (the winner's files are
        # equivalent — adopt them) or the rename itself failed
        # (permissions, EXDEV, ...). Only proceed if a winner actually
        # exists; registering over a nonexistent LOCATION would create
        # an empty directory and silently serve zero rows.
        import shutil

        shutil.rmtree(build, ignore_errors=True)
        if not os.path.exists(marker):
            raise
    _register()
    return wh


@register(
    "bucketed_colocated_join",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,4)) *
                (CAST(1.0 AS DECIMAL(15,4)) - CAST(l_discount AS DECIMAL(15,4))))
            AS DOUBLE) AS revenue
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderstatus = 'O'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    category="join",
)
def bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join with NO per-query shuffle: orders and lineitem are
    written ONCE as bucketed tables (8 buckets on the join key, bucket-
    sorted), and the join then reads co-located buckets directly — the
    scans' bucketing satisfies the SortMergeJoin's distribution
    requirement, so the plan has zero Exchange below the join
    (regression-locked by tests/test_plan_shapes.py).

    Scale (100 TB): repeated fact-fact joins on the same key are the one
    place broadcast cannot help (both sides huge). Bucketing moves the
    shuffle to WRITE time: pay it once when the table lands, then every
    subsequent join/aggregate on the bucket key is shuffle-free and — at
    1000 executors — network-free. Bucket count is the parallelism floor;
    at 100 TB it would be sized to ~shuffle-partition count (thousands),
    here 8 to keep the sf0.01 oracle fast. Parity: the same one-time
    cost/many-time benefit trade as the reference's persisted key index
    (index built at ingest, served per lookup).

    The write-once claim is REAL, not just demonstrated: the bucketed
    warehouse persists keyed by (sf_dir, source mtime) — repeat calls
    (and sibling queries like ``bucketed_point_read``) re-register the
    existing files and never rewrite (pinned by
    tests/test_bucketed_reuse.py)."""
    ensure_bucketed_warehouse(spark, sf_dir)
    ob = spark.table("mls_orders_bucketed").filter(
        F.col("o_orderstatus") == "O"
    )
    lb = spark.table("mls_lineitem_bucketed")
    return (
        # MERGE hint pins SortMergeJoin so the bucketed (shuffle-free)
        # path is what the plan lock asserts — a broadcast would also be
        # shuffle-free but would demonstrate nothing at fact-fact scale
        ob.hint("merge")
        .join(lb, ob.o_orderkey == lb.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(_disc_price()).cast("double").alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "bucketed_point_read",
    oracle="""
SELECT l_orderkey,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,4)) *
                (CAST(1.0 AS DECIMAL(15,4)) - CAST(l_discount AS DECIMAL(15,4))))
            AS DOUBLE) AS revenue
FROM lineitem
WHERE l_orderkey IN (1, 32, 33)
GROUP BY l_orderkey
ORDER BY l_orderkey
""",
    category="join",
)
def bucketed_point_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The amortization payoff of ``ensure_bucketed_warehouse``: a point
    read on the bucket key over the ALREADY-bucketed lineitem table.
    Bucket pruning (equality / IN on the bucket column) means Spark
    scans only the buckets those keys hash to — here ≤3 of 8 bucket
    files instead of the whole table, and at 100 TB ≤3 of thousands.
    Second and later queries over the bucketed warehouse pay zero write
    cost (the tables persist keyed by source mtime), which is the whole
    point of bucketing: one shuffle at write time, then shuffle-free
    joins AND pruned point reads forever after."""
    ensure_bucketed_warehouse(spark, sf_dir)
    lb = spark.table("mls_lineitem_bucketed").filter(
        F.col("l_orderkey").isin(1, 32, 33)
    )
    return (
        lb.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(_disc_price()).cast("double").alias("revenue"),
        )
        .orderBy("l_orderkey")
    )
