"""Dataset profiling / statistics operators.

A 100 TB training-data pipeline runs these before anything else: a one-pass
column profile (null rates, cardinalities, ranges) to validate a new drop, a
distribution-outlier scan to quarantine bad shards, time-windowed per-entity
rollups, and collocation (PMI) statistics over the token stream.

Reference anchor: moonlink exposes per-file min/max stats and cardinality
through its snapshot metadata (src/moonlink/src/storage/mooncake_table.rs
DiskFileEntry file stats; our table/stats.py mirrors that); these operators
generalize the same idea to full-column profiles computed *by* the engine.

Scale notes are inline per operator; none of them shuffles more than the
aggregation states themselves (no row-level shuffle anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from moonlink_spark.operators import load, register
from moonlink_spark.operators.textstats import WORD_RE

DEC = "decimal(15,4)"

# --------------------------------------------------------------------------- #
# one-pass column profile
# --------------------------------------------------------------------------- #

_NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount"]
_TS_COLS = ["l_shipdate"]
_STR_COLS = ["l_returnflag", "l_linestatus"]
_ALL_COLS = _NUM_COLS + _TS_COLS + _STR_COLS


def _profile_oracle() -> str:
    parts = []
    for c in _ALL_COLS:
        if c in _NUM_COLS:
            mn, mx = f"printf('%.4f', MIN({c}))", f"printf('%.4f', MAX({c}))"
        elif c in _TS_COLS:
            mn = f"strftime(MIN({c}), '%Y-%m-%d %H:%M:%S')"
            mx = f"strftime(MAX({c}), '%Y-%m-%d %H:%M:%S')"
        else:
            mn, mx = f"MIN({c})", f"MAX({c})"
        parts.append(
            f"""
SELECT '{c}' AS col_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       {mn} AS min_repr,
       {mx} AS max_repr
FROM lineitem"""
        )
    return " UNION ALL ".join(parts) + " ORDER BY col_name"


@register(
    "column_profile_lineitem",
    oracle=_profile_oracle(),
    category="profiling",
)
def column_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profile: row count, null count, exact distinct count,
    and min/max (rendered with engine-identical printf/strftime formatting)
    for six lineitem columns, emitted as one row per column.

    Scale: a SINGLE scan computes every metric — the multi-column distinct
    aggregates compile to one Expand + partial/final hash aggregate, so the
    shuffle carries only aggregation state (bytes per distinct value), never
    data rows. The wide 1-row aggregate is then unpivoted with ``stack`` on
    the driver side of the plan (6 rows). The oracle scans once per column
    (UNION ALL) purely for SQL clarity — same answer.
    """
    li = load(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _ALL_COLS:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"{c}__nulls")
        )
        aggs.append(F.countDistinct(F.col(c)).alias(f"{c}__nd"))
        if c in _NUM_COLS:
            aggs.append(F.format_string("%.4f", F.min(c)).alias(f"{c}__min"))
            aggs.append(F.format_string("%.4f", F.max(c)).alias(f"{c}__max"))
        elif c in _TS_COLS:
            aggs.append(
                F.date_format(F.min(c), "yyyy-MM-dd HH:mm:ss").alias(f"{c}__min")
            )
            aggs.append(
                F.date_format(F.max(c), "yyyy-MM-dd HH:mm:ss").alias(f"{c}__max")
            )
        else:
            aggs.append(F.min(c).alias(f"{c}__min"))
            aggs.append(F.max(c).alias(f"{c}__max"))
    wide = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__nd, {c}__min, {c}__max" for c in _ALL_COLS
    )
    return wide.selectExpr(
        "n_rows",
        f"stack({len(_ALL_COLS)}, {stack_args}) AS "
        "(col_name, n_nulls, n_distinct, min_repr, max_repr)",
    ).select(
        "col_name", "n_rows", "n_nulls", "n_distinct", "min_repr", "max_repr"
    ).orderBy("col_name")


# --------------------------------------------------------------------------- #
# z-score outlier scan
# --------------------------------------------------------------------------- #
@register(
    "zscore_outlier_events",
    oracle="""
WITH stats AS (
  SELECT event_type,
         CAST(round(avg(value), 6) AS DOUBLE)         AS mean_r,
         CAST(round(stddev_samp(value), 6) AS DOUBLE) AS sd_r
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN abs((e.value - s.mean_r) / s.sd_r) > 2.0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       CAST(round(MAX(abs((e.value - s.mean_r) / s.sd_r)), 6) AS DOUBLE)
           AS max_abs_z
FROM events e JOIN stats s USING (event_type)
GROUP BY e.event_type
ORDER BY e.event_type
""",
    category="profiling",
)
def zscore_outlier_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-outlier scan: per event_type mean/stddev, then count the
    rows whose |z| exceeds 2. The quarantine primitive for bad-shard
    detection in ingest pipelines.

    Scale: deliberately two-pass instead of a window — a window partitioned
    by event_type would funnel ALL rows of a type through one task (few
    distinct types = maximal skew). Pass 1 reduces to one tiny stats row per
    type (partial agg, ~k rows shuffled); pass 2 re-scans with the stats
    broadcast-joined, so no row-level shuffle ever happens. Determinism: the
    aggregate moments are rounded to 6 decimals (absorbing summation-order
    noise), after which (value - mean)/sd is bitwise-identical IEEE
    arithmetic in both engines, so the >2 threshold count is exact.
    """
    ev = load(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.round(F.avg("value"), 6).alias("mean_r"),
        F.round(F.stddev_samp("value"), 6).alias("sd_r"),
    )
    z = F.abs((F.col("value") - F.col("mean_r")) / F.col("sd_r"))
    return (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(z > 2.0, 1).otherwise(0)).cast("bigint").alias("n_outliers"),
            F.round(F.max(z), 6).alias("max_abs_z"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------- #
# time-range rolling window
# --------------------------------------------------------------------------- #
@register(
    "rolling_7d_customer_revenue",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(15,4))) OVER w AS DOUBLE)
           AS rev_7d,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_orders_7d
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
ORDER BY o_custkey, o_orderkey
""",
    category="window",
)
def rolling_7d_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame (not ROWS): per customer, the revenue and
    order count in the trailing 7 days of each order. The canonical
    "trailing activity" feature for per-entity feature stores.

    Scale: one shuffle on o_custkey (high-cardinality key — no skew); the
    range frame is evaluated with a sliding two-pointer over each sorted
    partition, O(n) per customer. Sums run over DECIMAL(15,4) so the rolling
    accumulation is exact (order-independent) in both engines; RANGE frames
    include value-peers identically in Spark and DuckDB, so ties on the
    order date are deterministic without a row tiebreak.
    """
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-7 * 86400, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("rev_7d"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_orders_7d"),
    ).orderBy("o_custkey", "o_orderkey")


# --------------------------------------------------------------------------- #
# bigram PMI collocations
# --------------------------------------------------------------------------- #
@register(
    "bigram_pmi_top",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{WORD_RE}') AS toks
  FROM documents
),
pos AS (
  SELECT doc_id, unnest(toks) AS w, generate_subscripts(toks, 1) AS p
  FROM toks
),
uni AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS c1 FROM pos GROUP BY w
),
big AS (
  SELECT a.w AS w1, b.w AS w2, CAST(COUNT(*) AS BIGINT) AS c12
  FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.p = a.p + 1
  GROUP BY a.w, b.w
),
tot AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS n_tokens,
         (SELECT CAST(SUM(c12) AS BIGINT) FROM big) AS n_bigrams
  FROM uni
)
SELECT w1, w2, c12 AS pair_cnt,
       CAST(round(ln((CAST(c12 AS DOUBLE) * CAST(n_tokens AS DOUBLE)
                      * CAST(n_tokens AS DOUBLE))
                     / (CAST(n_bigrams AS DOUBLE) * CAST(u1.c1 AS DOUBLE)
                        * CAST(u2.c1 AS DOUBLE))), 6) AS DOUBLE) AS pmi
FROM big
JOIN uni u1 ON big.w1 = u1.w
JOIN uni u2 ON big.w2 = u2.w
CROSS JOIN tot
WHERE c12 >= 5
ORDER BY pair_cnt DESC, w1, w2
LIMIT 100
""",
    category="textstats",
)
def bigram_pmi_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top-100 bigrams by frequency with pointwise mutual
    information ln(p(w1,w2) / (p(w1) p(w2))). The building block for phrase
    detection / tokenizer-vocabulary induction over a training corpus.

    Scale: token stream is exploded once per statistic (unigram agg, bigram
    agg) — two map-side-combining shuffles whose payload is counts, not
    text. The bigram->unigram count joins are left to AQE: at small vocab
    they broadcast, at web-scale vocab they fall back to shuffle-hash
    (both sides already partitioned by word). Global top-k runs as
    TakeOrdered (per-partition heap + driver merge of 100 rows), never a
    single-partition sort. The 1-row totals are a broadcast cross join.
    PMI uses identical left-associated double arithmetic in both engines,
    rounded to 6 decimals to absorb libm ln() ulp differences.
    """
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.expr(f"regexp_extract_all(lower(text), '{WORD_RE}', 0)").alias("toks"),
    )
    uni = (
        toks.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    big = (
        toks.filter(F.size("toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1), "
                    "i -> struct(toks[i-1] AS w1, toks[i] AS w2))"
                )
            ).alias("pair")
        )
        .select("pair.w1", "pair.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    tot = uni.agg(F.sum("c1").cast("bigint").alias("n_tokens")).crossJoin(
        big.agg(F.sum("c12").cast("bigint").alias("n_bigrams"))
    )
    pmi_num = (
        F.col("c12").cast("double")
        * F.col("n_tokens").cast("double")
        * F.col("n_tokens").cast("double")
    )
    pmi_den = (
        F.col("n_bigrams").cast("double")
        * F.col("c1_left").cast("double")
        * F.col("c1_right").cast("double")
    )
    return (
        big.join(uni.withColumnRenamed("c1", "c1_left"), big.w1 == F.col("w"))
        .drop("w")
        .join(
            uni.withColumnRenamed("c1", "c1_right").withColumnRenamed("w", "w_r"),
            big.w2 == F.col("w_r"),
        )
        .drop("w_r")
        .crossJoin(F.broadcast(tot))
        .filter(F.col("c12") >= 5)
        .select(
            "w1",
            "w2",
            F.col("c12").alias("pair_cnt"),
            F.round(F.log(pmi_num / pmi_den), 6).alias("pmi"),
        )
        .orderBy(F.col("pair_cnt").desc(), "w1", "w2")
        .limit(100)
    )


# --------------------------------------------------------------------------- #
# approximate heavy hitters (Misra-Gries) with exact recovery
# --------------------------------------------------------------------------- #

MG_CAPACITY = 1024  # per-partition summary size
HH_DENOM = 512  # report items with count > N / HH_DENOM


def _mg_summaries(iterator):
    """Per-partition Misra-Gries summary over bigram streams.

    Classic MG guarantee: any item whose count in this partition exceeds
    n_partition / capacity survives the summary. A GLOBAL heavy hitter
    (count > N / HH_DENOM with HH_DENOM <= capacity) must, by pigeonhole,
    exceed that local threshold in at least one partition — so the union
    of summaries is a guaranteed superset of every global heavy hitter,
    and the exact recount stage makes the final answer EXACT, not
    approximate. Summary size is O(capacity) per partition regardless of
    stream length: this is the sketch that lets 100 TB of tokens reduce
    to a few-KB candidate set before the only shuffle.
    """
    import pandas as pd

    counters: dict[str, int] = {}
    for pdf in iterator:
        for grams in pdf["grams"]:
            for g in grams:
                if g in counters:
                    counters[g] += 1
                elif len(counters) < MG_CAPACITY:
                    counters[g] = 1
                else:
                    dead = []
                    for k in counters:
                        counters[k] -= 1
                        if counters[k] == 0:
                            dead.append(k)
                    for k in dead:
                        del counters[k]
    yield pd.DataFrame({"candidate": list(counters.keys())})


@register(
    "approx_heavy_hitters",
    oracle="""
WITH grams AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+ [a-z0-9]+')) AS gram
  FROM documents
),
tot AS (SELECT COUNT(*) AS n FROM grams)
SELECT gram, CAST(cnt AS BIGINT) AS cnt
FROM (SELECT gram, COUNT(*) AS cnt FROM grams GROUP BY gram) g, tot
WHERE cnt * 512 > n
ORDER BY cnt DESC, gram
""",
    category="profiling",
)
def approx_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-item detection via per-partition Misra-Gries sketches with
    an exact verification pass: sketch (mapInPandas, O(capacity) memory,
    zero shuffle) -> tiny candidate broadcast -> exact recount of ONLY the
    candidates -> threshold count > N/512. The MG pigeonhole bound makes
    the candidate set a guaranteed superset of every true heavy hitter, so
    the output equals the oracle's full GROUP BY — while the full-stream
    shuffle the oracle performs is replaced by a broadcast-semi-join whose
    right side is a few hundred rows.

    Scale design (100 TB): the sketch pass touches each partition once and
    emits <=1024 candidates per partition; the recount aggregates only
    stream elements matching a broadcast hash set. Item domain here is
    word bigrams over ``documents`` (the classic n-gram frequency use).
    """
    from moonlink_spark.operators import load as _load

    docs = _load(spark, sf_dir, "documents")
    grams = docs.select(
        F.expr(
            r"regexp_extract_all(lower(text), '[a-z0-9]+ [a-z0-9]+', 0)"
        ).alias("grams")
    )
    from moonlink_spark.session import ensure_package_on_workers

    ensure_package_on_workers(spark)
    candidates = (
        grams.mapInPandas(_mg_summaries, schema="candidate string")
        .distinct()
    )
    exploded = grams.select(F.explode("grams").alias("gram"))
    total = exploded.agg(F.count(F.lit(1)).alias("n"))
    counted = (
        exploded.join(
            F.broadcast(candidates),
            exploded["gram"] == candidates["candidate"],
            "left_semi",
        )
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counted.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * HH_DENOM > F.col("n"))
        .select("gram", F.col("cnt").cast("bigint").alias("cnt"))
        .orderBy(F.desc("cnt"), "gram")
    )
