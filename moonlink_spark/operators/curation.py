"""End-to-end corpus-curation pipeline over ``documents``.

Single composed query demonstrating how the training-data operators chain:
quality gate -> exact-content dedup -> deterministic sample, reported as a
per-source funnel (how many documents survive each stage). Real pipelines
run exactly this shape before tokenization; keeping it one declarative
plan lets Catalyst fuse the stage flags into the scan projection.

Scale design (100 TB): the quality flag and the sampling bucket are pure
map expressions; the only shuffles are the window over the content hash
(the dedup group) and the final per-source rollup. Nothing materializes
between stages — the funnel counts come from flags, not intermediate
tables, so a 1000-executor run is scan -> hash-partition -> rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from moonlink_spark.operators import load, register
from moonlink_spark.operators.dedup import _sql_hex7

# every 10th doc gets an exact copy so the dedup stage has signal
# (same convention as dedup.py's _dup_corpus, plus the source column)
_SQL_CORPUS = """
  SELECT doc_id, text, source FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text, source FROM documents WHERE doc_id % 10 = 0
"""

MIN_TOKENS = 20
MIN_STOPWORD_RATIO = 0.02
SAMPLE_PCT = 50

_STOPS = ("the", "a", "of", "and", "to", "in", "is")
_STOPS_SQL = ", ".join(f"'{w}'" for w in _STOPS)


@register(
    "corpus_curation_pipeline",
    oracle=f"""
WITH corpus AS ({_SQL_CORPUS}),
staged AS (
  SELECT doc_id, text, source,
         CASE WHEN len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
                                   x -> x IN ({_STOPS_SQL}))) >=
                   {MIN_STOPWORD_RATIO} * len(regexp_extract_all(lower(text), '[a-z0-9]+'))
               AND len(regexp_extract_all(lower(text), '[a-z0-9]+')) >= {MIN_TOKENS}
              THEN 1 ELSE 0 END AS q
  FROM corpus
),
keepers AS (
  SELECT doc_id, source, q,
         CASE WHEN q = 1 AND doc_id = MIN(CASE WHEN q = 1 THEN doc_id END)
                                   OVER (PARTITION BY md5(text))
              THEN 1 ELSE 0 END AS keeper
  FROM staged
),
sampled AS (
  SELECT source, q, keeper,
         CASE WHEN keeper = 1 AND ({_sql_hex7("md5('curate:' || CAST(doc_id AS VARCHAR))")} % 100)
                                  < {SAMPLE_PCT}
              THEN 1 ELSE 0 END AS sampled
  FROM keepers
)
SELECT source,
       CAST(COUNT(*) AS BIGINT)     AS n_input,
       CAST(SUM(q) AS BIGINT)       AS n_quality,
       CAST(SUM(keeper) AS BIGINT)  AS n_deduped,
       CAST(SUM(sampled) AS BIGINT) AS n_sampled
FROM sampled
GROUP BY source
ORDER BY source
""",
    category="pipeline",
)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation funnel: stopword/length quality gate, exact-content dedup
    (min doc_id per md5 among quality passers), 50% salted hash sample;
    per-source stage counts. Flags, not materialized intermediates."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "source")
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text", "source"
        )
    )
    toks = F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
    n_stops = F.size(F.filter(toks, lambda x: x.isin(*_STOPS)))
    q = (
        (n_stops.cast("double") >= F.lit(MIN_STOPWORD_RATIO) * F.size(toks))
        & (F.size(toks) >= MIN_TOKENS)
    ).cast("int")
    staged = corpus.withColumn("q", q)
    w = Window.partitionBy(F.md5(F.col("text").cast("binary")))
    keeper = (
        (F.col("q") == 1)
        & (
            F.col("doc_id")
            == F.min(F.when(F.col("q") == 1, F.col("doc_id"))).over(w)
        )
    ).cast("int")
    keepers = staged.withColumn("keeper", keeper)
    bucket = F.expr(
        "cast(conv(substring(md5(cast(concat('curate:', cast(doc_id as string)) "
        "as binary)), 1, 7), 16, 10) as bigint) % 100"
    )
    sampled = keepers.withColumn(
        "sampled", ((F.col("keeper") == 1) & (bucket < SAMPLE_PCT)).cast("int")
    )
    return (
        sampled.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_input"),
            F.sum("q").alias("n_quality"),
            F.sum("keeper").alias("n_deduped"),
            F.sum("sampled").alias("n_sampled"),
        )
        .orderBy("source")
    )


@register(
    "dedup_keep_best_quality",
    oracle="""
WITH corpus AS (
  SELECT doc_id, text, source FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, upper(text) || ' !! ** !!' AS text, source
  FROM documents WHERE doc_id % 10 = 0
),
scored AS (
  SELECT doc_id, source,
         md5(lower(regexp_replace(text, '[^a-z0-9 ]', '', 'g'))) AS ckey,
         length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS n_noise
  FROM corpus
),
ranked AS (
  SELECT doc_id, source, ckey,
         row_number() OVER (PARTITION BY ckey ORDER BY n_noise, doc_id) AS rn
  FROM scored
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT ckey) AS BIGINT) AS n_clusters,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN rn = 1 THEN doc_id ELSE 0 END) AS BIGINT) AS kept_id_sum
FROM ranked
GROUP BY source
ORDER BY source
""",
    category="dedup",
)
def dedup_keep_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-then-keep-best dedup: near-duplicate clusters keyed on
    NORMALIZED content (lowercased, punctuation stripped — catches
    case/punctuation variants exact dedup misses), surviving the cleanest
    member per cluster (fewest non-[a-z0-9 ] raw characters, doc_id
    tiebreak) instead of an arbitrary one. The %10 docs get a shouting
    noisy variant injected so the quality rule has signal: the original
    must always win its cluster. Clusters may span sources (real
    cross-source contamination behaves the same way), so survivor choice
    is global and per-source counts report kept members, with a
    kept-doc_id checksum pinning the exact survivor set.

    Scale design (100 TB): one md5 of normalized text per doc (map-side),
    one shuffle on the fixed-width cluster key for the survivor window,
    one rollup on source. Identical plan shape to exact dedup — quality
    ranking rides the same window, adding zero extra shuffles.
    """
    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "source")
    variants = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .withColumn("doc_id", F.col("doc_id") + 100000)
        .withColumn("text", F.concat(F.upper("text"), F.lit(" !! ** !!")))
    )
    corpus = docs.unionByName(variants)
    scored = corpus.select(
        "doc_id",
        "source",
        F.md5(F.lower(F.regexp_replace("text", "[^a-z0-9 ]", ""))).alias("ckey"),
        F.length(F.regexp_replace("text", "[a-z0-9 ]", "")).alias("n_noise"),
    )
    w = Window.partitionBy("ckey").orderBy("n_noise", "doc_id")
    ranked = scored.withColumn("rn", F.row_number().over(w))
    kept = F.when(F.col("rn") == 1, 1).otherwise(0)
    kept_id = F.when(F.col("rn") == 1, F.col("doc_id")).otherwise(F.lit(0))
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("ckey").cast("bigint").alias("n_clusters"),
            F.sum(kept).cast("bigint").alias("n_kept"),
            F.sum(kept_id).cast("bigint").alias("kept_id_sum"),
        )
        .orderBy("source")
    )
