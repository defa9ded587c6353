"""Text-retrieval scoring over ``documents``: BM25 and TF-IDF.

A training-data pipeline uses retrieval scoring for targeted corpus
curation (pull documents relevant to a topic mix) and for building weak
labels. BM25 needs three corpus statistics — document frequency per term,
document length, average document length — all cheap distributed
aggregates; the per-document score is then a pure map over the (doc, term)
term-frequency table.

Scale design (100 TB): tokens are filtered to the query terms BEFORE the
tf shuffle (the explode never leaves the map stage for non-query terms),
term document-frequencies and the (n_docs, avgdl) scalar broadcast to the
scoring join, and the only wide shuffles are the two group-bys on
``(doc_id, term)`` and ``doc_id``. Floats are rounded to 6 decimals on
both engines (same policy as scalar_extra.py) to absorb last-ulp ln/div
differences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from moonlink_spark.operators import load, register

QUERY_TERMS = ("join", "vector", "stream")
K1 = 1.2
B = 0.75

_TERMS_SQL = ", ".join(f"'{t}'" for t in QUERY_TERMS)


@register(
    "bm25_retrieval",
    oracle=f"""
WITH tokd AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents
),
dld AS (SELECT doc_id, len(toks) AS dl, toks FROM tokd),
stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dld),
tf AS (
  SELECT doc_id, dl, t.term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM dld, UNNEST(toks) AS t(term)
  WHERE t.term IN ({_TERMS_SQL})
  GROUP BY doc_id, dl, t.term
),
dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
scored AS (
  SELECT doc_id,
         SUM(
           ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
           * tf * ({K1} + 1.0)
           / (tf + {K1} * (1.0 - {B} + {B} * dl / avgdl))
         ) AS score,
         CAST(COUNT(*) AS BIGINT) AS n_terms_hit
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats
  GROUP BY doc_id
)
SELECT doc_id, CAST(round(score, 6) AS DOUBLE) AS bm25, n_terms_hit
FROM scored
ORDER BY bm25 DESC, doc_id
""",
    category="retrieval",
)
def bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (k1=1.2, b=0.75) of every document against the fixed query
    terms, all-JVM builtins. Non-query tokens are dropped map-side before
    any shuffle; df table and the (n_docs, avgdl) scalar broadcast."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    dld = docs.select(
        "doc_id",
        F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").alias("toks"),
    ).withColumn("dl", F.size("toks"))
    stats = dld.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        dld.select("doc_id", "dl", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(*QUERY_TERMS))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    contrib = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "w",
            F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
            * F.col("tf")
            * (K1 + 1.0)
            / (F.col("tf") + K1 * (1.0 - B + B * F.col("dl") / F.col("avgdl"))),
        )
    )
    return (
        contrib.groupBy("doc_id")
        .agg(
            F.round(F.sum("w"), 6).alias("bm25"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
        .orderBy(F.col("bm25").desc(), "doc_id")
    )


@register(
    "tfidf_top_terms_per_source",
    oracle="""
WITH tokd AS (
  SELECT source, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents
),
term_src AS (
  SELECT source, t.term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tokd, UNNEST(toks) AS t(term)
  WHERE len(t.term) >= 4
  GROUP BY source, t.term
),
src_freq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS nsrc FROM term_src GROUP BY term),
n_sources AS (SELECT CAST(COUNT(DISTINCT source) AS BIGINT) AS ns FROM documents),
scored AS (
  SELECT source, term,
         CAST(round(tf * ln((ns + 1.0) / (nsrc + 1.0)) , 6) AS DOUBLE) AS tfidf
  FROM term_src JOIN src_freq USING (term) CROSS JOIN n_sources
),
ranked AS (
  SELECT source, term, tfidf,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY tfidf DESC, term) AS rk
  FROM scored
)
SELECT source, term, tfidf, CAST(rk AS INTEGER) AS rk
FROM ranked WHERE rk <= 5
ORDER BY source, rk
""",
    category="retrieval",
)
def tfidf_top_terms_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 characteristic terms per source by TF-IDF, where 'documents'
    are sources (source-level idf smoothed +1). Distinguishing terms per
    source is a standard corpus-diagnostics step; the heavy shuffle is the
    (source, term) group-by, the idf side broadcasts."""
    docs = load(spark, sf_dir, "documents").select("source", "text")
    term_src = (
        docs.select(
            "source",
            F.explode(
                F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
            ).alias("term"),
        )
        .filter(F.length("term") >= 4)
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    src_freq = term_src.groupBy("term").agg(F.count(F.lit(1)).alias("nsrc"))
    ns = docs.agg(F.countDistinct("source").alias("ns"))
    from pyspark.sql import Window

    scored = (
        term_src.join(F.broadcast(src_freq), "term")
        .crossJoin(F.broadcast(ns))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * F.log((F.col("ns") + 1.0) / (F.col("nsrc") + 1.0)), 6
            ),
        )
    )
    w = Window.partitionBy("source").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("source", "term", "tfidf", "rk")
        .orderBy("source", "rk")
    )
