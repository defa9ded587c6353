"""Sequence packing / data-mixing operators over ``documents``.

LLM pretraining consumes fixed-length token sequences, so the last batch
stage of every training-data pipeline is *packing*: concatenate documents in
a deterministic order and chunk the stream into budget-sized sequences
(GPT-style concat-and-chunk), tracking how many documents straddle a chunk
boundary. The companion problem is *mixture weighting*: given per-source
token totals, compute the sampling weight each source needs to hit the
target mixture.

Both are pure relational plans:

- packing is one shuffle on ``source`` (the packing domain) + a bounded
  per-source window cumsum — no global sort, so it scales linearly with
  sources × docs-per-source;
- mixture weighting aggregates to n_sources rows first and joins the
  1-row total via broadcast, so the expensive side is a single partial+final
  aggregation over the corpus.

Token counts use the standard chars/4+1 budget estimate (pure integer
arithmetic, identical in DuckDB) rather than a regex tokenizer — at 100 TB
the budgeting pass must not pay regex cost per document.

Reference anchor: the reference has no packing stage (it is an ingestion
engine, ``SURVEY.md §0``); these extend the LLM-pipeline surface the
assignment asks for alongside dedup/sampling/curation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from moonlink_spark.operators import load, register

_BUDGET = 512  # tokens per packed sequence


@register(
    "sequence_pack_bins",
    oracle=f"""
WITH sized AS (
  SELECT source, doc_id, n_chars // 4 + 1 AS toks
  FROM documents
), cum AS (
  SELECT source, toks,
         SUM(toks) OVER (
           PARTITION BY source
           ORDER BY md5('pack:' || CAST(doc_id AS VARCHAR)), doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum_toks
  FROM sized
)
SELECT source,
       CAST(COUNT(*) AS BIGINT)  AS n_docs,
       CAST(SUM(toks) AS BIGINT) AS total_tokens,
       CAST((SUM(toks) + {_BUDGET - 1}) // {_BUDGET} AS BIGINT) AS n_bins,
       CAST(SUM(CASE WHEN (cum_toks - toks) // {_BUDGET}
                       <> (cum_toks - 1) // {_BUDGET}
                THEN 1 ELSE 0 END) AS BIGINT) AS docs_spanning,
       CAST(ROUND(CAST(SUM(toks) AS DOUBLE)
                  / (CAST((SUM(toks) + {_BUDGET - 1}) // {_BUDGET} AS DOUBLE)
                     * {_BUDGET}.0), 6) AS DOUBLE) AS fill_ratio
FROM cum
GROUP BY source
ORDER BY source
""",
    category="packing",
)
def sequence_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are ordered by a salted
    md5 key within each source (deterministic, input-order independent),
    token counts are cumsum'd, and the stream is chunked into 512-token
    bins. Reports per-source packing stats: bin count, how many documents
    straddle a bin boundary, and the fill ratio of the final layout.

    Scale shape: one shuffle on ``source``; the window sort is bounded by
    docs-per-source, never global. At 100 TB you pack within whatever unit
    you shard training data by (source/shard), which is exactly this plan.
    """
    docs = load(spark, sf_dir, "documents")
    sized = docs.select(
        "source", "doc_id", F.expr("n_chars DIV 4 + 1").alias("toks")
    )
    order_key = F.md5(
        F.concat(F.lit("pack:"), F.col("doc_id").cast("string")).cast("binary")
    )
    w = (
        Window.partitionBy("source")
        .orderBy(order_key, F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = sized.withColumn("cum_toks", F.sum("toks").over(w))
    b = _BUDGET
    return (
        cum.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").alias("total_tokens"),
            F.expr(f"(sum(toks) + {b - 1}) DIV {b}").alias("n_bins"),
            F.sum(
                F.when(
                    F.expr(f"(cum_toks - toks) DIV {b} <> (cum_toks - 1) DIV {b}"),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).alias("docs_spanning"),
            F.round(
                F.expr(
                    f"cast(sum(toks) as double)"
                    f" / (cast((sum(toks) + {b - 1}) DIV {b} as double) * {b}.0)"
                ),
                6,
            ).alias("fill_ratio"),
        )
        .orderBy("source")
    )


@register(
    "source_mixture_weights",
    oracle="""
WITH per_source AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT)             AS n_docs,
         CAST(SUM(n_chars // 4 + 1) AS BIGINT) AS tokens
  FROM documents
  GROUP BY source
), tot AS (
  SELECT CAST(SUM(tokens) AS DOUBLE) AS total_tokens,
         CAST(COUNT(*) AS DOUBLE)    AS n_sources
  FROM per_source
)
SELECT p.source, p.n_docs, p.tokens,
       CAST(ROUND(CAST(p.tokens AS DOUBLE) / t.total_tokens, 6) AS DOUBLE)
         AS token_share,
       CAST(ROUND((t.total_tokens / t.n_sources) / CAST(p.tokens AS DOUBLE), 6)
            AS DOUBLE) AS mix_weight
FROM per_source p CROSS JOIN tot t
ORDER BY p.source
""",
    category="packing",
)
def source_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing weights: per-source token totals, each source's share of
    the corpus, and the oversampling weight that would equalize the mixture
    (uniform target: total/n_sources tokens per source). weight > 1 means
    the source must be upsampled (or epoch-repeated) to hit the target.

    Scale shape: the corpus-sized work is one partial+final aggregation to
    n_sources rows; the grand total is a 1-row broadcast join against that
    tiny aggregate, so no second pass over the data.
    """
    docs = load(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.expr("n_chars DIV 4 + 1")).alias("tokens"),
    )
    tot = per_source.agg(
        F.sum("tokens").cast("double").alias("total_tokens"),
        F.count(F.lit(1)).cast("double").alias("n_sources"),
    )
    return (
        per_source.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "tokens",
            F.round(
                F.col("tokens").cast("double") / F.col("total_tokens"), 6
            ).alias("token_share"),
            F.round(
                (F.col("total_tokens") / F.col("n_sources"))
                / F.col("tokens").cast("double"),
                6,
            ).alias("mix_weight"),
        )
        .orderBy("source")
    )


@register(
    "mixture_temperature_weights",
    oracle="""
WITH per_source AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars // 4 + 1) AS BIGINT) AS tokens
  FROM documents GROUP BY source
), s AS (
  SELECT *,
         CAST(floor(sqrt(CAST(tokens AS DOUBLE)) * 1000000.0) AS BIGINT) AS sq
  FROM per_source
), tot AS (
  SELECT CAST(SUM(sq) AS BIGINT) AS sq_total,
         CAST(SUM(tokens) AS BIGINT) AS tok_total
  FROM s
)
SELECT s.source, s.n_docs, s.tokens,
       CAST(ROUND(CAST(s.sq AS DOUBLE) / CAST(t.sq_total AS DOUBLE), 6)
            AS DOUBLE) AS temp_weight,
       CAST(ROUND(CAST(s.sq AS DOUBLE) / CAST(t.sq_total AS DOUBLE)
                  * CAST(t.tok_total AS DOUBLE) / CAST(s.tokens AS DOUBLE), 6)
            AS DOUBLE) AS epochs
FROM s CROSS JOIN tot t
ORDER BY s.source
""",
    category="packing",
)
def mixture_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source sampling (the multilingual-corpus standard:
    sample source i with probability proportional to p_i^alpha, alpha=0.5
    here) — flattens the mixture toward uniform without the hard equalize
    of ``source_mixture_weights``. ``epochs`` is how many passes over each
    source the sampler implies (weight * corpus_tokens / source_tokens).

    Cross-engine exactness: p_i^0.5 routes through sqrt (correctly rounded
    in IEEE-754, so Spark and DuckDB agree bit-for-bit) and is immediately
    quantized to BIGINT at 1e6, making the normalizing sum integer-exact
    and fold-order-free; the remaining divisions are identically
    associated in both engines. Scale shape: one partial+final agg to
    n_sources rows, 1-row broadcast total — no second corpus pass."""
    docs = load(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.expr("n_chars DIV 4 + 1")).alias("tokens"),
    )
    s = per_source.withColumn(
        "sq",
        F.floor(F.sqrt(F.col("tokens").cast("double")) * 1000000.0).cast(
            "bigint"
        ),
    )
    tot = s.agg(
        F.sum("sq").cast("bigint").alias("sq_total"),
        F.sum("tokens").cast("bigint").alias("tok_total"),
    )
    return (
        s.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "tokens",
            F.round(
                F.col("sq").cast("double") / F.col("sq_total").cast("double"),
                6,
            ).alias("temp_weight"),
            F.round(
                F.col("sq").cast("double")
                / F.col("sq_total").cast("double")
                * F.col("tok_total").cast("double")
                / F.col("tokens").cast("double"),
                6,
            ).alias("epochs"),
        )
        .orderBy("source")
    )
