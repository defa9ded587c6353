"""Document chunking for LLM training pipelines, as a Python UDTF.

SURVEY.md §2c's last delegated row (UDF/UDAF/UDTF) — the reference has no
UDFs at all; Spark's Python UDTF is capability headroom. Chunking is the
canonical table-function shape: one document row expands into a variable
number of overlapping token-window rows (what a pretraining tokenizer
feeds on). Carries a FULL value-hash oracle: the UDTF body is imperative
Python by design (that is the point of the exercise), but its windowing
arithmetic is deterministic and the oracle re-derives it relationally, so
the driver value-checks the expansion rather than just counting rows.

Scale: a UDTF runs per-partition inside the executors (no driver data),
so chunking parallelizes with the scan; for the hot path at 100 TB you
would swap the whitespace tokenizer for a real BPE inside the same UDTF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from moonlink_spark.operators import load, register

CHUNK_TOKENS = 64
CHUNK_OVERLAP = 16


def _chunks(text: str) -> list[tuple[int, str, int]]:
    """Deterministic overlapping token windows (shared by UDTF and tests)."""
    toks = text.split()
    out = []
    step = CHUNK_TOKENS - CHUNK_OVERLAP
    i = 0
    idx = 0
    while i < len(toks):
        window = toks[i : i + CHUNK_TOKENS]
        out.append((idx, " ".join(window), len(window)))
        if i + CHUNK_TOKENS >= len(toks):
            break
        i += step
        idx += 1
    return out


def chunk_documents_udtf(spark: SparkSession):
    """Build (and register) the chunker as a Python UDTF usable from SQL:
    ``SELECT * FROM doc_chunks(TABLE(docs))`` semantics via lateral join."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk_text string, n_tokens int")
    class DocChunks:
        def eval(self, text: str):
            if text is None:
                return
            for idx, chunk, n in _chunks(text):
                yield idx, chunk, n

    spark.udtf.register("doc_chunks", DocChunks)
    return DocChunks


@register(
    "chunk_documents_udtf",
    oracle=r"""
WITH d AS (
  SELECT doc_id, source, len(regexp_extract_all(text, '\S+')) AS n
  FROM documents WHERE doc_id % 5 = 0 AND len(regexp_extract_all(text, '\S+')) > 0
),
ch AS (
  SELECT doc_id, source, n,
         CASE WHEN n <= 64 THEN 1
              ELSE 1 + CAST(ceil((n - 64) / 48.0) AS BIGINT) END AS n_chunks
  FROM d
),
tok AS (
  SELECT ch.doc_id, ch.source, ch.n_chunks,
         SUM(LEAST(64, ch.n - 48 * t.k)) AS doc_tokens
  FROM ch, UNNEST(generate_series(0, ch.n_chunks - 1)) AS t(k)
  GROUP BY ch.doc_id, ch.source, ch.n_chunks
)
SELECT source,
       CAST(SUM(n_chunks) AS BIGINT) AS n_chunks,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(doc_tokens) AS BIGINT) AS total_tokens,
       CAST(MAX(n_chunks - 1) AS INTEGER) AS max_chunks_per_doc
FROM tok
GROUP BY source
ORDER BY source
""",
    category="udtf",
)
def chunk_documents_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk every 5th document into overlapping 64-token windows via the
    UDTF, then summarize per source. The oracle re-derives the window
    arithmetic in closed form (chunks = 1 + ceil((n-64)/48), chunk k holds
    min(64, n - 48k) tokens) in pure SQL — so the imperative Python UDTF
    is hash-checked against a declarative reimplementation, a stronger
    check than row counting."""
    chunk_documents_udtf(spark)
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    docs.createOrReplaceTempView("__docs_to_chunk")
    chunks = spark.sql(
        """
        SELECT d.doc_id, d.source, c.chunk_idx, c.chunk_text, c.n_tokens
        FROM __docs_to_chunk d,
             LATERAL doc_chunks(d.text) c
        """
    )
    return (
        chunks.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.max("chunk_idx").alias("max_chunks_per_doc"),
        )
        .orderBy("source")
    )
