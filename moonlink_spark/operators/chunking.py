"""Document chunking for LLM training pipelines, as a Python UDTF.

SURVEY.md §2c's last delegated row (UDF/UDAF/UDTF) — the reference has no
UDFs at all; Spark's Python UDTF is capability headroom. Chunking is the
canonical table-function shape: one document row expands into a variable
number of overlapping token-window rows (what a pretraining tokenizer
feeds on). Registered rows-only: the UDTF body is imperative Python by
design (that is the point of the exercise); the arithmetic is
deterministic so the driver's rows-only check is stable.

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


@register("chunk_documents_udtf", oracle=None, category="udtf")
def chunk_documents_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk every 5th document into overlapping 64-token windows via the
    UDTF, then summarize per source (deterministic rows-only output)."""
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
