"""Multimodal pipeline as a driver-checkable query.

Builds a media table from ``documents`` (payload = utf-8 text bytes, so
the table scales with SF), runs the Arrow-batched ``mapInPandas`` feature
extraction from ``sources/multimodal.py``, and aggregates to a stable
summary. Carries a FULL value-hash oracle: the decode kernels are
deterministic fakes (no media libs in this env) whose arithmetic the
oracle re-derives in SQL, so the mapInPandas schema/batching/partitioning
plumbing — the real 100 TB path — is value-checked, not just row-counted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from moonlink_spark.operators import load, register


@register(
    "multimodal_feature_extract",
    oracle="""
WITH media AS (
  SELECT doc_id AS media_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS kind,
         text
  FROM documents
),
f AS (
  SELECT kind,
         sha256(text) AS chash,
         octet_length(CAST(text AS BLOB)) AS n_bytes,
         CASE WHEN kind = 'image' THEN sha256(text)
              WHEN kind = 'audio' THEN sha256('audio:' || text)
              ELSE sha256('video:' || text) END AS fh
  FROM media
),
g AS (
  SELECT kind, chash, n_bytes,
         (strpos('0123456789abcdef', substr(fh, 1, 1)) - 1) * 16 +
         (strpos('0123456789abcdef', substr(fh, 2, 1)) - 1) AS b1,
         (strpos('0123456789abcdef', substr(fh, 3, 1)) - 1) * 16 +
         (strpos('0123456789abcdef', substr(fh, 4, 1)) - 1) AS b2
  FROM f
)
SELECT kind,
       CAST(COUNT(*) AS BIGINT) AS n_media,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       CAST(round(AVG(CAST(CASE WHEN kind = 'video'
                                THEN (b1 * 256 + b2) / 65535.0
                                ELSE b1 / 255.0 END AS REAL)), 6) AS DOUBLE)
         AS avg_f0,
       CAST(COUNT(DISTINCT chash) AS BIGINT) AS n_distinct
FROM g GROUP BY kind ORDER BY kind
""",
    category="multimodal",
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> binary media payloads -> mapInPandas feature extraction
    -> per-kind summary. Every value derives from content digests, so the
    oracle REPLAYS the fake decoders in pure SQL (sha256 nibbles -> bytes,
    float32-quantized like the Arrow feature schema) — the Python
    mapInPandas plumbing is hash-checked end to end, not just row-counted.
    """
    from moonlink_spark.sources.multimodal import extract_features

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        kinds.alias("kind"),
        F.col("text").cast("binary").alias("payload"),
        F.lit(None)
        .cast(
            "struct<mime:string,width:int,height:int,"
            "duration_ms:bigint,sample_rate:int>"
        )
        .alias("meta"),
    )
    feats = extract_features(media)
    return (
        feats.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.avg(F.element_at("feature", 1)), 6).alias("avg_f0"),
            F.countDistinct("content_hash").alias("n_distinct"),
        )
        .orderBy("kind")
    )
