"""Deterministic sampling / data-mixing operators over ``documents``.

Training-data pipelines never use RNG sampling at scale — reruns must
reproduce the same corpus byte-for-byte, and samples must be joinable across
tables. The standard trick is a salted content-key hash bucket:
``hash(salt || key) % 100 < rate``. It is a pure map (no shuffle, no state,
no seed coordination across executors), it composes with any partitioning,
and distinct salts give independent sample streams over the same keys.

Both operators here use the same 28-bit md5-prefix integer the dedup family
uses, so the DuckDB oracle can run the identical arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from moonlink_spark.operators import load, register
from moonlink_spark.operators.dedup import _sql_hex7


def _spark_skey(salt: str) -> str:
    """Spark SQL expr: the FULL 28-bit md5-prefix integer of
    (salt || doc_id) — THE one hash expression every sampling/shuffle
    operator derives from."""
    return (
        f"cast(conv(substring(md5(cast(concat('{salt}', cast(doc_id as string)) "
        "as binary)), 1, 7), 16, 10) as bigint)"
    )


def _sql_skey(salt: str) -> str:
    digest = f"md5('{salt}' || CAST(doc_id AS VARCHAR))"
    return _sql_hex7(digest)


def _spark_bucket(salt: str) -> str:
    """Spark SQL expr: hash bucket in [0, 100) from md5(salt || doc_id)."""
    return f"{_spark_skey(salt)} % 100"


def _sql_bucket(salt: str) -> str:
    """DuckDB expr for the same bucket (md5-prefix hex -> int -> % 100)."""
    return f"({_sql_skey(salt)} % 100)"


@register(
    "deterministic_hash_sample",
    oracle=f"""
WITH flagged AS (
  SELECT source, n_chars,
         CASE WHEN {_sql_bucket('sample:')} < 10 THEN 1 ELSE 0 END AS sampled
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT)      AS n_docs,
       CAST(SUM(sampled) AS BIGINT)  AS n_sampled,
       CAST(SUM(CASE WHEN sampled = 1 THEN n_chars ELSE 0 END) AS BIGINT)
                                     AS sampled_chars
FROM flagged
GROUP BY source
ORDER BY source
""",
    category="sampling",
)
def deterministic_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible ~10% corpus sample via salted hash bucket, reported as
    per-source coverage. The sampling predicate is a pure map stage that
    pushes below any downstream join/agg; the only shuffle is the reporting
    group-by. Rerunning at any scale reproduces the exact same sample."""
    docs = load(spark, sf_dir, "documents")
    flagged = docs.withColumn(
        "sampled",
        F.when(F.expr(_spark_bucket("sample:")) < 10, F.lit(1)).otherwise(F.lit(0)),
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("sampled").alias("n_sampled"),
            F.sum(F.when(F.col("sampled") == 1, F.col("n_chars")).otherwise(0)).alias(
                "sampled_chars"
            ),
        )
        .orderBy("source")
    )


@register(
    "stratified_sample_per_group",
    oracle="""
WITH ranked AS (
  SELECT doc_id, lang, source,
         row_number() OVER (
           PARTITION BY lang, source
           ORDER BY md5('strat:' || CAST(doc_id AS VARCHAR)), doc_id
         ) AS rk
  FROM documents
)
SELECT lang, source, doc_id, CAST(rk AS BIGINT) AS rk
FROM ranked
WHERE rk <= 3
ORDER BY lang, source, rk
""",
    category="sampling",
)
def stratified_sample_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k stratified sample: 3 documents per (lang, source) stratum,
    chosen by salted-md5 order so the pick is reproducible and independent
    of input order. One shuffle on the stratum key; the per-stratum sort is
    bounded by stratum size, and a rank<=k window (top-k per group) never
    materializes more than k rows per stratum past the exchange. This is
    the data-mixing primitive for "equal representation per language/source"
    corpus construction."""
    docs = load(spark, sf_dir, "documents")
    order_key = F.md5(
        F.concat(F.lit("strat:"), F.col("doc_id").cast("string")).cast("binary")
    )
    w = Window.partitionBy("lang", "source").orderBy(order_key, F.col("doc_id"))
    return (
        docs.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 3)
        .select("lang", "source", "doc_id", "rk")
        .orderBy("lang", "source", "rk")
    )


@register(
    "train_val_test_split",
    oracle=f"""
WITH bucketed AS (
  SELECT lang, n_chars,
         CASE WHEN {_sql_bucket('split:')} < 80 THEN 'train'
              WHEN {_sql_bucket('split:')} < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT split, lang,
       CAST(COUNT(*) AS BIGINT)     AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM bucketed
GROUP BY split, lang
ORDER BY split, lang
""",
    category="sampling",
)
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by salted hash bucket,
    summarized per (split, lang). The 'split:' salt makes this stream
    independent of the 'sample:' stream over the same doc_ids — a document's
    split never changes as the corpus grows, which is what keeps eval sets
    uncontaminated across dataset versions."""
    docs = load(spark, sf_dir, "documents")
    bucket = F.expr(_spark_bucket("split:"))
    bucketed = docs.withColumn(
        "split",
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test")),
    )
    return (
        bucketed.groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("split", "lang")
    )



@register(
    "deterministic_corpus_shuffle",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id, n_chars, {_sql_skey('shuffle:')} AS skey
  FROM documents
),
ranked AS (
  SELECT doc_id, n_chars, skey, skey % 16 AS shard,
         row_number() OVER (PARTITION BY skey % 16
             ORDER BY skey, doc_id) AS pos
  FROM keyed
)
SELECT CAST(shard AS BIGINT) AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(MIN(CASE WHEN pos = 1 THEN doc_id END) AS BIGINT) AS first_doc_id,
       CAST(SUM((pos * ((doc_id % 1000003) + 1)) % 1000000007) AS BIGINT) AS order_checksum
FROM ranked GROUP BY shard ORDER BY shard
""",
    category="sampling",
)
def deterministic_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded global shuffle for training order — the step between
    curation and tokenization in every LLM data pipeline. RNG-free: each
    doc's position comes from a salted content-key hash, so reruns (and
    any cluster size) produce the identical order, and a grown corpus
    only INSERTS new docs into the order without reshuffling old ones.

    The materialized form at scale is shard files: shard = skey % 16
    (one output file/task each — at 100 TB bump the modulus, nothing
    else changes) and within-shard order = (skey, doc_id). That is ONE
    hash exchange on the shard key; the within-shard sort is the
    task-local sort every shuffle write does anyway, and the summary
    aggregation reuses the window's partitioning (no second exchange).
    The per-shard summary pins both halves for the oracle: the
    assignment (counts/chars), the order head (first_doc_id), and the
    full order (sum of pos*doc_id — any transposition changes it).
    """
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    w = Window.partitionBy("shard").orderBy("skey", "doc_id")
    ranked = (
        docs.withColumn("skey", F.expr(_spark_skey("shuffle:")))
        .withColumn("shard", F.col("skey") % 16)
        .withColumn("pos", F.row_number().over(w))
    )
    return (
        ranked.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.min(F.when(F.col("pos") == 1, F.col("doc_id")))
            .cast("bigint")
            .alias("first_doc_id"),
            # modular fold: pos ride-along keeps transposition
            # detection, the mods keep every term (and the sum) inside
            # int64 at any corpus size — a raw SUM(pos*doc_id) is n^3-ish
            # and overflows (divergently per engine) past ~2e7 docs
            F.sum(
                (F.col("pos") * (F.col("doc_id") % 1000003 + 1))
                % 1000000007
            )
            .cast("bigint")
            .alias("order_checksum"),
        )
        .select(
            F.col("shard").cast("bigint").alias("shard"),
            "n_docs", "total_chars", "first_doc_id", "order_checksum",
        )
        .orderBy("shard")
    )
