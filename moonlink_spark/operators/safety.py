"""Training-data safety/quality operators: PII detection, repetition
scoring, benchmark contamination.

Three filters every large-scale pretraining pipeline runs before a corpus
reaches a tokenizer, alongside the dedup/textstats suite:

- PII: pattern counts (emails, phone-shaped numbers, SSN-shaped ids, IPv4)
  as pure regexp map expressions — the production shape at 100 TB is this
  exact query plus a redaction pass over the flagged rows.
- Repetition: unique-token ratio and max single-token dominance — cheap
  proxies for degenerate/boilerplate text (low unique ratio == spammy).
- Contamination: n-gram overlap between the corpus and a benchmark probe
  set, the standard train/test leakage check. The probe set is tiny and
  broadcast; the corpus side explodes to shingles ONCE — one shuffle, no
  cross join.

All deterministic, all oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from moonlink_spark.operators import load, register

_EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
_PHONE_RE = "\\(?[0-9]{3}\\)?[-. ][0-9]{3}[-. ][0-9]{4}"
_SSN_RE = "[0-9]{3}-[0-9]{2}-[0-9]{4}"
_IPV4_RE = "([0-9]{1,3}\\.){3}[0-9]{1,3}"


@register(
    "pii_pattern_scan",
    oracle=f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all(text, '{_SSN_RE}')) AS BIGINT) AS n_ssns,
       CAST(len(regexp_extract_all(text, '{_IPV4_RE}')) AS BIGINT) AS n_ips,
       (len(regexp_extract_all(text, '{_EMAIL_RE}')) > 0
        OR len(regexp_extract_all(text, '{_PHONE_RE}')) > 0
        OR len(regexp_extract_all(text, '{_SSN_RE}')) > 0
        OR len(regexp_extract_all(text, '{_IPV4_RE}')) > 0) AS flagged
FROM documents
ORDER BY doc_id
""",
    category="safety",
)
def pii_pattern_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII pattern counts + flag. Pure map stage (regexp in
    codegen), so it composes with any scan at zero shuffle cost."""
    docs = load(spark, sf_dir, "documents")

    def n(pat: str):
        return F.size(F.regexp_extract_all("text", F.lit(pat), F.lit(0))).cast(
            "bigint"
        )

    ne, np_, ns, ni = n(_EMAIL_RE), n(_PHONE_RE), n(_SSN_RE), n(_IPV4_RE)
    return docs.select(
        "doc_id",
        ne.alias("n_emails"),
        np_.alias("n_phones"),
        ns.alias("n_ssns"),
        ni.alias("n_ips"),
        ((ne > 0) | (np_ > 0) | (ns > 0) | (ni > 0)).alias("flagged"),
    ).orderBy("doc_id")


@register(
    "repetition_scores",
    oracle="""
WITH tokd AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
  FROM documents
),
exploded AS (
  SELECT doc_id, unnest(toks) AS tok FROM tokd WHERE len(toks) > 0
),
tok_counts AS (
  SELECT doc_id, tok, COUNT(*) AS c FROM exploded GROUP BY doc_id, tok
),
per_doc AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_toks,
         CAST(COUNT(*) AS BIGINT) AS n_unique,
         CAST(MAX(c) AS BIGINT) AS max_tok_count
  FROM tok_counts GROUP BY doc_id
)
SELECT doc_id, n_toks, n_unique,
       CAST(round(CAST(n_unique AS DOUBLE) / CAST(n_toks AS DOUBLE), 6) AS DOUBLE) AS unique_ratio,
       CAST(round(CAST(max_tok_count AS DOUBLE) / CAST(n_toks AS DOUBLE), 6) AS DOUBLE) AS top_tok_share,
       (CAST(n_unique AS DOUBLE) / CAST(n_toks AS DOUBLE)) < 0.3 AS repetitive
FROM per_doc
ORDER BY doc_id
""",
    category="safety",
)
def repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition proxies: unique-token ratio and top-token dominance.
    One explode + two aggregations keyed on doc_id — partial aggregation
    keeps the shuffle at distinct (doc, token) pairs, not raw tokens."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ).alias("tok"),
    )
    tok_counts = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    per_doc = tok_counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_toks"),
        F.count(F.lit(1)).alias("n_unique"),
        F.max("c").alias("max_tok_count"),
    )
    uratio = F.col("n_unique").cast("double") / F.col("n_toks").cast("double")
    return per_doc.select(
        "doc_id",
        "n_toks",
        "n_unique",
        F.round(uratio, 6).alias("unique_ratio"),
        F.round(
            F.col("max_tok_count").cast("double") / F.col("n_toks").cast("double"), 6
        ).alias("top_tok_share"),
        (uratio < 0.3).alias("repetitive"),
    ).orderBy("doc_id")


# Deterministic "benchmark" probe set: 3-gram shingles taken from every
# 97th document's head — stands in for an eval-set shingle list, which in
# production arrives as a small broadcast table.
_PROBE_DOC_FILTER = "doc_id % 97 = 0"
N_CONTAM = 3


@register(
    "contamination_check",
    oracle=f"""
WITH probe_docs AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
  FROM documents WHERE {_PROBE_DOC_FILTER}
),
probe AS (
  SELECT DISTINCT list_aggregate(toks[CAST(i AS INTEGER):CAST(i + {N_CONTAM} - 1 AS INTEGER)], 'string_agg', ' ') AS shingle
  FROM probe_docs,
       UNNEST(range(1, greatest(len(toks) - {N_CONTAM} + 1, 0) + 1)) AS t(i)
  WHERE len(toks) >= {N_CONTAM}
),
corpus AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
  FROM documents WHERE NOT ({_PROBE_DOC_FILTER})
),
corpus_sh AS (
  SELECT DISTINCT doc_id,
         list_aggregate(toks[CAST(i AS INTEGER):CAST(i + {N_CONTAM} - 1 AS INTEGER)], 'string_agg', ' ') AS shingle
  FROM corpus,
       UNNEST(range(1, greatest(len(toks) - {N_CONTAM} + 1, 0) + 1)) AS t(i)
  WHERE len(toks) >= {N_CONTAM}
)
SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_contaminated_shingles
FROM corpus_sh c JOIN probe p ON c.shingle = p.shingle
GROUP BY c.doc_id
ORDER BY c.doc_id
""",
    category="safety",
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark contamination: corpus documents sharing 3-gram shingles
    with the probe set. The probe side is tiny and broadcast; the corpus
    explodes to distinct (doc, shingle) once — one equi-join shuffle,
    which is the 100 TB-safe leakage check (never a cross join)."""
    docs = load(spark, sf_dir, "documents")
    toks = F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
    shingle_expr = F.expr(
        f"transform(sequence(1, greatest(size(toks) - {N_CONTAM} + 1, 0)), "
        f"i -> array_join(slice(toks, i, {N_CONTAM}), ' '))"
    )
    probe = (
        docs.filter(F.expr(_PROBE_DOC_FILTER))
        .select(F.col("doc_id"), toks.alias("toks"))
        .filter(F.size("toks") >= N_CONTAM)
        .select(F.explode(shingle_expr).alias("shingle"))
        .distinct()
    )
    corpus = (
        docs.filter(~F.expr(_PROBE_DOC_FILTER))
        .select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= N_CONTAM)
        .select("doc_id", F.explode(shingle_expr).alias("shingle"))
        .distinct()
    )
    return (
        corpus.join(F.broadcast(probe), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated_shingles"))
        .orderBy("doc_id")
    )
