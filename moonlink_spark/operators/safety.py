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


@register(
    "gopher_repetition_signals",
    oracle="""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
  FROM documents
),
base AS (
  SELECT doc_id, t, len(t) AS n_toks,
         CAST(len(list_aggregate(t, 'string_agg', '')) AS BIGINT) AS total_chars
  FROM toks
),
grams AS (
  SELECT b.doc_id, n.n, b.total_chars,
         list_aggregate(b.t[CAST(i AS INTEGER):CAST(i + n.n - 1 AS INTEGER)],
                        'string_agg', ' ') AS gram
  FROM base b
  CROSS JOIN (SELECT UNNEST([2, 3, 4, 5, 6]) AS n) n,
       UNNEST(range(1, greatest(b.n_toks - n.n + 1, 0) + 1)) AS u(i)
  WHERE b.n_toks >= n.n
),
gram_counts AS (
  SELECT doc_id, n, total_chars, gram,
         CAST(COUNT(*) AS BIGINT) AS c,
         CAST(len(replace(gram, ' ', '')) AS BIGINT) AS gchars
  FROM grams GROUP BY doc_id, n, total_chars, gram
),
per_n AS (
  SELECT doc_id, n,
         round(CAST(MAX(c * gchars) AS DOUBLE)
               / CAST(ANY_VALUE(total_chars) AS DOUBLE), 6) AS top_frac,
         round(CAST(COALESCE(SUM(c * gchars) FILTER (c > 1), 0) AS DOUBLE)
               / CAST(ANY_VALUE(total_chars) AS DOUBLE), 6) AS dup_frac
  FROM gram_counts GROUP BY doc_id, n
)
SELECT b.doc_id,
       CAST(b.n_toks AS BIGINT) AS n_toks,
       b.total_chars,
       COALESCE(MAX(CASE WHEN p.n = 2 THEN p.top_frac END), 0.0) AS top_2gram_char_frac,
       COALESCE(MAX(CASE WHEN p.n = 3 THEN p.top_frac END), 0.0) AS top_3gram_char_frac,
       COALESCE(MAX(CASE WHEN p.n = 4 THEN p.top_frac END), 0.0) AS top_4gram_char_frac,
       COALESCE(MAX(CASE WHEN p.n = 5 THEN p.dup_frac END), 0.0) AS dup_5gram_char_frac,
       COALESCE(MAX(CASE WHEN p.n = 6 THEN p.dup_frac END), 0.0) AS dup_6gram_char_frac,
       (COALESCE(MAX(CASE WHEN p.n = 2 THEN p.top_frac END), 0.0) > 0.20 OR
        COALESCE(MAX(CASE WHEN p.n = 3 THEN p.top_frac END), 0.0) > 0.18 OR
        COALESCE(MAX(CASE WHEN p.n = 4 THEN p.top_frac END), 0.0) > 0.16 OR
        COALESCE(MAX(CASE WHEN p.n = 5 THEN p.dup_frac END), 0.0) > 0.15 OR
        COALESCE(MAX(CASE WHEN p.n = 6 THEN p.dup_frac END), 0.0) > 0.14)
        AS would_filter
FROM base b LEFT JOIN per_n p ON p.doc_id = b.doc_id
GROUP BY b.doc_id, b.n_toks, b.total_chars
ORDER BY b.doc_id
""",
    category="safety",
)
def gopher_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher repetition-filter suite (Rae et al. 2021, Table A1),
    token-adapted: per document, the character fraction covered by the
    single most frequent {2,3,4}-gram and the character fraction covered by
    all duplicated {5,6}-grams (count x gram-chars / total token chars, the
    standard occurrence-weighted approximation), plus the would-filter flag
    at the published thresholds (0.20/0.18/0.16 top, 0.15/0.14 dup).

    Plan shape for 100 TB: n-grams are built per row with transform() over
    the token array (a pure map — no self-join on positions), exploded once
    for all five n in one pass, and the only shuffle is the
    groupBy(doc, n, gram) count whose partial aggregation collapses
    repeated grams map-side. Output stays one row per document.
    """
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").alias("t"),
    )
    base = toks.select(
        "doc_id",
        F.size("t").alias("n_toks"),
        F.length(F.array_join("t", "")).cast("long").alias("total_chars"),
        "t",
    ).persist()

    ns = [2, 3, 4, 5, 6]
    gram_arrays = [
        F.when(
            F.col("n_toks") >= n,
            F.expr(
                f"transform(sequence(1, greatest(n_toks - {n} + 1, 1)), "
                f"i -> named_struct('n', {n}, "
                f"'gram', concat_ws(' ', slice(t, i, {n}))))"
            ),
        ).otherwise(F.array())
        for n in ns
    ]
    grams = base.select(
        "doc_id",
        "total_chars",
        F.explode(F.flatten(F.array(*gram_arrays))).alias("g"),
    ).select("doc_id", "total_chars", F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))

    gram_counts = grams.groupBy("doc_id", "n", "gram").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.first("total_chars").alias("total_chars"),
    ).withColumn(
        "gchars", F.length(F.regexp_replace("gram", " ", "")).cast("long")
    )
    per_n = gram_counts.groupBy("doc_id", "n").agg(
        F.round(
            F.max(F.col("c") * F.col("gchars")).cast("double")
            / F.first("total_chars").cast("double"),
            6,
        ).alias("top_frac"),
        F.round(
            F.coalesce(
                F.sum(
                    F.when(F.col("c") > 1, F.col("c") * F.col("gchars"))
                ),
                F.lit(0),
            ).cast("double")
            / F.first("total_chars").cast("double"),
            6,
        ).alias("dup_frac"),
    )

    def pick(n: int, col: str):
        return F.coalesce(
            F.max(F.when(F.col("n") == n, F.col(col))), F.lit(0.0)
        )

    agg = per_n.groupBy("doc_id").agg(
        pick(2, "top_frac").alias("top_2gram_char_frac"),
        pick(3, "top_frac").alias("top_3gram_char_frac"),
        pick(4, "top_frac").alias("top_4gram_char_frac"),
        pick(5, "dup_frac").alias("dup_5gram_char_frac"),
        pick(6, "dup_frac").alias("dup_6gram_char_frac"),
    )
    out = (
        base.select("doc_id", F.col("n_toks").cast("long").alias("n_toks"), "total_chars")
        .join(agg, "doc_id", "left")
        .fillna(
            0.0,
            subset=[
                "top_2gram_char_frac", "top_3gram_char_frac",
                "top_4gram_char_frac", "dup_5gram_char_frac",
                "dup_6gram_char_frac",
            ],
        )
    )
    return out.select(
        "doc_id",
        "n_toks",
        "total_chars",
        "top_2gram_char_frac",
        "top_3gram_char_frac",
        "top_4gram_char_frac",
        "dup_5gram_char_frac",
        "dup_6gram_char_frac",
        (
            (F.col("top_2gram_char_frac") > 0.20)
            | (F.col("top_3gram_char_frac") > 0.18)
            | (F.col("top_4gram_char_frac") > 0.16)
            | (F.col("dup_5gram_char_frac") > 0.15)
            | (F.col("dup_6gram_char_frac") > 0.14)
        ).alias("would_filter"),
    ).orderBy("doc_id")
