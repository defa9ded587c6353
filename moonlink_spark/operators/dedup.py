"""Deduplication operators for training-data pipelines over ``documents``.

Exact (hash-groupBy), MinHash+LSH (shingle -> minhash -> band -> bucket
join), n-gram Jaccard verification, and SimHash (hamming-banded) — each
deterministic and expressed with JVM-side builtins so the DuckDB oracle can
run the *same* computation.

Scale design (100 TB):
- Exact dedup: one shuffle on the content hash; survivors via min(doc_id).
- MinHash LSH: per-doc signature is a pure map stage; the only shuffle is
  the band bucket join (candidates), whose fan-out is controlled by band
  width — the standard way to near-dedup petabyte corpora (the
  all-pairs/shared-shingle join is quadratic and never runs at scale).
- Jaccard verify runs on LSH candidates only in production; the standalone
  exact-Jaccard operator here doubles as the oracle-checkable verify step.
- SimHash: 16-bit fingerprints, candidates banded by half-fingerprint
  equality, verified with bit_count(xor) — integer ops end to end.

The synthetic corpus has no natural duplicates, so each query first builds a
deterministic superset: exact copies (doc_id + 2^40 for doc_id%10==0) or
near-copies with the first word dropped (doc_id%5==0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from moonlink_spark.operators import (
    ensure_parallelism,
    load,
    persist_tracked,
    register,
)

N_HASHES = 8
N_BANDS = 4  # bands of 2 hashes each

# ---------------------------------------------------------------------------
# corpus builders (Spark + SQL versions must match exactly)
# ---------------------------------------------------------------------------


def _dup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + exact copies of every 10th doc (new ids + 2^40 — an
    offset no real corpus reaches, so synthetic ids can never collide
    with real doc_ids the way a +100000 offset would past 100k docs)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + F.lit(1099511627776)).alias("doc_id"), "text"
    )
    # no parallelism floor here: the sole consumer (dedup_exact) computes
    # ONE md5 per document — too light to repay the repartition shuffle
    # (measured 0.31 -> 0.62s with the floor; the shingle-heavy family
    # goes through _near_corpus, which floors)
    return docs.unionByName(copies)


_SQL_DUP_CORPUS = """
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1099511627776 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
"""


def _near_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + near-copies (first word dropped) of every 5th doc."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    near = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + F.lit(1099511627776)).alias("doc_id"),
        F.expr("substring(text, instr(text, ' ') + 1)").alias("text"),
    )
    return ensure_parallelism(docs.unionByName(near))


_SQL_NEAR_CORPUS = """
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1099511627776 AS doc_id, substr(text, strpos(text, ' ') + 1) AS text
  FROM documents WHERE doc_id % 5 = 0
"""

# shingle machinery: 3-word shingles over lowercase word tokens
# try_element_at (not element_at): under Spark 4's default ANSI mode an
# out-of-bounds element_at THROWS, so a <3-token document would abort the
# whole query; try_element_at yields NULL, the concat propagates it, and
# the filter drops it — exactly DuckDB's 1-based list-index semantics.
_SPARK_SHINGLES = (
    "filter(transform(sequence(1, greatest(size(toks) - 2, 1)), "
    "i -> concat(try_element_at(toks, i), ' ', try_element_at(toks, i + 1), ' ', "
    "try_element_at(toks, i + 2))), x -> x IS NOT NULL)"
)
_SQL_SHINGLES = (
    "list_filter(list_transform(range(1, greatest(len(toks) - 2, 1) + 1), "
    "i -> toks[CAST(i AS INTEGER)] || ' ' || toks[CAST(i AS INTEGER) + 1] || ' ' || "
    "toks[CAST(i AS INTEGER) + 2]), x -> x IS NOT NULL)"
)
_SPARK_TOKS = "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"
_SQL_TOKS = "regexp_extract_all(lower(text), '[a-z0-9]+')"


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------
@register(
    "dedup_exact",
    oracle=f"""
WITH corpus AS ({_SQL_DUP_CORPUS})
SELECT md5(text) AS content_hash,
       MIN(doc_id) AS keep_id,
       COUNT(*)    AS n_copies
FROM corpus
GROUP BY md5(text)
HAVING COUNT(*) > 1
""",
    category="dedup",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup: hash-groupBy, keep the smallest doc_id.
    One shuffle on the content hash; at 100 TB hash first, never shuffle
    full text."""
    corpus = _dup_corpus(spark, sf_dir)
    return (
        corpus.groupBy(F.md5(F.col("text").cast("binary")).alias("content_hash"))
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .filter(F.col("n_copies") > 1)
    )


# ---------------------------------------------------------------------------
# minhash + LSH candidates
# ---------------------------------------------------------------------------


# Integer minhash family over a 28-bit digest prefix: ONE md5 per shingle,
# then k universal hashes h_s = (A_s*h + B_s) mod P — integer transforms
# beat the hex-string-rotation family ~2x wall-clock (strings dominated the
# round-1 bench) and stay portable to the DuckDB oracle. A_s*h < 2^31*2^28
# never overflows BIGINT in either engine.
_MINHASH_P = 2_147_483_647  # 2^31 - 1 (prime)
_MINHASH_AB = [
    ((s * 2_654_435_761) % _MINHASH_P or 1, (s * 40_503_001 + 12_345) % _MINHASH_P)
    for s in range(1, N_HASHES + 1)
]


def _sql_hex7(expr: str) -> str:
    """DuckDB: value of the first 7 hex chars of ``expr`` as an int < 2^28."""
    return "(" + " + ".join(
        f"(strpos('0123456789abcdef', substr({expr}, {i + 1}, 1)) - 1) * {16 ** (6 - i)}"
        for i in range(7)
    ) + ")"


def _spark_signature(df: DataFrame) -> DataFrame:
    """Add integer minhash signature columns h0..h7 (one md5 per shingle,
    universal-hash family, min over ints). Built as four chained selects —
    one projection per derivation step — rather than a withColumn chain:
    each withColumn triggers a full re-analysis of the growing plan, and
    the 11-step chain dominated this query's cold (first-run) latency."""
    hashed = (
        df.select("doc_id", F.expr(_SPARK_TOKS).alias("toks"))
        .select("doc_id", F.expr(_SPARK_SHINGLES).alias("shingles"))
        .select(
            "doc_id",
            F.expr(
                "transform(shingles, x -> cast(conv(substring("
                "md5(concat('sh:', x)), 1, 7), 16, 10) as bigint))"
            ).alias("hv"),
        )
    )
    return hashed.select(
        "doc_id",
        *[
            F.expr(
                f"array_min(transform(hv, h -> ({a}L * h + {b}L) % {_MINHASH_P}L))"
            ).alias(f"h{s}")
            for s, (a, b) in enumerate(_MINHASH_AB)
        ],
    )


def _sql_signature(corpus_sql: str) -> str:
    hashes = ", ".join(
        f"list_min(list_transform(hv, h -> ({a} * h + {b}) % {_MINHASH_P})) AS h{s}"
        for s, (a, b) in enumerate(_MINHASH_AB)
    )
    return f"""
corpus AS ({corpus_sql}),
tokd AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM corpus),
shingled AS (SELECT doc_id, {_SQL_SHINGLES} AS shingles FROM tokd),
hashed AS (SELECT doc_id,
           list_transform(shingles, x -> CAST({_sql_hex7("md5('sh:' || x)")} AS BIGINT)) AS hv
           FROM shingled),
sigs AS (SELECT doc_id, {hashes} FROM hashed)
"""


# band value = h_{2b}*P + h_{2b+1} (both < P, so the combine fits BIGINT)
_SQL_BANDS = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band_idx, h{2*b} * {_MINHASH_P} + h{2*b+1} AS band_val FROM sigs"
    for b in range(N_BANDS)
)


@register(
    "dedup_minhash_lsh",
    oracle=f"""
WITH {_sql_signature(_SQL_NEAR_CORPUS)},
bands AS ({_SQL_BANDS})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND a.doc_id < b.doc_id
""",
    category="dedup",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidates: 8 seeded min-hashes, 4 bands of 2,
    bucket self-join on band value. The band join is the ONLY shuffle —
    this is the petabyte-scale dedup plan."""
    # persist: the signature subtree is referenced by both join sides;
    # without a cache Spark recomputes every md5 per side. posexplode (not
    # unionByName) fans out the bands with ONE copy of the signature
    # expression in the plan.
    sigs = persist_tracked(
        "dedup_minhash_lsh.sigs",
        _spark_signature(_near_corpus(spark, sf_dir)),
    )
    bands = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.col(f"h{2*b}") * F.lit(_MINHASH_P) + F.col(f"h{2*b+1}")
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    a = bands.alias("a")
    b_ = bands.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# exact n-gram jaccard (the verify stage, run standalone for the oracle)
# ---------------------------------------------------------------------------
@register(
    "dedup_ngram_jaccard",
    oracle=f"""
WITH corpus AS ({_SQL_NEAR_CORPUS}),
tokd AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM corpus),
shingled AS (SELECT doc_id, list_distinct({_SQL_SHINGLES}) AS sh FROM tokd),
sizes AS (SELECT doc_id, len(sh) AS n_sh FROM shingled),
exploded AS (SELECT doc_id, unnest(sh) AS shingle FROM shingled),
pair_common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
  FROM exploded a JOIN exploded b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       CAST(round(CAST(n_common AS DOUBLE) /
            CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE), 6) AS DOUBLE) AS jaccard
FROM pair_common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_common AS DOUBLE) >= 0.5
""",
    category="dedup",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard similarity >= 0.5 via shared-shingle join.
    At scale this runs ONLY on LSH candidate pairs (dedup_minhash_lsh);
    standalone here so DuckDB can verify the arithmetic."""
    corpus = _near_corpus(spark, sf_dir)
    shingled = (
        corpus.withColumn("toks", F.expr(_SPARK_TOKS))
        .withColumn("sh", F.array_distinct(F.expr(_SPARK_SHINGLES)))
        .select("doc_id", "sh")
    )
    sizes = shingled.select("doc_id", F.size("sh").alias("n_sh"))
    exploded = shingled.select("doc_id", F.explode("sh").alias("shingle"))
    a = exploded.alias("a")
    b = exploded.alias("b")
    pair_common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_common").cast("double") / (
        F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_common")
    ).cast("double")
    return (
        pair_common.join(F.broadcast(sa), F.col("doc_a") == F.col("sa.doc_id"))
        .join(F.broadcast(sb), F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= 0.5)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

# 64-bit SimHash carried as 4x 16-bit words w0..w3 (avoids 64-bit sign
# overflow in both engines and makes each word directly usable as an LSH
# band key). N_WORDS x 16 bits = the classic 64-bit fingerprint.
N_WORDS = 4
SIMHASH_MAX_HAMMING = 3


def _sql_hexquad(off: int) -> str:
    """DuckDB: value of md5-hex chars [off+1 .. off+4] as an int in [0,65535]."""
    return (
        f"((strpos('0123456789abcdef', substr(m, {off + 1}, 1)) - 1) * 4096 + "
        f"(strpos('0123456789abcdef', substr(m, {off + 2}, 1)) - 1) * 256 + "
        f"(strpos('0123456789abcdef', substr(m, {off + 3}, 1)) - 1) * 16 + "
        f"(strpos('0123456789abcdef', substr(m, {off + 4}, 1)) - 1))"
    )


_SQL_BITSUMS64 = ", ".join(
    f"SUM(CASE WHEN (h{w} >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS s{w}_{i}"
    for w in range(N_WORDS)
    for i in range(16)
)
_SQL_WORDS = ", ".join(
    "("
    + " + ".join(f"(CASE WHEN s{w}_{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(16))
    + f") AS w{w}"
    for w in range(N_WORDS)
)
_SQL_WORD_BANDS = " UNION ALL ".join(
    f"SELECT doc_id, w0, w1, w2, w3, {w} AS band_idx, w{w} AS band_val FROM fps"
    for w in range(N_WORDS)
)
_SQL_HAMMING = " + ".join(
    f"bit_count(xor(wa{w}, wb{w}))" for w in range(N_WORDS)
)


@register(
    "dedup_simhash",
    oracle=f"""
WITH corpus AS ({_SQL_NEAR_CORPUS}),
tokd AS (SELECT doc_id, unnest({_SQL_TOKS}) AS tok FROM corpus),
hashed AS (
  SELECT doc_id,
         {", ".join(f"{_sql_hexquad(4 * w)} AS h{w}" for w in range(N_WORDS))}
  FROM (SELECT doc_id, md5(tok) AS m FROM tokd) t
),
bitsums AS (SELECT doc_id, {_SQL_BITSUMS64} FROM hashed GROUP BY doc_id),
fps AS (SELECT doc_id, {_SQL_WORDS} FROM bitsums),
bands AS ({_SQL_WORD_BANDS}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.w0 AS wa0, a.w1 AS wa1, a.w2 AS wa2, a.w3 AS wa3,
         b.w0 AS wb0, b.w1 AS wb1, b.w2 AS wb2, b.w3 AS wb3
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST({_SQL_HAMMING} AS BIGINT) AS hamming
FROM cand
WHERE {_SQL_HAMMING} <= {SIMHASH_MAX_HAMMING}
ORDER BY doc_a, doc_b
""",
    category="dedup",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash near-dup detection, Google-style banding: per-token
    md5 -> signed bit votes over 64 bits (as 4x 16-bit words) -> candidates
    join on any equal word -> exact hamming verify via bit_count(xor).

    Scale (100 TB): 4 bands x 16 bits = 65536 buckets/band, so bucket
    occupancy stays bounded (vs the old 16-bit/256-bucket variant whose
    candidates grew quadratically). Pigeonhole guarantees recall: a pair
    within hamming<={SIMHASH_MAX_HAMMING} differs in <=3 words, so at least
    one of the 4 words matches exactly. Parity anchor: the bounded-bucket
    index design of persisted_bucket_hash_map.rs:33-110."""
    corpus = _near_corpus(spark, sf_dir)
    toks = corpus.select("doc_id", F.explode(F.expr(_SPARK_TOKS)).alias("tok"))
    # materialize the digest ONCE per token: the four word-hash columns
    # would otherwise each re-evaluate md5 (no CSE across projections)
    digested = toks.select(
        "doc_id", F.md5(F.col("tok").cast("binary")).alias("m")
    )
    hashed = digested.select(
        "doc_id",
        *[
            F.conv(F.substring("m", 4 * w + 1, 4), 16, 10)
            .cast("long")
            .alias(f"h{w}")
            for w in range(N_WORDS)
        ],
    )
    # branchless votes: summing the raw bit (0/1) instead of a CASE'd +-1
    # gives the same sign test — vote s = 2c - n, so s > 0 <=> 2c > n —
    # with 64 bitand-sums instead of 64 branch evaluations per token row
    # (the agg over the exploded token table is this query's hot loop)
    bitsums = hashed.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(F.expr(f"(h{w} >> {i}) & 1")).alias(f"c{w}_{i}")
            for w in range(N_WORDS)
            for i in range(16)
        ],
    )
    word_cols = []
    for w in range(N_WORDS):
        expr = None
        for i in range(16):
            term = F.when(
                F.col(f"c{w}_{i}") * 2 > F.col("n"), F.lit(1 << i)
            ).otherwise(F.lit(0))
            expr = term if expr is None else (expr + term)
        word_cols.append(expr.cast("long").alias(f"w{w}"))
    # persist: the fingerprint subtree feeds both join sides; posexplode
    # fans out the 4 word-bands with one copy of the expression tree.
    fps = persist_tracked(
        "dedup_simhash.fps", bitsums.select("doc_id", *word_cols)
    )
    bands = fps.select(
        "doc_id", "w0", "w1", "w2", "w3",
        F.posexplode(F.array(*[F.col(f"w{w}") for w in range(N_WORDS)])).alias(
            "band_idx", "band_val"
        ),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            *[F.col(f"a.w{w}").alias(f"wa{w}") for w in range(N_WORDS)],
            *[F.col(f"b.w{w}").alias(f"wb{w}") for w in range(N_WORDS)],
        )
        .distinct()
    )
    hamming = F.expr(
        " + ".join(f"bit_count(wa{w} ^ wb{w})" for w in range(N_WORDS))
    )
    return (
        cand.filter(hamming <= SIMHASH_MAX_HAMMING)
        .select("doc_a", "doc_b", hamming.cast("bigint").alias("hamming"))
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# duplicate-cluster assignment (connected components over LSH candidates)
# ---------------------------------------------------------------------------


def connected_components(
    edges: DataFrame, max_iters: int = 50
) -> DataFrame:
    """Connected components by iterative min-label propagation.

    ``edges`` must have columns ``src``/``dst`` (undirected edges should be
    present in both directions). Returns ``(doc_id, label)`` where ``label``
    is the smallest node id reachable from ``doc_id`` — the canonical
    cluster representative.

    Scale design (100 TB): each iteration is one shuffle join (labels onto
    edge endpoints) plus one min-aggregate; edges are persisted once and
    reused across iterations, and each iteration's label table is
    materialized (by the convergence count) before the previous one is
    dropped, so lineage never grows past one step. Converges in at most
    graph-diameter iterations — near-dup clusters are shallow, so in
    practice 2-4 rounds. The convergence check shares the materialization
    job rather than running a separate action.
    """
    edges = edges.persist()
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .persist()
    )
    changed = -1
    for _ in range(max_iters):
        msgs = edges.join(
            labels.withColumnRenamed("doc_id", "src"), "src"
        ).select(F.col("dst").alias("doc_id"), "label")
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("doc_id")
            .agg(F.min("label").alias("label"))
            .persist()
        )
        # full (non-limited) count so every partition of new_labels lands in
        # the cache before the old generation is unpersisted
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # NEVER return non-canonical labels silently: a component whose
        # diameter exceeds the round budget would otherwise elect
        # multiple "keepers" and dedup would keep real duplicates
        edges.unpersist()
        labels.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} "
            "rounds (a component's diameter exceeds the budget); raise "
            "max_iters — min-label propagation needs one round per hop "
            "of the longest duplicate chain"
        )
    # the returned generation is fully materialized by the convergence
    # count; edges can be released now, and the labels cache is tracked
    # so the NEXT invocation frees this one (callers hold a lazy DF)
    edges.unpersist()
    from moonlink_spark.operators import _PERSISTED

    prev = _PERSISTED.get("dedup.connected_components.labels")
    if prev is not None and prev is not labels:
        try:
            prev.unpersist()
        except Exception:
            pass
    _PERSISTED["dedup.connected_components.labels"] = labels
    return labels


@register(
    "dedup_connected_components",
    oracle=f"""
WITH RECURSIVE {_sql_signature(_SQL_NEAR_CORPUS)},
bands AS ({_SQL_BANDS}),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND a.doc_id < b.doc_id
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
labeled AS (
  SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id FROM reach GROUP BY src
)
SELECT doc_id, cluster_id,
       COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       doc_id = cluster_id AS is_keeper
FROM labeled
ORDER BY doc_id
""",
    category="dedup",
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster assignment: LSH candidate pairs -> connected
    components -> one keeper (min doc_id) per cluster.

    This is the stage real dedup pipelines run after MinHash-LSH: candidate
    pairs are edges of a duplicate graph, components are the duplicate
    clusters, and exactly one document per cluster survives. Implemented as
    iterative min-label propagation (see :func:`connected_components`); the
    DuckDB oracle computes the same fixpoint with a recursive CTE over the
    identical LSH pair set."""
    pairs = dedup_minhash_lsh(spark, sf_dir)
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    labels = connected_components(edges)
    from pyspark.sql import Window

    w = Window.partitionBy("cluster_id")
    return (
        labels.select("doc_id", F.col("label").alias("cluster_id"))
        .withColumn("cluster_size", F.count(F.lit(1)).over(w))
        .withColumn("is_keeper", F.col("doc_id") == F.col("cluster_id"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# segment-level (line) dedup
# ---------------------------------------------------------------------------

SEG_LEN = 8  # tokens per segment


@register(
    "dedup_duplicate_segments",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {_SQL_TOKS} AS toks
  FROM documents
),
segs AS (
  SELECT doc_id,
         md5(unnest(list_transform(generate_series(1, len(toks)//{SEG_LEN}),
             i -> array_to_string(toks[(i-1)*{SEG_LEN}+1:(i-1)*{SEG_LEN}+{SEG_LEN}], ' ')))) AS seg_hash
  FROM toks WHERE len(toks) >= {SEG_LEN}
),
cnt AS (SELECT seg_hash, CAST(COUNT(*) AS BIGINT) AS c FROM segs GROUP BY seg_hash),
per_doc AS (
  SELECT s.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_segments,
         CAST(SUM(CASE WHEN c.c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_segments
  FROM segs s JOIN cnt c USING (seg_hash)
  GROUP BY s.doc_id
)
SELECT d.doc_id,
       COALESCE(p.n_segments, 0) AS n_segments,
       COALESCE(p.n_dup_segments, 0) AS n_dup_segments,
       CAST(round(COALESCE(CAST(p.n_dup_segments AS DOUBLE)
                           / CAST(p.n_segments AS DOUBLE), 0.0), 6) AS DOUBLE)
           AS dup_frac,
       COALESCE(CAST(p.n_dup_segments AS DOUBLE)
                / CAST(p.n_segments AS DOUBLE), 0.0) <= 0.5 AS keep
FROM documents d LEFT JOIN per_doc p USING (doc_id)
ORDER BY d.doc_id
""",
    category="dedup",
)
def dedup_duplicate_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-level dedup (the 'line dedup' stage of Gopher / CCNet /
    RefinedWeb, adapted to newline-free corpora): split each doc into
    non-overlapping 8-token segments, count each segment's occurrences
    across the WHOLE corpus, and flag documents where more than half the
    segments are corpus-duplicated (boilerplate / template pages).

    Parity anchor: complements doc-granularity `dedup_exact` the way the
    reference's row-identity delete complements full-table ops
    (SURVEY.md §1.3) — the unit of identity drops below the row.

    Scale: the only row-level shuffles are (1) the segment-count groupBy
    and (2) the segment->count join, both keyed on md5(segment) — a
    fixed-width 16-byte key regardless of segment text length, so shuffle
    payload is bounded. Counts get map-side partial aggregation; hot
    boilerplate segments are absorbed by the partial agg (the classic
    word-count skew answer), and the join is equi on the same key so AQE
    can pick shuffle-hash. Per-doc re-aggregation shuffles on doc_id
    (uniform). Nothing is quadratic; this is the same plan FineWeb-scale
    line dedup runs.
    """
    docs = load(spark, sf_dir, "documents")
    toks = ensure_parallelism(docs.select("doc_id", "text")).select(
        "doc_id",
        F.expr(_SPARK_TOKS).alias("toks"),
    )
    segs = (
        toks.filter(F.size("toks") >= SEG_LEN)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(toks) div {SEG_LEN}), "
                    f"i -> md5(array_join(slice(toks, (i-1)*{SEG_LEN}+1, {SEG_LEN}), ' ')))"
                )
            ).alias("seg_hash"),
        )
    )
    cnt = segs.groupBy("seg_hash").agg(F.count(F.lit(1)).alias("c"))
    per_doc = (
        segs.join(cnt, "seg_hash")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_segments"),
            F.sum(F.when(F.col("c") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_segments"),
        )
    )
    frac = F.col("n_dup_segments").cast("double") / F.col("n_segments").cast("double")
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_segments", F.lit(0)).cast("bigint").alias("n_segments"),
            F.coalesce("n_dup_segments", F.lit(0)).cast("bigint").alias("n_dup_segments"),
            F.round(F.coalesce(frac, F.lit(0.0)), 6).alias("dup_frac"),
            (F.coalesce(frac, F.lit(0.0)) <= 0.5).alias("keep"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# n-gram novelty scoring (how much of each doc is first-seen content)
# ---------------------------------------------------------------------------
# 60-bit shingle key: both engines hash the shingle text to the same
# BIGINT (md5 15-hex prefix), so the shuffle/window key is 8 bytes instead
# of a ~25-byte string. A collision merges two shingles IDENTICALLY on
# both sides (same hash both engines), so parity is unaffected; at 60 bits
# the expected collision count stays < 1 up to ~10^8 distinct shingles.
_SQL_SH60 = "((strpos('0123456789abcdef', substr(md5(s0), 1, 1)) - 1) * 72057594037927936 + (strpos('0123456789abcdef', substr(md5(s0), 2, 1)) - 1) * 4503599627370496 + (strpos('0123456789abcdef', substr(md5(s0), 3, 1)) - 1) * 281474976710656 + (strpos('0123456789abcdef', substr(md5(s0), 4, 1)) - 1) * 17592186044416 + (strpos('0123456789abcdef', substr(md5(s0), 5, 1)) - 1) * 1099511627776 + (strpos('0123456789abcdef', substr(md5(s0), 6, 1)) - 1) * 68719476736 + (strpos('0123456789abcdef', substr(md5(s0), 7, 1)) - 1) * 4294967296 + (strpos('0123456789abcdef', substr(md5(s0), 8, 1)) - 1) * 268435456 + (strpos('0123456789abcdef', substr(md5(s0), 9, 1)) - 1) * 16777216 + (strpos('0123456789abcdef', substr(md5(s0), 10, 1)) - 1) * 1048576 + (strpos('0123456789abcdef', substr(md5(s0), 11, 1)) - 1) * 65536 + (strpos('0123456789abcdef', substr(md5(s0), 12, 1)) - 1) * 4096 + (strpos('0123456789abcdef', substr(md5(s0), 13, 1)) - 1) * 256 + (strpos('0123456789abcdef', substr(md5(s0), 14, 1)) - 1) * 16 + (strpos('0123456789abcdef', substr(md5(s0), 15, 1)) - 1) * 1)"


@register(
    "ngram_novelty_rate",
    oracle=f"""
WITH tokd AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
raw AS (SELECT doc_id, unnest({_SQL_SHINGLES}) AS s0 FROM tokd),
sh AS (SELECT DISTINCT doc_id, CAST({_SQL_SH60} AS BIGINT) AS s FROM raw),
marked AS (
  SELECT doc_id, MIN(doc_id) OVER (PARTITION BY s) AS first_owner FROM sh
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN first_owner = doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS novel_shingles,
       CAST(ROUND(CAST(SUM(CASE WHEN first_owner = doc_id
                                THEN 1 ELSE 0 END) AS DOUBLE)
                  / CAST(COUNT(*) AS DOUBLE), 6) AS DOUBLE) AS novelty_rate
FROM marked
GROUP BY doc_id
ORDER BY doc_id
""",
    category="dedup",
)
def ngram_novelty_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a doc's distinct
    3-token shingles whose globally first owner (min doc_id — "earliest
    in corpus order") is the doc itself. Low novelty flags documents that
    mostly repeat earlier content — the soft-score complement to the hard
    keep/drop of MinHash dedup, and the standard signal for ordering
    near-duplicate retention (CCNet/RefinedWeb-style).

    Scale shape: shingles hash to 60-bit BIGINT keys before any shuffle
    (full text never shuffles — the MinHash plan's key discipline), so
    every exchange moves only (doc_id, key) pairs; first-ownership is a
    window MIN over the shingle partition instead of a groupBy + join
    back, dropping the join's extra shuffle of the whole shingle relation
    (~2x faster at sf0.1, identical output)."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    tokd = ensure_parallelism(docs.select("doc_id", "text")).select(
        "doc_id", F.expr(_SPARK_TOKS).alias("toks")
    )
    sh = (
        tokd.select("doc_id", F.explode(F.expr(_SPARK_SHINGLES)).alias("s0"))
        .select(
            "doc_id",
            F.expr(
                "cast(conv(substring(md5(s0), 1, 15), 16, 10) as bigint)"
            ).alias("s"),
        )
        .distinct()
    )
    marked = sh.withColumn(
        "first_owner", F.min("doc_id").over(Window.partitionBy("s"))
    )
    novel = F.sum(
        F.when(F.col("first_owner") == F.col("doc_id"), 1).otherwise(0)
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            novel.cast("bigint").alias("novel_shingles"),
            F.round(
                novel.cast("double") / F.count(F.lit(1)).cast("double"), 6
            ).alias("novelty_rate"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# LSH quality evaluation (recall of candidates vs exact Jaccard truth)
# ---------------------------------------------------------------------------
def _register_lsh_recall():
    from moonlink_spark.operators import REGISTRY

    jaccard_sql = REGISTRY["dedup_ngram_jaccard"].oracle
    lsh_sql = REGISTRY["dedup_minhash_lsh"].oracle
    oracle = f"""
WITH tp AS (SELECT doc_a, doc_b FROM ({jaccard_sql}) j),
cand AS (SELECT doc_a, doc_b FROM ({lsh_sql}) c),
hits AS (SELECT COUNT(*) AS n_hits FROM tp JOIN cand USING (doc_a, doc_b))
SELECT CAST((SELECT COUNT(*) FROM tp) AS BIGINT) AS n_true,
       CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_candidates,
       CAST(h.n_hits AS BIGINT) AS n_hits,
       CAST(ROUND(CAST(h.n_hits AS DOUBLE)
                  / CAST((SELECT COUNT(*) FROM tp) AS DOUBLE), 6)
            AS DOUBLE) AS recall,
       CAST(ROUND(CAST(h.n_hits AS DOUBLE)
                  / CAST((SELECT COUNT(*) FROM cand) AS DOUBLE), 6)
            AS DOUBLE) AS candidate_precision
FROM hits h
"""

    @register("lsh_jaccard_recall_eval", oracle=oracle, category="dedup")
    def lsh_jaccard_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Dedup-index quality evaluation: recall of the MinHash-LSH
        candidate set against the exact Jaccard >= 0.5 ground truth, plus
        candidate precision — the dedup-family twin of ``ann_recall_at_k``,
        computed AS a query by composing the two registered operators (and
        their oracles). Run it after changing band count/width or the hash
        family: a recall drop means the banding no longer catches the
        near-dups the verify stage would confirm.

        Scale: both inputs are already scale-safe plans (banded bucket
        join / shared-shingle join on candidates); the comparison joins
        candidate-pair keys only — never documents."""
        # persist: each input feeds both a global count and the hits join;
        # without a cache Spark would run the shingle self-join and the
        # band join twice each (same convention as sigs in
        # dedup_minhash_lsh)
        tp = persist_tracked(
            "lsh_jaccard_recall_eval.tp",
            dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b"),
        )
        cand = persist_tracked(
            "lsh_jaccard_recall_eval.cand", dedup_minhash_lsh(spark, sf_dir)
        )
        n_true = tp.agg(F.count(F.lit(1)).cast("bigint").alias("n_true"))
        n_cand = cand.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_candidates")
        )
        n_hits = (
            tp.join(cand, ["doc_a", "doc_b"])
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
        )
        return (
            n_true.crossJoin(n_cand)
            .crossJoin(n_hits)
            .select(
                "n_true",
                "n_candidates",
                "n_hits",
                F.round(
                    F.col("n_hits").cast("double")
                    / F.col("n_true").cast("double"),
                    6,
                ).alias("recall"),
                F.round(
                    F.col("n_hits").cast("double")
                    / F.col("n_candidates").cast("double"),
                    6,
                ).alias("candidate_precision"),
            )
        )


_register_lsh_recall()


# ---------------------------------------------------------------------------
# edit-distance verification of LSH candidates
# ---------------------------------------------------------------------------
def _register_edit_distance_verify():
    from moonlink_spark.operators import REGISTRY

    lsh_sql = REGISTRY["dedup_minhash_lsh"].oracle
    oracle = f"""
WITH cand AS (SELECT doc_a, doc_b FROM ({lsh_sql}) c),
corpus AS ({_SQL_NEAR_CORPUS}),
scored AS (
  SELECT cand.doc_a, cand.doc_b,
         CAST(levenshtein(substr(a.text, 1, 200), substr(b.text, 1, 200))
              AS BIGINT) AS edit_dist
  FROM cand
  JOIN corpus a ON a.doc_id = cand.doc_a
  JOIN corpus b ON b.doc_id = cand.doc_b
)
SELECT doc_a, doc_b, edit_dist,
       CAST(edit_dist <= 40 AS BOOLEAN) AS is_near_dup
FROM scored
ORDER BY doc_a, doc_b
"""

    @register("dedup_edit_distance_verify", oracle=oracle, category="dedup")
    def dedup_edit_distance_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Edit-distance verification of MinHash-LSH candidates: exact
        Levenshtein over 200-char prefixes (both engines implement the
        classic integer DP, so the scores hash-match), thresholded at 40
        edits — the CCNet-style character-level confirm that catches
        near-dups token-level Jaccard mis-scores (reorderings, heavy
        punctuation edits).

        Scale shape: Levenshtein is O(len²) per pair, so it runs ONLY on
        the banded candidate set (never all pairs), on bounded prefixes;
        the two text re-attach joins are equi-joins on doc_id. This is
        the verify-stage pattern of the reference's index lookups:
        cheap candidate generation, exact confirmation on candidates."""
        cand = dedup_minhash_lsh(spark, sf_dir)
        corpus = _near_corpus(spark, sf_dir)
        a = corpus.select(
            F.col("doc_id").alias("doc_a"),
            F.substring("text", 1, 200).alias("ta"),
        )
        b = corpus.select(
            F.col("doc_id").alias("doc_b"),
            F.substring("text", 1, 200).alias("tb"),
        )
        scored = (
            cand.join(a, "doc_a")
            .join(b, "doc_b")
            .withColumn(
                "edit_dist", F.levenshtein("ta", "tb").cast("bigint")
            )
        )
        return scored.select(
            "doc_a",
            "doc_b",
            "edit_dist",
            (F.col("edit_dist") <= 40).alias("is_near_dup"),
        ).orderBy("doc_a", "doc_b")


_register_edit_distance_verify()


@register(
    "ingest_export_sigindex_pairs",
    oracle=f"""
WITH {_sql_signature(_SQL_NEAR_CORPUS)},
bands AS ({_SQL_BANDS})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND a.doc_id < b.doc_id
""",
    category="dedup",
)
def ingest_export_sigindex_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH near-dup candidates served from an EXPORTED Iceberg table's
    signature-index blobs, end to end: ingest the near-dup corpus into a
    table, build the persisted MinHash index (table/sigindex.py), export
    table + index to Iceberg (mooncake-minhash-index-v1 Puffin blobs,
    table/iceberg_export.py), then compute the banded candidate pairs
    ENTIRELY in DuckDB from the exported artifacts — no text read, no
    md5 recomputed, no Spark on the read side
    (integrations/duckdb_provider.attach_iceberg_lsh_pairs). The oracle
    is dedup_minhash_lsh's from-scratch SQL replay, so the exported
    index-served pairs must equal the native banding bit for bit."""
    import shutil
    import tempfile

    import duckdb

    from moonlink_spark.integrations.duckdb_provider import (
        attach_iceberg_lsh_pairs,
    )
    from moonlink_spark.table import sigindex
    from moonlink_spark.table.iceberg_export import export_iceberg
    from moonlink_spark.table.identity import IdentityProp
    from moonlink_spark.table.table import MoonlinkTable

    corpus = _near_corpus(spark, sf_dir)
    workdir = tempfile.mkdtemp(prefix="moonlink-sexport-")
    try:
        t = MoonlinkTable.create(
            spark,
            f"{workdir}/t",
            [
                {"name": "doc_id", "data_type": "int64", "nullable": False},
                {"name": "text", "data_type": "string"},
            ],
            IdentityProp.single("doc_id"),
        )
        # table ingest (data/ + manifest) and signature-index build
        # (sigindex/ segments + meta) are independent deterministic
        # functions of the same corpus writing disjoint paths — overlap
        # them from two driver threads (guide §2.6) so each chain's jobs
        # back-fill the other's per-job floors; the export consumes both
        # finished artifacts, byte-identical to the sequential order (r13)
        from concurrent.futures import ThreadPoolExecutor

        def _table_chain() -> None:
            t.append_df(corpus)
            t.commit(lsn=1)

        def _index_chain() -> None:
            sigindex.build_index(
                corpus,
                f"{workdir}/t/sigindex/text",
                meta_update={"as_of_lsn": 1},
            )

        with ThreadPoolExecutor(max_workers=2) as pool:
            tf, xf = pool.submit(_table_chain), pool.submit(_index_chain)
            tf.result()
            xf.result()
        export_iceberg(t, f"{workdir}/ice")
        con = duckdb.connect()
        try:
            attach_iceberg_lsh_pairs(
                con, f"{workdir}/ice", "text", view_name="exported_pairs"
            )
            rows = con.execute(
                "SELECT doc_a, doc_b FROM exported_pairs "
                "ORDER BY doc_a, doc_b"
            ).fetchall()
        finally:
            con.close()
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    return spark.createDataFrame(rows, "doc_a bigint, doc_b bigint")
