"""The engine's text/vector primitives as first-class Spark SQL functions.

``register_sql_functions(spark)`` creates a set of ``ml_*`` SQL UDFs
(Spark 4 ``CREATE FUNCTION ... RETURNS ... RETURN <expr>`` — pure
expression bodies, so every call inlines into whole-stage codegen; there
is no Python in the loop). They are the same expressions the registered
operators run — tokenization, shingling, the seeded MinHash family,
cosine/dot/norm folds, Jaccard — so ad-hoc SQL (including ``POST /sql``
through :meth:`MoonlinkBackend.sql`) composes with the curated operators
without re-deriving their arithmetic.

Parity note: the reference delegates its relational surface to attached
engines (SURVEY §0); these macros are the Spark-native equivalent of
shipping the engine's row-level primitives to that attached engine.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# mirror dedup.py's seeded universal-hash family (same constants => the
# SQL surface and the operator pipeline produce identical signatures)
from moonlink_spark.operators.dedup import _MINHASH_AB, _MINHASH_P

_DOT = (
    "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * "
    "CAST(y AS DOUBLE)), 0.0D, (acc, v) -> acc + v)"
)


def _norm(col: str) -> str:
    return (
        f"sqrt(aggregate(transform({col}, x -> CAST(x AS DOUBLE) * "
        f"CAST(x AS DOUBLE)), 0.0D, (acc, v) -> acc + v))"
    )


_MINHASH_BODY = "array(" + ", ".join(
    f"array_min(transform(hv, h -> ({a}L * h + {b}L) % {_MINHASH_P}L))"
    for a, b in _MINHASH_AB
) + ")"


SQL_FUNCTIONS: dict[str, str] = {
    # --- text ---------------------------------------------------------
    "ml_tokens": (
        "(t STRING) RETURNS ARRAY<STRING> RETURN "
        "regexp_extract_all(lower(t), '[a-z0-9]+', 0)"
    ),
    "ml_token_count": (
        "(t STRING) RETURNS BIGINT RETURN "
        "CAST(size(regexp_extract_all(lower(t), '[a-z0-9]+', 0)) AS BIGINT)"
    ),
    # try_element_at: ANSI-mode element_at throws on out-of-bounds, so a
    # <3-token input would abort the caller's query; NULL-and-filter
    # matches the operator pipeline (dedup._SPARK_SHINGLES)
    "ml_shingles": (
        "(toks ARRAY<STRING>) RETURNS ARRAY<STRING> RETURN "
        "filter(transform(sequence(1, greatest(size(toks) - 2, 1)), "
        "i -> concat(try_element_at(toks, i), ' ', try_element_at(toks, i + 1), "
        "' ', try_element_at(toks, i + 2))), x -> x IS NOT NULL)"
    ),
    "ml_content_hash": (
        "(t STRING) RETURNS STRING RETURN md5(CAST(t AS BINARY))"
    ),
    # nullif guards: ANSI mode raises DIVIDE_BY_ZERO even for doubles, so
    # two empty token arrays (or a zero vector in ml_cosine) must yield
    # NULL, not abort the caller's query
    "ml_jaccard": (
        "(a ARRAY<STRING>, b ARRAY<STRING>) RETURNS DOUBLE RETURN "
        "CAST(size(array_intersect(a, b)) AS DOUBLE) / "
        "nullif(CAST(size(array_union(a, b)) AS DOUBLE), 0.0D)"
    ),
    # shingles -> 28-bit digest ints (one md5 per shingle), then the 8
    # seeded minhashes over those ints — identical constants and
    # arithmetic to dedup._spark_signature, split in two so the digest is
    # computed once however many hash functions consume it
    "ml_shingle_hashes": (
        "(shingles ARRAY<STRING>) RETURNS ARRAY<BIGINT> RETURN "
        "transform(shingles, x -> cast(conv(substring(md5(concat('sh:', x)), "
        "1, 7), 16, 10) as bigint))"
    ),
    "ml_minhash_sig": (
        "(hv ARRAY<BIGINT>) RETURNS ARRAY<BIGINT> RETURN "
        f"CASE WHEN size(hv) = 0 THEN NULL ELSE {_MINHASH_BODY} END"
    ),
    # --- vectors ------------------------------------------------------
    "ml_dot": (
        f"(a ARRAY<FLOAT>, b ARRAY<FLOAT>) RETURNS DOUBLE RETURN {_DOT}"
    ),
    "ml_norm": (
        "(a ARRAY<FLOAT>) RETURNS DOUBLE RETURN " + _norm("a")
    ),
    "ml_cosine": (
        "(a ARRAY<FLOAT>, b ARRAY<FLOAT>) RETURNS DOUBLE RETURN "
        f"{_DOT} / nullif({_norm('a')} * {_norm('b')}, 0.0D)"
    ),
}


# sessions that already hold the current macro set — temporary SQL
# functions are session-scoped, so re-running the DDL per query (e.g. on
# every POST /sql) would be pure overhead (same memoization pattern as
# session.ensure_package_on_workers)
_REGISTERED: set[int] = set()


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Create (or replace) every ``ml_*`` temporary SQL function on this
    session (idempotent, memoized per session). Returns the names."""
    key = id(spark)
    if key not in _REGISTERED:
        for name, decl in SQL_FUNCTIONS.items():
            spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{decl}")
        _REGISTERED.add(key)
    return list(SQL_FUNCTIONS)
