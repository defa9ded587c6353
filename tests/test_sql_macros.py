"""ml_* SQL macros: registration, arithmetic identity with the operator
pipeline, and availability through the backend SQL surface."""

import pytest
from pyspark.sql import functions as F

from moonlink_spark.functions.sql_macros import (
    SQL_FUNCTIONS,
    register_sql_functions,
)
from moonlink_spark.operators import load


@pytest.fixture(scope="module", autouse=True)
def macros(spark):
    return register_sql_functions(spark)


def test_all_declared_functions_register(spark, macros):
    assert set(macros) == set(SQL_FUNCTIONS)
    # every macro is callable (smoke over trivial inputs)
    row = spark.sql(
        """
        SELECT ml_token_count('a b c') AS tc,
               size(ml_tokens('x y')) AS tn,
               size(ml_shingles(array('a','b','c','d'))) AS sh,
               ml_content_hash('x') AS ch,
               ml_jaccard(array('a'), array('a','b')) AS j,
               ml_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d,
               ml_norm(array(3.0F, 4.0F)) AS n,
               ml_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c
        """
    ).collect()[0]
    assert row.tc == 3 and row.tn == 2 and row.sh == 2
    assert row.j == 0.5 and row.d == 11.0 and row.n == 5.0
    assert abs(row.c - 1.0) < 1e-12


def test_minhash_macro_equals_operator_pipeline(spark, sf_dir):
    """The SQL-surface signature must be bit-identical to the dedup
    pipeline's (same constants, same arithmetic) over real documents."""
    from moonlink_spark.operators.dedup import N_HASHES, _spark_signature

    docs = load(spark, sf_dir, "documents").select("doc_id", "text").filter(
        F.col("doc_id") < 50
    )
    docs.createOrReplaceTempView("macro_docs")
    via_macro = spark.sql(
        """
        SELECT doc_id, ml_minhash_sig(ml_shingle_hashes(
                   ml_shingles(ml_tokens(text)))) AS sig
        FROM macro_docs
        """
    ).collect()
    via_op = {r.doc_id: r for r in _spark_signature(docs).collect()}
    assert len(via_macro) == 50
    for r in via_macro:
        expected = [via_op[r.doc_id][f"h{i}"] for i in range(N_HASHES)]
        assert list(r.sig) == expected, r.doc_id


def test_cosine_macro_equals_vector_fold(spark, sf_dir):
    from moonlink_spark.operators.similarity import _dot, _norm

    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 20)
    emb.createOrReplaceTempView("macro_emb")
    via_macro = {
        r.vec_id: r.c
        for r in spark.sql(
            "SELECT vec_id, ml_cosine(embedding, embedding) AS c FROM macro_emb"
        ).collect()
    }
    via_op = {
        r.vec_id: r.c
        for r in emb.select(
            "vec_id",
            (_dot("embedding", "embedding")
             / (_norm("embedding") * _norm("embedding"))).alias("c"),
        ).collect()
    }
    assert via_macro == via_op  # bit-identical, not approximately equal


def test_macros_available_through_backend_sql(spark, tmp_path):
    from moonlink_spark.backend import MoonlinkBackend
    from moonlink_spark.table.identity import IdentityProp

    be = MoonlinkBackend(spark, str(tmp_path / "wh"))
    t = be.create_table(
        "db",
        "docs",
        [
            {"name": "id", "data_type": "int64", "nullable": False},
            {"name": "body", "data_type": "string"},
        ],
        identity=IdentityProp.single("id"),
    )
    t.append_rows(
        [{"id": 1, "body": "alpha beta gamma"}, {"id": 2, "body": "x"}]
    )
    t.commit(lsn=1)
    rows = be.sql(
        "SELECT id, ml_token_count(body) AS n FROM docs ORDER BY id",
        database="db",
    ).collect()
    assert [(r.id, r.n) for r in rows] == [(1, 3), (2, 1)]


def test_macros_ansi_edge_cases(spark, macros):
    """Under Spark 4's default ANSI mode, degenerate inputs must yield
    empty/NULL results, not abort the caller's query (element_at throws
    on out-of-bounds, double division throws on /0)."""
    row = spark.sql(
        """
        SELECT ml_shingles(ml_tokens('one two')) AS short_sh,
               ml_shingles(ml_tokens('')) AS empty_sh,
               ml_jaccard(CAST(array() AS ARRAY<STRING>),
                          CAST(array() AS ARRAY<STRING>)) AS j0,
               ml_cosine(array(0.0F, 0.0F), array(1.0F, 2.0F)) AS c0,
               ml_minhash_sig(ml_shingle_hashes(
                   ml_shingles(ml_tokens('hi')))) AS sig0
        """
    ).collect()[0]
    assert row.short_sh == [] and row.empty_sh == []
    assert row.j0 is None and row.c0 is None and row.sig0 is None


def test_operator_shingles_tolerate_short_docs(spark):
    """The shared shingle expression must not raise on <3-token docs
    (ANSI element_at would)."""
    from moonlink_spark.operators.dedup import _SPARK_SHINGLES, _SPARK_TOKS

    df = spark.createDataFrame(
        [(1, "only two"), (2, ""), (3, "a b c d")],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r.sh
        for r in df.selectExpr(
            "doc_id", f"{_SPARK_SHINGLES.replace('toks', _SPARK_TOKS)} AS sh"
        ).collect()
    }
    assert rows[1] == [] and rows[2] == []
    assert rows[3] == ["a b c", "b c d"]
