"""Unit checks for the distributed linear-algebra operators beyond the
oracle sweep: the Gram matrix must equal numpy's ground truth, and the
power-iteration scores must align with numpy's true first eigenvector."""

import math

import numpy as np
import pytest

from moonlink_spark.operators import all_queries, load


@pytest.fixture(scope="module")
def specs():
    return all_queries()


def _quantized(spark, sf_dir, scale):
    rows = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    return np.array(
        [[math.floor(float(x) * scale) for x in r.embedding] for r in rows],
        dtype=np.int64,
    )


def test_gram_matrix_equals_numpy(spark, sf_dir, specs):
    Q = _quantized(spark, sf_dir, 1024.0)
    G = Q.T @ Q
    out = specs["embedding_gram_matrix"].fn(spark, sf_dir).collect()
    assert len(out) == 64 * 65 // 2
    n = Q.shape[0]
    for r in out:
        assert r.gram == G[r.i - 1][r.j - 1], (r.i, r.j)
        assert r.n == n
    # symmetry of the source matrix means the upper triangle fully
    # determines it; spot-check a mirrored entry
    assert out[1].gram == G[1][0]


def test_pca_scores_match_pure_python_replica(spark, sf_dir, specs):
    # ground truth computed with arbitrary-precision Python ints, fully
    # independent of Spark, numpy matmul, and DuckDB: the operator's
    # integer lattice must land on exactly these values
    Q = _quantized(spark, sf_dir, 1024.0)
    D = Q.shape[1]
    G = [[int(x) for x in row] for row in (Q.T @ Q)]
    v = [1024] * D
    for _ in range(3):
        w = [sum(G[i][j] * v[j] for j in range(D)) for i in range(D)]
        m = max(abs(x) for x in w)
        v = [(x * 1024) // m for x in w]
    expected = [sum(int(Q[r][i]) * v[i] for i in range(D)) for r in range(Q.shape[0])]
    out = specs["embedding_pca_power_scores"].fn(spark, sf_dir).collect()
    assert [r.proj for r in out] == expected


def test_pca_power_iteration_rayleigh_monotone(spark, sf_dir):
    # each power iteration must not decrease the (generalized) Rayleigh
    # quotient v.G.v / v.v — the defining convergence property, valid for
    # ANY spectrum (the synthetic corpus is near-isotropic, so testing
    # alignment with the true eigenvector would need hundreds of
    # iterations; monotone ascent holds from step one)
    Q = _quantized(spark, sf_dir, 1024.0).astype(np.float64)
    G = Q.T @ Q
    D = G.shape[0]
    Gi = [[int(x) for x in row] for row in (Q.astype(np.int64).T @ Q.astype(np.int64))]
    v = [1024] * D
    prev = None
    for _ in range(4):
        vv = np.array(v, dtype=np.float64)
        rq = float(vv @ G @ vv) / float(vv @ vv)
        if prev is not None:
            assert rq >= prev * (1 - 1e-12), (rq, prev)
        prev = rq
        w = [sum(Gi[i][j] * v[j] for j in range(D)) for i in range(D)]
        m = max(abs(x) for x in w)
        v = [(x * 1024) // m for x in w]


def test_drift_zero_between_identical_populations(spark, sf_dir):
    # TV distance of a population against itself is 0 in every dimension:
    # run the operator's arithmetic with both groups fed the same rows
    from pyspark.sql import functions as F

    # deterministic subset (an unordered limit() may pick different rows
    # per evaluation of the two union legs)
    emb = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    both = emb.select(F.lit(0).alias("grp"), "embedding").unionByName(
        emb.select(F.lit(1).alias("grp"), "embedding")
    )
    ex = both.select(
        "grp",
        F.posexplode(
            F.expr(
                "transform(embedding, x -> "
                "CAST(floor(CAST(x AS DOUBLE) * 4.0D) AS BIGINT))"
            )
        ).alias("i0", "b"),
    )
    counts = ex.groupBy("i0", "b").agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("cb"),
    )
    mismatch = counts.filter(F.col("ca") != F.col("cb")).count()
    assert mismatch == 0


def test_novelty_of_exact_copy_is_zero(spark, sf_dir):
    # append an exact copy of doc 0 with a higher id: every shingle of the
    # copy is first owned by the original, so the copy's novelty is 0
    from pyspark.sql import functions as F

    from moonlink_spark.operators.dedup import _SPARK_SHINGLES, _SPARK_TOKS

    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 20)  # deterministic subset incl. doc 0
    )
    assert docs.filter(F.col("doc_id") == 0).count() == 1
    copy = docs.filter(F.col("doc_id") == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(copy)
    tokd = corpus.select("doc_id", F.expr(_SPARK_TOKS).alias("toks"))
    sh = (
        tokd.select("doc_id", F.explode(F.expr(_SPARK_SHINGLES)).alias("s"))
        .distinct()
    )
    own = sh.groupBy("s").agg(F.min("doc_id").alias("first_owner"))
    out = (
        sh.join(own, "s")
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("first_owner") == F.col("doc_id"), 1).otherwise(0)
            ).alias("novel")
        )
        .filter(F.col("doc_id") == 10_000_000)
        .collect()
    )
    assert out[0].novel == 0


def test_temperature_weights_flatten_toward_uniform(spark, sf_dir, specs):
    rows = specs["mixture_temperature_weights"].fn(spark, sf_dir).collect()
    assert abs(sum(r.temp_weight for r in rows) - 1.0) < 1e-3
    total = sum(x.tokens for x in rows)
    shares = [r.tokens / total for r in rows]
    weights = [r.temp_weight for r in rows]
    # w_i = g(p_i)/sum g(p_j) with g concave increasing => p majorizes w:
    # the weight vector is strictly "flatter". Schur-convex consequences
    # (true for ANY share distribution, unlike a per-source band):
    n = len(rows)
    var_p = sum((p - 1 / n) ** 2 for p in shares)
    var_w = sum((w - 1 / n) ** 2 for w in weights)
    assert var_w <= var_p + 1e-9
    assert max(weights) <= max(shares) + 1e-6
    assert min(weights) >= min(shares) - 1e-6
    # monotone: a bigger source never gets a smaller weight (tolerance
    # covers the 1e-6 output rounding)
    by_tokens = sorted(rows, key=lambda r: r.tokens)
    for a, b in zip(by_tokens, by_tokens[1:]):
        assert a.temp_weight <= b.temp_weight + 1e-6, (a.source, b.source)


def test_gram_partial_skips_null_embeddings(spark):
    """Review finding (r8): a NULL embedding row must be DROPPED by the
    per-partition Gram fold (the DuckDB oracles' list_transform(NULL)
    rows never reach the unnest) — not crash np.array on a None.
    An all-NULL input degrades to an empty result, and the power
    iteration guards the all-zero vector instead of dividing by it."""
    from pyspark.sql import types as T

    from moonlink_spark.operators.similarity import _gram_partial_fn

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("qv", T.ArrayType(T.LongType())),
        ]
    )
    df = spark.createDataFrame(
        [(1, [1, 2]), (2, None), (3, [3, 4])], schema
    )
    out_schema = "i int, j int, gram long"
    from collections import defaultdict

    rows: dict = defaultdict(int)
    for r in df.mapInPandas(
        _gram_partial_fn("qv", with_n=False), out_schema
    ).collect():
        rows[(r.i, r.j)] += r.gram  # partials arrive per partition
    # triangle of [[1,2],[3,4]]^T [[1,2],[3,4]] = [[10,14],[14,20]]
    assert dict(rows) == {(1, 1): 10, (1, 2): 14, (2, 2): 20}
    # all-NULL: the fold yields nothing rather than raising
    df2 = spark.createDataFrame([(1, None), (2, None)], schema)
    assert df2.mapInPandas(_gram_partial_fn("qv", with_n=False), out_schema).count() == 0
