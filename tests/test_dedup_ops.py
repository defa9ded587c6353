"""Connected-components label propagation over duplicate-candidate graphs."""

from pyspark.sql import functions as F

from moonlink_spark.operators.dedup import connected_components


def _edges(spark, pairs):
    df = spark.createDataFrame(pairs, "src long, dst long")
    return df.unionByName(df.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def test_chain_collapses_to_min_label(spark):
    # 1-2-3-4-5 chain: diameter 4, needs several propagation rounds
    labels = connected_components(_edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)]))
    got = {r.doc_id: r.label for r in labels.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_disjoint_components_keep_distinct_labels(spark):
    # triangle {10,11,12}, pair {20,21}, chain {30,31,32}
    labels = connected_components(
        _edges(spark, [(10, 11), (11, 12), (10, 12), (20, 21), (30, 31), (31, 32)])
    )
    got = {r.doc_id: r.label for r in labels.collect()}
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30, 31: 30, 32: 30}


def test_semantic_dedup_scale_path_flags_planted_duplicates(spark, sf_dir):
    """The scale-path semantic_dedup (k grows with n — the shape
    scripts/scale_validation.py measures) must flag planted exact copies
    under the keep-lowest-id rule: identical vectors always share a
    nearest centroid, so cluster growth cannot lose them."""
    from pyspark.sql import functions as F

    from moonlink_spark.operators import load
    from moonlink_spark.operators.similarity import semantic_dedup

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n = emb.count()
    copies = emb.orderBy("vec_id").limit(25).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(copies)
    out = semantic_dedup(spark, corpus, target_cluster_size=200).collect()
    total_members = sum(r.n_members for r in out)
    total_dups = sum(r.n_duplicates for r in out)
    total_kept = sum(r.n_kept for r in out)
    assert total_members == n + 25
    assert total_dups >= 25  # every planted copy is caught
    assert total_kept == total_members - total_dups
    # impossible threshold: nothing duplicates, everything kept
    clean = semantic_dedup(spark, emb, threshold=1.01,
                           target_cluster_size=200).collect()
    assert sum(r.n_duplicates for r in clean) == 0
    assert sum(r.n_kept for r in clean) == n
