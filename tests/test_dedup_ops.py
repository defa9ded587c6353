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


def test_semantic_dedup_hierarchical_matches_flat_recall(spark, sf_dir):
    """r9 verdict #1: the two-level coarse quantizer (assignment
    O(n*sqrt(k)) instead of the flat path's O(n*k)) must keep >= 95% of
    the flat entry's duplicate count, and planted exact copies are
    always caught (identical vectors assign identically)."""
    from pyspark.sql import functions as F

    from moonlink_spark.operators import load
    from moonlink_spark.operators.similarity import (
        semantic_dedup,
        semantic_dedup_hierarchical,
    )

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n = emb.count()
    copies = emb.orderBy("vec_id").limit(25).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    )
    corpus = emb.unionByName(copies)
    flat = semantic_dedup(spark, corpus, target_cluster_size=100).collect()
    hier = semantic_dedup_hierarchical(
        spark, corpus, target_cluster_size=100
    ).collect()
    flat_dups = sum(r.n_duplicates for r in flat)
    hier_dups = sum(r.n_duplicates for r in hier)
    assert sum(r.n_members for r in hier) == n + 25
    assert hier_dups >= 25  # every planted exact copy caught
    assert hier_dups >= 0.95 * flat_dups  # recall pinned vs flat
    assert all(r.n_kept == r.n_members - r.n_duplicates for r in hier)


def test_hierarchical_quantizer_structure(spark, sf_dir):
    """Every centroid lands in exactly one cell, no cell is empty, and
    the two-level assignment agrees with flat assignment whenever the
    true nearest centroid's cell is probed."""
    from moonlink_spark.operators import load
    from moonlink_spark.operators.similarity import (
        assign_hierarchical_clusters,
        assign_ivf_clusters,
        build_hierarchical_quantizer,
        quantize_embeddings_1e6,
        train_ivf_centroids,
    )

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    emb_q = quantize_embeddings_1e6(emb)
    cents = train_ivf_centroids(spark, emb_q, k=16, iters=2)
    supers, cells = build_hierarchical_quantizer(spark, cents)
    assert all(cells), "no empty cells after re-indexing"
    assert len(supers) == len(cells)
    bucketed = sorted(cid for cell in cells for cid, _ in cell)
    assert bucketed == sorted(cid for cid, _ in cents)
    # probing ALL cells makes hierarchical exhaustive == flat
    flat = {
        r.vec_id: (r.cluster_id, r.d2)
        for r in assign_ivf_clusters(spark, emb_q, cents).collect()
    }
    full = {
        r.vec_id: (r.cluster_id, r.d2)
        for r in assign_hierarchical_clusters(
            spark, emb_q, supers, cells, nprobe_super=len(supers)
        ).collect()
    }
    assert full == flat
