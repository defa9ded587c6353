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
