"""Vector function engines: the numpy path must agree with the oracle-exact
fold to float tolerance, and both must be usable in the same plan."""

import pytest

from pyspark.sql import functions as F

from moonlink_spark.functions.vector import (
    cosine_fold,
    cosine_np,
    dot_fold,
    dot_np,
)


def test_numpy_matches_fold_within_tolerance(spark):
    from moonlink_spark.session import ensure_package_on_workers

    ensure_package_on_workers(spark)
    df = (
        spark.range(500)
        .selectExpr(
            "id",
            "transform(sequence(1, 64), i -> CAST(((id * 31 + i * 17) % 97) "
            "AS DOUBLE) / 97.0) AS ea",
            "transform(sequence(1, 64), i -> CAST(((id * 13 + i * 29) % 89) "
            "AS DOUBLE) / 89.0) AS eb",
        )
    )
    out = df.select(
        dot_fold("ea", "eb").alias("d_fold"),
        dot_np("ea", "eb").alias("d_np"),
        cosine_fold("ea", "eb").alias("c_fold"),
        cosine_np("ea", "eb").alias("c_np"),
    ).collect()
    assert len(out) == 500
    for r in out:
        assert r.d_np == pytest.approx(r.d_fold, rel=1e-12)
        assert r.c_np == pytest.approx(r.c_fold, rel=1e-12)
