"""Operator registry: every implemented query/operator from SURVEY.md §2.

Each entry pairs a PySpark implementation ``(spark, sf_dir) -> DataFrame``
with (where SQL-expressible) an equivalent ANSI-SQL oracle string for DuckDB
over the same parquet tables. The driver hash-compares both sides at sf0.01
(CORRECTNESS gate); names and aliases must line up exactly.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # DuckDB SQL, None => rows-only check
    category: str = ""
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: Optional[str] = None, category: str = ""):
    """Decorator registering a query implementation."""

    def deco(fn):
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, category=category, doc=fn.__doc__ or ""
        )
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    # Pin the session to UTC so timestamp semantics match the DuckDB oracle
    # regardless of which SparkSession the driver hands us, and make sure
    # executor Python workers can import this package.
    from moonlink_spark.session import ensure_package_on_workers

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ensure_package_on_workers(spark)
    if table == "events":
        # events.parquet stores TIMESTAMP(NANOS), which the Spark parquet
        # reader rejects; read nanos as long and truncate to micros (exact
        # integer DIV — matches DuckDB's ns->us truncation).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        return df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
        )
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def all_queries() -> dict[str, QuerySpec]:
    # import side-effect: modules self-register
    from moonlink_spark.operators import (  # noqa: F401
        relational,
        relational_extra,
        multimodal_ops,
        chunking,
        safety,
        windows,
        dedup,
        similarity,
        textstats,
        ingest_parity,
        scalar_extra,
        sampling,
        packing,
        retrieval,
        streaming_batch,
        curation,
        scale_patterns,
        profiling,
    )

    return dict(REGISTRY)
