"""SparkSession factory tuned for the moonlink_spark engine.

Local test runs use ``local[N]``; the same config block is what we would ship
to a 1000-executor cluster — everything scale-sensitive (AQE, shuffle
partitions, broadcast threshold, Arrow batch sizes) is centralized here so a
cluster deployment only overrides master/resources.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_shuffle_partitions() -> str:
    """Shuffle-partition default tracking the configured core count, with
    the same lenient env parsing as get_spark: a non-numeric
    SPARK_GRAFT_CPUS / SPARK_GRAFT_SHUFFLE_PARTITIONS must not crash at
    module import (ADVICE r12) — fall back to 32 like the master string
    does."""
    override = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
    if override:
        try:
            return str(max(1, int(override)))
        except ValueError:
            pass
    try:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32") or 32)
    except ValueError:
        cpus = 32
    return str(max(8, cpus))


_DEFAULTS: dict[str, str] = {
    # Adaptive query execution: runtime shuffle-partition coalescing, skew-join
    # splitting, and dynamic join-strategy switching. Essential at 100 TB where
    # static partition counts are always wrong for some stage.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Runtime bloom-filter pushdown replaces the reference's persisted hash
    # index for join-side row pruning (SURVEY.md §4).
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # Python Data Source filter pushdown (SPARK-50657): lets the moonlink
    # data source prune whole files from manifest stats at plan time.
    "spark.sql.python.filterPushdown.enabled": "true",
    # Arrow transfer for every Python<->JVM hop (pandas UDFs, toPandas).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Parquet: pushdown + vectorized reads are the default, be explicit since
    # the scan path is the backbone of the whole engine.
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.parquet.enableVectorizedReader": "true",
    # Target ~128 MiB per scan partition (reference targets 128 MiB parquet
    # files, storage/mooncake_table_config.rs:21-27).
    "spark.sql.files.maxPartitionBytes": "134217728",
    # Session timezone pinned to UTC: reference canonicalizes timestamptz to
    # UTC micros (pg_replicate/util.rs:50-56) and the DuckDB oracle runs UTC.
    "spark.sql.session.timeZone": "UTC",
    # Shuffle: compress + spill settings appropriate for wide aggregations.
    # The session DEFAULT partition count tracks the configured core count
    # (r12: a literal "32" was silently core-count-tuned; the driver also
    # benches at lower core counts). Data-scale-aware jobs override via
    # tuning.configure_for_scale, which sizes partitions from input bytes
    # — that, plus AQE coalescing, is the 100 TB answer; this default only
    # governs small local/model-state shuffles.
    "spark.sql.shuffle.partitions": _default_shuffle_partitions(),
    "spark.shuffle.compress": "true",
    "spark.sql.autoBroadcastJoinThreshold": "33554432",  # 32 MiB: dims broadcast
    # Keep the UI off in tests/bench (port churn, memory).
    "spark.ui.enabled": "false",
}


def get_spark(
    app_name: str = "moonlink_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) the tuned SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) for
    local runs; on a cluster, pass ``None`` with a pre-set master or export
    ``MASTER``.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = os.environ.get("MASTER", f"local[{cpus}]")
    # Put the package root on PYTHONPATH before the JVM launches: Spark's
    # Python *data-source runner* processes (batch planning + streaming
    # source/sink runners) are spawned by the JVM with the JVM's env and do
    # NOT see addPyFile, so `import moonlink_spark` inside a pickled
    # DataSource needs this. Must happen before getOrCreate() — the JVM's
    # env is captured at launch.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + existing if existing else "")
        )
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()


_SHIPPED: set[int] = set()


def ensure_package_on_workers(spark: SparkSession) -> None:
    """Ship moonlink_spark to executor Python workers via addPyFile.

    Needed whenever a pickled closure references this package (mapInPandas
    kernels, lambda-based expressions) and the driver process wasn't started
    from the repo root — e.g. an externally-created SparkSession. Idempotent
    per SparkContext."""
    import shutil
    import tempfile

    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tmp = tempfile.mkdtemp(prefix="moonlink-pkg-")
    zip_path = shutil.make_archive(
        os.path.join(tmp, "moonlink_spark"),
        "zip",
        root_dir=pkg_root,
        base_dir="moonlink_spark",
    )
    sc.addPyFile(zip_path)
    _SHIPPED.add(key)
