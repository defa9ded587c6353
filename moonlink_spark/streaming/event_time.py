"""Event-time streaming: watermarks, tumbling/session windows, stateful ops.

This surface is a SUPERSET of the reference (SURVEY.md §2c streaming row):
moonlink orders by LSN and has no event-time notion; a Spark-native engine
gets watermark-driven late-data policies, windowed aggregation, and session
windows from Structured Streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
    ]
)


def read_event_stream(
    spark: SparkSession, source_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    from moonlink_spark.session import ensure_package_on_workers

    ensure_package_on_workers(spark)
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(source_dir)
    )


def windowed_counts(
    events: DataFrame, watermark: str = "10 minutes", window: str = "5 minutes"
) -> DataFrame:
    """Tumbling event-time window aggregation with a watermark: rows later
    than the watermark are dropped; windows finalize (append mode) once the
    watermark passes their end."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total",
        )
    )


def sessionized_counts(
    events: DataFrame, watermark: str = "10 minutes", gap: str = "5 minutes"
) -> DataFrame:
    """Session windows (gap-based) per user — the streaming twin of the
    batch sessionize_events operator."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup on event_id bounded by the watermark — the
    streaming counterpart of dedup_exact with bounded state."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_to_memory(
    stream_df: DataFrame, checkpoint_dir: str, name: str, output_mode: str = "append",
    timeout_s: float = 120.0,
):
    """Drive a streaming DataFrame to a memory sink with availableNow and
    block until done (test/catch-up harness)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    _await_or_fail(q, timeout_s)
    return q


def _await_or_fail(q, timeout_s: float) -> None:
    """availableNow drains must FINISH: a caller reading results while
    the query still commits in the background sees silent partial state."""
    if not q.awaitTermination(timeout_s):
        try:
            q.stop()
        finally:
            raise TimeoutError(
                f"availableNow drain did not finish within {timeout_s}s"
            )


def run_to_parquet(
    stream_df: DataFrame, checkpoint_dir: str, out_dir: str, timeout_s: float = 120.0
):
    """Append-mode parquet sink with availableNow — unlike the memory sink
    this supports checkpoint RECOVERY, so multi-run watermark scenarios
    (stop, new data, catch up) work."""
    q = (
        stream_df.writeStream.format("parquet")
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .option("path", out_dir)
        .trigger(availableNow=True)
        .start()
    )
    _await_or_fail(q, timeout_s)
    return q
