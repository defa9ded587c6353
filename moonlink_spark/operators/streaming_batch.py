"""Batch analogs of streaming event-time operators over ``events``.

Structured Streaming semantics (sliding windows, watermark lateness) have
exact batch equivalents, which makes them oracle-checkable: the streaming
runtime computes the same groups incrementally that these queries compute
in one pass. The live incremental versions ship in
``moonlink_spark/streaming/event_time.py`` (watermarks, windowed aggs,
dedup-within-watermark) and are pytest-verified; these registered queries
pin the *semantics* against DuckDB.

Scale design (100 TB): the sliding window is `F.window(ts, 1h, 30m)` — a
map-side 2-way replicate then one group-by shuffle on (window, type); no
self-join. Lateness uses a per-partition watermark (keyed by event_type, the
topic-partition analog), so the running-max window stays parallel — a
global watermark would serialize, which is exactly why Spark's own
watermark is maintained per-partition and merged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from moonlink_spark.operators import load, register
from moonlink_spark.operators.dedup import _sql_hex7

DEC = "decimal(15,4)"


@register(
    "sliding_window_event_stats",
    oracle="""
WITH ev AS (
  SELECT ts, event_type, value FROM events
  WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-12 00:00:00'
),
expanded AS (
  SELECT u.ws AS window_start, event_type, value
  FROM ev, UNNEST([
    time_bucket(INTERVAL '30 minutes', ts),
    time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'
  ]) AS u(ws)
)
SELECT window_start, window_start + INTERVAL '1 hour' AS window_end, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(value AS DECIMAL(15,4))) AS DOUBLE) AS total_value
FROM expanded
GROUP BY window_start, event_type
ORDER BY window_start, event_type
""",
    category="streaming",
)
def sliding_window_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (1 h length, 30 min slide): each event
    lands in exactly two windows, replicated map-side by `F.window`; the
    oracle expands the same two `time_bucket` starts. One shuffle."""
    ev = load(spark, sf_dir, "events").filter(
        (F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-12 00:00:00").cast("timestamp"))
    )
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


# Deterministic synthetic arrival jitter: the generated events are perfectly
# time-ordered, so out-of-orderness is simulated by delaying each event's
# ARRIVAL by hash(event_id) % 7200 seconds while its event time stays put —
# the same trick both engines can compute bit-identically.
_SPARK_JITTER = (
    "cast(conv(substring(md5(cast(concat('arr:', cast(event_id as string)) "
    "as binary)), 1, 7), 16, 10) as bigint) % 7200"
)
_SQL_JITTER_DIGEST = "md5('arr:' || CAST(event_id AS VARCHAR))"
_LATE_US = 600 * 1_000_000  # 10-minute allowed lateness


@register(
    "late_event_detection",
    oracle=f"""
WITH arr AS (
  SELECT event_id, user_id, event_type,
         epoch_us(ts) AS us,
         epoch_us(ts) + ({_sql_hex7(_SQL_JITTER_DIGEST)} % 7200) * 1000000 AS arr_us
  FROM events
),
marked AS (
  SELECT event_type, us,
         MAX(us) OVER (PARTITION BY event_type ORDER BY arr_us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm_us
  FROM arr
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN wm_us - us > {_LATE_US} THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST(MAX(GREATEST(wm_us - us, 0)) // 1000000 AS BIGINT) AS max_delay_s
FROM marked
GROUP BY event_type
ORDER BY event_type
""",
    category="streaming",
)
def late_event_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-lateness audit: replay events in (jittered) arrival order
    per stream partition (event_type, the topic-partition analog), track
    the per-partition high-water mark, and count events whose event time
    trails it by more than the 10-minute allowed lateness — exactly what
    `withWatermark` drops in the live pipeline (streaming/event_time.py),
    whose watermark is likewise maintained per source partition."""
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
        (F.unix_micros("ts") + F.expr(_SPARK_JITTER) * F.lit(1_000_000)).alias(
            "arr_us"
        ),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("arr_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = ev.select("event_type", "us", F.max("us").over(w).alias("wm_us"))
    return (
        marked.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(F.col("wm_us") - F.col("us") > _LATE_US, 1).otherwise(0)
            ).alias("n_late"),
            (
                F.max(F.greatest(F.col("wm_us") - F.col("us"), F.lit(0)))
                / F.lit(1_000_000)
            )
            .cast("bigint")
            .alias("max_delay_s"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------- #
# hierarchical time rollup (hypertable continuous-aggregate pattern)
# --------------------------------------------------------------------------- #
@register(
    "hierarchical_time_rollup",
    oracle="""
SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS DOUBLE)
         AS total_value,
       CAST(MIN(value) AS DOUBLE) AS min_value,
       CAST(MAX(value) AS DOUBLE) AS max_value,
       CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                  / CAST(COUNT(*) AS DOUBLE), 6) AS DOUBLE) AS mean_value
FROM events
GROUP BY date_trunc('day', ts), event_type
ORDER BY day, event_type
""",
    category="rollup",
)
def hierarchical_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style hierarchical rollup: minute partials -> hourly
    partials -> daily aggregates, merging (count, sum, min, max) at each
    level and deriving mean at the top. The ORACLE aggregates the raw
    events directly at day grain — the hash match PROVES the three-level
    partial merge is lossless (sums in DECIMAL(18,6), so re-aggregation
    order cannot perturb a bit).

    Scale shape: this is the continuous-aggregate/materialized-rollup
    pattern — each level re-aggregates ~60x fewer rows than the one below,
    so refreshing a day never rescans raw events, only hour partials. In a
    live deployment each level is a table the streaming pipeline upserts;
    here the three group-bys express the same dataflow in one plan.
    """
    ev = load(spark, sf_dir, "events")
    dec_v = F.col("value").cast("decimal(18,6)")
    minute = ev.groupBy(
        F.date_trunc("minute", "ts").alias("m_ts"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec_v).alias("sum_v"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
    )
    hour = minute.groupBy(
        F.date_trunc("hour", "m_ts").alias("h_ts"), "event_type"
    ).agg(
        F.sum("n").alias("n"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )
    day = hour.groupBy(
        F.date_trunc("day", "h_ts").alias("day"), "event_type"
    ).agg(
        F.sum("n").alias("n_events"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_value"),
        F.max("max_v").alias("max_value"),
    )
    total_dbl = F.col("sum_v").cast("double")
    return (
        day.select(
            F.col("day").cast("date").alias("day"),
            "event_type",
            F.col("n_events").cast("bigint").alias("n_events"),
            total_dbl.alias("total_value"),
            "min_value",
            "max_value",
            F.round(total_dbl / F.col("n_events").cast("double"), 6).alias(
                "mean_value"
            ),
        )
        .orderBy("day", "event_type")
    )


# --------------------------------------------------------------------------- #
# real Structured Streaming run, oracle-checked against the batch equivalent
# --------------------------------------------------------------------------- #
@register(
    "streaming_tumbling_agg_e2e",
    oracle="""
SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS DOUBLE)
         AS total_value
FROM events
GROUP BY CAST(date_trunc('day', ts) AS DATE), event_type
ORDER BY day, event_type
""",
    category="streaming",
)
def streaming_tumbling_agg_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END Structured Streaming: readStream over the events parquet,
    1-hour watermark, 1-day tumbling windows, availableNow trigger into a
    complete-mode sink; returns the stream's FINAL state. The DuckDB oracle
    is the plain batch aggregation — the hash match proves the streaming
    runtime's incremental window state converges to exactly the batch
    answer (the replayability guarantee micro-batch streaming is built on).

    Scale shape: the streaming agg is the same partial+final hash aggregate
    as batch, maintained incrementally in the state store; watermarks bound
    that state. The memory sink here is the test harness — production runs
    write each epoch to the table format (streaming/event_time.py
    run_to_parquet) instead of collecting.
    """
    from moonlink_spark.session import ensure_package_on_workers

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ensure_package_on_workers(spark)
    from moonlink_spark.operators import normalize_events_ts

    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema  # long (legacy nanos) or NTZ
    stream = normalize_events_ts(
        spark.readStream.schema(schema)
        # the file-stream source wants a directory: stream the sf_dir,
        # glob-filtered down to the events file
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_v"),
        )
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("mls_tumbling_e2e")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table("mls_tumbling_e2e")
        .select(
            F.col("w.start").cast("date").alias("day"),
            "event_type",
            F.col("n_events").cast("bigint").alias("n_events"),
            F.col("sum_v").cast("double").alias("total_value"),
        )
        .orderBy("day", "event_type")
    )


@register(
    "streaming_stateful_sessionize_e2e",
    oracle="""
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events WHERE user_id < 100
), sessions AS (
  SELECT user_id, ts, event_id,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       COUNT(*) AS n_events, MIN(ts) AS session_start, MAX(ts) AS session_end
FROM sessions
GROUP BY user_id, session_id
""",
    category="streaming",
)
def streaming_stateful_sessionize_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END custom stateful streaming: readStream over events ->
    applyInPandasWithState gap-sessionization (30-min inactivity) -> update
    -mode memory sink, reduced to final session rows. The DuckDB oracle is
    the BATCH sessionization (identical to sessionize_events) — the hash
    match proves the keyed-state operator converges to the batch answer no
    matter how the source splits into micro-batches (an open session carried
    in state is extended by later batches; each emission supersedes the
    previous one for that session, so max(n)/min(start)/max(end) per
    (user, session) reconstructs the final state exactly).

    This is the operator class Structured Streaming cannot express natively
    (per-key custom state machines; reference headroom per SURVEY.md §2c):
    state is hash-partitioned by user_id across executors, batches arrive
    Arrow-encoded, and per-key state is O(1) — the 1000-executor plan.
    Timestamps travel as epoch-micros BIGINTs through state and output
    (exact integer arithmetic, no Arrow tz coercion), cast back to
    TIMESTAMP only in the final projection.
    """
    from moonlink_spark.operators import normalize_events_ts
    from moonlink_spark.session import ensure_package_on_workers
    from moonlink_spark.streaming.stateful import sessionize_stream

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ensure_package_on_workers(spark)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = normalize_events_ts(
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ev = (
        stream.filter(F.col("user_id") < 100)
        .select(
            "user_id",
            "event_id",
            F.unix_micros(F.col("ts")).alias("us"),
        )
    )
    q = (
        sessionize_stream(ev)
        .writeStream.format("memory")
        .queryName("mls_sessionize_e2e")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table("mls_sessionize_e2e")
        .groupBy("user_id", "session_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.min("start_us").alias("start_us"),
            F.max("end_us").alias("end_us"),
        )
        .select(
            "user_id",
            "session_id",
            "n_events",
            F.timestamp_micros(F.col("start_us")).alias("session_start"),
            F.timestamp_micros(F.col("end_us")).alias("session_end"),
        )
    )


@register(
    "streaming_interval_join_e2e",
    oracle="""
SELECT p.event_id AS purchase_id, c.event_id AS click_id,
       p.user_id,
       CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS lag_s
FROM events p JOIN events c
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 10 MINUTE
WHERE p.user_id < 100
""",
    category="streaming",
)
def streaming_interval_join_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END stream-stream interval join: two readStreams over events
    (purchases vs clicks), joined on user_id with a +/-10-minute event-time
    range under watermarks, availableNow into an append-mode memory sink.
    The DuckDB oracle is the equivalent batch interval join — the hash
    match proves the streaming join's watermark-bounded state buffering
    emits exactly the batch answer.

    Scale shape: Spark keys both join-state stores on user_id (one shuffle
    each side), and the watermark + range condition bound how long each
    row is buffered — the state size is O(rate x 10min), independent of
    stream length. This is the §2c capability a pure CDC engine lacks:
    joining two live streams without landing either.
    """
    from moonlink_spark.operators import normalize_events_ts
    from moonlink_spark.session import ensure_package_on_workers

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ensure_package_on_workers(spark)
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema

    def stream():
        return normalize_events_ts(
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        ).filter(F.col("user_id") < 100)

    purchases = (
        stream()
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        stream()
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES")),
        "inner",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("mls_interval_join_e2e")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("mls_interval_join_e2e").select(
        "purchase_id",
        "click_id",
        "user_id",
        (F.unix_timestamp("p_ts") - F.unix_timestamp("c_ts"))
        .cast("bigint")
        .alias("lag_s"),
    )


@register(
    "streaming_dedup_e2e",
    oracle="""
SELECT event_id, ts, user_id, event_type,
       CAST(value AS DOUBLE) AS value
FROM events
ORDER BY event_id
""",
    category="streaming",
)
def streaming_dedup_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END streaming deduplication: every source row is doubled
    in-stream (explode over two copies — the at-least-once duplicate an
    unreliable transport produces), then ``dropDuplicates`` on
    (event_id, ts) under a 1-hour watermark removes the replays before
    they reach the sink. The memory-sink contents must equal the original
    table exactly — the oracle is the plain distinct source.

    This is the streaming ingestion guarantee the engine's batch-id /
    LSN-floor replay guards provide at the table layer (apply_cdc_batch
    idempotence, rest.rs journal replay), expressed at the operator layer:
    dedup state is keyed by (id, event-time) so the watermark bounds it —
    at 100 TB/day the state store holds only the watermark window, not
    the corpus. Parity anchor: the reference's at-least-once REST/Kafka
    ingestion dedupe (SURVEY §3.3).
    """
    from moonlink_spark.operators import normalize_events_ts
    from moonlink_spark.session import ensure_package_on_workers

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ensure_package_on_workers(spark)

    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    stream = normalize_events_ts(
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    doubled = stream.select(
        "event_id", "ts", "user_id", "event_type", "value",
        F.explode(F.array(F.lit(1), F.lit(2))).alias("copy"),
    ).drop("copy")
    deduped = doubled.withWatermark("ts", "1 hour").dropDuplicates(
        ["event_id", "ts"]
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("mls_dedup_e2e")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.table("mls_dedup_e2e")
        .select(
            "event_id", "ts", "user_id", "event_type",
            F.col("value").cast("double").alias("value"),
        )
        .orderBy("event_id")
    )
