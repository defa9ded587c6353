"""Structured Streaming ingestion: CDC event stream -> MoonlinkTable.

The Spark port of the reference write path (SURVEY.md §3.1): the source
stream replaces the PG replication feed, ``foreachBatch`` replaces the
table-handler event loop, one micro-batch == one transaction == one manifest
commit (so the Delta-style "version per batch" maps to commit LSNs), and the
streaming checkpoint replaces the WAL (``storage/wal.rs``) — after a crash,
Spark replays the un-committed batches and the batch-id guard makes
re-delivery idempotent.

Event schema (FIXTURES.md F4 ``cdc_events``):
  lsn BIGINT, xact_id INT (nullable), op STRING (insert|update|delete),
  row STRUCT<target schema>, old_row STRUCT<target schema> (for update).

Scale notes: the batch apply is fully set-based — events are reduced to one
winner per key (max LSN) with a window, then a single bulk delete + bulk
append; no per-row driver loop, no collect. The same code drives a Kafka
source on a cluster (swap ``readStream.format``).
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from moonlink_spark.errors import IdentityError
from moonlink_spark.table.table import MoonlinkTable

LAST_BATCH_PROP = "streaming.last_batch_id"
LAST_LSN_PROP = "streaming.last_event_lsn"


def cdc_event_schema(row_schema: T.StructType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("lsn", T.LongType(), False),
            T.StructField("xact_id", T.IntegerType(), True),
            T.StructField("op", T.StringType(), False),
            T.StructField("row", row_schema, True),
            T.StructField("old_row", row_schema, True),
        ]
    )


_ROWS_PER_OUTPUT_FILE = 1_000_000


def _fan_in(n_rows: int, cap: int = 64) -> int:
    """Output-partition count for a write of ``n_rows`` rows."""
    return max(1, min(cap, -(-n_rows // _ROWS_PER_OUTPUT_FILE)))


def apply_cdc_batch(
    table: MoonlinkTable, batch_df: DataFrame, batch_id: int
) -> int | None:
    """Apply one micro-batch of CDC events as one atomic commit.

    Set-based merge: per identity key keep only the event with the highest
    (lsn, op-precedence); a final 'delete' wins as a delete, anything else as
    an upsert. Idempotent across batch re-delivery via the batch-id guard
    (exactly-once on top of at-least-once foreachBatch)."""
    props = table.manifest.properties
    last_applied = int(props.get(LAST_BATCH_PROP, -1))
    if batch_id <= last_applied:
        return None  # replayed batch after recovery: already committed

    ident = table.identity
    if ident.mode not in ("single", "keys"):
        raise IdentityError("streaming CDC requires a key identity")
    key_cols = list(ident.columns)
    data_cols = table.schema.fieldNames()

    min_lsn = int(props.get(LAST_LSN_PROP, 0))
    ev = batch_df.filter(F.col("lsn") > min_lsn)

    # normalize: key columns come from old_row for deletes/updates if the new
    # row is absent
    key_exprs = [
        F.coalesce(F.col(f"row.{c}"), F.col(f"old_row.{c}")).alias(f"__k_{c}")
        for c in key_cols
    ]
    ev = ev.select("lsn", "op", "row", *key_exprs)
    w = Window.partitionBy(*[f"__k_{c}" for c in key_cols]).orderBy(F.desc("lsn"))
    winner = ev.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    winner = winner.persist()
    try:
        deletes = winner.filter(F.col("op") == "delete").select(
            *[F.col(f"__k_{c}").alias(c) for c in key_cols]
        )
        upserts = winner.filter(F.col("op") != "delete").select(
            *[F.col(f"row.{c}").alias(c) for c in data_cols]
        )
        # ONE driver action for (n_del, n_up, max_lsn) — at 1 s triggers the
        # per-batch fixed cost is one Spark job, not three. The per-key
        # winner holding the globally largest lsn survives the window, so
        # max(lsn) over winners equals max over all events.
        stats = winner.agg(
            F.sum(F.when(F.col("op") == "delete", 1).otherwise(0)).alias("n_del"),
            F.sum(F.when(F.col("op") != "delete", 1).otherwise(0)).alias("n_up"),
            F.max("lsn").alias("max_lsn"),
        ).collect()[0]
        n_del, n_up = stats["n_del"] or 0, stats["n_up"] or 0
        if n_del == 0 and n_up == 0:
            return None
        # Size-aware write fan-in: the exact batch counts are in hand, so
        # bound the output file count by data volume instead of letting a
        # 50-row micro-batch fan out into shuffle.partitions tiny parquet
        # files — the classic streaming-lakehouse file-explosion failure
        # the reference's mem-slice/flush sizing exists to prevent
        # (mooncake_table_config.rs:152-166). Large batches keep their
        # parallelism: one output file per ~1M rows.
        if n_del:
            table.delete_keys_df(deletes.coalesce(_fan_in(n_del)))
        if n_up:
            table.upsert_df(upserts.coalesce(_fan_in(n_up)))
        max_lsn = stats["max_lsn"] or (table.last_lsn + 1)
        return table.commit(
            lsn=max(max_lsn, table.last_lsn + 1),
            operation=f"stream-batch-{batch_id}",
            properties_update={
                LAST_BATCH_PROP: int(batch_id),
                LAST_LSN_PROP: int(max_lsn),
            },
        )
    finally:
        winner.unpersist()


class StreamingIngestor:
    """CDC stream -> MoonlinkTable. Sources: a JSONL spool directory (the
    bundled path — fed by tests, ``ingest/dbpoll``, or any producer), or a
    Kafka topic when the spark-sql-kafka jar is present (``kafka_topic=``;
    gated by ``sources.formats.kafka_available`` — same event JSON in the
    record value, so the merge pipeline is identical)."""

    def __init__(
        self,
        table: MoonlinkTable,
        source_dir: str | None = None,
        checkpoint_dir: str = "",
        on_batch: Callable[[int, int | None], None] | None = None,
        kafka_bootstrap: str | None = None,
        kafka_topic: str | None = None,
        refresh_views: list | None = None,
        sync_iceberg: str | None = None,
        sync_catalog: tuple[str, str, str] | None = None,
        sync_vecindex: tuple[str, str] | None = None,
        sync_sigindex: tuple[str, str] | None = None,
    ):
        if (source_dir is None) == (kafka_topic is None):
            raise ValueError("exactly one of source_dir / kafka_topic required")
        self.table = table
        self.source_dir = source_dir
        self.checkpoint_dir = checkpoint_dir
        self.on_batch = on_batch
        self.kafka_bootstrap = kafka_bootstrap
        self.kafka_topic = kafka_topic
        # MaterializedViews kept current per micro-batch: each refresh is
        # O(batch delta) by construction, so chaining it here turns the
        # stream into continuously-maintained aggregates
        self.refresh_views = list(refresh_views or [])
        # Continuous Iceberg materialization: every micro-batch commit is
        # followed by an incremental Iceberg snapshot export (data files
        # content-addressed -> O(changed files); deletes ship as Puffin
        # DVs, never rewrites). This is the reference's core loop — CDC in,
        # Iceberg out, per commit (iceberg_table_syncer.rs sync_snapshot) —
        # run at the micro-batch boundary instead of a background thread.
        # ``sync_catalog`` = (catalog_url, namespace, name) registers each
        # new metadata version so readers discover it (rest_catalog.rs).
        self.sync_iceberg = sync_iceberg
        self.sync_catalog = sync_catalog
        # Continuous ANN-index maintenance: ``sync_vecindex = (dest,
        # embedding_col)`` assigns each micro-batch's INSERTED vectors to
        # the persisted IVF index's existing centroids (table/vecindex.py
        # update_index — O(batch), old segments untouched; the
        # reference's index-on-flush lifecycle at the micro-batch
        # boundary). Contract: append-only embedding streams. Updates or
        # deletes don't patch inverted lists in place — they bump the
        # meta's ``stale_rows`` so ``retrain_recommended`` flips and the
        # operator rebuilds, exactly like drift.
        self.sync_vecindex = sync_vecindex
        # Same lifecycle for the MinHash signature index:
        # ``sync_sigindex = (dest, text_col)`` appends signatures for each
        # micro-batch's inserted documents (table/sigindex.py
        # update_index); updates/deletes flip the stale flag.
        self.sync_sigindex = sync_sigindex

    def _foreach_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        version = apply_cdc_batch(self.table, batch_df, batch_id)
        if self.sync_vecindex or self.sync_sigindex:
            # NOT gated on version: a replayed batch (version=None) whose
            # table commit landed but whose index maintenance crashed must
            # still be indexed. Each index carries its own
            # ``indexed_batch_id`` watermark, so this is a cheap meta read
            # (and a no-op) when everything is already absorbed.
            self._maintain_indexes(batch_df, batch_id)
        for mv in self.refresh_views:
            mv.refresh()
        if version is not None and self.sync_iceberg:
            from moonlink_spark.table.iceberg_export import export_iceberg

            export_iceberg(self.table, self.sync_iceberg)
            if self.sync_catalog:
                from moonlink_spark.table.rest_catalog import register_export

                url, ns, name = self.sync_catalog
                register_export(url, ns, name, self.sync_iceberg)
        if self.on_batch:
            self.on_batch(batch_id, version)

    def _maintain_indexes(self, batch_df: DataFrame, batch_id: int) -> None:
        """Absorb this micro-batch into the configured persisted indexes.

        Idempotent + crash-recoverable: each index stores an
        ``indexed_batch_id`` watermark IN THE SAME atomic meta write that
        publishes its new segment, so (a) a replayed batch whose index
        work already landed is skipped here, and (b) a crash after the
        table commit but before index maintenance leaves the watermark
        lagging — the replay re-runs the maintenance instead of the old
        version-gated path that skipped it forever."""
        from moonlink_spark.table import sigindex, vecindex

        need_vec = self.sync_vecindex is not None and (
            vecindex.indexed_batch_id(self.sync_vecindex[0]) < batch_id
        )
        need_sig = self.sync_sigindex is not None and (
            sigindex.indexed_batch_id(self.sync_sigindex[0]) < batch_id
        )
        if not (need_vec or need_sig):
            return
        key = self.table.identity.columns[0]
        # as_of_lsn pins the index state to the table LSN it covers —
        # Iceberg export refuses to ship index blobs newer than the
        # data snapshot being exported (see iceberg_export.py)
        wm = {
            "indexed_batch_id": int(batch_id),
            "as_of_lsn": int(self.table.last_lsn),
        }
        split = batch_df.groupBy(F.col("op") == "insert").count().collect()
        n_ins = sum(r["count"] for r in split if r[0])
        n_other = sum(r["count"] for r in split if not r[0])
        inserts = batch_df.filter(F.col("op") == "insert") if n_ins else None
        if need_vec:
            dest, col = self.sync_vecindex
            if n_other:
                # the watermark rides the LAST meta write for this batch;
                # batch_id makes the stale count idempotent if a crash
                # lands between this write and the watermark-carrying one
                vecindex.mark_stale(
                    dest,
                    n_other,
                    meta_update=None if n_ins else wm,
                    batch_id=batch_id,
                )
            if n_ins:
                vecindex.update_index(
                    self.table.spark,
                    inserts.select(
                        F.col(f"row.{key}").cast("bigint").alias("vec_id"),
                        F.col(f"row.{col}").alias("embedding"),
                    ),
                    dest,
                    meta_update=wm,
                )
            if not n_ins and not n_other:
                vecindex.note_indexed_batch(dest, batch_id)
        if need_sig:
            dest, col = self.sync_sigindex
            if n_other:
                sigindex.mark_stale(
                    dest,
                    n_other,
                    meta_update=None if n_ins else wm,
                    batch_id=batch_id,
                )
            if n_ins:
                sigindex.update_index(
                    inserts.select(
                        F.col(f"row.{key}").cast("bigint").alias("doc_id"),
                        F.col(f"row.{col}").alias("text"),
                    ),
                    dest,
                    meta_update=wm,
                )
            if not n_ins and not n_other:
                sigindex.note_indexed_batch(dest, batch_id)

    def start(self, available_now: bool = True, processing_time: str = "1 second"):
        spark: SparkSession = self.table.spark
        schema = cdc_event_schema(self.table.schema)
        if self.kafka_topic is not None:
            from moonlink_spark.sources.formats import kafka_available

            if not kafka_available(spark):
                raise RuntimeError(
                    "spark-sql-kafka jar not on the classpath; submit with "
                    "--packages org.apache.spark:spark-sql-kafka-0-10_2.13"
                )
            raw = (
                spark.readStream.format("kafka")
                .option("kafka.bootstrap.servers", self.kafka_bootstrap)
                .option("subscribe", self.kafka_topic)
                .option("startingOffsets", "earliest")
                .load()
            )
            stream = raw.select(
                F.from_json(F.col("value").cast("string"), schema).alias("e")
            ).select("e.*")
        else:
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 16)
                .json(self.source_dir)
            )
        writer = stream.writeStream.foreachBatch(self._foreach_batch).option(
            "checkpointLocation", self.checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        else:
            writer = writer.trigger(processingTime=processing_time)
        return writer.start()

    def run_available(self, timeout_s: float = 120.0) -> None:
        """Process everything currently in the source dir, then stop
        (used for tests and catch-up runs)."""
        q = self.start(available_now=True)
        q.awaitTermination(timeout_s)


def initial_copy(
    table: MoonlinkTable, snapshot_df: DataFrame, snapshot_lsn: int
) -> int:
    """Seed a table from a batch snapshot, then let the CDC stream take over
    from the captured LSN (parity initial-copy flow,
    pg_replicate/initial_copy.rs + buffered replay table_handler.rs:940-951:
    events at lsn <= snapshot_lsn are skipped by apply_cdc_batch's LSN
    floor)."""
    table.append_df(snapshot_df)
    try:
        return table.commit(
            lsn=snapshot_lsn,
            operation="initial-copy",
            properties_update={LAST_LSN_PROP: int(snapshot_lsn)},
        )
    except BaseException:
        # all-or-nothing: a torn copy (source died mid-COPY, Spark job
        # failed) must leave the table EXACTLY as before — the caller
        # retries with a fresh snapshot DataFrame, and the stale staged
        # one would otherwise double-apply on that retry's commit
        table.discard_staged_df(snapshot_df)
        raise
