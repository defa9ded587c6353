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


def cdc_event_schema(
    row_schema: T.StructType, with_seq: bool = False
) -> T.StructType:
    """``with_seq`` adds the optional within-transaction sequence column
    (``seq``): committed transactions stamp every DML row with the same
    COMMIT LSN, so a batch that touches one key twice in one transaction
    needs seq to order the events — the spool producer
    (ingest/pgoutput.spool_lines) stamps it; absent/NULL seq falls back
    to op-precedence (see apply_cdc_batch)."""
    fields = [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("xact_id", T.IntegerType(), True),
        T.StructField("op", T.StringType(), False),
        T.StructField("row", row_schema, True),
        T.StructField("old_row", row_schema, True),
    ]
    if with_seq:
        fields.append(T.StructField("seq", T.LongType(), True))
    return T.StructType(fields)


_ROWS_PER_OUTPUT_FILE = 1_000_000


def _fan_in(n_rows: int, cap: int = 64) -> int:
    """Output-partition count for a write of ``n_rows`` rows."""
    return max(1, min(cap, -(-n_rows // _ROWS_PER_OUTPUT_FILE)))


def _winner_events(
    batch_df: DataFrame, key_cols: list[str], min_lsn: int
) -> DataFrame:
    """Per-identity-key winner of a CDC batch: events at or below the
    ``min_lsn`` floor are dropped, then the highest (lsn, seq,
    op-precedence) event wins per key. ``seq`` (the within-transaction
    statement index — same-transaction events share one COMMIT LSN) is
    used when the batch carries it; without it, ties break by
    op-precedence with delete highest — the conservative reading, since
    resurrecting a deleted row is the worse failure.

    A key-changing update (the reference's delete(old) + append(new),
    pg_replicate/moonlink_sink.rs:295-326) is split into TWO events
    before the window: the original, keyed by the NEW key, and a
    synthetic delete keyed by the OLD key at the same (lsn, seq). The
    synthetic delete competes in the old key's partition like any other
    event, so it correctly loses to a LATER insert of that key and
    correctly kills an EARLIER one — resolving each old key by LSN
    instead of always deleting (which resurrected same-batch inserts the
    key-change should have erased, and left intermediate keys alive in
    A->B->C chains)."""
    ev = batch_df.filter(F.col("lsn") > min_lsn)
    keep = ["lsn", "op", "row", "old_row"]
    has_seq = "seq" in batch_df.columns
    if has_seq:
        keep.append("seq")
    ev = ev.select(*keep)
    old_differs = F.lit(False)
    has_old = F.lit(True)
    for c in key_cols:
        old_differs = old_differs | ~F.col(f"old_row.{c}").eqNullSafe(
            F.col(f"row.{c}")
        )
        has_old = has_old & F.col(f"old_row.{c}").isNotNull()
    synthetic = ev.filter(
        # row-less updates are NOT split: they must reach the malformed
        # check as themselves, not masquerade as an old-key delete
        (F.col("op") == "update")
        & F.col("row").isNotNull()
        & has_old
        & old_differs
    ).select(
        F.col("lsn"),
        F.lit("delete").alias("op"),
        F.lit(None).cast(ev.schema["row"].dataType).alias("row"),
        F.col("old_row"),
        *([F.col("seq")] if has_seq else []),
    )
    ev = ev.unionByName(synthetic)
    key_exprs = [
        F.coalesce(F.col(f"row.{c}"), F.col(f"old_row.{c}")).alias(f"__k_{c}")
        for c in key_cols
    ]
    order = [F.desc("lsn")]
    if has_seq:
        order.append(F.desc_nulls_last("seq"))
    order.append(
        F.when(F.col("op") == "delete", 2)
        .when(F.col("op") == "update", 1)
        .otherwise(0)
        .desc()
    )
    ev = ev.select(*(keep[:3] + (["seq"] if has_seq else [])), *key_exprs)
    w = Window.partitionBy(*[f"__k_{c}" for c in key_cols]).orderBy(*order)
    return (
        ev.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_cdc_batch(
    table: MoonlinkTable,
    batch_df: DataFrame,
    batch_id: int,
    winner_out: list | None = None,
) -> int | None:
    """Apply one micro-batch of CDC events as one atomic commit.

    Set-based merge: per identity key keep only the winning event
    (see _winner_events); a final 'delete' wins as a delete, anything
    else as an upsert, and a key-changing update also deletes the OLD
    key's row (the reference's CDC update = delete(old) + append(new),
    pg_replicate/moonlink_sink.rs:295-326). Idempotent across batch
    re-delivery via the batch-id guard (exactly-once on top of
    at-least-once foreachBatch); a FAILED commit reverts everything this
    call staged, so the replayed batch stages exactly once.

    ``winner_out``: when a list is passed, the persisted winner
    DataFrame and the LSN floor it was computed under are appended to it
    instead of being unpersisted here — index maintenance reuses them,
    halving the per-batch window shuffle; the CALLER then unpersists."""
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
    winner = _winner_events(batch_df, key_cols, min_lsn).persist()
    mark = table.pending_mark()
    try:
        # key-changing updates were already split into (delete old key,
        # upsert new key) events inside _winner_events, so the winners
        # route directly: delete wins as a delete, the rest as upserts
        deletes = winner.filter(F.col("op") == "delete").select(
            *[F.col(f"__k_{c}").alias(c) for c in key_cols]
        )
        upserts = winner.filter(
            (F.col("op") != "delete") & F.col("row").isNotNull()
        ).select(*[F.col(f"row.{c}").alias(c) for c in data_cols])
        # ONE driver action for the batch stats — at 1 s triggers the
        # per-batch fixed cost is one Spark job, not four. The per-key
        # winner holding the globally largest lsn survives the window, so
        # max(lsn) over winners equals max over all events.
        stats = winner.agg(
            F.sum(F.when(F.col("op") == "delete", 1).otherwise(0)).alias("n_del"),
            F.sum(
                F.when(
                    (F.col("op") != "delete") & F.col("row").isNotNull(), 1
                ).otherwise(0)
            ).alias("n_up"),
            F.sum(
                F.when(
                    (F.col("op") != "delete") & F.col("row").isNull(), 1
                ).otherwise(0)
            ).alias("n_malformed"),
            F.max("lsn").alias("max_lsn"),
        ).collect()[0]
        if stats["n_malformed"]:
            # an insert/update without a new row is a producer bug; an
            # all-NULL append (or a silent drop) would corrupt the table
            raise ValueError(
                f"{stats['n_malformed']} non-delete CDC events carry no "
                "row payload"
            )
        n_del = stats["n_del"] or 0
        n_up = stats["n_up"] or 0
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
    except BaseException:
        # a failed commit restores raw ops to the pending queue for the
        # NON-streaming retry pattern; the streaming caller re-delivers
        # the whole batch and re-stages, so OUR restored ops must go or
        # the replay double-applies every row
        table.discard_pending_since(mark)
        raise
    finally:
        if winner_out is not None:
            winner_out.append((winner, min_lsn))
        else:
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
        if kafka_topic is not None and not kafka_bootstrap:
            raise ValueError(
                "kafka_topic requires kafka_bootstrap=<host:port>"
            )
        if sync_vecindex or sync_sigindex:
            ident = table.identity
            if ident.mode != "single":
                raise ValueError(
                    "sync_vecindex/sync_sigindex need a SINGLE-column "
                    f"identity (vec_id/doc_id come from it); table has "
                    f"identity {ident.mode}"
                )
            ktype = table.schema[ident.columns[0]].dataType
            if not isinstance(
                ktype,
                (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
            ):
                raise ValueError(
                    "sync_vecindex/sync_sigindex need an integer identity "
                    f"column; {ident.columns[0]} is {ktype.simpleString()} "
                    "(a non-integer key would cast to NULL ids)"
                )
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
        handoff: list = []
        try:
            version = apply_cdc_batch(
                self.table, batch_df, batch_id, winner_out=handoff
            )
            if self.sync_vecindex or self.sync_sigindex:
                # NOT gated on version: a replayed batch (version=None)
                # whose table commit landed but whose index maintenance
                # crashed must still be indexed. Each index carries its
                # own ``indexed_batch_id`` watermark, so this is a cheap
                # meta read (and a no-op) when everything is already
                # absorbed. The winner the table apply computed is reused
                # (same LSN floor), so the window shuffle runs ONCE per
                # batch, not twice.
                self._maintain_indexes(
                    batch_df,
                    batch_id,
                    winner=handoff[0][0] if handoff else None,
                )
        finally:
            for w, _floor in handoff:
                w.unpersist()
        for mv in self.refresh_views:
            mv.refresh()
        if self.sync_iceberg:
            from moonlink_spark.table.iceberg_export import (
                export_iceberg,
                read_iceberg_sync,
            )

            # NOT gated on version alone: a crash between the table
            # commit and the export would otherwise skip the export on
            # replay (version=None) until the next non-empty batch —
            # indefinitely on a low-traffic stream. The sync sidecar's
            # flush_lsn tells whether the export lags the table.
            need = version is not None
            if not need and self.table.last_lsn > 0:
                sync = read_iceberg_sync(self.table)
                need = sync is None or int(
                    sync.get("flush_lsn", -1)
                ) < int(self.table.last_lsn)
            if need:
                export_iceberg(self.table, self.sync_iceberg)
                if self.sync_catalog:
                    from moonlink_spark.table.rest_catalog import (
                        register_export,
                    )

                    url, ns, name = self.sync_catalog
                    register_export(url, ns, name, self.sync_iceberg)
        if self.on_batch:
            self.on_batch(batch_id, version)

    def _index_lsn_floor(self, batch_id: int) -> int:
        """The LSN floor THIS batch's events were judged against by
        apply_cdc_batch: the floor lived in the PARENT of the batch's
        OWN commit (the post-batch floor would filter out every event of
        the batch on the replay path).

        The batch's commit is identified by its OPERATION string, not by
        LAST_BATCH_PROP alone: properties carry forward, so a foreign
        commit landing after the batch still carries batch_id in the
        prop — matching on it walked to the WRONG parent (the batch's own
        commit) and read the post-batch floor, permanently skipping the
        batch's index work (review r10). Walk the parent chain (bounded:
        foreign commits since this batch) to the operation-tagged commit."""
        target_op = f"stream-batch-{batch_id}"
        m = self.table.manifest
        try:
            while int(m.properties.get(LAST_BATCH_PROP, -1)) == batch_id:
                if m.operation == target_op:
                    if m.parent is None:
                        return 0
                    parent = self.table.store.read(m.parent)
                    return int(parent.properties.get(LAST_LSN_PROP, 0))
                if m.parent is None:
                    break
                m = self.table.store.read(m.parent)
        except Exception:
            return 0  # chain vacuumed: index watermark bounds rework
        return int(self.table.manifest.properties.get(LAST_LSN_PROP, 0))

    def _maintain_indexes(
        self,
        batch_df: DataFrame,
        batch_id: int,
        winner: DataFrame | None = None,
    ) -> None:
        """Absorb this micro-batch into the configured persisted indexes.

        Idempotent + crash-recoverable: each index stores an
        ``indexed_batch_id`` watermark IN THE SAME atomic meta write that
        publishes its new segment, so (a) a replayed batch whose index
        work already landed is skipped here, and (b) a crash after the
        table commit but before index maintenance leaves the watermark
        lagging — the replay re-runs the maintenance instead of the old
        version-gated path that skipped it forever.

        The indexed rows are the batch's WINNER inserts under the same
        LSN floor the table apply used — raw events would index rows the
        table itself dropped (pre-floor replays after an initial copy,
        or an insert-then-delete of one key within the batch), violating
        update_index's 'vec_ids not already indexed' contract with ghost
        or duplicate entries."""
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
        own_winner = winner is None
        if own_winner:
            # replay path (the table apply was skipped): recompute the
            # batch's winners under the floor its commit actually used
            winner = _winner_events(
                batch_df,
                list(self.table.identity.columns),
                self._index_lsn_floor(batch_id),
            ).persist()
        try:
            split = winner.groupBy(F.col("op") == "insert").count().collect()
            n_ins = sum(r["count"] for r in split if r[0])
            n_other = sum(r["count"] for r in split if not r[0])
            inserts = (
                winner.filter(F.col("op") == "insert") if n_ins else None
            )
            if need_vec:
                dest, col = self.sync_vecindex
                if n_other:
                    # the watermark rides the LAST meta write for this
                    # batch; batch_id makes the stale count idempotent if
                    # a crash lands between this write and the
                    # watermark-carrying one
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
                            F.col(f"__k_{key}").cast("bigint").alias("vec_id"),
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
                            F.col(f"__k_{key}").cast("bigint").alias("doc_id"),
                            F.col(f"row.{col}").alias("text"),
                        ),
                        dest,
                        meta_update=wm,
                    )
                if not n_ins and not n_other:
                    sigindex.note_indexed_batch(dest, batch_id)
        finally:
            if own_winner:
                winner.unpersist()  # a handed-off winner is the caller's

    def start(self, available_now: bool = True, processing_time: str = "1 second"):
        spark: SparkSession = self.table.spark
        # with_seq: producers that stamp the within-transaction sequence
        # (pgoutput spool) get deterministic same-LSN ordering; events
        # without it parse seq as NULL and fall back to op-precedence
        schema = cdc_event_schema(self.table.schema, with_seq=True)
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
        (used for tests and catch-up runs). Fails LOUD on timeout — a
        caller proceeding on partial state while the query keeps
        committing in the background is silent corruption."""
        q = self.start(available_now=True)
        try:
            if not q.awaitTermination(timeout_s):
                raise TimeoutError(
                    f"availableNow drain did not finish within {timeout_s}s"
                )
        finally:
            if q.isActive:
                q.stop()


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
