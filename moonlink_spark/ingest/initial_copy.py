"""Initial copy over the PostgreSQL COPY protocol — the socket leg.

Parity: the reference seeds a table by streaming ``COPY ... TO STDOUT``
from the source database in parallel CTID shards under one exported
snapshot, captures the WAL boundary LSN at snapshot export, bulk-loads
the copied files at that LSN, and lets the CDC stream take over — events
at lsn <= boundary are dropped by the LSN floor, later ones apply
(``src/moonlink_connectors/src/pg_replicate/initial_copy.rs:56-219``
``copy_table_stream``: export_snapshot_and_lsn -> plan_ctid_shards ->
spawn_sharded_copy_readers -> LoadFiles at boundary_lsn;
``initial_copy_writer.rs`` parallel parquet writers).

Spark-first re-expression: the shard plan is a tiny DataFrame and each
EXECUTOR TASK opens its own wire connection (``pg_protocol.
PgWireClient``), pins the exported snapshot with ``SET TRANSACTION
SNAPSHOT``, streams its rowid range via COPY OUT, and yields Arrow
batches through ``mapInPandas`` — reader parallelism, text->typed
decode, and parquet writing all ride Spark's machinery instead of a
bespoke channel/writer-pool (the reference's batch channel + N writer
tasks ARE Spark tasks here). The driver only plans shards and commits;
no row crosses it. Switchover reuses :func:`moonlink_spark.streaming.
pipeline.initial_copy`'s boundary-LSN commit, so the existing
``apply_cdc_batch`` floor provides the concurrent-event semantics
(buffered events replay after the copy; the applied floor drops the
prefix the snapshot already contains).

CTID -> rowid: PG shards on physical block ranges ``(ctid >= (b,1))``;
the SQLite-backed source exposes the same contract through ``rowid``
ranges over the frozen snapshot table — both are coarse physical
partitions of one consistent snapshot.
"""

from __future__ import annotations

import math
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from moonlink_spark.streaming.pipeline import initial_copy
from moonlink_spark.table.table import MoonlinkTable


def plan_rowid_shards(
    lo: int, hi: int, shard_count: int
) -> list[tuple[int, int, int]]:
    """Split [lo, hi] (inclusive) into <= shard_count contiguous ranges —
    the plan_ctid_shards shape: the LAST shard is unbounded above so rows
    appended to the snapshot's physical tail are never missed."""
    if hi < lo:
        return []
    n = max(1, min(shard_count, hi - lo + 1))
    step = math.ceil((hi - lo + 1) / n)
    out = []
    for i in range(n):
        a = lo + i * step
        if a > hi:
            break
        b = a + step - 1
        out.append((i, a, 2**62 if i == n - 1 else b))
    return out


def _coercers(schema: T.StructType):
    """Per-column text->typed converters for COPY text output."""
    import pandas as pd

    def mk(dt: T.DataType):
        if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
            return lambda s: pd.to_numeric(s).astype("Int64")
        if isinstance(dt, (T.DoubleType, T.FloatType)):
            return lambda s: pd.to_numeric(s).astype("float64")
        if isinstance(dt, T.BooleanType):
            return lambda s: s.map(
                lambda v: None if v is None else v in ("t", "true", "1", "True")
            ).astype("boolean")
        if isinstance(dt, T.StringType):
            return lambda s: s
        raise TypeError(
            f"COPY text decode for {dt.simpleString()} not implemented "
            "(supported: integral, floating, boolean, string)"
        )

    return {f.name: mk(f.dataType) for f in schema.fields}


def wire_initial_copy(
    table: MoonlinkTable,
    host: str,
    port: int,
    src_table: str,
    shard_count: int = 4,
    user: str = "moonlink",
    database: str = "postgres",
    password: str | None = None,
) -> dict[str, Any]:
    """Seed ``table`` from a live source database over the COPY protocol.

    Returns {"boundary_lsn", "rows_copied", "shards", "version"}; commit
    lands at the boundary LSN with the LSN-floor property set, so feeding
    the concurrent CDC stream afterwards applies exactly the events the
    snapshot does not contain."""
    from moonlink_spark.pg_protocol import PgWireClient, parse_wal_lsn

    spark: SparkSession = table.spark
    schema = table.schema

    # The control connection exports the snapshot from INSIDE an open
    # REPEATABLE READ transaction and stays open until every shard reader
    # has imported it — on real PostgreSQL an exported snapshot is only
    # importable while the exporting transaction lives, and the exporting
    # transaction reads its own snapshot (no SET TRANSACTION SNAPSHOT of
    # its own; SET is only legal before the first query of an importing
    # transaction). The mock mirrors both rules.
    ctl = PgWireClient(host, port, user=user, database=database, password=password)
    try:
        ctl.query("BEGIN ISOLATION LEVEL REPEATABLE READ")
        r = ctl.query("SELECT pg_export_snapshot(), pg_current_wal_lsn()")
        snap_id, lsn_text = r.rows[0]
        boundary = parse_wal_lsn(lsn_text)
        b = ctl.query(
            f"SELECT MIN(rowid), MAX(rowid) FROM {src_table}"
        ).rows[0]

        shards = (
            []
            if b[0] is None
            else plan_rowid_shards(int(b[0]), int(b[1]), shard_count)
        )
        before = table.cardinality()
        # idempotence guard (review r10): the seed must not run twice. A
        # crash-retry after a successful copy — or pointing the copy at a
        # table that already has data — would silently append the entire
        # snapshot AGAIN (the LSN floor only drops CDC events, not the
        # snapshot rows themselves).
        if shards and (before > 0 or boundary <= table.last_lsn):
            raise ValueError(
                f"initial copy target is not empty/fresh (rows={before}, "
                f"table lsn={table.last_lsn}, boundary={boundary}): "
                "re-seeding would duplicate the snapshot; drop and "
                "recreate the table, or resume the CDC stream instead"
            )
        if shards:
            df = _read_shards_df(
                spark, schema, shards, host, port, src_table, snap_id,
                user=user, database=database, password=password,
            )
            # initial_copy consumes the COPY streams eagerly (writes +
            # commits before returning), so the exporting transaction is
            # still open while every shard imports the snapshot
            version = initial_copy(table, df, boundary)
        elif boundary > table.last_lsn:
            version = initial_copy(
                table, spark.createDataFrame([], schema), boundary
            )
        else:
            # empty source with no WAL history: nothing to seed and the
            # LSN floor is already at/above the boundary — no commit
            version = table.manifest.version
    finally:
        try:
            ctl.query("ROLLBACK")
        except Exception:
            pass  # connection may already be gone; close() is the cleanup
        ctl.close()
    # manifest row counts, no re-read (the COPY stream is consumed once)
    rows_copied = table.cardinality() - before
    return {
        "boundary_lsn": boundary,
        "rows_copied": rows_copied,
        "shards": len(shards),
        "version": version,
    }


def _read_shards_df(
    spark: SparkSession,
    schema: T.StructType,
    shards: list[tuple[int, int, int]],
    host: str,
    port: int,
    src_table: str,
    snap_id: str,
    user: str,
    database: str,
    password: str | None,
) -> DataFrame:
    """One COPY reader per shard, executor-side, Arrow-batched."""
    cols = schema.fieldNames()
    col_list = ", ".join(cols)
    shard_df = spark.createDataFrame(
        [(int(s), int(a), int(b)) for s, a, b in shards],
        "shard_id int, lo long, hi long",
    ).repartitionByRange(len(shards), "shard_id")

    def read_shards(batches: Iterator) -> Iterator:
        import pandas as pd

        from moonlink_spark.pg_protocol import (
            PgWireClient,
            parse_copy_text_row,
            parse_copy_text_rows,
        )

        coerce = _coercers(schema)
        for pdf in batches:
            for _, row in pdf.iterrows():
                c = PgWireClient(
                    host, port, user=user, database=database,
                    password=password,
                )
                try:
                    # importing a snapshot is only legal as the first act
                    # of a REPEATABLE READ transaction (real-PG rule; the
                    # reader never writes, so the txn ends in ROLLBACK via
                    # connection close)
                    c.query("BEGIN ISOLATION LEVEL REPEATABLE READ")
                    c.query(f"SET TRANSACTION SNAPSHOT '{snap_id}'")
                    # the reference's exact predicate-reader statement
                    # shape (clients/postgres.rs:261 copy_out_with_
                    # predicate), WITH (FORMAT text) included
                    sql = (
                        f"COPY (SELECT {col_list} FROM {src_table} WHERE "
                        f"rowid >= {int(row.lo)} AND rowid <= {int(row.hi)}"
                        ") TO STDOUT WITH (FORMAT text)"
                    )
                    # frame-granular consumption: one parse call per
                    # ~256 KiB CopyData frame instead of per row
                    buf: list[list] = []
                    rest = b""
                    for frame in c.copy_out_frames(sql):
                        rows, rest = parse_copy_text_rows(frame, rest)
                        buf.extend(rows)
                        if len(buf) >= 50_000:  # bounded executor memory
                            yield _to_pandas(buf, cols, coerce, pd)
                            buf = []
                    if rest:  # unterminated trailing row (defensive)
                        buf.append(parse_copy_text_row(rest))
                    if buf:
                        yield _to_pandas(buf, cols, coerce, pd)
                finally:
                    c.close()

    return shard_df.mapInPandas(read_shards, schema)


def _to_pandas(buf, cols, coerce, pd):
    out = pd.DataFrame(buf, columns=cols)
    for c in cols:
        out[c] = coerce[c](out[c])
    return out
