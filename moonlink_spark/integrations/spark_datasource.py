"""A PySpark Python Data Source for moonlink tables: the Spark-native
external read path over the binary RPC scan protocol.

Usage (any Spark application, no moonlink backend in-process):

    from moonlink_spark.integrations.spark_datasource import MoonlinkDataSource
    spark.dataSource.register(MoonlinkDataSource)
    df = (spark.read.format("moonlink")
          .option("host", "127.0.0.1").option("port", 4321)
          .option("database", "db").option("table", "users")
          .option("lsn", 20)          # optional: time travel
          .load())

Parity: the reference embeds exactly this for DataFusion
(``src/moonlink_datafusion/src/table_provider.rs`` — TableProvider over
``get_table_schema`` + ``scan_table_begin(db, table, lsn)`` + per-file
deletion-vector row skips). Spark is one of the reference's named read
engines (README.md:88-91); PySpark 4's Python Data Source API
(SPARK-44076) is the idiomatic carrier.

Scale shape: planning is driver-side (one RPC round-trip, file list +
position deletes only — no data moves); each data file becomes one input
partition, so reads parallelize across executors like any file source;
each partition streams Arrow record batches with its deletion-vector rows
masked out batch-by-batch (never materializing the file as one table).
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)


def _plan(options: dict) -> tuple[bytes, list[tuple[str, tuple[int, ...]]]]:
    """Driver-side: one RPC conversation -> (arrow schema IPC bytes,
    [(file, deleted_positions)]). Mirrors the provider's try_new + scan
    (table_provider.rs:41-57)."""
    import pyarrow as pa

    from moonlink_spark.rpc import MoonlinkRpcClient

    host = options.get("host", "127.0.0.1")
    port = int(options["port"])
    db = options["database"]
    table = options["table"]
    lsn = int(options.get("lsn", 0))
    client = MoonlinkRpcClient(host, port)
    try:
        schema = client.get_table_schema(db, table)
        blob = client.scan_table_begin(db, table, lsn)
        per_file: dict[int, list[int]] = {}
        for fidx, row in blob.position_deletes:
            per_file.setdefault(fidx, []).append(row)
        parts = [
            (path, tuple(sorted(per_file.get(i, ()))))
            for i, path in enumerate(blob.data_files)
        ]
        client.scan_table_end(db, table)
    finally:
        client.close()
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, schema):
        pass
    return sink.getvalue().to_pybytes(), parts


class MoonlinkFilePartition(InputPartition):
    """One data file + its deleted row positions + the target schema
    (arrow IPC bytes, so the executor needs no RPC connection)."""

    def __init__(self, path: str, deleted: tuple[int, ...], schema_ipc: bytes):
        self.path = path
        self.deleted = deleted
        self.schema_ipc = schema_ipc


class MoonlinkDataSourceReader(DataSourceReader):
    def __init__(self, options: dict):
        self._schema_ipc, self._parts = _plan(options)

    def partitions(self):  # noqa: D102
        return [
            MoonlinkFilePartition(p, d, self._schema_ipc)
            for p, d in self._parts
        ]

    def read(self, partition: MoonlinkFilePartition) -> Iterator[Any]:
        """Executor-side: stream the file's record batches, mask DV rows,
        align to the table schema (schema evolution: missing columns are
        NULL, matching the native scan). Only pyarrow is required here."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        with pa.ipc.open_stream(partition.schema_ipc) as r:
            target = r.schema
        deleted = set(partition.deleted)
        pf = pq.ParquetFile(partition.path)
        offset = 0
        for batch in pf.iter_batches():
            n = batch.num_rows
            if deleted:
                mask = [offset + i not in deleted for i in range(n)]
                batch = batch.filter(pa.array(mask, type=pa.bool_()))
            offset += n
            cols = []
            for f in target:
                if f.name in batch.schema.names:
                    col = batch.column(batch.schema.names.index(f.name))
                    if col.type != f.type:
                        col = col.cast(f.type)
                else:
                    col = pa.nulls(batch.num_rows, type=f.type)
                cols.append(col)
            yield pa.RecordBatch.from_arrays(cols, schema=target)


def register_moonlink_source(spark) -> None:
    """Register the ``moonlink`` format on a session, shipping the package
    to Spark's Python workers first — the DataSource class unpickles in a
    separate Python worker process, which needs ``moonlink_spark``
    importable (addPyFile covers sessions not started from the repo root)."""
    from moonlink_spark.session import ensure_package_on_workers

    ensure_package_on_workers(spark)
    spark.dataSource.register(MoonlinkDataSource)


class MoonlinkDataSource(DataSource):
    """``spark.read.format("moonlink")`` — register with
    ``register_moonlink_source(spark)`` (or
    ``spark.dataSource.register(MoonlinkDataSource)`` if the package is
    already importable by Spark's Python workers)."""

    @classmethod
    def name(cls) -> str:
        return "moonlink"

    def schema(self):
        import pyarrow as pa
        from pyspark.sql.pandas.types import from_arrow_schema

        ipc, _ = _plan(self.options)
        with pa.ipc.open_stream(ipc) as r:
            return from_arrow_schema(r.schema)

    def reader(self, schema) -> MoonlinkDataSourceReader:
        return MoonlinkDataSourceReader(dict(self.options))
