"""Row-encoding formats for ingestion: JSON, Avro, Protobuf.

Parity targets (SURVEY.md §2c sources row): the reference ingests JSON
(``rest_ingest/json_converter.rs``), Avro for the Kafka path
(``rest_ingest/avro_converter.rs``), and protobuf
(``src/moonlink_proto``). Here:

- JSON is first-class twice over: driver-side strict conversion
  (``ingest/json_convert.py``) and distributed ``from_json`` for streams.
- Avro binary DECODE needs the ``spark-avro`` datasource jar, which is NOT
  bundled in this environment — ``avro_available()`` gates it; on a cluster
  with the jar the same code path works unchanged. The Avro SCHEMA mapping
  (avro schema JSON -> StructType, logical types included) is pure metadata
  and lives jar-free in ``sources/converters.py``.
- Protobuf rows (the reference's ``row.proto`` MoonlinkRow encoding) are
  decoded by the dependency-free wire codec in ``sources/converters.py`` —
  no jar needed; ``protobuf_available()`` only gates the optional
  descriptor-based fast path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def parse_json_rows(df: DataFrame, json_col: str, schema: T.StructType) -> DataFrame:
    """Distributed JSON decoding with from_json (JVM-side, codegen'd) —
    the bulk/streaming twin of ingest.json_convert.convert_row."""
    return df.select(
        F.from_json(F.col(json_col), schema).alias("row")
    ).select("row.*")


def avro_available(spark) -> bool:
    """True when the spark-avro datasource is loaded (external jar)."""
    try:
        from pyspark.sql.avro.functions import to_avro

        spark.createDataFrame([(1,)], "x int").select(
            to_avro(F.struct("x"))
        ).collect()
        return True
    except Exception:
        return False


def from_avro_rows(data: Column, avro_schema_json: str) -> Column:
    """Decode an Avro binary column (requires spark-avro; see
    avro_available). Kept as a thin passthrough so cluster deployments get
    the reference's Kafka/Avro path with zero code changes."""
    from pyspark.sql.avro.functions import from_avro

    return from_avro(data, avro_schema_json)


def protobuf_available() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def kafka_available(spark) -> bool:
    """True when the spark-sql-kafka datasource is on the classpath (an
    external jar, like spark-avro). Probing with load() would block on
    brokers, so check the provider class directly."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False
