"""moonlink_spark — a PySpark-native streaming lakehouse ingestion & query engine.

A from-scratch engine with the query and data-processing capabilities of
Mooncake-Labs/moonlink (an Iceberg-native streaming ingestion engine; see
SURVEY.md). Built idiomatically on the Spark DataFrame/SQL API and Structured
Streaming rather than as a port of the reference's Rust architecture:

- ``MoonlinkTable``: a versioned Parquet table format with atomic manifest
  commits, position-delete deletion vectors, and an LSN -> version log
  (parity: reference mooncake_table + Iceberg/Puffin sync,
  ``src/moonlink/src/storage/mooncake_table.rs``).
- Row-identity-aware ingestion: append / delete / upsert / CDC update with the
  four identity modes of the reference
  (``src/moonlink/src/row/moonlink_row.rs:271-277``).
- Streaming transactions with commit/abort
  (``src/moonlink/src/storage/mooncake_table/transaction_stream.rs``).
- The full relational operator surface (SURVEY.md §2c) plus large-scale
  training-data pipeline operators (dedup, similarity search, text analysis,
  multimodal plumbing).
"""

from moonlink_spark.session import get_spark, stop_spark
from moonlink_spark.schema import field_schema_to_struct, struct_to_field_schema
from moonlink_spark.table.identity import IdentityProp
from moonlink_spark.table.matview import MaterializedView
from moonlink_spark.table.table import MoonlinkTable
from moonlink_spark.backend import MoonlinkBackend

__all__ = [
    "get_spark",
    "stop_spark",
    "field_schema_to_struct",
    "struct_to_field_schema",
    "IdentityProp",
    "MaterializedView",
    "MoonlinkTable",
    "MoonlinkBackend",
]

__version__ = "0.1.0"
