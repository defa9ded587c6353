"""Ingestion-semantics queries: the MoonlinkTable engine itself, verified
against SQL oracles.

Each query builds a real MoonlinkTable in a temp directory, applies a
deterministic sequence of ingestion events (the same shapes as the
reference's CDC/REST paths, SURVEY.md §3.1/§3.3), scans the result, and the
oracle expresses the expected final state in plain SQL over the source
parquet. This is how the engine's upsert/delete/LSN machinery gets covered
by the driver's correctness gate, not just by pytest.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from moonlink_spark.operators import load, register
from moonlink_spark.table.identity import IdentityProp
from moonlink_spark.table.table import MoonlinkTable

ORDERS_FIELDS = [
    {"name": "o_orderkey", "data_type": "int64", "nullable": False},
    {"name": "o_custkey", "data_type": "int64"},
    {"name": "o_orderstatus", "data_type": "string"},
    {"name": "o_totalprice", "data_type": "float64"},
    {"name": "o_orderpriority", "data_type": "string"},
]


def _orders_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )


def _tmp_table_dir(tag: str) -> str:
    return tempfile.mkdtemp(prefix=f"moonlink-{tag}-")


@register(
    "ingest_upsert_delete_scan",
    oracle="""
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
  FROM orders
),
upserted AS (
  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
         o_totalprice + 1000.0 AS o_totalprice, o_orderpriority
  FROM base WHERE o_orderkey % 100 = 0
),
inserted AS (
  SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey, 'N' AS o_orderstatus,
         o_totalprice, o_orderpriority
  FROM base WHERE o_orderkey % 97 = 0
),
merged AS (
  SELECT * FROM base WHERE o_orderkey % 100 <> 0
  UNION ALL SELECT * FROM upserted
  UNION ALL SELECT * FROM inserted
)
SELECT o_orderkey, o_custkey, o_orderstatus,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice, o_orderpriority
FROM merged WHERE o_orderkey % 55 <> 0
""",
    category="ingest",
)
def ingest_upsert_delete_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MERGE lifecycle on a key-identity table: bulk append, upsert
    batch (updates + inserts), delete batch, scan (parity: REST upsert
    decomposition moonlink_rest_sink.rs:222-253 + delete
    mooncake_table.rs:1241-1287)."""
    base = _orders_df(spark, sf_dir)
    t = MoonlinkTable.create(
        spark,
        _tmp_table_dir("upsert"),
        ORDERS_FIELDS,
        IdentityProp.single("o_orderkey"),
    )
    t.append_df(base)
    t.commit(lsn=1)
    updates = base.filter(F.col("o_orderkey") % 100 == 0).withColumns(
        {
            "o_orderstatus": F.lit("U"),
            "o_totalprice": F.col("o_totalprice") + 1000.0,
        }
    )
    inserts = base.filter(F.col("o_orderkey") % 97 == 0).withColumns(
        {
            "o_orderkey": F.col("o_orderkey") + 10000000,
            "o_orderstatus": F.lit("N"),
        }
    )
    t.upsert_df(updates.unionByName(inserts))
    t.commit(lsn=2)
    deletes = (
        t.scan()
        .filter(F.col("o_orderkey") % 55 == 0)
        .select("o_orderkey")
    )
    t.delete_keys_df(deletes)
    t.commit(lsn=3)
    return t.scan().withColumn(
        "o_totalprice", F.col("o_totalprice").cast("double")
    )


@register(
    "ingest_scan_at_lsn",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderstatus,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice, o_orderpriority
FROM orders WHERE o_orderkey % 3 IN (0, 1)
""",
    category="ingest",
)
def ingest_scan_at_lsn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read-your-LSN: three commits, scan pinned at the second commit's LSN
    sees exactly commits 1-2 (consistency rule mooncake_table.rs:440-444;
    versionAsOf semantics SURVEY.md §3.2)."""
    base = _orders_df(spark, sf_dir)
    t = MoonlinkTable.create(
        spark,
        _tmp_table_dir("lsn"),
        ORDERS_FIELDS,
        IdentityProp.single("o_orderkey"),
    )
    t.append_df(base.filter(F.col("o_orderkey") % 3 == 0))
    t.commit(lsn=100)
    t.append_df(base.filter(F.col("o_orderkey") % 3 == 1))
    t.commit(lsn=200)
    t.append_df(base.filter(F.col("o_orderkey") % 3 == 2))
    t.commit(lsn=300)
    return t.scan(lsn=200).withColumn(
        "o_totalprice", F.col("o_totalprice").cast("double")
    )


@register(
    "ingest_fullrow_delete_one",
    oracle="""
SELECT doc_id, source FROM documents
UNION ALL
SELECT doc_id, source FROM documents WHERE doc_id % 10 = 0
""",
    category="ingest",
)
def ingest_fullrow_delete_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FullRow identity: load every %10 doc three times, delete exactly ONE
    occurrence each -> two copies remain (delete-first-match semantics,
    mem_index.rs FullRow multimap; SURVEY.md §1.3)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    dup = docs.filter(F.col("doc_id") % 10 == 0)
    t = MoonlinkTable.create(
        spark,
        _tmp_table_dir("fullrow"),
        [
            {"name": "doc_id", "data_type": "int64", "nullable": False},
            {"name": "source", "data_type": "string"},
        ],
        IdentityProp.full_row(),
    )
    t.append_df(docs.unionByName(dup).unionByName(dup))
    t.commit(lsn=1)
    # distributed full-row delete: no driver collect (the delete set stays
    # a DataFrame end to end)
    t.delete_rows_df(dup)
    t.commit(lsn=2)
    return t.scan()


@register(
    "ingest_streaming_xact_commit_abort",
    oracle="""
SELECT event_id, user_id, event_type FROM events
WHERE user_id % 2 = 0 OR event_type = 'purchase'
""",
    category="ingest",
)
def ingest_streaming_xact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming transactions: xact A (purchase events) commits, xact B
    (error events) aborts — only A's rows are visible
    (transaction_stream.rs semantics; abort parity table_handler.rs:907)."""
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    t = MoonlinkTable.create(
        spark,
        _tmp_table_dir("xact"),
        [
            {"name": "event_id", "data_type": "int64", "nullable": False},
            {"name": "user_id", "data_type": "int64"},
            {"name": "event_type", "data_type": "string"},
        ],
        IdentityProp.single("event_id"),
    )
    t.append_df(ev.filter(F.col("user_id") % 2 == 0))
    t.commit(lsn=1)
    xa = t.begin_transaction(xact_id=1)
    xa.append_df(
        ev.filter((F.col("event_type") == "purchase") & (F.col("user_id") % 2 != 0))
    )
    xb = t.begin_transaction(xact_id=2)
    xb.append_df(
        ev.filter((F.col("event_type") == "error") & (F.col("user_id") % 2 != 0))
    )
    xa.commit(lsn=5)
    xb.abort()
    return t.scan()
