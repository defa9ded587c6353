"""Day-in-the-life soak: every production surface composed into ONE
randomized multi-round run, with the chaos FS layer injecting transient
object-store faults the whole time.

The chain per round (each hop is unit-tested elsewhere; this test is the
composition under faults, the r11 verdict's remaining unknown):

  authenticated replication wire (SCRAM) -> CDC squash -> table A
  the same WAL bytes -> streaming spool -> MERGE pipeline -> table B
  table B -> matview refresh + sigindex sync -> continuous Iceberg
  export + REST catalog registration -> DuckDB read of the export

Both tables live on an object-store control plane wrapped in a
ChaosPolicy (one injected TransientStoreError every N mutating calls —
the retry loop must absorb every one). Final invariants: table A ==
table B == the Python model, the matview equals a direct aggregate, the
DuckDB read of the exported Iceberg table equals the model, the catalog
advanced, chaos actually fired, and ZERO orphaned tmp objects/segments
remain.

Reference anchor: src/moonlink_backend/tests/test_basic.rs (the e2e
shape) + table_handler/chaos_test.rs:1-7 (seeded faults, model parity).
"""

import os
import random
import struct

import duckdb
import pytest
from pyspark.sql import functions as F

from moonlink_spark.backend import MoonlinkBackend
from moonlink_spark.ingest.pgoutput import pgoutput_trace_to_spool
from moonlink_spark.ingest.pgwire import ReplicationWireClient, ReplicationWireServer
from moonlink_spark.streaming.pipeline import StreamingIngestor
from moonlink_spark.table import sigindex
from moonlink_spark.table.fs import (
    ChaosPolicy,
    InMemoryObjectStore,
    ObjectStoreFS,
    register_fs_scheme,
)
from moonlink_spark.table.iceberg_export import (
    read_iceberg_deletion_vectors,
    read_iceberg_live_files,
)
from moonlink_spark.table.identity import IdentityProp
from moonlink_spark.table.rest_catalog import (
    IcebergRestCatalogServer,
    RestCatalogClient,
)
from tests.test_pgoutput import USERS_REL, begin, commit
from tests.test_replication_chaos import REL, _gen_txn, frame

FIELDS = [
    {"name": "id", "data_type": "int64", "nullable": False},
    {"name": "name", "data_type": "string"},
    {"name": "age", "data_type": "int32"},
]

ROUNDS = 5


def _spool_slice(trace: str, prev_len: int, out_path: str) -> str:
    """The round's NEW trace bytes as a standalone decodable trace: the
    relation registration rides a dummy (already-replayed) transaction
    so the decoder knows the relation without re-emitting old DML."""
    with open(trace, "rb") as fh:
        fh.seek(prev_len)
        tail = fh.read()
    with open(out_path, "wb") as fh:
        fh.write(frame(begin(1), USERS_REL, commit(1)) + tail)
    return out_path


@pytest.mark.slow
@pytest.mark.parametrize("seed", [11, 42])
def test_day_in_the_life_soak(spark, tmp_path, seed):
    rng = random.Random(seed)

    # -- chaos object-store warehouse (control plane for BOTH tables) ----
    store = InMemoryObjectStore()
    chaos = ChaosPolicy(fail_every=6)
    scheme = f"soakfs{seed}"
    register_fs_scheme(
        scheme,
        lambda path, _s=store, _c=chaos: ObjectStoreFS(_s, chaos=_c, retries=6),
    )
    be = MoonlinkBackend(
        spark,
        f"{scheme}://bucket/wh",
        data_staging_dir=str(tmp_path / "stage"),
    )
    ta = be.create_table("db", "users_wire", FIELDS, IdentityProp.single("id"))
    tb = be.create_table("db", "users_merge", FIELDS, IdentityProp.single("id"))

    # -- authenticated wire + catalog --------------------------------------
    trace = str(tmp_path / "wal.bin")
    with open(trace, "wb") as fh:
        fh.write(frame(begin(1), USERS_REL, commit(1)))
    srv = ReplicationWireServer(
        trace, password="s0ak", auth="scram-sha-256"
    ).start()
    cat = IcebergRestCatalogServer(str(tmp_path / "catalog")).start()
    ice = str(tmp_path / "ice")
    sig_dir = be._sigindex_dir(tb, "name")  # the backend-owned index dir
    mv = None
    meta_locations = []
    try:
        url = f"http://127.0.0.1:{cat.port}"
        RestCatalogClient(url).create_namespace("soak")
        model: dict[int, tuple] = {}
        lsn = 10
        prev_len = os.path.getsize(trace)

        for rnd in range(ROUNDS):
            # ---- generate 2-4 plain transactions (CDC squash food:
            # multi-op txns with same-key update/delete runs) ----------
            for _ in range(rng.randrange(2, 5)):
                frames, effects = _gen_txn(rng, lsn, model, streamed=False)
                with open(trace, "ab") as fh:
                    fh.write(frame(*frames))
                for eff in effects:
                    if eff[0] == "put":
                        model[eff[1]] = eff[2]
                    else:
                        model.pop(eff[1], None)
                lsn += 10

            # ---- leg 1: authenticated wire -> tailer -> table A ------
            client = ReplicationWireClient(
                ta, srv.host, srv.port, str(tmp_path / "spool_wire.bin"),
                password="s0ak",
            )
            client.stream_once()

            # ---- leg 2: the SAME new WAL bytes -> streaming MERGE ----
            slice_path = _spool_slice(
                trace, prev_len, str(tmp_path / f"slice{rnd}.bin")
            )
            prev_len = os.path.getsize(trace)
            pgoutput_trace_to_spool(slice_path, str(tmp_path / "spool_stream"))
            sync_kw = {}
            if mv is not None:
                sync_kw = {
                    "refresh_views": [mv],
                    "sync_sigindex": (sig_dir, "name"),
                }
            ing = StreamingIngestor(
                tb,
                str(tmp_path / "spool_stream"),
                str(tmp_path / "ckpt"),
                sync_iceberg=ice,
                sync_catalog=(url, "soak", "users_merge"),
                **sync_kw,
            )
            q = ing.start(available_now=True)
            q.awaitTermination()

            # ---- after round 0: bootstrap matview + sigindex (the
            # backend-owned build carries the streaming watermark from
            # the table's LAST_BATCH_PROP, so round 1's micro-batch is
            # not double-indexed) ---------------------------------------
            if mv is None:
                mv = be.create_materialized_view(
                    "db", "users_merge", str(tmp_path / "mv"),
                    group_by=["name"], sums=["age"],
                )
                be.build_signature_index("db", "users_merge", "name")

            # ---- per-round invariants ---------------------------------
            got_a = {r.id: (r.name, r.age) for r in ta.scan().collect()}
            got_b = {r.id: (r.name, r.age) for r in tb.scan().collect()}
            assert got_a == model, f"wire leg diverged (seed={seed} rnd={rnd})"
            assert got_b == model, f"merge leg diverged (seed={seed} rnd={rnd})"
            mv.refresh()
            want_mv = {
                (r[0], r[1], r[2])
                for r in tb.scan()
                .groupBy("name")
                .agg(F.count("*").alias("n"), F.sum("age").alias("s"))
                .collect()
            }
            got_mv = {
                (r.name, r.n_rows, r.sum_age) for r in mv.read().collect()
            }
            assert got_mv == want_mv, f"matview diverged (seed={seed} rnd={rnd})"
            code, loaded = RestCatalogClient(url).load_table(
                "soak", "users_merge"
            )
            assert code == 200
            meta_locations.append(loaded["metadata-location"])
            # the sigindex sync contract: updates/deletes flip the stale
            # flag instead of patching segments — the operator's move is
            # one backend maintenance tick (rebuild when stale, compact
            # when fragmented, r12 surface), which carries the CDC
            # watermark so the next micro-batch doesn't double-index
            be.maintain_signature_index("db", "users_merge", "name")

        # ---- final: external DuckDB read of the Iceberg export --------
        files = read_iceberg_live_files(ice)
        dvs = read_iceberg_deletion_vectors(ice)
        dead = {(f, p) for f, ps in dvs.items() for p in ps}
        con = duckdb.connect()
        quoted = ", ".join(f"'{p}'" for p in files)
        got = con.sql(
            f"SELECT id, name, age, filename, file_row_number "
            f"FROM read_parquet([{quoted}], filename=true, "
            f"file_row_number=true, union_by_name=true)"
        ).fetchall()
        live = {r[0]: (r[1], r[2]) for r in got if (r[3], r[4]) not in dead}
        assert live == model, f"Iceberg export diverged (seed={seed})"
        assert len(set(meta_locations)) > 1, "catalog never advanced"

        # ---- faults really fired, and every one was absorbed -----------
        assert chaos.injected >= ROUNDS, (
            f"chaos layer barely fired ({chaos.injected} injections)"
        )

        # ---- zero orphans anywhere -------------------------------------
        # control plane: no .tmp objects survive (atomic publishes only)
        tmp_keys = [
            k for k in store.keys_with_prefix("bucket/wh") if ".tmp" in k
        ]
        assert tmp_keys == [], f"orphaned control-plane tmp objects: {tmp_keys}"
        # sigindex: every on-disk segment is listed in the meta
        live_segs = set(sigindex.read_meta(sig_dir)["segments"])
        disk_segs = {
            f for f in os.listdir(sig_dir) if f.startswith("sig")
            and f.endswith(".parquet")
        }
        assert disk_segs == live_segs, (
            f"orphan sigindex segments: {disk_segs - live_segs}"
        )
        # sigindex coverage: with the stale->rebuild loop running every
        # round, the index ends EXACTLY at the live corpus, one
        # signature per document
        sig_ids = [
            r.doc_id for r in sigindex.signatures(spark, sig_dir).collect()
        ]
        assert len(sig_ids) == len(set(sig_ids)), "double-indexed documents"
        assert set(sig_ids) == set(model), "index diverged from live corpus"
    finally:
        srv.stop()
        cat.stop()
