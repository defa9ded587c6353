"""REST/JSON/CDC ingestion tests (parity: reference service e2e tests,
src/moonlink_service/src/test.rs + sink tests in moonlink_sink.rs)."""

import datetime as dt
from decimal import Decimal

import pytest

from moonlink_spark.errors import LsnError
from moonlink_spark.ingest.cdc import CdcEvent, CdcSink
from moonlink_spark.ingest.json_convert import JsonConvertError, convert_row
from moonlink_spark.ingest.rest import RestSink
from moonlink_spark.schema import field_schema_to_struct
from moonlink_spark.table.identity import IdentityProp
from moonlink_spark.table.table import MoonlinkTable

TYPED_FIELDS = [
    {"name": "id", "data_type": "int32", "nullable": False},
    {"name": "id64", "data_type": "int64"},
    {"name": "small", "data_type": "int16"},
    {"name": "name", "data_type": "string"},
    {"name": "active", "data_type": "bool"},
    {"name": "score", "data_type": "float64"},
    {"name": "amount", "data_type": "decimal(5,2)"},
    {"name": "big_amount", "data_type": "decimal(38,10)"},
    {"name": "d", "data_type": "date32"},
    {"name": "t_us", "data_type": "time64"},
    {"name": "ts", "data_type": "timestamp"},
    {"name": "uid", "data_type": "uuid"},
    {"name": "blob", "data_type": "binary"},
    {"name": "tags", "data_type": "list", "item": {"data_type": "string"}},
    {
        "name": "profile",
        "data_type": "struct",
        "fields": [
            {"name": "pid", "data_type": "int32"},
            {"name": "pname", "data_type": "string"},
        ],
    },
]


class TestJsonConvert:
    def setup_method(self):
        self.schema = field_schema_to_struct(TYPED_FIELDS)

    def test_full_type_coverage(self):
        row = convert_row(
            {
                "id": 1,
                "id64": 2**40,
                "small": 12,
                "name": "x",
                "active": True,
                "score": 1.5,
                "amount": "123.45",
                "big_amount": 99.5,
                "d": "2024-03-01",
                "t_us": "01:02:03.000004",
                "ts": "2024-03-01T12:30:00Z",
                "uid": "A7F3B2C1-0000-4000-8000-000000000001",
                "blob": "deadbeef",
                "tags": ["a", "b"],
                "profile": {"pid": 5, "pname": "p"},
            },
            self.schema,
        )
        assert row["amount"] == Decimal("123.45")
        assert row["big_amount"] == Decimal("99.5000000000")
        assert row["d"] == dt.date(2024, 3, 1)
        assert row["t_us"] == 1 * 3_600_000_000 + 2 * 60_000_000 + 3_000_000 + 4
        assert row["ts"] == dt.datetime(2024, 3, 1, 12, 30)
        assert row["uid"] == "a7f3b2c1-0000-4000-8000-000000000001"  # canonical
        assert row["blob"] == b"\xde\xad\xbe\xef"
        assert row["profile"] == {"pid": 5, "pname": "p"}

    def test_epoch_micros_timestamp(self):
        row = convert_row({"id": 1, "ts": 1_709_294_400_000_000}, self.schema)
        assert row["ts"] == dt.datetime(2024, 3, 1, 12, 0)

    @pytest.mark.parametrize(
        "data",
        [
            {"id": 1, "nope": 2},  # unknown field
            {"id": None},  # null non-nullable
            {"id": 1, "small": 70000},  # int16 overflow
            {"id": 1.5},  # lossy float->int
            {"id": 1, "amount": "1234.56"},  # decimal(5,2) overflow
            {"id": 1, "uid": "not-a-uuid"},
            {"id": 1, "active": "yes"},
            {"id": 1, "tags": "notalist"},
        ],
    )
    def test_rejects(self, data):
        with pytest.raises(JsonConvertError):
            convert_row(data, self.schema)


USERS = [
    {"name": "id", "data_type": "int32", "nullable": False},
    {"name": "name", "data_type": "string"},
    {"name": "age", "data_type": "int32"},
]


class TestRestSink:
    def test_sync_requests_each_commit(self, spark, tmp_path):
        t = MoonlinkTable.create(
            spark, str(tmp_path / "t"), USERS, IdentityProp.single("id")
        )
        sink = RestSink(t)
        r1 = sink.ingest("insert", {"id": 1, "name": "a", "age": 10})
        assert r1.committed and r1.commit_lsn == r1.row_lsn + 1
        r2 = sink.ingest("upsert", {"id": 1, "name": "a2", "age": 11})
        r3 = sink.ingest("insert", {"id": 2, "name": "b", "age": 20})
        sink.ingest("delete", {"id": 2})
        # consecutive counter across requests (rest_source.rs:382-395)
        assert r2.row_lsn == r1.commit_lsn + 1
        got = {r["id"]: r["name"] for r in t.scan().collect()}
        assert got == {1: "a2"}
        # read at the LSN right after the first commit: only row 1 v1
        assert [r["name"] for r in t.scan(lsn=r1.commit_lsn).collect()] == ["a"]
        assert r3.version is not None

    def test_async_buffer_then_flush(self, spark, tmp_path):
        t = MoonlinkTable.create(
            spark, str(tmp_path / "t"), USERS, IdentityProp.single("id")
        )
        sink = RestSink(t)
        sink.ingest("insert", {"id": 1, "name": "a", "age": 1}, request_mode="async")
        sink.ingest("insert", {"id": 2, "name": "b", "age": 2}, request_mode="async")
        assert t.scan().count() == 0
        v = sink.flush()
        assert v is not None
        assert t.scan().count() == 2
        assert sink.flush() is None  # idempotent when clean


class TestCdcSink:
    def test_transaction_per_commit(self, spark, tmp_path):
        t = MoonlinkTable.create(
            spark, str(tmp_path / "t"), USERS, IdentityProp.single("id")
        )
        sink = CdcSink(t)
        stats = sink.apply(
            [
                CdcEvent.begin(),
                CdcEvent.insert({"id": 1, "name": "a", "age": 1}),
                CdcEvent.insert({"id": 2, "name": "b", "age": 2}),
                CdcEvent.commit(lsn=10),
                CdcEvent.begin(),
                CdcEvent.update(
                    {"id": 1, "name": "a", "age": 1}, {"id": 1, "name": "a2", "age": 5}
                ),
                CdcEvent.delete({"id": 2, "name": "b", "age": 2}),
                CdcEvent.commit(lsn=20),
            ]
        )
        assert stats.inserts == 2 and stats.updates == 1 and stats.deletes == 1
        assert {tuple(r) for r in t.scan().collect()} == {(1, "a2", 5)}
        assert t.scan(lsn=10).count() == 2  # pre-update state readable
        with pytest.raises(LsnError):
            sink.apply([CdcEvent.insert({"id": 9, "name": "z", "age": 0}),
                        CdcEvent.commit(lsn=20)])
        t._pending.clear()

    def test_streaming_xacts_interleaved(self, spark, tmp_path):
        t = MoonlinkTable.create(
            spark, str(tmp_path / "t"), USERS, IdentityProp.single("id")
        )
        sink = CdcSink(t)
        sink.apply(
            [
                CdcEvent.insert({"id": 1, "name": "base", "age": 0}),
                CdcEvent.commit(lsn=5),
                # two interleaved streaming transactions
                CdcEvent.insert({"id": 10, "name": "x1", "age": 1}, xact_id=100),
                CdcEvent.insert({"id": 20, "name": "x2", "age": 2}, xact_id=200),
                CdcEvent.insert({"id": 11, "name": "x1b", "age": 3}, xact_id=100),
                CdcEvent.stream_commit(xact_id=100, lsn=30),
                CdcEvent.stream_abort(xact_id=200),
            ]
        )
        ids = sorted(r["id"] for r in t.scan().collect())
        assert ids == [1, 10, 11]


class TestRestSinkForeignWriters:
    """Review r10: REST's LSN bookkeeping vs other writers of the same
    table (queue drains, streaming batches commit at far-higher LSNs)."""

    def _t(self, spark, tmp_path):
        return MoonlinkTable.create(
            spark, str(tmp_path / "t"), USERS, IdentityProp.single("id")
        )

    def test_acked_async_rows_survive_foreign_lsn(self, spark, tmp_path):
        t = self._t(spark, tmp_path)
        sink = RestSink(t)
        sink.ingest("insert", {"id": 1, "name": "a", "age": 1}, "async")
        # a foreign writer advances the table's LSN far past the counter
        t.append_rows([{"id": 99, "name": "f", "age": 9}])
        t.commit(lsn=1_000_000, operation="avro-queue")
        # crash before flush: a NEW sink must replay the acked request —
        # the old row_lsn <= table.last_lsn skip silently dropped it
        sink2 = RestSink(t)
        assert sink2.flush() is not None
        got = {r["id"] for r in t.scan().collect()}
        assert got == {1, 99}

    def test_sync_commit_clamps_past_foreign_lsn(self, spark, tmp_path):
        t = self._t(spark, tmp_path)
        sink = RestSink(t)
        sink.ingest("insert", {"id": 1, "name": "a", "age": 1})
        t.append_rows([{"id": 99, "name": "f", "age": 9}])
        t.commit(lsn=1_000_000, operation="stream-batch-0")
        # old code: LsnError (counter lsn <= 1e6) bricked REST ingest
        r = sink.ingest("insert", {"id": 2, "name": "b", "age": 2})
        assert r.committed
        assert {x["id"] for x in t.scan().collect()} == {1, 2, 99}
        # flush after foreign commits stays monotone too
        sink.ingest("insert", {"id": 3, "name": "c", "age": 3}, "async")
        t.append_rows([{"id": 98, "name": "g", "age": 8}])
        t.commit(lsn=2_000_000, operation="avro-queue")
        assert sink.flush() is not None
        assert {x["id"] for x in t.scan().collect()} == {1, 2, 3, 98, 99}

    def test_sync_commit_failure_retry_no_double_apply(self, spark, tmp_path):
        from unittest.mock import patch

        t = self._t(spark, tmp_path)
        sink = RestSink(t)
        with patch.object(
            MoonlinkTable, "commit", side_effect=RuntimeError("transient")
        ):
            with pytest.raises(RuntimeError):
                sink.ingest("insert", {"id": 1, "name": "a", "age": 1})
        # the failed request's staging was reverted: a client retry
        # must not double-apply the row
        r = sink.ingest("insert", {"id": 1, "name": "a", "age": 1})
        assert r.committed
        assert t.scan().count() == 1


class TestCdcSquashEquivalence:
    """Review r11: CdcSink squashes contiguous same-transaction DML per
    identity key. Property: the squashed sink's final table equals a
    naive per-event replay for random legal event streams — plain txns,
    streamed xacts with interleaved chunks, key-change updates,
    delete-then-reinsert, and updates of keys inserted in the same txn."""

    def _final_state(self, spark, tmp_path, name, events):
        t = MoonlinkTable.create(
            spark, str(tmp_path / name), USERS, IdentityProp.single("id")
        )
        CdcSink(t).apply(events)
        return {tuple(r) for r in t.scan().collect()}

    def _naive_state(self, events):
        """Pure-Python per-event replay of the same semantics: plain
        txns apply at commit; streamed xacts stage and apply at
        stream_commit; aborts drop staged state."""
        table: dict[int, tuple] = {}
        staged: dict[int, dict] = {}  # xact -> ordered ops

        def apply_op(state, ev):
            if ev.op == "insert":
                state[ev.row["id"]] = (
                    ev.row["id"], ev.row["name"], ev.row["age"])
            elif ev.op == "update":
                old = ev.old_row if ev.old_row is not None else ev.row
                state.pop(old["id"], None)
                state[ev.row["id"]] = (
                    ev.row["id"], ev.row["name"], ev.row["age"])
            elif ev.op == "delete":
                state.pop(ev.row["id"], None)

        pending = []
        for ev in events:
            if ev.op in ("insert", "update", "delete"):
                if ev.xact_id is None:
                    pending.append(ev)
                else:
                    staged.setdefault(ev.xact_id, []).append(ev)
            elif ev.op == "commit":
                for e in pending:
                    apply_op(table, e)
                pending = []
            elif ev.op == "stream_commit":
                for e in staged.pop(ev.xact_id, []):
                    apply_op(table, e)
            elif ev.op == "stream_abort":
                staged.pop(ev.xact_id, None)
        return set(table.values())

    def test_random_streams_match_naive_replay(self, spark, tmp_path):
        import random

        rng = random.Random(11)
        for case in range(4):
            events = []
            lsn = 0
            live_guess: set[int] = set()
            open_xid = None
            chunk = []
            for _ in range(rng.randint(30, 60)):
                op = rng.choice(
                    ["insert", "update", "delete", "commit", "stream"]
                )
                key = rng.randint(0, 15)
                row = {"id": key, "name": f"v{rng.randint(0, 99)}",
                       "age": rng.randint(0, 9)}
                xid = open_xid if (open_xid and rng.random() < 0.5) else None
                if op == "insert" and key not in live_guess:
                    events.append(CdcEvent.insert(row, xact_id=xid))
                    live_guess.add(key)
                elif op == "update" and key in live_guess:
                    new_key = rng.choice([key, rng.randint(16, 20)])
                    new = dict(row, id=new_key)
                    events.append(CdcEvent.update(
                        {"id": key, "name": "?", "age": 0}, new,
                        xact_id=xid))
                    live_guess.discard(key)
                    live_guess.add(new_key)
                elif op == "delete" and key in live_guess:
                    events.append(CdcEvent(
                        "delete", 0, {"id": key, "name": "?", "age": 0},
                        xact_id=xid))
                    live_guess.discard(key)
                elif op == "commit":
                    lsn += 10
                    if open_xid is not None:
                        events.append(
                            CdcEvent.stream_commit(open_xid, lsn))
                        open_xid = None
                    else:
                        events.append(CdcEvent.commit(lsn=lsn))
                elif op == "stream" and open_xid is None:
                    open_xid = 100 + case * 10 + rng.randint(0, 3)
            lsn += 10
            if open_xid is not None:
                events.append(CdcEvent.stream_commit(open_xid, lsn))
            else:
                events.append(CdcEvent.commit(lsn=lsn))
            got = self._final_state(spark, tmp_path, f"sq{case}", events)
            want = self._naive_state(events)
            assert got == want, (case, got ^ want)
