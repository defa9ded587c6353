"""Seeded randomized chaos harness with replayable failure dumps.

Parity with the reference's strongest test asset, the table-handler chaos
test (``src/moonlink/src/table_handler/chaos_test.rs``):

- a SEEDED random event-sequence generator over the full table surface —
  begin (streaming / non-streaming), append, delete, update, stream
  flush, stream abort, commit (with / without flush), read-snapshot,
  force-snapshot-to-Iceberg, index merge, data compaction, alter — with
  the same system invariants (``chaos_test.rs:1-7``): begin only after
  end, end only after begin, deletes target committed/appended rows, LSN
  always increases;
- every executed event is DUMPED to a JSONL artifact whose first line
  carries the table metadata needed to rebuild the run
  (``chaos_table_metadata.rs`` ReplayTableMetadata parity). Events carry
  their full data, so a failing sequence replays deterministically
  WITHOUT the generator or its RNG (``chaos_replay.rs`` parity; CLI:
  ``scripts/chaos_replay.py``);
- table variants mirror the reference's test matrix
  (``SpecialTableOption``, chaos_test.rs:746-754): ``none`` (key
  identity, streaming txns allowed), ``upsert`` (delete-if-exists +
  upsert, non-streaming only), ``append_only``;
- the control plane can run over the object-store seam with the
  deterministic ``ChaosPolicy`` fault injector (``table/fs.py``;
  accessor-wrapper chaos parity), so injected transient store failures
  ride under the same event stream and must be absorbed by the retry
  layer with no observable difference;
- force-snapshot validates the PERSISTED Iceberg table independently
  (DuckDB scan of the manifest-referenced parquet minus Puffin deletion
  vectors) against the in-memory model — the
  ``validate_persisted_iceberg_table`` check (``chaos_test.rs:982``).

Division of labor: the GENERATOR owns model mutation while choosing
events (like the reference, whose ``get_random_row_to_*`` mutate
ChaosState); the RUNNER owns table operations and read validation; for
replay, ``apply_to_model`` re-derives the model transitions from the
recorded events. Reads validate ROW IDS (the reference's
``check_read_snapshot`` contract); the final check validates full row
content.
"""

from __future__ import annotations

import json
import os
import random
from typing import Any

from moonlink_spark.table.identity import IdentityProp
from moonlink_spark.table.table import MoonlinkTable

FIELDS = [
    {"name": "id", "data_type": "int32", "nullable": False},
    {"name": "name", "data_type": "string"},
    {"name": "age", "data_type": "int32"},
]

#: parity NON_UPDATE_COMMAND_INTERVAL_LSN (chaos_test.rs:44)
NON_UPDATE_COMMAND_INTERVAL_LSN = 5


def _row(next_id: int) -> dict[str, Any]:
    """parity create_row (chaos_test.rs:80-86)."""
    return {"id": next_id, "name": "user", "age": next_id % 5}


class ChaosFailure(AssertionError):
    """A chaos invariant broke; ``dump_path`` replays the sequence."""

    def __init__(self, msg: str, dump_path: str | None):
        super().__init__(msg)
        self.dump_path = dump_path


class ChaosModel:
    """The in-memory expected state (ChaosState's table-tracking half,
    chaos_test.rs:173-331)."""

    def __init__(self) -> None:
        self.committed: dict[int, dict[str, Any]] = {}
        self.uncommitted_inserted: dict[int, dict[str, Any]] = {}
        self.uncommitted_updated: dict[int, dict[str, Any]] = {}
        self.deleted_committed: set[int] = set()
        self.deleted_uncommitted: set[int] = set()
        self.txn: str = "empty"  # empty | normal | stream
        self.next_id = 0
        self.cur_lsn = 1  # commits need lsn >= 1
        self.cur_xact_id = 0
        self.last_commit_lsn: int | None = None
        self.last_txn_committed = False
        self.snapshots: dict[int, list[int]] = {}  # commit lsn -> live ids

    def assert_txn_empty(self) -> None:
        """parity assert_txn_begin_precondition (chaos_test.rs:257-263)."""
        assert self.txn == "empty"
        assert not self.uncommitted_inserted
        assert not self.uncommitted_updated
        assert not self.deleted_committed
        assert not self.deleted_uncommitted

    def clear_txn_buffers(self) -> None:
        self.uncommitted_inserted.clear()
        self.uncommitted_updated.clear()
        self.deleted_committed.clear()
        self.deleted_uncommitted.clear()

    def begin_txn(self, mode: str) -> None:
        self.assert_txn_empty()
        self.txn = mode

    def insert(self, row: dict[str, Any]) -> None:
        self.uncommitted_inserted[row["id"]] = row
        self.next_id = max(self.next_id, row["id"] + 1)

    def commit_txn(self, lsn: int) -> None:
        """parity commit_transaction (chaos_test.rs:285-306)."""
        if self.txn == "stream":
            self.cur_xact_id += 1
        assert self.txn != "empty"
        self.txn = "empty"
        self.last_commit_lsn = lsn
        self.last_txn_committed = True
        self.committed.update(self.uncommitted_inserted)
        for rid, row in self.uncommitted_updated.items():
            if rid in self.committed:
                self.committed[rid] = row
        for rid in self.deleted_committed | self.deleted_uncommitted:
            self.committed.pop(rid, None)
        self.clear_txn_buffers()
        self.snapshots[lsn] = self.valid_ids()
        self.cur_lsn = max(self.cur_lsn, lsn + 1)

    def abort_txn(self) -> None:
        assert self.txn == "stream"
        self.txn = "empty"
        self.cur_xact_id += 1
        self.last_txn_committed = False
        self.clear_txn_buffers()

    def valid_ids(self) -> list[int]:
        return sorted(self.committed)

    def take_lsn(self) -> int:
        lsn = self.cur_lsn
        self.cur_lsn += 1
        return lsn


def apply_to_model(m: ChaosModel, ev: dict) -> None:
    """Replay-side model transition: re-derive the generator's model
    mutations from the recorded event (the dump carries all data, so no
    RNG is needed — chaos_replay.rs parity)."""
    kind = ev["kind"]
    if kind in ("begin_stream", "begin_normal"):
        m.begin_txn("stream" if kind == "begin_stream" else "normal")
        m.insert(ev["row"])
    elif kind == "append":
        m.insert(ev["row"])
    elif kind == "delete":
        rid = ev["row"]["id"]
        if ev["target"] == "committed":
            m.deleted_committed.add(rid)
        elif ev["target"] == "uncommitted":
            m.deleted_uncommitted.add(rid)
        # "missing": delete-if-exists of an absent row — no model change
    elif kind == "update":
        if ev.get("fresh"):
            m.insert(ev["row"])
        else:
            m.uncommitted_updated[ev["row"]["id"]] = ev["row"]
    elif kind == "stream_abort":
        m.abort_txn()
    elif kind in ("commit_flush", "commit_no_flush"):
        m.commit_txn(ev["lsn"])
    # read_snapshot / force_snapshot / index_merge / compaction / alter:
    # no model transition (alter's extra columns are runner state)


class ChaosGenerator:
    """Seeded event generation (ChaosState's RNG half,
    chaos_test.rs:603-733). Mutates the shared model as it picks — every
    emitted event carries its full data for RNG-free replay."""

    def __init__(
        self,
        model: ChaosModel,
        seed: int,
        table_option: str = "none",
        maintenance: bool = True,
        with_alter: bool = False,
    ):
        assert table_option in ("none", "upsert", "append_only")
        self.m = model
        self.rng = random.Random(seed)
        self.table_option = table_option
        self.maintenance = maintenance
        self.with_alter = with_alter
        self.altered = 0
        # parity NonTableUpdateCmdCall interval tracking
        self._last_read = 0
        self._last_force = 0
        self._last_index_merge = 0
        self._last_compaction = 0

    # -- capability checks (chaos_test.rs:354-432) -------------------------

    def _can_append(self) -> bool:
        return self.table_option != "upsert"

    def _updated_undeleted(self) -> bool:
        m = self.m
        return any(
            rid not in m.deleted_uncommitted and rid not in m.deleted_committed
            for rid in m.uncommitted_updated
        )

    def _can_delete(self) -> bool:
        m = self.m
        if self.table_option == "append_only":
            return False
        if len(m.committed) > len(
            m.deleted_committed | set(m.uncommitted_updated)
        ):
            return True
        if m.txn == "stream":
            if len(m.uncommitted_inserted) > len(m.deleted_uncommitted):
                return True
            if self._updated_undeleted():
                return True
        return False

    def _can_update(self) -> bool:
        m = self.m
        if self.table_option == "append_only":
            return False
        if len(m.committed) > (
            len(m.uncommitted_updated)
            + len(m.deleted_committed)
            + len(m.deleted_uncommitted)
        ):
            return True
        if m.txn == "stream":
            if self._updated_undeleted():
                return True
            if len(m.uncommitted_inserted) > len(m.deleted_uncommitted):
                return True
        return False

    # -- row pickers (chaos_test.rs:435-560) -------------------------------

    def _pick_delete(self) -> dict | None:
        m = self.m
        if (
            self.table_option == "upsert"
            and m.txn != "stream"
            and self.rng.randrange(100) < 50
        ):
            # delete a non-existing row (delete-if-exists semantics,
            # chaos_test.rs:437-445)
            row = _row(m.next_id)
            m.next_id += 1
            return {"kind": "delete", "row": row, "target": "missing"}
        cands: list[tuple[int, dict, bool]] = [
            (rid, row, True)
            for rid, row in sorted(m.committed.items())
            if rid not in m.deleted_committed and rid not in m.uncommitted_updated
        ]
        if m.txn == "stream":
            cands.extend(
                (rid, row, False)
                for rid, row in sorted(m.uncommitted_inserted.items())
                if rid not in m.deleted_uncommitted
            )
            cands.extend(
                (rid, row, rid not in m.uncommitted_inserted)
                for rid, row in sorted(m.uncommitted_updated.items())
                if rid not in m.deleted_uncommitted
                and rid not in m.deleted_committed
            )
        if not cands:
            return None
        rid, row, is_committed = cands[self.rng.randrange(len(cands))]
        if is_committed:
            m.deleted_committed.add(rid)
        else:
            m.deleted_uncommitted.add(rid)
        return {
            "kind": "delete",
            "row": row,
            "target": "committed" if is_committed else "uncommitted",
        }

    def _pick_update(self) -> dict | None:
        m = self.m
        if self.table_option == "upsert" and self.rng.randrange(100) < 50:
            # upsert a brand-new row (chaos_test.rs:501-508)
            row = _row(m.next_id)
            m.insert(row)
            return {"kind": "update", "row": row, "fresh": True}
        cands: list[tuple[int, dict]] = [
            (rid, row)
            for rid, row in sorted(m.committed.items())
            if rid not in m.uncommitted_updated
            and rid not in m.deleted_committed
            and rid not in m.deleted_uncommitted
        ]
        if m.txn == "stream":
            cands.extend(
                (rid, row)
                for rid, row in sorted(m.uncommitted_updated.items())
                if rid not in m.deleted_uncommitted
                and rid not in m.deleted_committed
            )
            cands.extend(
                (rid, row)
                for rid, row in sorted(m.uncommitted_inserted.items())
                if rid not in m.deleted_uncommitted
                and rid not in m.uncommitted_updated
            )
        if not cands:
            return None
        rid, row = cands[self.rng.randrange(len(cands))]
        m.uncommitted_updated[rid] = row
        return {"kind": "update", "row": row, "fresh": False}

    # -- event generation --------------------------------------------------

    def next_event(self) -> dict:
        m = self.m
        choices: list[str] = []
        if (
            m.last_commit_lsn is not None
            and m.cur_lsn - self._last_read >= NON_UPDATE_COMMAND_INTERVAL_LSN
        ):
            choices.append("read_snapshot")
        if (
            m.last_commit_lsn is not None
            and not m.uncommitted_inserted
            and m.last_txn_committed
            and m.txn == "empty"
        ):
            if m.cur_lsn - self._last_force >= NON_UPDATE_COMMAND_INTERVAL_LSN:
                choices.append("force_snapshot")
            if self.maintenance:
                if (
                    m.cur_lsn - self._last_index_merge
                    >= NON_UPDATE_COMMAND_INTERVAL_LSN
                ):
                    choices.append("index_merge")
                if (
                    m.cur_lsn - self._last_compaction
                    >= NON_UPDATE_COMMAND_INTERVAL_LSN
                ):
                    choices.append("compaction")
            if self.with_alter and self.altered < 2:
                choices.append("alter")
        if m.txn == "empty":
            if self.table_option != "upsert":
                # upsert tables don't stream (chaos_test.rs:609-611)
                choices.append("begin_stream")
            choices.append("begin_normal")
        else:
            if self._can_append():
                choices.append("append")
            if self._can_delete():
                choices.append("delete")
            if self._can_update():
                choices.append("update")
            if m.txn == "stream":
                choices.append("stream_flush")
                choices.append("stream_abort")
            choices.append("commit_flush")
            choices.append("commit_no_flush")
        assert choices
        kind = choices[self.rng.randrange(len(choices))]

        if kind == "read_snapshot":
            self._last_read = m.cur_lsn
            return {"kind": "read_snapshot", "lsn": m.last_commit_lsn}
        if kind == "force_snapshot":
            self._last_force = m.cur_lsn
            return {"kind": "force_snapshot", "lsn": m.last_commit_lsn}
        if kind == "index_merge":
            self._last_index_merge = m.cur_lsn
            return {"kind": "index_merge"}
        if kind == "compaction":
            self._last_compaction = m.cur_lsn
            return {"kind": "compaction"}
        if kind == "alter":
            self.altered += 1
            return {
                "kind": "alter",
                "add": {"name": f"extra{self.altered}", "data_type": "string"},
            }
        if kind in ("begin_stream", "begin_normal"):
            m.begin_txn("stream" if kind == "begin_stream" else "normal")
            row = _row(m.next_id)
            m.insert(row)
            ev: dict[str, Any] = {"kind": kind, "row": row}
            if kind == "begin_stream":
                ev["xact_id"] = m.cur_xact_id
            return ev
        if kind == "append":
            row = _row(m.next_id)
            m.insert(row)
            return {"kind": "append", "row": row}
        if kind == "delete":
            picked = self._pick_delete()
            if picked is not None:
                return picked
            kind = "commit_no_flush"
        if kind == "update":
            picked = self._pick_update()
            if picked is not None:
                return picked
            kind = "commit_no_flush"
        if kind == "stream_flush":
            return {"kind": "stream_flush"}
        if kind == "stream_abort":
            xid = m.cur_xact_id
            m.abort_txn()
            return {"kind": "stream_abort", "xact_id": xid}
        # commit_flush / commit_no_flush
        lsn = m.take_lsn()
        ev = {"kind": kind, "lsn": lsn}
        if m.txn == "stream":
            ev["xact_id"] = m.cur_xact_id
        m.commit_txn(lsn)
        return ev


class ChaosRunner:
    """Executes chaos events against a real MoonlinkTable and validates
    reads against the model. Pure table-side: model transitions happen in
    the generator (live runs) or ``apply_to_model`` (replay)."""

    def __init__(
        self,
        spark,
        table_path: str,
        meta: dict[str, Any],
        model: ChaosModel,
        data_path: str | None = None,
    ):
        self.spark = spark
        self.meta = meta
        option = meta["table_option"]
        ident = (
            IdentityProp.none()
            if option == "append_only"
            else IdentityProp.single("id")
        )
        self.option = option
        self.table = MoonlinkTable.create(
            spark,
            table_path,
            [dict(f) for f in meta["schema"]],
            ident,
            key_index=bool(meta.get("key_index")),
            data_path=data_path,
        )
        self.model = model
        self.extra_cols: list[str] = []
        self._xact = None
        self.iceberg_dest = meta.get("iceberg_dest")
        self.validated_reads = 0
        self.validated_snapshots = 0

    def execute(self, ev: dict) -> None:
        m = self.model
        kind = ev["kind"]
        if kind in ("begin_stream", "begin_normal"):
            if kind == "begin_stream":
                self._xact = self.table.begin_transaction(ev["xact_id"])
            self._append(ev["row"])
        elif kind == "append":
            self._append(ev["row"])
        elif kind == "delete":
            self._delete(ev)
        elif kind == "update":
            self._update(ev)
        elif kind == "stream_flush":
            self._xact.flush()
        elif kind == "stream_abort":
            self._xact.abort()
            self._xact = None
        elif kind in ("commit_flush", "commit_no_flush"):
            if self._xact is not None:
                self._xact.commit(lsn=ev["lsn"])
                self._xact = None
            else:
                self.table.commit(lsn=ev["lsn"])
        elif kind == "read_snapshot":
            self._check_read(ev["lsn"])
        elif kind == "index_merge":
            from moonlink_spark.table import keyindex

            if keyindex.enabled(self.table.manifest):
                keyindex.merge_index(self.table)
            self._check_read(m.last_commit_lsn)
        elif kind == "compaction":
            from moonlink_spark.table.maintenance import optimize

            optimize(self.table)
            self._check_read(m.last_commit_lsn)
        elif kind == "force_snapshot":
            self._force_snapshot(ev["lsn"])
        elif kind == "alter":
            self.table.alter(add_columns=[dict(ev["add"])], lsn=m.take_lsn())
            self.extra_cols.append(ev["add"]["name"])
        else:
            raise ValueError(f"unknown chaos event kind {kind!r}")

    def _full(self, row: dict) -> dict:
        return {**row, **{c: None for c in self.extra_cols}}

    def _append(self, row: dict) -> None:
        if self._xact is not None:
            self._xact.append_rows([self._full(row)])
        else:
            self.table.append_rows([self._full(row)])

    def _delete(self, ev: dict) -> None:
        key = {"id": ev["row"]["id"]}
        if self._xact is not None:
            self._xact.delete_rows([key])
        elif self.option == "upsert":
            self.table.delete_rows([key], if_exists=True)
        else:
            # strict delete: the model guarantees the target exists, so a
            # raise here IS an invariant failure
            self.table.delete_rows([key], if_exists=False)

    def _update(self, ev: dict) -> None:
        row = ev["row"]
        full = self._full(row)
        if ev.get("fresh"):
            self.table.upsert_rows([full])
        elif self._xact is not None:
            # reference Update = Delete + Append of the same row content
            # (chaos_test.rs:679-696)
            self._xact.delete_rows([{"id": row["id"]}])
            self._xact.append_rows([full])
        elif self.option == "upsert":
            self.table.upsert_rows([full])
        else:
            self.table.update_rows([{"id": row["id"]}], [full])

    # -- validation (check_read_snapshot parity) ---------------------------

    def _check_read(self, lsn: int | None) -> None:
        if lsn is None:
            return
        expect = self.model.snapshots.get(lsn)
        if expect is None:
            expect = self.model.valid_ids()
        got = sorted(
            r["id"] for r in self.table.scan(lsn=lsn).select("id").collect()
        )
        assert got == expect, (
            f"read@{lsn}: got {len(got)} ids, expected {len(expect)}; "
            f"extra={sorted(set(got) - set(expect))[:5]} "
            f"missing={sorted(set(expect) - set(got))[:5]}"
        )
        self.validated_reads += 1

    def _force_snapshot(self, lsn: int | None) -> None:
        """Export to Iceberg and validate the PERSISTED table independently
        (validate_persisted_iceberg_table parity, chaos_test.rs:982): a
        DuckDB scan of the snapshot's live parquet minus its Puffin DVs
        must equal the model's ids at that LSN."""
        if lsn is None or self.iceberg_dest is None:
            return self._check_read(lsn)
        import duckdb

        from moonlink_spark.table.iceberg_export import (
            export_iceberg,
            read_iceberg_deletion_vectors,
            read_iceberg_live_files,
        )

        export_iceberg(self.table, self.iceberg_dest)
        files = read_iceberg_live_files(self.iceberg_dest)
        expect = self.model.snapshots.get(lsn, self.model.valid_ids())
        if not files:
            assert expect == [], f"iceberg@{lsn}: no files but expected {expect}"
            return
        dvs = read_iceberg_deletion_vectors(self.iceberg_dest)
        dead = {(f, p) for f, ps in dvs.items() for p in ps}
        con = duckdb.connect()
        quoted = ", ".join(f"'{p}'" for p in files)
        rows = con.sql(
            f"SELECT id, filename, file_row_number "
            f"FROM read_parquet([{quoted}], filename=true, "
            f"file_row_number=true)"
        ).fetchall()
        con.close()
        got = sorted(i for i, fn, rn in rows if (fn, rn) not in dead)
        assert got == expect, (
            f"iceberg@{lsn}: persisted ids diverge from model "
            f"(got {len(got)}, expected {len(expect)})"
        )
        self.validated_snapshots += 1

    def final_check(self) -> None:
        """Full-content equality at the end (stronger than the per-read id
        check): every committed row must round-trip exactly."""
        base_cols = [f["name"] for f in FIELDS]
        got = {
            r["id"]: {c: r[c] for c in base_cols}
            for r in self.table.scan().collect()
        }
        assert got == self.model.committed, (
            f"final state diverged: {len(got)} table rows vs "
            f"{len(self.model.committed)} model rows"
        )


def run_chaos(
    spark,
    workdir: str,
    seed: int,
    n_events: int = 100,
    table_option: str = "none",
    key_index: bool = False,
    chaos_every: int = 0,
    with_iceberg: bool = True,
    with_alter: bool = False,
    dump_path: str | None = None,
    transport: str = "local",
) -> dict[str, Any]:
    """Run one seeded chaos sequence. Returns a summary dict; on invariant
    failure raises ChaosFailure pointing at the replayable dump.

    ``chaos_every`` > 0 puts the table's control plane (manifests, WAL)
    on an in-memory object store that injects one TransientStoreError
    every N accessor calls — the accessor's retry layer must absorb every
    injection without any observable difference.

    ``transport`` selects where the control plane lives: ``"local"``
    (plain directory, or the in-memory store when ``chaos_every`` is
    set), ``"s3"`` (an in-process S3 REST endpoint with SigV4-signed
    requests and 503-SlowDown throttling every ``chaos_every`` calls),
    or ``"gcs"`` (the GCS JSON API endpoint, bearer-authenticated, with
    429 throttling) — the chaos_test.rs scenario spread replayed over
    every wire transport. Dumps stay transport-independent: a dump
    recorded over s3/gcs replays on a local directory."""
    os.makedirs(workdir, exist_ok=True)
    meta = {
        "seed": seed,
        "n_events": n_events,
        "table_option": table_option,
        "key_index": key_index,
        "chaos_every": chaos_every,
        "schema": FIELDS,
        "iceberg_dest": (
            os.path.join(workdir, "iceberg") if with_iceberg else None
        ),
    }
    if dump_path is None:
        dump_path = os.path.join(workdir, f"chaos_dump_{seed}.jsonl")

    data_path = None
    table_path = os.path.join(workdir, "table")
    chaos_policy = None
    wire_server = None
    if transport == "s3":
        from moonlink_spark.table.fs import register_fs_scheme
        from moonlink_spark.table.s3 import S3HttpFS, S3MemServer

        wire_server = S3MemServer(
            throttle_every=chaos_every, credentials={"chaos-ak": "chaos-sk"}
        ).start()
        scheme = f"s3c{seed}x{os.getpid() % 10_000}"
        register_fs_scheme(
            scheme,
            lambda path, _e=wire_server.endpoint: S3HttpFS(
                _e, retries=8, access_key="chaos-ak", secret_key="chaos-sk"
            ),
        )
        table_path = f"{scheme}://bucket/table"
        data_path = os.path.join(workdir, "data")
    elif transport == "gcs":
        from moonlink_spark.table.fs import register_fs_scheme
        from moonlink_spark.table.gcs import GCSHttpFS, GCSMemServer

        wire_server = GCSMemServer(
            throttle_every=chaos_every, valid_tokens={"chaos-token"}
        ).start()
        scheme = f"gcsc{seed}x{os.getpid() % 10_000}"
        register_fs_scheme(
            scheme,
            lambda path, _e=wire_server.endpoint: GCSHttpFS(
                _e, retries=8, token="chaos-token"
            ),
        )
        table_path = f"{scheme}://bucket/table"
        data_path = os.path.join(workdir, "data")
    elif transport != "local":
        raise ValueError(f"unknown transport {transport!r} (local|s3|gcs)")
    if chaos_every and transport == "local":
        from moonlink_spark.table.fs import (
            ChaosPolicy,
            InMemoryObjectStore,
            ObjectStoreFS,
            register_fs_scheme,
        )

        store = InMemoryObjectStore()
        chaos_policy = ChaosPolicy(fail_every=chaos_every)
        scheme = f"chaos{seed}x{os.getpid() % 10_000}"
        register_fs_scheme(
            scheme,
            lambda path, _s=store, _c=chaos_policy: ObjectStoreFS(
                _s, chaos=_c, retries=6
            ),
        )
        table_path = f"{scheme}://bucket/table"
        data_path = os.path.join(workdir, "data")

    model = ChaosModel()
    runner = ChaosRunner(spark, table_path, meta, model, data_path=data_path)
    gen = ChaosGenerator(
        model, seed, table_option, with_alter=with_alter
    )

    try:
        return _drive(
            dump_path, meta, model, runner, gen, n_events, seed,
            table_option, chaos_policy, wire_server,
        )
    finally:
        if wire_server is not None:
            wire_server.stop()


def _drive(
    dump_path, meta, model, runner, gen, n_events, seed, table_option,
    chaos_policy, wire_server,
) -> dict[str, Any]:
    executed = 0
    with open(dump_path, "w") as dump:
        dump.write(json.dumps({"meta": meta}) + "\n")
        try:
            for _ in range(n_events):
                ev = gen.next_event()
                dump.write(json.dumps(ev) + "\n")
                dump.flush()
                runner.execute(ev)
                executed += 1
            if model.txn != "empty":
                # drain: close the trailing transaction so the final check
                # compares fully-committed state
                ev = {"kind": "commit_flush", "lsn": model.cur_lsn}
                if model.txn == "stream":
                    ev["xact_id"] = model.cur_xact_id
                lsn = model.take_lsn()
                assert lsn == ev["lsn"]
                dump.write(json.dumps(ev) + "\n")
                dump.flush()
                model.commit_txn(lsn)
                runner.execute(ev)
                executed += 1
            runner.final_check()
        except Exception as exc:  # noqa: BLE001 — record, mark, re-raise
            dump.write(
                json.dumps(
                    {"kind": "__failure__", "index": executed, "error": str(exc)}
                )
                + "\n"
            )
            raise ChaosFailure(
                f"chaos seed {seed} ({table_option}) failed at event "
                f"{executed}: {exc}; replay: scripts/chaos_replay.py "
                f"{dump_path}",
                dump_path,
            ) from exc
    return {
        "seed": seed,
        "executed": executed,
        "final_rows": len(model.committed),
        "validated_reads": runner.validated_reads,
        "validated_iceberg_snapshots": runner.validated_snapshots,
        "chaos_injected": chaos_policy.injected if chaos_policy else 0,
        "transport_throttled": (
            wire_server.throttled if wire_server is not None else 0
        ),
        "dump_path": dump_path,
    }


def replay(spark, dump_path: str, workdir: str) -> dict[str, Any]:
    """Re-execute a chaos dump deterministically (chaos_replay.rs parity):
    rebuild the table per the dump's metadata, feed every recorded event
    through the same executor with the same validations. A dump from a
    failing run raises the same invariant failure."""
    os.makedirs(workdir, exist_ok=True)
    with open(dump_path) as fh:
        lines = [json.loads(ln) for ln in fh if ln.strip()]
    meta = dict(lines[0]["meta"])
    if meta.get("iceberg_dest"):
        meta["iceberg_dest"] = os.path.join(workdir, "iceberg")
    model = ChaosModel()
    runner = ChaosRunner(
        spark, os.path.join(workdir, "table"), meta, model, data_path=None
    )
    executed = 0
    for ev in lines[1:]:
        if ev.get("kind") == "__failure__":
            break
        apply_to_model(model, ev)
        runner.execute(ev)
        executed += 1
    runner.final_check()
    return {
        "executed": executed,
        "final_rows": len(model.committed),
        "validated_reads": runner.validated_reads,
        "validated_iceberg_snapshots": runner.validated_snapshots,
    }
