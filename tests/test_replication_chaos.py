"""Seeded randomized chaos at the replication-protocol level (parity:
the reference's seeded chaos tests, table_handler/chaos_test.rs, applied
to the connector): random transactions — inserts/updates/deletes, some as
streamed xacts, some aborted — serialized as pgoutput frames, fed to the
tailer through RANDOM byte-sized appends (every torn-frame boundary gets
exercised), with occasional tailer restarts from checkpoint. The table
must equal a naive Python replay of the committed transactions."""

import random
import struct

import pytest

from moonlink_spark.ingest.replication import ReplicationTailer
from moonlink_spark.table.identity import IdentityProp
from moonlink_spark.table.table import MoonlinkTable
from tests.test_pgoutput import (
    USERS_REL,
    begin,
    commit,
    delete,
    insert,
    stream_abort,
    stream_commit,
    stream_start,
    stream_stop,
    update,
)

FIELDS = [
    {"name": "id", "data_type": "int64", "nullable": False},
    {"name": "name", "data_type": "string"},
    {"name": "age", "data_type": "int32"},
]
REL = 16385


def frame(*payloads: bytes) -> bytes:
    return b"".join(struct.pack(">I", len(p)) + p for p in payloads)


def _gen_txn(rng: random.Random, lsn: int, model: dict, streamed: bool):
    """Generate one transaction's frames + the model effect if committed.
    The reference chaos invariant holds: deletes/updates only target rows
    that exist at generation time (committed model state)."""
    ops = []
    effects = []  # applied to model only on commit
    staged = dict(model)  # rows visible to later ops in this txn
    xid = rng.randrange(2, 1 << 20) if streamed else None
    n_ops = rng.randrange(1, 6)
    for _ in range(n_ops):
        choice = rng.random()
        if choice < 0.5 or not staged:
            rid = rng.randrange(0, 10_000)
            row = (rid, f"n{rng.randrange(100)}", rng.randrange(99))
            if rid in staged:  # keep it an insert of a fresh key
                continue
            ops.append(insert(REL, [str(row[0]), row[1], str(row[2])], xid=xid))
            staged[rid] = row[1:]
            effects.append(("put", rid, row[1:]))
        elif choice < 0.8:
            rid = rng.choice(sorted(staged))
            row = (rid, f"u{rng.randrange(100)}", rng.randrange(99))
            ops.append(update(REL, [str(row[0]), row[1], str(row[2])], xid=xid))
            staged[rid] = row[1:]
            effects.append(("put", rid, row[1:]))
        else:
            rid = rng.choice(sorted(staged))
            ops.append(delete(REL, [str(rid), None, None], xid=xid))
            del staged[rid]
            effects.append(("del", rid))

    if streamed:
        aborted = rng.random() < 0.3
        frames = [stream_start(xid), *ops, stream_stop()]
        if aborted:
            frames.append(stream_abort(xid))
            return frames, []
        frames.append(stream_commit(xid, lsn))
        return frames, effects
    return [begin(lsn), *ops, commit(lsn)], effects


@pytest.mark.parametrize("seed", [3, 77, 2024])
def test_replication_chaos(spark, tmp_path, seed):
    rng = random.Random(seed)
    t = MoonlinkTable.create(
        spark, str(tmp_path / f"rc{seed}"), FIELDS, IdentityProp.single("id")
    )
    trace = str(tmp_path / f"wal{seed}.bin")
    open(trace, "wb").close()
    tailer = ReplicationTailer(t, trace)

    model: dict[int, tuple] = {}
    pending = bytearray(frame(begin(1), USERS_REL, commit(1)))
    lsn = 10
    for _ in range(12):
        frames, effects = _gen_txn(rng, lsn, model, streamed=rng.random() < 0.4)
        pending += frame(*frames)
        for eff in effects:
            if eff[0] == "put":
                model[eff[1]] = eff[2]
            else:
                model.pop(eff[1], None)
        lsn += 10

        # append a RANDOM prefix of the pending bytes (torn frames), poll,
        # sometimes restart the tailer from its checkpoint
        cut = rng.randrange(0, len(pending) + 1)
        chunk, pending = pending[:cut], pending[cut:]
        with open(trace, "ab") as fh:
            fh.write(chunk)
        tailer.poll_once()
        if rng.random() < 0.3:
            tailer = ReplicationTailer(t, trace)  # checkpoint resume

    # flush the tail and drain
    with open(trace, "ab") as fh:
        fh.write(pending)
    tailer.poll_once()

    got = {r.id: (r.name, r.age) for r in t.scan().collect()}
    assert got == model, f"diverged from model (seed={seed})"
