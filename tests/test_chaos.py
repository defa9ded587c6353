"""Seeded randomized event-sequence tests against an in-memory model.

Parity with the reference chaos test strategy
(src/moonlink/src/table_handler/chaos_test.rs:1-7): random upsert / delete /
commit / xact streams with the invariants "deletes target committed rows" and
"LSN always increases"; after every commit the table must equal the model,
including historical read-at-LSN snapshots. Failures print the seed for
replay (chaos_replay.rs parity).
"""


import random

import pytest

from moonlink_spark.table.identity import IdentityProp
from moonlink_spark.table.table import MoonlinkTable

# full-lifecycle chaos/stress runs (10-70s each): excluded from the
# fast profile; the full run covers them (pytest -m "")
pytestmark = pytest.mark.slow

USERS = [
    {"name": "id", "data_type": "int32", "nullable": False},
    {"name": "name", "data_type": "string"},
    {"name": "age", "data_type": "int32"},
]


def _row(rng, key):
    return {"id": key, "name": f"n{rng.randrange(1000)}", "age": rng.randrange(100)}


@pytest.mark.parametrize(
    "seed,key_index",
    [(7, False), (42, False), (1337, False), (7, True), (1337, True)],
)
def test_chaos_key_identity(spark, tmp_path, seed, key_index):
    """key_index=True runs the same sequences with index-targeted deletes
    (keyindex.py); the model must be indistinguishable."""
    rng = random.Random(seed)
    t = MoonlinkTable.create(
        spark,
        str(tmp_path / f"chaos{seed}{'i' if key_index else ''}"),
        USERS,
        IdentityProp.single("id"),
        key_index=key_index,
    )
    committed: dict[int, tuple] = {}
    pending: dict[int, tuple | None] = {}  # None = delete
    snapshots: dict[int, dict[int, tuple]] = {}
    lsn = 0

    def current_keys():
        live = dict(committed)
        for k, v in pending.items():
            if v is None:
                live.pop(k, None)
            else:
                live[k] = v
        return live

    for _ in range(70):
        action = rng.choices(
            ["upsert", "delete", "commit"], weights=[5, 3, 2], k=1
        )[0]
        if action == "upsert":
            key = rng.randrange(40)
            row = _row(rng, key)
            t.upsert_rows([row])
            pending[key] = (row["id"], row["name"], row["age"])
        elif action == "delete":
            live = current_keys()
            if not live:
                continue
            # invariant: deletes target committed/appended rows only
            key = rng.choice(sorted(live))
            t.delete_rows([{"id": key}])
            pending[key] = None
        else:
            if not t.has_pending():
                continue
            lsn += rng.randrange(1, 5)  # LSN strictly increases
            t.commit(lsn=lsn)
            for k, v in pending.items():
                if v is None:
                    committed.pop(k, None)
                else:
                    committed[k] = v
            pending.clear()
            if rng.random() < 0.4:
                snapshots[lsn] = dict(committed)

    if t.has_pending():
        lsn += 1
        t.commit(lsn=lsn)
        for k, v in pending.items():
            if v is None:
                committed.pop(k, None)
            else:
                committed[k] = v

    got = {r["id"]: tuple(r) for r in t.scan().collect()}
    assert got == committed, f"final state diverged (seed={seed})"
    # historical reads must reproduce every recorded snapshot
    for snap_lsn, model in snapshots.items():
        got_hist = {r["id"]: tuple(r) for r in t.scan(lsn=snap_lsn).collect()}
        assert got_hist == model, f"read@{snap_lsn} diverged (seed={seed})"


@pytest.mark.parametrize("seed", [11, 99])
def test_chaos_full_row_multiset(spark, tmp_path, seed):
    """FullRow identity: the table is a multiset; each delete removes exactly
    one matching copy (mem_index.rs FullRow semantics)."""
    rng = random.Random(seed)
    t = MoonlinkTable.create(
        spark, str(tmp_path / f"chaosfr{seed}"), USERS, IdentityProp.full_row()
    )
    from collections import Counter

    committed: Counter = Counter()
    pending_ops: list[tuple[str, tuple]] = []
    lsn = 0
    # small value space to force duplicates
    rows = [(i, f"n{i % 3}", i % 4) for i in range(6)]

    def model_apply():
        nonlocal pending_ops
        for op, row in pending_ops:
            if op == "add":
                committed[row] += 1
            else:
                if committed[row] > 0:
                    committed[row] -= 1
        pending_ops = []

    for _ in range(50):
        action = rng.choices(["append", "delete", "commit"], weights=[5, 3, 2], k=1)[0]
        if action == "append":
            row = rng.choice(rows)
            t.append_rows([dict(zip(("id", "name", "age"), row))])
            pending_ops.append(("add", row))
        elif action == "delete":
            live = committed + Counter(
                r for op, r in pending_ops if op == "add"
            )
            live.subtract(Counter(r for op, r in pending_ops if op == "del"))
            live = +live
            if not live:
                continue
            row = rng.choice(sorted(live))
            t.delete_rows([dict(zip(("id", "name", "age"), row))])
            pending_ops.append(("del", row))
        else:
            if not t.has_pending():
                continue
            lsn += 1
            t.commit(lsn=lsn)
            model_apply()

    if t.has_pending():
        t.commit(lsn=lsn + 1)
        model_apply()

    got = Counter(tuple(r) for r in t.scan().collect())
    assert got == +committed, f"multiset diverged (seed={seed})"
