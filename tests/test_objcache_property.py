"""Property-based state machine test for the object-storage cache.

Random operation sequences (get / unreference / delete / import) are
checked against a pure-Python model of the reference's cache semantics
(``object_storage_cache.rs`` state machine). Invariants after every op:

- ``cur_bytes`` equals the sum of managed entry sizes,
- every pinned entry's refcount matches the model's,
- every pinned/evictable cache file exists on disk,
- files surfaced for deletion are surfaced exactly once,
- the byte budget holds whenever nothing is force-pinned above it.
"""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from moonlink_spark.table.fs import InMemoryObjectStore, ObjectStoreFS
from moonlink_spark.table.objcache import CacheFullError, ObjectStorageCache

N_FILES = 6
SIZES = [30, 50, 70, 90, 110, 130]  # per file id
BUDGET = 200


def _ops():
    fid = st.integers(min_value=0, max_value=N_FILES - 1)
    return st.lists(
        st.one_of(
            st.tuples(st.just("get"), fid),
            st.tuples(st.just("unref"), fid),
            st.tuples(st.just("delete"), fid),
            st.tuples(st.just("unref_delete"), fid),
        ),
        min_size=1,
        max_size=60,
    )


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_ops())
def test_cache_state_machine_against_model(tmp_path, ops):
    import tempfile

    cache_dir = tempfile.mkdtemp(prefix="objcache-prop-")
    store = InMemoryObjectStore()
    for i in range(N_FILES):
        store.put(f"f{i}.parquet", bytes([i]) * SIZES[i])
    remote = ObjectStoreFS(store)
    c = ObjectStorageCache(max_bytes=BUDGET, cache_directory=cache_dir)

    handles: dict[int, list] = {i: [] for i in range(N_FILES)}  # open pins
    model_refs: dict[int, int] = {}  # id -> refcount (pinned entries only)

    def surface(paths):
        for p in paths:
            # exactly-once per file GENERATION: cache filenames are
            # content-addressed (shared-dir adoption), so a refetch
            # after deletion legitimately recreates the same path. The
            # caller deletes every surfaced path, so a double-surface
            # without a re-creating fetch in between shows up as a
            # missing file right here.
            assert os.path.exists(p), f"{p} surfaced twice (not on disk)"
            os.unlink(p)

    for op, i in ops:
        key = f"f{i}.parquet"
        if op == "get":
            h, freed = c.get(key, key, remote)
            surface(freed)
            if h is not None:
                handles[i].append(h)
                model_refs[i] = model_refs.get(i, 0) + 1
        elif op == "unref" and handles[i]:
            h = handles[i].pop()
            surface(h.unreference())
            model_refs[i] -= 1
            if model_refs[i] == 0:
                del model_refs[i]
        elif op == "delete":
            surface(c.try_delete(key))
        elif op == "unref_delete" and handles[i]:
            h = handles[i].pop()
            surface(h.unreference_and_delete())
            model_refs[i] -= 1
            if model_refs[i] == 0:
                del model_refs[i]
            # remaining handles for i now reference a delete-marked entry;
            # drop our model's other pins too (their unrefs stay legal)

        # ---- invariants after every operation ----
        st_now = c.stats()
        # refcount parity for pinned entries the model tracks
        for j, refs in model_refs.items():
            assert c.ref_count(f"f{j}.parquet") == refs, (op, i, j)
        # byte accounting: cur_bytes == sum of managed entries
        with c._lock:
            managed = list(c._pinned.values()) + list(c._evictable.values())
            total = sum(e.entry.file_size for e in managed)
            assert st_now["cur_bytes"] == total
            # every managed file exists on disk
            for e in managed:
                assert os.path.exists(e.entry.cache_filepath)
        # budget holds unless pins alone exceed it (get returns None then,
        # so managed bytes can only exceed budget via pinned entries)
        if st_now["cur_bytes"] > BUDGET:
            with c._lock:
                pinned_bytes = sum(
                    e.entry.file_size for e in c._pinned.values()
                )
            assert pinned_bytes > BUDGET - min(SIZES)

    # drain: every handle unreferenced, then delete everything
    for i in range(N_FILES):
        for h in handles[i]:
            surface(h.unreference())
        surface(c.try_delete(f"f{i}.parquet"))
    assert c.stats()["cur_bytes"] == 0
    assert c.stats()["pinned"] == 0 and c.stats()["evictable"] == 0


@settings(max_examples=20, deadline=None)
@given(
    sizes=st.lists(
        st.integers(min_value=1, max_value=120), min_size=1, max_size=10
    )
)
def test_import_sequence_never_overcommits(sizes):
    import tempfile

    cache_dir = tempfile.mkdtemp(prefix="objcache-imp-")
    c = ObjectStorageCache(max_bytes=150, cache_directory=cache_dir)
    pinned_total = 0
    for k, size in enumerate(sizes):
        p = os.path.join(cache_dir, f"w{k}.parquet")
        with open(p, "wb") as fh:
            fh.write(b"x" * size)
        try:
            h, freed = c.import_entry(f"w{k}", p, file_size=size)
        except CacheFullError:
            # rejected: nothing managed under that id, bytes unchanged
            assert c.ref_count(f"w{k}") == 0
            assert pinned_total + size > 150  # only true overcommits fail
            continue
        pinned_total += size
        for q in freed:
            if os.path.exists(q):
                os.unlink(q)
        assert c.stats()["cur_bytes"] <= max(150, pinned_total)
