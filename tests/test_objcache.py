"""Object-storage + metadata cache state machine.

Mirrors the reference's cache test matrix
(``src/moonlink/src/storage/cache/object_storage/state_tests.rs``,
``local_file_optimization_state_tests.rs``,
``cache/metadata/moka_cache_test.rs``): pin/unpin transitions, byte-budget
eviction in LRU order, delete-while-pinned markers, read-through fetch
exactly-once, write-through import, local-filesystem optimization, and the
LRU+TTL metadata cache.
"""

from __future__ import annotations

import os
import threading

import pytest

from moonlink_spark.table.fs import InMemoryObjectStore, ObjectStoreFS
from moonlink_spark.table.objcache import (
    CachedFS,
    CacheFullError,
    MetadataCache,
    ObjectStorageCache,
)


class CountingAccessor:
    """Accessor proxy that counts remote reads (the IO the cache saves)."""

    def __init__(self, inner):
        self.inner = inner
        self.reads = 0

    def open_read_binary(self, path):
        self.reads += 1
        return self.inner.open_read_binary(path)

    def __getattr__(self, name):
        return getattr(self.inner, name)


def make_remote(objs: dict[str, bytes]):
    store = InMemoryObjectStore()
    fs = ObjectStoreFS(store)
    for k, v in objs.items():
        store.put(k, v)
    return CountingAccessor(fs)


# -- read-through -------------------------------------------------------------


def test_read_through_fetches_once_then_hits(tmp_path):
    # state_tests.rs:76 test_cache_1_requested_to_read
    remote = make_remote({"t/a.parquet": b"A" * 100})
    c = ObjectStorageCache(max_bytes=1000, cache_directory=str(tmp_path))
    h1, ev = c.get("t/a.parquet", "t/a.parquet", remote)
    assert h1 is not None and ev == []
    assert remote.reads == 1
    assert open(h1.cache_filepath, "rb").read() == b"A" * 100
    # second get while pinned: refcount bump, zero IO
    h2, _ = c.get("t/a.parquet", "t/a.parquet", remote)
    assert remote.reads == 1
    assert c.ref_count("t/a.parquet") == 2
    h1.unreference()
    h2.unreference()
    # unpinned -> evictable; a re-get still serves from disk, no IO
    h3, _ = c.get("t/a.parquet", "t/a.parquet", remote)
    assert remote.reads == 1
    h3.unreference()
    assert c.stats()["hits"] == 2 and c.stats()["misses"] == 1


def test_eviction_lru_order_and_budget(tmp_path):
    # state_tests.rs:109/160: eviction happens oldest-unpinned-first and
    # only down to the budget
    remote = make_remote(
        {f"t/{i}.parquet": bytes([i]) * 100 for i in range(5)}
    )
    c = ObjectStorageCache(max_bytes=250, cache_directory=str(tmp_path))
    paths = {}
    for i in range(3):  # 300 bytes total -> evicts file 0 on insert of 2
        h, ev = c.get(f"t/{i}.parquet", f"t/{i}.parquet", remote)
        paths[i] = h.cache_filepath
        h.unreference()
        for p in ev:
            os.unlink(p)
    st = c.stats()
    assert st["cur_bytes"] == 200 and st["evictions"] == 1
    # file 0 (LRU) was evicted: next get re-fetches
    before = remote.reads
    h, _ = c.get("t/0.parquet", "t/0.parquet", remote)
    assert remote.reads == before + 1
    h.unreference()


def test_get_returns_none_when_pinned_fills_budget(tmp_path):
    # state_tests.rs:275 new_entry_with_insufficient_space: everything
    # pinned -> the newcomer can't fit, handle is None, bytes roll back
    remote = make_remote({"a.parquet": b"x" * 200, "b.parquet": b"y" * 200})
    c = ObjectStorageCache(max_bytes=250, cache_directory=str(tmp_path))
    ha, _ = c.get("a.parquet", "a.parquet", remote)  # pinned, 200B
    hb, to_delete = c.get("b.parquet", "b.parquet", remote)
    assert hb is None
    assert c.stats()["cur_bytes"] == 200  # rollback
    # the fetched-but-unusable copy is surfaced for deletion
    assert len(to_delete) == 1 and not os.path.exists(to_delete[0]) is False
    for p in to_delete:
        os.unlink(p)
    ha.unreference()
    # once a is unpinned, b fits (a evicted)
    hb2, ev = c.get("b.parquet", "b.parquet", remote)
    assert hb2 is not None
    assert len(ev) == 1  # a's cache file freed
    hb2.unreference()


def test_unpin_still_referenced_stays_pinned(tmp_path):
    # state_tests.rs:336 unpin_still_referenced
    remote = make_remote({"a.parquet": b"x" * 10})
    c = ObjectStorageCache(max_bytes=100, cache_directory=str(tmp_path))
    h1, _ = c.get("a.parquet", "a.parquet", remote)
    h2, _ = c.get("a.parquet", "a.parquet", remote)
    assert h1.unreference() == []
    assert c.ref_count("a.parquet") == 1  # still pinned via h2
    assert c.stats()["pinned"] == 1 and c.stats()["evictable"] == 0
    h2.unreference()
    assert c.stats()["pinned"] == 0 and c.stats()["evictable"] == 1


def test_delete_while_pinned_defers_until_last_unref(tmp_path):
    # state_tests.rs:446/490 requested_to_delete while referenced
    remote = make_remote({"a.parquet": b"x" * 10})
    c = ObjectStorageCache(max_bytes=100, cache_directory=str(tmp_path))
    h, _ = c.get("a.parquet", "a.parquet", remote)
    local = h.cache_filepath
    assert c.try_delete("a.parquet") == []  # marker only: still pinned
    assert os.path.exists(local)
    freed = h.unreference()  # last pin drops -> file surfaced
    assert freed == [local]
    os.unlink(local)
    assert c.stats()["pinned"] == 0 and c.stats()["evictable"] == 0
    assert c.stats()["cur_bytes"] == 0


def test_delete_evictable_is_immediate_and_handle_delete(tmp_path):
    remote = make_remote({"a.parquet": b"x" * 10, "b.parquet": b"y" * 10})
    c = ObjectStorageCache(max_bytes=100, cache_directory=str(tmp_path))
    h, _ = c.get("a.parquet", "a.parquet", remote)
    h.unreference()
    freed = c.try_delete("a.parquet")
    assert len(freed) == 1
    assert c.try_delete("a.parquet") == []  # idempotent
    with pytest.raises(KeyError):
        c.delete("a.parquet")
    # unreference_and_delete: one call does pin-drop + delete
    h2, _ = c.get("b.parquet", "b.parquet", remote)
    freed = h2.unreference_and_delete()
    assert len(freed) == 1
    assert c.stats()["cur_bytes"] == 0


def test_import_write_through_and_budget_raise(tmp_path):
    # object_storage_cache.rs:398-421 import_cache_entry; base_cache.rs:37
    remote = make_remote({})
    c = ObjectStorageCache(max_bytes=100, cache_directory=str(tmp_path))
    f = tmp_path / "written.parquet"
    f.write_bytes(b"z" * 60)
    h, ev = c.import_entry("t/written.parquet", str(f))
    assert ev == [] and c.ref_count("t/written.parquet") == 1
    # reader of the just-flushed file: zero remote IO
    h2, _ = c.get("t/written.parquet", "remote/ignored", remote)
    assert remote.reads == 0
    h.unreference(), h2.unreference()
    # double-manage is a programming error
    with pytest.raises(ValueError):
        c.import_entry("t/written.parquet", str(f))
    big = tmp_path / "big.parquet"
    big.write_bytes(b"b" * 200)
    with pytest.raises(CacheFullError):
        c.import_entry("t/big.parquet", str(big))


def test_increment_reference_count_requires_pinned(tmp_path):
    remote = make_remote({"a.parquet": b"x"})
    c = ObjectStorageCache(max_bytes=100, cache_directory=str(tmp_path))
    h, _ = c.get("a.parquet", "a.parquet", remote)
    c.increment_reference_count(h)
    assert c.ref_count("a.parquet") == 2
    h.unreference()
    assert c.ref_count("a.parquet") == 1
    c._unreference("a.parquet")
    with pytest.raises(KeyError):
        c.increment_reference_count(h)


def test_local_filesystem_optimization(tmp_path):
    # local_file_optimization_state_tests.rs: a local "remote" file IS
    # the cache entry — no copy, never deleted by eviction
    local_src = tmp_path / "persisted.parquet"
    local_src.write_bytes(b"p" * 50)
    c = ObjectStorageCache(
        max_bytes=60,
        cache_directory=str(tmp_path / "cache"),
        optimize_local_filesystem=True,
    )
    h, _ = c.get("t/p.parquet", str(local_src), accessor=None)  # no IO needed
    assert h.cache_filepath == str(local_src)
    h.unreference()
    # pressure-evict it: the persisted file must NOT be surfaced for delete
    other = tmp_path / "other.parquet"
    other.write_bytes(b"o" * 30)
    h2, ev = c.import_entry("t/o.parquet", str(other))
    assert ev == []  # 50 evicted (non-deletable -> no files returned)
    assert os.path.exists(local_src)
    h2.unreference()


def test_replace_with_remote_swaps_copy_for_persisted(tmp_path):
    # cache_handle.rs:68-92 unreference_and_replace_with_remote
    remote = make_remote({"t/a.parquet": b"A" * 40})
    c = ObjectStorageCache(
        max_bytes=100,
        cache_directory=str(tmp_path / "cache"),
        optimize_local_filesystem=True,
    )
    h, _ = c.get("t/a.parquet", "t/a.parquet", remote)  # copied (non-local remote)
    copied = h.cache_filepath
    persisted = tmp_path / "persisted.parquet"
    persisted.write_bytes(b"A" * 40)
    freed = h.unreference_and_replace_with_remote(str(persisted))
    assert freed == [copied]  # the duplicate copy is released
    os.unlink(copied)
    h2, _ = c.get("t/a.parquet", "t/a.parquet", remote)
    assert h2.cache_filepath == str(persisted)
    h2.unreference()


def test_concurrent_gets_single_fetch(tmp_path):
    # the race path: N threads cold-get the same id; exactly one copy
    # remains managed and every handle serves identical bytes
    remote = make_remote({"a.parquet": b"R" * 1000})
    c = ObjectStorageCache(max_bytes=10_000, cache_directory=str(tmp_path))
    handles, errs = [], []

    def run():
        try:
            h, ev = c.get("a.parquet", "a.parquet", remote)
            assert open(h.cache_filepath, "rb").read() == b"R" * 1000
            handles.append(h)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=run) for _ in range(8)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    assert not errs and len(handles) == 8
    assert c.ref_count("a.parquet") == 8
    assert c.stats()["cur_bytes"] == 1000  # one managed copy
    for h in handles:
        h.unreference()


# -- CachedFS -----------------------------------------------------------------


def test_cachedfs_serves_reads_and_invalidates_on_write(tmp_path):
    remote = make_remote({"b/data.parquet": b"v1" * 50, "b/wal.json": b"{}"})
    c = ObjectStorageCache(max_bytes=10_000, cache_directory=str(tmp_path))
    fs = CachedFS(remote, c)
    assert fs.open_read_binary("b/data.parquet").read() == b"v1" * 50
    assert fs.open_read_binary("b/data.parquet").read() == b"v1" * 50
    assert remote.reads == 1  # second read served locally
    # journal-ish file: never cached (mutates in place)
    fs.open_read("b/wal.json").read()
    fs.open_read("b/wal.json").read()
    # a write through the seam invalidates the cached copy
    fs.write_text_durable("b/data.parquet", "v2")
    assert fs.open_read("b/data.parquet").read() == "v2"
    # delete propagates + invalidates
    fs.unlink("b/data.parquet")
    assert not fs.exists("b/data.parquet")
    # directory ops still reach the inner accessor
    assert fs.listdir("b") == ["wal.json"]


def test_cachedfs_rename_and_rmtree_invalidate(tmp_path):
    remote = make_remote({"b/t/a.parquet": b"A" * 10})
    c = ObjectStorageCache(max_bytes=10_000, cache_directory=str(tmp_path))
    fs = CachedFS(remote, c)
    fs.open_read_binary("b/t/a.parquet").read()
    assert c.stats()["evictable"] == 1
    fs.rmtree("b/t")
    assert c.stats()["evictable"] == 0 and c.stats()["cur_bytes"] == 0


# -- MetadataCache ------------------------------------------------------------


def test_metadata_cache_lru_and_ttl():
    # moka_cache_test.rs semantics: max-entries LRU + insertion TTL
    now = [0.0]
    mc = MetadataCache(max_size=2, ttl_secs=10.0, clock=lambda: now[0])
    mc.put("a", 1)
    mc.put("b", 2)
    assert mc.get("a") == 1  # touches a
    mc.put("c", 3)  # evicts b (LRU)
    assert mc.get("b") is None
    assert mc.get("a") == 1 and mc.get("c") == 3
    # TTL is since INSERTION, not last access
    now[0] = 10.1
    assert mc.get("a") is None and mc.get("c") is None
    assert len(mc) == 0
    # overwrite resets insertion time
    mc.put("d", 4)
    now[0] = 15.0
    mc.put("d", 5)
    now[0] = 24.0
    assert mc.get("d") == 5
    assert mc.remove("d") == 5 and mc.remove("d") is None
    mc.put("e", 6)
    mc.clear()
    assert mc.get("e") is None


def test_transient_fetch_failure_does_not_poison_cache(tmp_path):
    # a throttled/failed remote fetch surfaces to the caller but leaves
    # the cache consistent: no phantom entry, no leaked bytes, and the
    # retry succeeds normally
    class Flaky:
        def __init__(self, inner, fail_first):
            self.inner, self.fails = inner, fail_first

        def open_read_binary(self, p):
            if self.fails > 0:
                self.fails -= 1
                raise OSError("connection reset")
            return self.inner.open_read_binary(p)

    remote = make_remote({"a.parquet": b"x" * 100})
    acc = Flaky(remote, fail_first=1)
    c = ObjectStorageCache(max_bytes=1000, cache_directory=str(tmp_path))
    with pytest.raises(OSError):
        c.get("a.parquet", "a.parquet", acc)
    st = c.stats()
    assert st["cur_bytes"] == 0 and st["pinned"] == 0 and st["evictable"] == 0
    # no half-written cache file left behind (only .part would be, and
    # the atomic rename means none is visible as a cache file)
    assert [f for f in __import__("os").listdir(tmp_path) if not f.endswith(".part")] == []
    h, _ = c.get("a.parquet", "a.parquet", acc)
    assert open(h.cache_filepath, "rb").read() == b"x" * 100
    h.unreference()


def test_shared_dir_adoption_across_cache_instances(tmp_path):
    """Two cache instances over the SAME directory (the per-worker-
    process shape on one node): the second instance adopts the file the
    first fetched — content-addressed name, zero remote reads — and a
    sibling's eviction of the shared file downgrades a stale index hit
    to a clean refetch."""
    remote = make_remote({"a.parquet": b"R" * 1000})
    c1 = ObjectStorageCache(max_bytes=10_000, cache_directory=str(tmp_path))
    c2 = ObjectStorageCache(max_bytes=10_000, cache_directory=str(tmp_path))

    h1, _ = c1.get("a.parquet", "a.parquet", remote)
    n_after_first = remote.reads
    h2, _ = c2.get("a.parquet", "a.parquet", remote)
    assert remote.reads == n_after_first  # adopted, not refetched
    assert h1.cache_filepath == h2.cache_filepath
    assert open(h2.cache_filepath, "rb").read() == b"R" * 1000

    # sibling eviction: c1 deletes the shared file; c2's stale
    # evictable entry must self-heal into a refetch, not an error
    h2.unreference()
    h1.unreference()
    for p in c1.try_delete("a.parquet"):
        os.unlink(p)
    h3, _ = c2.get("a.parquet", "a.parquet", remote)
    assert h3 is not None
    assert open(h3.cache_filepath, "rb").read() == b"R" * 1000
    assert remote.reads == n_after_first + 1  # exactly one refetch
    h3.unreference()


def test_cachedfs_write_extension_invalidates(tmp_path):
    """Review r10: write-shaped accessor EXTENSIONS (write_bytes,
    upload_file) were delegated raw via __getattr__ — a cached path then
    served the OLD bytes after an extension write, violating the class's
    never-stale contract."""
    remote = make_remote({"b/x.avro": b"old-bytes-1"})
    c = ObjectStorageCache(max_bytes=10_000, cache_directory=str(tmp_path / "c"))
    fs = CachedFS(remote, c)
    assert fs.open_read_binary("b/x.avro").read() == b"old-bytes-1"
    # extension write through the seam (ObjectStoreFS has no write_bytes;
    # emulate an accessor extension on the inner object)
    remote.write_bytes = lambda path, data: remote.inner.store.put(path, data)
    fs.write_bytes("b/x.avro", b"new-bytes-2")
    assert fs.open_read_binary("b/x.avro").read() == b"new-bytes-2"
    # upload_file invalidates its DESTINATION (arg 2)
    local = tmp_path / "local.bin"
    local.write_bytes(b"uploaded-3")
    remote.upload_file = lambda lp, path: remote.inner.store.put(
        path, open(lp, "rb").read()
    )
    fs.upload_file(str(local), "b/x.avro")
    assert fs.open_read_binary("b/x.avro").read() == b"uploaded-3"


def test_cachedfs_write_extension_invalidates_kwargs(tmp_path):
    """Review r11: invalidation resolved the target path only from
    POSITIONAL args — keyword calls (write_bytes(path=..., data=...),
    upload_file(local, path=...)) bypassed it and served stale bytes."""
    remote = make_remote({"k/x.bin": b"old-1"})
    c = ObjectStorageCache(max_bytes=10_000, cache_directory=str(tmp_path / "ck"))
    fs = CachedFS(remote, c)
    assert fs.open_read_binary("k/x.bin").read() == b"old-1"
    remote.write_bytes = lambda path, data: remote.inner.store.put(path, data)
    fs.write_bytes(path="k/x.bin", data=b"new-2")  # all-keyword call
    assert fs.open_read_binary("k/x.bin").read() == b"new-2"
    # mixed call: positional local, keyword destination
    local = tmp_path / "l.bin"
    local.write_bytes(b"up-3")
    remote.upload_file = lambda local_path, path: remote.inner.store.put(
        path, open(local_path, "rb").read()
    )
    fs.upload_file(str(local), path="k/x.bin")
    assert fs.open_read_binary("k/x.bin").read() == b"up-3"
    # data-first keyword order must also resolve the right target
    fs.write_bytes(data=b"new-4", path="k/x.bin")
    assert fs.open_read_binary("k/x.bin").read() == b"new-4"
