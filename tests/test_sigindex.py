"""Persisted signature index: index-served candidates must equal the
from-scratch computation; updates touch only new documents; compaction
preserves content (reference index build/lookup/merge, §2a #12-14)."""

import os

from pyspark.sql import functions as F

from moonlink_spark.operators import load
from moonlink_spark.operators.dedup import _spark_signature
from moonlink_spark.table import sigindex


def fresh_candidates(docs):
    """From-scratch banded candidates (no index)."""
    sigs = _spark_signature(docs)
    bands = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        ":",
                        F.col(f"h{2 * b}").cast("string"),
                        F.col(f"h{2 * b + 1}").cast("string"),
                    )
                    for b in range(sigindex.N_BANDS)
                ]
            )
        ).alias("band", "bucket"),
    )
    a = bands.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    b = bands.select(
        F.col("doc_id").alias("doc_b"),
        F.col("band").alias("band_b"),
        F.col("bucket").alias("bucket_b"),
    )
    return (
        a.join(
            b,
            (F.col("band") == F.col("band_b"))
            & (F.col("bucket") == F.col("bucket_b"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .select("doc_a", "doc_b")
        .distinct()
    )


def pairs_set(df):
    return {(r.doc_a, r.doc_b) for r in df.collect()}


def test_build_update_compact_lookup(spark, tmp_path):
    docs = load(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    first = docs.filter(F.col("doc_id") < 40)
    later = docs.filter((F.col("doc_id") >= 40) & (F.col("doc_id") < 60))
    dest = str(tmp_path / "sigidx")

    sigindex.build_index(first, dest)
    assert len(sigindex._sig_files(dest)) == 1
    got = pairs_set(sigindex.candidate_pairs(spark, dest))
    want = pairs_set(fresh_candidates(first))
    assert got == want

    # incremental update: one NEW file, the original is byte-untouched
    before = {f: os.path.getmtime(f) for f in sigindex._sig_files(dest)}
    sigindex.update_index(later, dest)
    files = sigindex._sig_files(dest)
    assert len(files) == 2
    for f, mtime in before.items():
        assert os.path.getmtime(f) == mtime
    both = docs.filter(F.col("doc_id") < 60)
    assert pairs_set(sigindex.candidate_pairs(spark, dest)) == pairs_set(
        fresh_candidates(both)
    )

    # compaction: one file, identical candidates (index merge parity)
    replaced = sigindex.compact_index(spark, dest)
    assert replaced == 2 and len(sigindex._sig_files(dest)) == 1
    assert pairs_set(sigindex.candidate_pairs(spark, dest)) == pairs_set(
        fresh_candidates(both)
    )
    assert sigindex.read_meta(dest)["generation"] == 2


def test_streaming_ingest_maintains_sigindex(spark, tmp_path):
    """sync_sigindex: the CDC loop appends signatures for inserted docs;
    index-served candidates equal a from-scratch run over the full set."""
    import json as _json
    import os as _os

    from moonlink_spark.streaming.pipeline import StreamingIngestor
    from moonlink_spark.table.identity import IdentityProp
    from moonlink_spark.table.table import MoonlinkTable

    docs = load(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    first = docs.filter(F.col("doc_id") < 40)
    later = {
        r.doc_id: r.text
        for r in docs.filter(
            (F.col("doc_id") >= 40) & (F.col("doc_id") < 60)
        ).collect()
    }
    dest = str(tmp_path / "sigidx")
    sigindex.build_index(first, dest)

    t = MoonlinkTable.create(
        spark,
        str(tmp_path / "t"),
        [
            {"name": "doc_id", "data_type": "int64", "nullable": False},
            {"name": "text", "data_type": "string"},
        ],
        IdentityProp.single("doc_id"),
    )
    spool = str(tmp_path / "spool")
    _os.makedirs(spool)
    ing = StreamingIngestor(
        t,
        source_dir=spool,
        checkpoint_dir=str(tmp_path / "ckpt"),
        sync_sigindex=(dest, "text"),
    )
    with open(_os.path.join(spool, "b1.jsonl"), "w") as fh:
        for did, text in sorted(later.items()):
            fh.write(
                _json.dumps(
                    {
                        "lsn": 100 + did,
                        "xact_id": None,
                        "op": "insert",
                        "row": {"doc_id": did, "text": text},
                        "old_row": None,
                    }
                )
                + "\n"
            )
    ing.run_available()

    both = docs.filter(F.col("doc_id") < 60)
    got = pairs_set(sigindex.candidate_pairs(spark, dest))
    want = pairs_set(fresh_candidates(both))
    assert got == want
    assert not sigindex.rebuild_recommended(sigindex.read_meta(dest))

    # a delete flips the stale flag
    with open(_os.path.join(spool, "b2.jsonl"), "w") as fh:
        fh.write(
            _json.dumps(
                {
                    "lsn": 10_000,
                    "xact_id": None,
                    "op": "delete",
                    "row": None,
                    "old_row": {"doc_id": 5, "text": None},
                }
            )
            + "\n"
        )
    ing.run_available()
    assert sigindex.rebuild_recommended(sigindex.read_meta(dest))


def test_backend_owned_signature_index_lifecycle(spark, tmp_path):
    """The r12 symmetric surface: the backend owns the sigindex the same
    way it owns the vecindex — build from the live table, incremental
    update from the change feed (inserts index, updates/deletes flip
    stale), status reporting, and a maintenance tick whose
    stale->rebuild response resets the stale counter, advances the
    generation, reclaims superseded segments, and serves candidates
    equal to a from-scratch computation."""
    from moonlink_spark.backend import MoonlinkBackend
    from moonlink_spark.table.identity import IdentityProp

    corpus = load(spark, "/root/testdata/sf0.001", "documents").select(
        F.col("doc_id"), F.col("text")
    )
    rows = [
        {"doc_id": int(r.doc_id), "text": r.text}
        for r in corpus.filter(F.col("doc_id") < 80).collect()
    ]
    be = MoonlinkBackend(spark, str(tmp_path / "wh"))
    t = be.create_table(
        "db",
        "docs",
        [
            {"name": "doc_id", "data_type": "int64", "nullable": False},
            {"name": "text", "data_type": "string"},
        ],
        identity=IdentityProp.single("doc_id"),
    )
    t.append_rows(rows[:60])
    t.commit(lsn=1)

    meta = be.build_signature_index("db", "docs", "text")
    st = be.signature_index_status("db", "docs", "text", meta=meta)
    assert st["segments"] == 1 and not st["rebuild_recommended"]

    # inserts via the change feed: incremental, no rebuild needed
    t.append_rows(rows[60:])
    t.commit(lsn=2)
    meta = be.update_signature_index("db", "docs", "text", since_lsn=1)
    assert meta["generation"] == 2
    dest = be._sigindex_dir(t, "text")
    got = pairs_set(sigindex.candidate_pairs(spark, dest))
    want = pairs_set(
        fresh_candidates(
            spark.createDataFrame(rows, "doc_id long, text string")
        )
    )
    assert got == want

    # a delete flips stale; maintain_signature_index rebuilds, resets
    # the counter, and reclaims the superseded segments on disk
    t.delete_rows([{"doc_id": rows[0]["doc_id"]}])
    t.commit(lsn=3)
    meta = be.update_signature_index("db", "docs", "text", since_lsn=2)
    assert be.signature_index_status(
        "db", "docs", "text", meta=meta
    )["rebuild_recommended"]
    act = be.maintain_signature_index("db", "docs", "text")
    assert act["action"] == "rebuilt"
    # the rebuild ADVANCES the content counter past the replaced index
    # (build=1, update=2, rebuild=3): clients keying caches on
    # (dest, generation) must see post-rebuild state as new
    assert act["generation"] == 3
    st = be.signature_index_status("db", "docs", "text")
    assert st["stale_rows"] == 0 and st["segments"] == 1
    # and the lookup verb serves through the backend (route parity)
    via_backend = {
        (r["doc_a"], r["doc_b"])
        for r in be.signature_index_candidates(
            "db", "docs", "text", limit=100_000
        )
    }
    on_disk = [
        f for f in os.listdir(dest)
        if f.startswith("sig-") and f.endswith(".parquet")
    ]
    assert len(on_disk) == 1  # superseded segments reclaimed
    live = spark.createDataFrame(
        [r for r in rows if r["doc_id"] != rows[0]["doc_id"]],
        "doc_id long, text string",
    )
    assert pairs_set(sigindex.candidate_pairs(spark, dest)) == pairs_set(
        fresh_candidates(live)
    )
    assert via_backend == pairs_set(fresh_candidates(live))
    # nothing stale, not fragmented: the next tick is a no-op
    assert be.maintain_signature_index("db", "docs", "text")["action"] == "none"


def test_sigindex_over_http_routes(spark, tmp_path):
    """The r12 sigindex routes, e2e: build over HTTP, status reports the
    index shape, change-feed update marks stale, maintain rebuilds and
    resets, candidates serve over the wire equal to the module API."""
    import json as _json
    import urllib.request

    from moonlink_spark.backend import MoonlinkBackend
    from moonlink_spark.service import MoonlinkService
    from moonlink_spark.table.identity import IdentityProp

    corpus = load(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    rows = [
        {"doc_id": int(r.doc_id), "text": r.text}
        for r in corpus.filter(F.col("doc_id") < 60).collect()
    ]
    be = MoonlinkBackend(spark, str(tmp_path / "whsig"))
    t = be.create_table(
        "db",
        "docs",
        [
            {"name": "doc_id", "data_type": "int64", "nullable": False},
            {"name": "text", "data_type": "string"},
        ],
        identity=IdentityProp.single("doc_id"),
    )
    t.append_rows(rows)
    t.commit(lsn=1)

    svc = MoonlinkService(be).start()
    try:
        port = svc.port

        def post(path, body):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                data=_json.dumps(body).encode(),
                headers={"Content-Type": "application/json"},
            )
            return _json.loads(urllib.request.urlopen(req).read())

        def get(path):
            return _json.loads(
                urllib.request.urlopen(
                    f"http://127.0.0.1:{port}{path}"
                ).read()
            )

        built = post("/tables/db/docs/sigindex", {"column": "text"})
        assert built["segments"] == 1 and not built["rebuild_recommended"]
        status = get("/tables/db/docs/sigindex?column=text")
        assert status["n_bands"] == sigindex.N_BANDS

        t.delete_rows([{"doc_id": rows[0]["doc_id"]}])
        t.commit(lsn=2)
        upd = post(
            "/tables/db/docs/sigindex/update",
            {"column": "text", "since_lsn": 1},
        )
        assert upd["rebuild_recommended"]
        tick = post(
            "/tables/db/docs/sigindex/maintain", {"column": "text"}
        )
        assert tick["action"] == "rebuilt"
        assert not get(
            "/tables/db/docs/sigindex?column=text"
        )["rebuild_recommended"]

        wire = post(
            "/tables/db/docs/sigindex/candidates",
            {"column": "text", "limit": 10_000},
        )
        direct = pairs_set(
            sigindex.candidate_pairs(spark, be._sigindex_dir(t, "text"))
        )
        assert {
            (r["doc_a"], r["doc_b"]) for r in wire["rows"]
        } == direct
        assert wire["count"] == len(direct)
    finally:
        svc.stop()
