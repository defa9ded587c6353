"""Persisted IVF vector index lifecycle: build / incremental update /
compact / query-from-disk, with index-served results proven identical to
the from-scratch computation."""

import os

import pytest
from pyspark.sql import functions as F

from moonlink_spark.operators import load
from moonlink_spark.operators.similarity import (
    assign_ivf_clusters,
    quantize_embeddings_1e6,
    train_ivf_centroids,
)
from moonlink_spark.table import vecindex


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return load(spark, sf_dir, "embeddings").select("vec_id", "embedding")


@pytest.fixture()
def index_dir(tmp_path):
    return str(tmp_path / "vecindex")


def test_build_matches_from_scratch_assignment(spark, corpus, index_dir):
    meta = vecindex.build_index(spark, corpus, index_dir, k=8, iters=2)
    assert meta["generation"] == 1 and len(meta["centroids"]) == 8

    q = quantize_embeddings_1e6(corpus).persist()
    cents = train_ivf_centroids(spark, q, k=8, iters=2)
    fresh = {
        r.vec_id: (r.cluster_id, r.d2)
        for r in assign_ivf_clusters(spark, q, cents).collect()
    }
    served = {
        r.vec_id: (r.cluster_id, r.d2)
        for r in vecindex.read_assignments(spark, index_dir).collect()
    }
    q.unpersist()
    assert served == fresh  # bit-identical, not approximately


def test_update_is_incremental_and_leaves_segments_untouched(
    spark, corpus, index_dir
):
    base = corpus.filter(F.col("vec_id") % 2 == 0)
    new = corpus.filter(F.col("vec_id") % 2 == 1)
    vecindex.build_index(spark, base, index_dir, k=4, iters=1)
    before = {
        f: os.path.getmtime(os.path.join(index_dir, f))
        for f in os.listdir(index_dir)
        if f.startswith("assign-")
    }
    meta = vecindex.update_index(spark, new, index_dir)
    assert meta["generation"] == 2
    after_files = [
        f for f in os.listdir(index_dir) if f.startswith("assign-")
    ]
    assert len(after_files) == len(before) + 1
    for f, mtime in before.items():
        assert os.path.getmtime(os.path.join(index_dir, f)) == mtime

    # all vectors served; new ones assigned to the ORIGINAL centroids
    served = vecindex.read_assignments(spark, index_dir)
    assert served.count() == corpus.count()
    cents = [(i, c) for i, c in enumerate(meta["centroids"])]
    fresh_new = {
        r.vec_id: r.cluster_id
        for r in assign_ivf_clusters(
            spark, quantize_embeddings_1e6(new), cents
        ).collect()
    }
    served_new = {
        r.vec_id: r.cluster_id
        for r in served.join(
            new.select("vec_id"), "vec_id"
        ).collect()
    }
    assert served_new == fresh_new


def test_compaction_preserves_contents(spark, corpus, index_dir):
    vecindex.build_index(
        spark, corpus.filter(F.col("vec_id") < 100), index_dir, k=4, iters=1
    )
    vecindex.update_index(
        spark,
        corpus.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 200)),
        index_dir,
    )
    before = {
        (r.vec_id, r.cluster_id, r.d2)
        for r in vecindex.read_assignments(spark, index_dir).collect()
    }
    replaced = vecindex.compact_index(spark, index_dir)
    assert replaced == 2
    files = [f for f in os.listdir(index_dir) if f.startswith("assign-")]
    assert len(files) == 1
    after = {
        (r.vec_id, r.cluster_id, r.d2)
        for r in vecindex.read_assignments(spark, index_dir).collect()
    }
    assert after == before


def test_query_topk_served_from_disk(spark, corpus, index_dir):
    vecindex.build_index(spark, corpus, index_dir, k=8, iters=2)
    out = vecindex.query_topk(
        spark, corpus, index_dir, query_ids=[0, 1, 2], topk=3, nprobe=2
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2}
    for q, rows in by_q.items():
        assert [r.rn for r in sorted(rows, key=lambda r: r.rn)] == [1, 2, 3]
        cosines = [r.cosine for r in sorted(rows, key=lambda r: r.rn)]
        assert cosines == sorted(cosines, reverse=True)
        assert all(r.neighbor_id != q for r in rows)


def test_retrain_recommendation_flags_drift(spark, corpus, index_dir):
    vecindex.build_index(spark, corpus, index_dir, k=4, iters=2)
    meta = vecindex.read_meta(index_dir)
    assert not vecindex.retrain_recommended(meta)
    # drifted vectors: far outside the unit-scale training distribution
    drifted = corpus.limit(20).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.expr("transform(embedding, x -> CAST(x * 50.0 AS FLOAT))").alias(
            "embedding"
        ),
    )
    meta = vecindex.update_index(spark, drifted, index_dir)
    assert vecindex.retrain_recommended(meta)


def test_streaming_ingest_maintains_index(spark, corpus, tmp_path):
    """sync_vecindex: the CDC loop assigns each micro-batch's inserted
    vectors to the existing centroids; updates flip the stale flag."""
    import json as _json
    import os as _os

    from moonlink_spark.streaming.pipeline import StreamingIngestor
    from moonlink_spark.table.identity import IdentityProp
    from moonlink_spark.table.table import MoonlinkTable

    base = corpus.filter(F.col("vec_id") < 200)
    dest = str(tmp_path / "vidx")
    vecindex.build_index(spark, base, dest, k=4, iters=1)

    t = MoonlinkTable.create(
        spark,
        str(tmp_path / "t"),
        [
            {"name": "vec_id", "data_type": "int64", "nullable": False},
            {
                "name": "embedding",
                "data_type": "list",
                "item": {"data_type": "float32"},
            },
        ],
        IdentityProp.single("vec_id"),
    )
    spool = str(tmp_path / "spool")
    _os.makedirs(spool)
    ing = StreamingIngestor(
        t,
        source_dir=spool,
        checkpoint_dir=str(tmp_path / "ckpt"),
        sync_vecindex=(dest, "embedding"),
    )

    new_vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in corpus.filter(
            (F.col("vec_id") >= 200) & (F.col("vec_id") < 230)
        ).collect()
    }
    with open(_os.path.join(spool, "b1.jsonl"), "w") as fh:
        for vid, emb in sorted(new_vecs.items()):
            fh.write(
                _json.dumps(
                    {
                        "lsn": 100 + vid,
                        "xact_id": None,
                        "op": "insert",
                        "row": {"vec_id": vid, "embedding": emb},
                        "old_row": None,
                    }
                )
                + "\n"
            )
    ing.run_available()

    served = vecindex.read_assignments(spark, dest)
    assert served.count() == 200 + len(new_vecs)
    meta = vecindex.read_meta(dest)
    assert not vecindex.retrain_recommended(meta)
    # streamed vectors must carry the SAME assignment a fresh
    # assign-to-meta-centroids run produces
    cents = [(i, c) for i, c in enumerate(meta["centroids"])]
    streamed = corpus.filter(
        (F.col("vec_id") >= 200) & (F.col("vec_id") < 230)
    )
    fresh = {
        r.vec_id: r.cluster_id
        for r in assign_ivf_clusters(
            spark, quantize_embeddings_1e6(streamed), cents
        ).collect()
    }
    got = {
        r.vec_id: r.cluster_id
        for r in served.filter(F.col("vec_id") >= 200).collect()
    }
    assert got == fresh

    # an update event does not patch inverted lists — it flips stale
    some_vid = 5
    with open(_os.path.join(spool, "b2.jsonl"), "w") as fh:
        fh.write(
            _json.dumps(
                {
                    "lsn": 10_000,
                    "xact_id": None,
                    "op": "update",
                    "row": {
                        "vec_id": some_vid,
                        "embedding": [0.5] * 64,
                    },
                    "old_row": {"vec_id": some_vid, "embedding": None},
                }
            )
            + "\n"
        )
    ing.run_available()
    meta = vecindex.read_meta(dest)
    assert meta.get("stale_rows", 0) == 1
    assert vecindex.retrain_recommended(meta)


def test_index_maintenance_recovers_after_crash(spark, corpus, tmp_path):
    """Crash window between the table commit and index maintenance: the
    replayed batch (apply_cdc_batch -> None) must STILL be indexed —
    the watermark in the index meta lags the table, so _foreach_batch
    re-runs maintenance instead of skipping it forever (ADVICE r4)."""
    from moonlink_spark.streaming.pipeline import (
        StreamingIngestor,
        apply_cdc_batch,
        cdc_event_schema,
    )
    from moonlink_spark.table.identity import IdentityProp
    from moonlink_spark.table.table import MoonlinkTable

    base = corpus.filter(F.col("vec_id") < 200)
    dest = str(tmp_path / "vidx")
    vecindex.build_index(spark, base, dest, k=4, iters=1)
    assert vecindex.indexed_batch_id(dest) == -1

    t = MoonlinkTable.create(
        spark,
        str(tmp_path / "t"),
        [
            {"name": "vec_id", "data_type": "int64", "nullable": False},
            {
                "name": "embedding",
                "data_type": "list",
                "item": {"data_type": "float32"},
            },
        ],
        IdentityProp.single("vec_id"),
    )
    ing = StreamingIngestor(
        t,
        source_dir=str(tmp_path / "spool"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        sync_vecindex=(dest, "embedding"),
    )
    new = corpus.filter((F.col("vec_id") >= 200) & (F.col("vec_id") < 230))
    batch = new.select(
        (F.col("vec_id") + 100).cast("bigint").alias("lsn"),
        F.lit(None).cast("int").alias("xact_id"),
        F.lit("insert").alias("op"),
        F.struct("vec_id", "embedding").alias("row"),
        F.lit(None).cast(cdc_event_schema(t.schema)["row"].dataType).alias(
            "old_row"
        ),
    )
    # "crash": the table commit lands but maintenance never runs
    assert apply_cdc_batch(t, batch, 0) is not None
    assert vecindex.indexed_batch_id(dest) == -1  # index is behind

    # Spark replays batch 0 from the checkpoint after restart
    ing._foreach_batch(batch, 0)
    assert vecindex.indexed_batch_id(dest) == 0
    assert vecindex.read_assignments(spark, dest).count() == 230
    gen = vecindex.read_meta(dest)["generation"]

    # a second replay of the same batch is a no-op (watermark-gated)
    ing._foreach_batch(batch, 0)
    assert vecindex.read_assignments(spark, dest).count() == 230
    assert vecindex.read_meta(dest)["generation"] == gen


def test_vector_index_over_http(spark, corpus, tmp_path):
    """Backend + HTTP surface: build the table-owned index, incrementally
    update from the change feed, check status, query top-k — all through
    the service routes."""
    import json as _json
    import urllib.request

    from moonlink_spark.backend import MoonlinkBackend
    from moonlink_spark.service import MoonlinkService
    from moonlink_spark.table.identity import IdentityProp

    be = MoonlinkBackend(spark, str(tmp_path / "wh"))
    t = be.create_table(
        "db",
        "emb",
        [
            {"name": "vec_id", "data_type": "int64", "nullable": False},
            {
                "name": "embedding",
                "data_type": "list",
                "item": {"data_type": "float32"},
            },
        ],
        identity=IdentityProp.single("vec_id"),
    )
    rows = [
        {"vec_id": r.vec_id, "embedding": [float(x) for x in r.embedding]}
        for r in corpus.filter(F.col("vec_id") < 120).collect()
    ]
    t.append_rows(rows[:100])
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

        built = post(
            "/tables/db/emb/vecindex", {"column": "embedding", "k": 4, "iters": 1}
        )
        assert built["trained_rows"] == 100 and built["k"] == 4

        # ingest 20 more rows, then index the delta from the change feed
        t.append_rows(rows[100:])
        t.commit(lsn=2)
        status = post(
            "/tables/db/emb/vecindex/update",
            {"column": "embedding", "since_lsn": 1},
        )
        assert status["appended_rows"] == 20
        assert status["segments"] == 2
        assert not status["retrain_recommended"]
        assert get("/tables/db/emb/vecindex?column=embedding") == status

        res = post(
            "/tables/db/emb/vecindex/query",
            {"column": "embedding", "query_ids": [0, 1], "topk": 3, "nprobe": 2},
        )
        assert res["count"] == 6
        assert {r["query_id"] for r in res["rows"]} == {0, 1}
        # served result equals the direct backend query
        direct = be.query_vector_index(
            "db", "emb", "embedding", [0, 1], topk=3, nprobe=2
        ).orderBy("query_id", "rn").collect()
        assert [
            (r["query_id"], r["neighbor_id"], r["rn"]) for r in res["rows"]
        ] == [(r.query_id, r.neighbor_id, r.rn) for r in direct]

        # a delete makes the status report a recommended retrain
        t.delete_rows([{"vec_id": 5}])
        t.commit(lsn=3)
        status = post(
            "/tables/db/emb/vecindex/update",
            {"column": "embedding", "since_lsn": 2},
        )
        assert status["stale_rows"] == 1 and status["retrain_recommended"]
    finally:
        svc.stop()


@pytest.mark.slow
def test_auto_retrain_timer_restores_recall(spark, corpus, tmp_path):
    """The timer-driven maintenance loop (index_merge_config.rs trigger
    parity): drifted inserts trip retrain_recommended, the ticker
    retrains the table-owned index, and post-retrain recall@k for the
    drifted queries is at least the stale-index recall."""
    import time

    import numpy as np

    from moonlink_spark.backend import MoonlinkBackend
    from moonlink_spark.table.identity import IdentityProp

    be = MoonlinkBackend(spark, str(tmp_path / "wh"))
    t = be.create_table(
        "db",
        "emb",
        [
            {"name": "vec_id", "data_type": "int64", "nullable": False},
            {
                "name": "embedding",
                "data_type": "list",
                "item": {"data_type": "float32"},
            },
        ],
        identity=IdentityProp.single("vec_id"),
    )
    base = [
        {"vec_id": r.vec_id, "embedding": [float(x) for x in r.embedding]}
        for r in corpus.filter(F.col("vec_id") < 250).collect()
    ]
    t.append_rows(base)
    t.commit(lsn=1)
    be.build_vector_index("db", "emb", "embedding", k=4, iters=2)

    # drifted cluster: far outside the training distribution
    rng = np.random.default_rng(7)
    dim = len(base[0]["embedding"])
    drift_center = rng.normal(30.0, 1.0, dim)
    drifted = [
        {
            "vec_id": 1_000_000 + i,
            "embedding": [
                float(x) for x in drift_center + rng.normal(0, 0.5, dim)
            ],
        }
        for i in range(60)
    ]
    t.append_rows(drifted)
    t.commit(lsn=2)
    be.update_vector_index("db", "emb", "embedding", since_lsn=1)
    status = be.vector_index_status("db", "emb", "embedding")
    assert status["retrain_recommended"], "drift signal should have tripped"

    def recall_at_k(query_ids, k=5):
        # ground truth: brute-force cosine over the full live corpus
        rows = t.scan().collect()
        vecs = {r.vec_id: np.asarray(r.embedding, dtype=float) for r in rows}
        hits = 0
        for qid in query_ids:
            qv = vecs[qid]

            def cos(v):
                return float(
                    v @ qv / (np.linalg.norm(v) * np.linalg.norm(qv) + 1e-12)
                )

            truth = sorted(
                (i for i in vecs if i != qid),
                key=lambda i: -cos(vecs[i]),
            )[:k]
            got = [
                r.neighbor_id
                for r in be.query_vector_index(
                    "db", "emb", "embedding", [qid], topk=k, nprobe=1
                ).collect()
            ]
            hits += len(set(truth) & set(got))
        return hits / (k * len(query_ids))

    qids = [1_000_000 + i for i in range(5)]
    stale_recall = recall_at_k(qids)

    ticker = be.start_vector_index_maintenance(
        "db", "emb", "embedding", interval_s=0.3
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            s = be.vector_index_status("db", "emb", "embedding")
            if not s["retrain_recommended"] and s["appended_rows"] == 0:
                break
            time.sleep(0.3)
        else:
            raise AssertionError("timer never retrained the index")
    finally:
        ticker.stop()

    post_recall = recall_at_k(qids)
    assert post_recall >= stale_recall
    # the retrained index must answer drifted queries well: their true
    # neighbors are other drifted points in a tight, now-centroided blob
    assert post_recall >= 0.8, f"post-retrain recall {post_recall}"


# --------------------------------------------------------------------------- #
# IVF-PQ segments (round 11): product-quantized codes ride the same
# segment/compaction lifecycle; serving is ADC shortlist + exact rerank.
# --------------------------------------------------------------------------- #

PQ = {"m": 8, "ksub": 256, "iters": 2}


def test_pq_compaction_preserves_codes(spark, corpus, index_dir):
    """Compaction invariance for PQ segments: the merged segment carries
    the exact same (vec_id, cluster_id, d2, codes) rows."""
    vecindex.build_index(
        spark, corpus.filter(F.col("vec_id") < 150), index_dir,
        k=4, iters=1, pq={"m": 4, "ksub": 16, "iters": 1},
    )
    vecindex.update_index(
        spark,
        corpus.filter((F.col("vec_id") >= 150) & (F.col("vec_id") < 300)),
        index_dir,
    )
    before = {
        (r.vec_id, r.cluster_id, r.d2, tuple(r.codes))
        for r in vecindex.read_assignments(spark, index_dir).collect()
    }
    assert before and all(len(c) == 4 for *_rest, c in before)
    assert vecindex.compact_index(spark, index_dir) == 2
    after = {
        (r.vec_id, r.cluster_id, r.d2, tuple(r.codes))
        for r in vecindex.read_assignments(spark, index_dir).collect()
    }
    assert after == before


def test_pq_update_assigns_against_existing_codebooks(spark, corpus, index_dir):
    """Incremental update must NOT retrain: codes of pre-existing rows
    are byte-identical before and after an update, and new rows' codes
    come from the frozen codebooks."""
    import json

    meta1 = vecindex.build_index(
        spark, corpus.filter(F.col("vec_id") % 2 == 0), index_dir,
        k=4, iters=1, pq={"m": 4, "ksub": 16, "iters": 1},
    )
    old = {
        r.vec_id: tuple(r.codes)
        for r in vecindex.read_assignments(spark, index_dir).collect()
    }
    meta2 = vecindex.update_index(
        spark, corpus.filter(F.col("vec_id") % 2 == 1), index_dir
    )
    assert json.dumps(meta1["pq"]) == json.dumps(meta2["pq"])  # frozen books
    now = {
        r.vec_id: tuple(r.codes)
        for r in vecindex.read_assignments(spark, index_dir).collect()
    }
    assert all(now[v] == c for v, c in old.items())
    assert len(now) > len(old)


def test_pq_recall_at_least_95pct_of_sq(spark, corpus, tmp_path):
    """The serving-format pin from the r10 verdict: with m=8 x 256-entry
    codebooks and rerank=4*topk, PQ-served top-k recall against the
    brute-force ground truth is >= 95% of the flat (SQ) index's recall
    at the same nprobe, on the planted query set."""
    from pyspark.sql import Window

    from moonlink_spark.operators.similarity import _dot, _norm

    queries = list(range(10))
    topk = 3
    # ground truth: brute-force cosine top-k
    qe = corpus.filter(F.col("vec_id").isin(queries)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    ce = corpus.select("vec_id", F.col("embedding").alias("ce"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("vec_id")
    )
    truth_rows = (
        ce.join(F.broadcast(qe))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", _dot("qe", "ce") / (_norm("qe") * _norm("ce")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= topk)
        .select("query_id", "vec_id")
        .collect()
    )
    truth = {(r.query_id, r.vec_id) for r in truth_rows}

    def recall(dest, **kw):
        rows = vecindex.query_topk(
            spark, corpus, dest, query_ids=queries, topk=topk, nprobe=2, **kw
        ).collect()
        got = {(r.query_id, r.neighbor_id) for r in rows}
        return len(got & truth) / len(truth)

    flat_dir = str(tmp_path / "flat")
    vecindex.build_index(
        spark, corpus.filter(F.col("vec_id") % 2 == 0), flat_dir, k=8, iters=2
    )
    vecindex.update_index(
        spark, corpus.filter(F.col("vec_id") % 2 == 1), flat_dir
    )
    pq_dir = str(tmp_path / "pq")
    vecindex.build_index(
        spark, corpus.filter(F.col("vec_id") % 2 == 0), pq_dir,
        k=8, iters=2, pq=PQ,
    )
    vecindex.update_index(
        spark, corpus.filter(F.col("vec_id") % 2 == 1), pq_dir
    )
    r_flat = recall(flat_dir)
    r_pq = recall(pq_dir, rerank=4 * topk)
    assert r_pq >= 0.95 * r_flat, (r_pq, r_flat)

    # rerank=0 (pure ADC): ranks on the integer code distance alone,
    # never touching the full-precision corpus after probing — the
    # schema drops cosine for the integer adc. Measured recall@3 on
    # this corpus: 0.30 vs 0.83 flat/reranked (nprobe=2) — the fixture
    # vectors are RANDOM, PQ's adversarial case (no cluster structure
    # for the codebooks to exploit), and rank-3 ADC noise is exactly
    # what the rerank stage exists to absorb (the >=0.95*flat pin
    # above proves rerank=4*topk restores it). The pure-ADC pin is an
    # absolute floor: a drop below 0.2 means codes stopped carrying
    # signal (e.g. a codebook/table indexing regression), which is the
    # failure mode this guards — not a recall SLO; operators who need
    # recall choose rerank>0 (SCALE.md §16 records the tradeoff).
    adc_rows = vecindex.query_topk(
        spark, corpus, pq_dir, query_ids=queries, topk=topk, nprobe=2,
        rerank=0,
    ).collect()
    assert adc_rows and set(adc_rows[0].asDict()) == {
        "query_id", "neighbor_id", "adc", "rn"
    }
    got = {(r.query_id, r.neighbor_id) for r in adc_rows}
    r_adc = len(got & truth) / len(truth)
    assert r_adc >= 0.2, (r_adc, r_flat)


@pytest.mark.slow
def test_pq_index_over_http_and_rebuild_inherits_pq(spark, corpus, tmp_path):
    """PQ through every owning surface: build with pq over HTTP, status
    reports the format, CDC update assigns codes against the frozen
    codebooks, query accepts rerank — and a k-only rebuild INHERITS the
    PQ config instead of silently downgrading the serving format to
    flat (the drift-triggered auto-retrain path calls build without
    pq)."""
    import json as _json
    import urllib.request

    from moonlink_spark.backend import MoonlinkBackend
    from moonlink_spark.service import MoonlinkService
    from moonlink_spark.table.identity import IdentityProp

    be = MoonlinkBackend(spark, str(tmp_path / "whpq"))
    t = be.create_table(
        "db",
        "emb",
        [
            {"name": "vec_id", "data_type": "int64", "nullable": False},
            {
                "name": "embedding",
                "data_type": "list",
                "item": {"data_type": "float32"},
            },
        ],
        identity=IdentityProp.single("vec_id"),
    )
    rows = [
        {"vec_id": r.vec_id, "embedding": [float(x) for x in r.embedding]}
        for r in corpus.filter(F.col("vec_id") < 120).collect()
    ]
    t.append_rows(rows[:100])
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

        post(
            "/tables/db/emb/vecindex",
            {"column": "embedding", "k": 4, "iters": 1,
             "pq": {"m": 4, "ksub": 16, "iters": 1}},
        )
        status = get("/tables/db/emb/vecindex?column=embedding")
        assert status["pq"] == {"m": 4, "ksub": 16}

        t.append_rows(rows[100:])
        t.commit(lsn=2)
        status = post(
            "/tables/db/emb/vecindex/update",
            {"column": "embedding", "since_lsn": 1},
        )
        assert status["appended_rows"] == 20 and status["pq"] is not None

        res = post(
            "/tables/db/emb/vecindex/query",
            {"column": "embedding", "query_ids": [0, 1], "topk": 3,
             "nprobe": 2, "rerank": 12},
        )
        assert res["count"] == 6
        direct = be.query_vector_index(
            "db", "emb", "embedding", [0, 1], topk=3, nprobe=2, rerank=12
        ).orderBy("query_id", "rn").collect()
        assert [
            (r["query_id"], r["neighbor_id"], r["rn"]) for r in res["rows"]
        ] == [(r.query_id, r.neighbor_id, r.rn) for r in direct]

        # rerank=0 over HTTP: pure-ADC serving — the schema swaps cosine
        # for the integer adc, and 0 must NOT be treated as "default"
        # (falsy-vs-None is the easy bug here)
        adc_res = post(
            "/tables/db/emb/vecindex/query",
            {"column": "embedding", "query_ids": [0, 1], "topk": 3,
             "nprobe": 2, "rerank": 0},
        )
        assert adc_res["count"] == 6
        assert set(adc_res["rows"][0]) == {
            "query_id", "neighbor_id", "adc", "rn"
        }
        adc_direct = be.query_vector_index(
            "db", "emb", "embedding", [0, 1], topk=3, nprobe=2, rerank=0
        ).orderBy("query_id", "rn").collect()
        assert [
            (r["query_id"], r["neighbor_id"], r["adc"], r["rn"])
            for r in adc_res["rows"]
        ] == [(r.query_id, r.neighbor_id, r.adc, r.rn) for r in adc_direct]

        # rebuild WITHOUT pq in the request: the serving format survives
        rebuilt = post(
            "/tables/db/emb/vecindex", {"column": "embedding", "k": 4,
                                        "iters": 1}
        )
        assert rebuilt["trained_rows"] == 120
        status = get("/tables/db/emb/vecindex?column=embedding")
        assert status["pq"] == {"m": 4, "ksub": 16}
        assert status["segments"] == 1  # rebuilt into one PQ segment
    finally:
        svc.stop()


def test_pq_crash_between_segment_persist_and_meta_publish(
    spark, corpus, tmp_path, monkeypatch
):
    """Chaos for the r11 PQ lifecycle (verdict r11 ask): kill the writer
    AFTER codebooks/segments hit disk but BEFORE the atomic meta
    publish, in both build and incremental update. Invariants (the
    reference's chaos_test.rs shape): readers never see the unpublished
    state, the orphan segment stays invisible forever, and a retried
    build/update converges to exactly the clean outcome."""
    half = corpus.filter(F.col("vec_id") % 2 == 0)
    rest = corpus.filter(F.col("vec_id") % 2 == 1)
    pq = {"m": 4, "ksub": 16, "iters": 1}

    # clean twin for the expected outcome
    clean = str(tmp_path / "clean")
    vecindex.build_index(spark, half, clean, k=4, iters=1, pq=pq)
    vecindex.update_index(spark, rest, clean)
    want = {
        (r.vec_id, r.cluster_id, r.d2, tuple(r.codes))
        for r in vecindex.read_assignments(spark, clean).collect()
    }

    # (1) kill build between segment write and meta publish
    crash = str(tmp_path / "crash")
    real_write_meta = vecindex._write_meta
    monkeypatch.setattr(
        vecindex, "_write_meta",
        lambda dest, meta: (_ for _ in ()).throw(
            RuntimeError("killed before meta publish")
        ),
    )
    with pytest.raises(RuntimeError):
        vecindex.build_index(spark, half, crash, k=4, iters=1, pq=pq)
    monkeypatch.setattr(vecindex, "_write_meta", real_write_meta)
    # no meta => no readable index; the orphan segment is on disk
    assert not os.path.exists(os.path.join(crash, vecindex.META_FILE))
    orphans = [f for f in os.listdir(crash) if f.startswith("assign-")]
    assert len(orphans) == 1
    # retry the build: meta lists ONLY its own segment; orphan invisible
    vecindex.build_index(spark, half, crash, k=4, iters=1, pq=pq)
    meta = vecindex.read_meta(crash)
    assert len(meta["segments"]) == 1 and meta["segments"][0] not in orphans

    # (2) kill update between segment write and meta publish
    calls = {"n": 0}

    def dying_write_meta(dest, meta):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("killed before meta publish")
        real_write_meta(dest, meta)

    monkeypatch.setattr(vecindex, "_write_meta", dying_write_meta)
    with pytest.raises(RuntimeError):
        vecindex.update_index(spark, rest, crash)
    # the failed update is invisible: still generation 1, one live segment
    meta = vecindex.read_meta(crash)
    assert meta["generation"] == 1 and len(meta["segments"]) == 1
    n_before = vecindex.read_assignments(spark, crash).count()
    assert n_before == half.count()
    # retried update lands exactly once and equals the clean twin
    vecindex.update_index(spark, rest, crash)
    got = {
        (r.vec_id, r.cluster_id, r.d2, tuple(r.codes))
        for r in vecindex.read_assignments(spark, crash).collect()
    }
    assert got == want
    # and the crash-build/crash-update orphans never became visible
    live = set(vecindex.read_meta(crash)["segments"])
    on_disk = {f for f in os.listdir(crash) if f.startswith("assign-")}
    assert live < on_disk  # orphans exist on disk...
    served = vecindex.query_topk(
        spark, corpus, crash, query_ids=[0, 1], topk=3, nprobe=2, rerank=0
    ).count()
    assert served == 6  # ...and serving works off the live set only


def test_pure_adc_plan_never_scans_the_corpus(spark, corpus, index_dir):
    """Plan lock for the rerank=0 claim: after probe selection, pure-ADC
    serving reads ONLY index bytes. Since r12 the query-side vector
    fetch is a bounded driver collect BEFORE planning (query_ids is an
    explicit request), so the rerank=0 physical plan contains NO
    embeddings scan at all — only index-segment scans. The reranked
    plan, by contrast, must contain at least one corpus scan WITHOUT an
    In(vec_id, [queries]) pushed filter (the shortlist's embedding
    fetch), proving the parser distinguishes the two shapes rather than
    vacuously passing."""
    import re

    vecindex.build_index(
        spark, corpus, index_dir, k=4, iters=1,
        pq={"m": 4, "ksub": 16, "iters": 1},
    )

    def scan_blocks(rerank):
        df = vecindex.query_topk(
            spark, corpus, index_dir, query_ids=[0, 1], topk=3, nprobe=2,
            rerank=rerank,
        )
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        # each "Scan parquet" node block (up to the blank line), split by
        # source: the index's assign-*.parquet segments vs the corpus
        emb, seg = [], []
        for block in re.split(r"\n\n", plan):
            if "Scan parquet" not in block:
                continue
            if "embeddings" in block:
                m = re.search(r"PushedFilters: \[([^\]]*)\]", block)
                emb.append(m.group(1) if m else "")
            elif "assign-" in block or index_dir in block:
                seg.append(block)
        return emb, seg

    adc_emb, adc_seg = scan_blocks(0)
    assert adc_seg, "parser found no index-segment scans — format rotted"
    assert not adc_emb, adc_emb  # zero corpus scans in the pure-ADC plan
    rer_emb, rer_seg = scan_blocks(12)
    assert rer_seg, "parser found no index-segment scans — format rotted"
    # the rerank path's shortlist fetch scans the corpus unbounded
    assert any("In(vec_id" not in f for f in rer_emb), rer_emb
