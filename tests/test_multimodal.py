"""Multimodal plumbing tests: schema, Arrow batch shape, deterministic
features, content dedup."""

import hashlib

from moonlink_spark.sources.multimodal import (
    FEATURE_SCHEMA,
    extract_features,
    media_dedup_by_content,
    synthesize_media,
)


def test_feature_extraction_schema_and_determinism(spark):
    media = synthesize_media(spark, n=30)
    feats = extract_features(media)
    assert feats.schema == FEATURE_SCHEMA
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 30
    # deterministic: rerun produces identical features
    rows2 = {r["media_id"]: r for r in extract_features(media).collect()}
    for i in rows:
        assert rows[i]["feature"] == rows2[i]["feature"]
        assert rows[i]["content_hash"] == rows2[i]["content_hash"]
    # image/audio features are 8-dim, video frame samples 4-dim
    kinds = {r["kind"]: len(r["feature"]) for r in rows.values()}
    assert kinds == {"image": 8, "audio": 8, "video": 4}


def test_content_hash_matches_python(spark):
    media = synthesize_media(spark, n=6)
    payloads = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    feats = {r["media_id"]: r["content_hash"] for r in extract_features(media).collect()}
    for i, p in payloads.items():
        assert feats[i] == hashlib.sha256(p).hexdigest()


def test_media_dedup(spark):
    media = synthesize_media(spark, n=12)
    dup = media.limit(4)
    d = media_dedup_by_content(media.unionByName(dup))
    out = d.collect()
    assert sum(1 for r in out if r["n_copies"] == 2) == 4
    assert sum(1 for r in out if r["n_copies"] == 1) == 8
