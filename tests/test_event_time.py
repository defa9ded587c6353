"""Watermark / late-data / window streaming tests (SURVEY.md §2c streaming:
superset of the reference, which has no event-time semantics)."""

import json
import os

from moonlink_spark.streaming.event_time import (
    dedup_within_watermark,
    read_event_stream,
    run_to_memory,
    run_to_parquet,
    sessionized_counts,
    windowed_counts,
)


def _write(path, events):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        for e in events:
            fh.write(json.dumps(e) + "\n")
    os.rename(tmp, path)


def _ev(i, ts, etype="click", user=1, value=1.0):
    return {"event_id": i, "ts": ts, "user_id": user, "event_type": etype,
            "value": value}


def test_watermark_drops_late_rows(spark, tmp_path):
    src = str(tmp_path / "src")
    cp = str(tmp_path / "cp")
    # run 1: events up to 12:30 -> watermark persisted as 12:20 in checkpoint
    _write(f"{src}/f1.json", [
        _ev(1, "2024-01-01 12:00:30"),
        _ev(2, "2024-01-01 12:04:00"),
        _ev(3, "2024-01-01 12:30:00"),
    ])
    out_dir = str(tmp_path / "out")
    stream = read_event_stream(spark, src)
    run_to_parquet(windowed_counts(stream), cp, out_dir)
    # run 2 (same checkpoint -> inherits watermark 12:20): a row at 12:01 is
    # beyond the watermark -> DROPPED; 13:00 advances the watermark so the
    # 12:00 and 12:30 windows finalize
    _write(f"{src}/f2.json", [
        _ev(4, "2024-01-01 12:01:00"),   # late beyond watermark
        _ev(5, "2024-01-01 12:31:00"),
        _ev(6, "2024-01-01 13:00:00"),
    ])
    stream2 = read_event_stream(spark, src)
    run_to_parquet(windowed_counts(stream2), cp, out_dir)
    out = {}
    for r in spark.read.parquet(out_dir).collect():
        out[str(r["window_start"])] = out.get(str(r["window_start"]), 0) + r["n"]
    # the 12:00-12:05 window finalized with its 2 on-time rows only — the
    # late id=4 at 12:01 never appears; 12:30 window has ids 3 and 5
    assert out["2024-01-01 12:00:00"] == 2
    assert out["2024-01-01 12:30:00"] == 2


def test_session_windows_streaming(spark, tmp_path):
    src = str(tmp_path / "src")
    _write(f"{src}/f1.json", [
        _ev(1, "2024-01-01 10:00:00", user=7),
        _ev(2, "2024-01-01 10:02:00", user=7),   # same session (gap < 5m)
        _ev(3, "2024-01-01 10:20:00", user=7),   # new session
        _ev(4, "2024-01-01 11:00:00", user=7),   # advances watermark, finalizes
    ])
    stream = read_event_stream(spark, src)
    run_to_memory(sessionized_counts(stream), str(tmp_path / "cp"), "sess_counts")
    rows = spark.sql(
        "SELECT n_events FROM sess_counts ORDER BY session_start"
    ).collect()
    assert [r["n_events"] for r in rows[:2]] == [2, 1]


def test_streaming_dedup_within_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    _write(f"{src}/f1.json", [
        _ev(1, "2024-01-01 12:00:00"),
        _ev(1, "2024-01-01 12:00:01"),  # duplicate id within watermark
        _ev(2, "2024-01-01 12:05:00"),
    ])
    stream = read_event_stream(spark, src, max_files_per_trigger=16)
    run_to_memory(
        dedup_within_watermark(stream), str(tmp_path / "cp"), "dedup_stream"
    )
    ids = sorted(
        r["event_id"] for r in spark.sql("SELECT * FROM dedup_stream").collect()
    )
    assert ids == [1, 2]
