"""applyInPandasWithState: keyed state persists across micro-batches and
restarts (checkpoint recovery)."""

import json
import os

from moonlink_spark.streaming.event_time import read_event_stream
from moonlink_spark.streaming.stateful import running_user_stats


def _write(path, events):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        for e in events:
            fh.write(json.dumps(e) + "\n")
    os.rename(tmp, path)


def _ev(i, ts, user, value):
    return {"event_id": i, "ts": ts, "user_id": user, "event_type": "x",
            "value": value}


def _run(spark, src, cp, out_dir):
    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        running_user_stats(read_event_stream(spark, src, max_files_per_trigger=16))
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_state_survives_restart(spark, tmp_path):
    src, cp, out = (str(tmp_path / d) for d in ("src", "cp", "out"))
    _write(f"{src}/f1.json", [
        _ev(1, "2024-01-01 10:00:00", 7, 10.0),
        _ev(2, "2024-01-01 10:01:00", 7, 20.0),
        _ev(3, "2024-01-01 10:02:00", 8, 5.0),
    ])
    _run(spark, src, cp, out)
    # restart with new data: user 7's running count continues from state
    _write(f"{src}/f2.json", [
        _ev(4, "2024-01-01 10:05:00", 7, 100.0),  # spikes the max -> anomaly
    ])
    _run(spark, src, cp, out)
    rows = [r.asDict() for r in spark.read.parquet(out).collect()]
    u7 = sorted((r for r in rows if r["user_id"] == 7), key=lambda r: r["n_events"])
    assert u7[0]["n_events"] == 2 and u7[0]["total_value"] == 30.0
    assert not u7[0]["anomalous"]  # 20 <= 3 * 10
    assert u7[-1]["n_events"] == 3 and u7[-1]["total_value"] == 130.0
    assert u7[-1]["max_value"] == 100.0 and bool(u7[-1]["anomalous"])  # 100 > 3*15
    u8 = [r for r in rows if r["user_id"] == 8]
    assert u8[0]["n_events"] == 1 and not u8[0]["anomalous"]
