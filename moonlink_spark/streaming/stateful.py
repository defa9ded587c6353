"""Custom stateful streaming operators via applyInPandasWithState.

The escape hatch for operators Structured Streaming lacks natively
(SURVEY.md §2c: custom stateful operators are capability headroom over the
reference). State is partitioned by key and Arrow-batched — the 1000-executor
scale path for per-entity running state.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_STATS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), True),
        T.StructField("max_value", T.DoubleType(), True),
        T.StructField("anomalous", T.BooleanType(), False),
    ]
)

# STATE-SCHEMA COMPATIBILITY: the ``nv`` field was added after the original
# 3-field (n, total, mx) schema shipped. Spark's state store pins the state
# schema per checkpoint — a running_user_stats stream restarted from a
# checkpoint written by the 3-field version fails Spark's state-schema
# compatibility check (and the 4-tuple unpack of state.get). Upgrading an
# existing stream therefore requires a NEW checkpointLocation (the stream
# rebuilds state from the source); there is no in-place migration.
_STATE_SCHEMA = "n BIGINT, total DOUBLE, mx DOUBLE, nv BIGINT"


def _update_user_stats(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total, mx, nv = (
        state.get if state.exists else (0, 0.0, float("-inf"), 0)
    )
    for pdf in pdfs:
        vals = pdf["value"].dropna()
        n += len(pdf)
        nv += int(len(vals))
        total += float(vals.sum())
        if len(vals):
            mx = max(mx, float(vals.max()))
    state.update((n, total, mx, nv))
    # anomaly rule: max ever seen > 3x the mean of the OTHER VALUED events
    # (a spike must not inflate its own baseline). The divisor counts only
    # valued events: dividing a nulls-excluded sum by a nulls-included
    # count diluted the baseline toward 0 and flagged any user whose lone
    # valued event rode with null-value events (review r10).
    baseline = (total - mx) / (nv - 1) if nv > 1 else None
    anomalous = bool(baseline is not None and mx > 3 * baseline)
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
            "max_value": [mx if mx != float("-inf") else None],
            "anomalous": [anomalous],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum, max, anomaly flag) maintained across
    micro-batches in keyed state (parity target: a custom stateful operator
    the reference cannot express; update-mode output emits the refreshed row
    for every user seen in the batch)."""
    from moonlink_spark.session import ensure_package_on_workers

    ensure_package_on_workers(events.sparkSession)
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=RUNNING_STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Gap-based sessionization maintained in keyed state across micro-batches.
# Timestamps travel as epoch-micros BIGINTs through state (exact integer
# arithmetic; no Arrow tz coercion in the state row).

SESSION_GAP_US = 30 * 60 * 1_000_000

SESSION_STATE_SCHEMA = "session_id BIGINT, last_us BIGINT, start_us BIGINT, n BIGINT"

SESSION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("start_us", T.LongType(), False),
        T.StructField("end_us", T.LongType(), False),
    ]
)


def _update_sessions(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user session tracking: 30-min inactivity gap opens a new session.

    Emits (update-mode) the state-so-far of every session touched by this
    batch; an open session carried in state keeps growing if its user's next
    batch continues it, and each emission for a session supersedes the last
    (n_events is monotone), so the reader reduces with max(n)/min(start)/
    max(end) per (user, session).
    """
    import numpy as np

    (user_id,) = key
    if state.exists:
        sid, last_us, start_us, n = state.get
    else:
        sid, last_us, start_us, n = 0, None, None, 0
    pdf = pd.concat(list(pdfs))
    pdf = pdf.sort_values(["us", "event_id"], kind="mergesort")
    # vectorized gap sessionization: a new session starts where the gap to
    # the previous event (or to the carried state's last event) exceeds
    # the threshold; per-session aggregates reduce over segment bounds —
    # no per-row Python loop
    us = pdf["us"].to_numpy(dtype="int64")
    touched: dict[int, tuple[int, int, int]] = {}
    if len(us):
        prev = np.empty_like(us)
        prev[1:] = us[:-1]
        prev[0] = last_us if last_us is not None else us[0] - SESSION_GAP_US - 1
        new_session = (us - prev) > SESSION_GAP_US
        seg_ids = sid + np.cumsum(new_session)
        starts = np.flatnonzero(new_session)
        bounds = np.concatenate([[0], starts, [len(us)]])
        # segment 0 (before the first flagged start) continues the carried
        # open session when the first row does NOT open a new one
        for i in range(len(bounds) - 1):
            lo, hi = bounds[i], bounds[i + 1]
            if lo == hi:
                continue
            seg_sid = int(seg_ids[lo])
            continuing = seg_sid == sid  # extends the open session in state
            seg_start = start_us if continuing else int(us[lo])
            seg_n = (n if continuing else 0) + (hi - lo)
            touched[seg_sid] = (seg_start, int(us[hi - 1]), seg_n)
        sid = int(seg_ids[-1])
        start_us, last_us, n = touched[sid]
    state.update((sid, last_us, start_us, n))
    yield pd.DataFrame(
        {
            "user_id": [user_id] * len(touched),
            "session_id": list(touched.keys()),
            "n_events": [v[2] for v in touched.values()],
            "start_us": [v[0] for v in touched.values()],
            "end_us": [v[1] for v in touched.values()],
        }
    )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """Keyed stateful sessionization over a stream with columns
    (user_id BIGINT, event_id BIGINT, us BIGINT epoch-micros)."""
    from moonlink_spark.session import ensure_package_on_workers

    ensure_package_on_workers(events.sparkSession)
    return events.groupBy("user_id").applyInPandasWithState(
        _update_sessions,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
