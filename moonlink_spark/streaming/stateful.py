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

_STATE_SCHEMA = "n BIGINT, total DOUBLE, mx DOUBLE"


def _update_user_stats(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdfs:
        vals = pdf["value"].dropna()
        n += len(pdf)
        total += float(vals.sum())
        if len(vals):
            mx = max(mx, float(vals.max()))
    state.update((n, total, mx))
    # anomaly rule: max ever seen > 3x the mean of the OTHER events (a spike
    # must not be allowed to inflate its own baseline)
    baseline = (total - mx) / (n - 1) if n > 1 else None
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
