"""Unit tests for the vectorized keyed session state machine: multi-batch
continuation must behave exactly like a reference per-row loop."""

import pandas as pd
import pytest

from moonlink_spark.streaming.stateful import SESSION_GAP_US, _update_sessions

MIN = 60 * 1_000_000  # one minute in micros


class FakeState:
    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def reference_sessions(batches):
    """Per-row loop ground truth over the concatenated stream."""
    sid, last, start, n = 0, None, None, 0
    out = {}
    for us_list in batches:
        for us in sorted(us_list):
            if last is None or us - last > SESSION_GAP_US:
                sid += 1
                start = us
                n = 0
            n += 1
            last = us
            out[sid] = (start, last, n)
    return out


def run_batches(batches):
    state = FakeState()
    emitted = {}
    for us_list in batches:
        pdf = pd.DataFrame(
            {"us": us_list, "event_id": list(range(len(us_list)))}
        )
        for out in _update_sessions((7,), iter([pdf]), state):
            for _, r in out.iterrows():
                emitted[int(r.session_id)] = (
                    int(r.start_us),
                    int(r.end_us),
                    int(r.n_events),
                )
    return emitted


@pytest.mark.parametrize(
    "batches",
    [
        # one batch, two sessions
        [[0, MIN, 2 * MIN, 45 * MIN, 46 * MIN]],
        # session continues across the batch boundary
        [[0, MIN], [2 * MIN, 3 * MIN]],
        # new session opens exactly at the boundary (gap > 30 min)
        [[0, MIN], [40 * MIN]],
        # three batches: continue, break, continue
        [[0], [MIN, 50 * MIN], [51 * MIN, 120 * MIN]],
        # batch with a single event, then long gap
        [[0], [200 * MIN], [201 * MIN]],
        # boundary case: gap of exactly 30 min does NOT break the session
        [[0], [30 * MIN], [60 * MIN + 1]],
    ],
)
def test_matches_reference_loop(batches):
    assert run_batches(batches) == reference_sessions(batches)


def test_empty_batch_preserves_state():
    state = FakeState()
    pdf1 = pd.DataFrame({"us": [0, MIN], "event_id": [0, 1]})
    list(_update_sessions((1,), iter([pdf1]), state))
    snapshot = state.get
    empty = pd.DataFrame({"us": [], "event_id": []})
    out = list(_update_sessions((1,), iter([empty]), state))
    assert state.get == snapshot
    assert sum(len(o) for o in out) == 0
