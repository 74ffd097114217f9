"""Custom stateful streaming operator: per-series sessionization via
``applyInPandasWithState``.

The reference chunks each location's observations into per-cell series
and tracks the max gap between consecutive observations
(stack.py:240-261 ``t_max_delta``; img2ts.py per-cell series chunking).
The streaming generalization is a session window with an explicit gap:
consecutive points of one series belong to one session until the series
goes quiet for ``gap``; the closed session row (start, end, count, sum)
is the emitted artifact.

Built-in ``session_window`` covers the plain case; this operator exists
for the semantics the built-in can't express — carrying OPEN sessions in
explicit per-key state across micro-batches and closing them by
event-time timeout when the watermark passes last_ts + gap, emitting
exactly-once closed sessions in append mode.  State is one tiny tuple
per live series (micros, counts) — bounded by live keys, not data.

Scale shape: state lives in the state store partitioned by doc_id (the
same key the tier tables shuffle on); each micro-batch touches only keys
with new data plus timed-out keys.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "doc_id string, session_start timestamp, session_end timestamp, "
    "n_points long, sum_v long"
)
STATE_SCHEMA = "session_start long, last_ts long, n_points long, sum_v long"

_US = 1_000_000


def _emit(doc_id: str, ss: int, ls: int, n: int, sv: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_id": [doc_id],
            "session_start": [pd.Timestamp(ss, unit="us")],
            "session_end": [pd.Timestamp(ls, unit="us")],
            "n_points": [n],
            "sum_v": [sv],
        }
    )


def _session_fn(gap_us: int):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        doc_id = key[0]
        if state.hasTimedOut:
            # watermark passed last_ts + gap: the open session can never
            # be extended by in-watermark data — close and clear
            ss, ls, n, sv = state.get
            state.remove()
            yield _emit(doc_id, ss, ls, n, sv)
            return
        rows = pd.concat(list(pdfs)).sort_values("ts")
        ts_us = (rows["ts"].astype("int64") // 1000).to_numpy()  # ns→us
        vs = rows["token"].to_numpy()
        if state.exists:
            ss, ls, n, sv = state.get
        else:
            ss = ls = int(ts_us[0])
            n = 0
            sv = 0
        for t, v in zip(ts_us, vs):
            t = int(t)
            if n > 0 and t - ls > gap_us:
                # in-stream gap: the running session closed before this
                # point — emit it and start a new one
                yield _emit(doc_id, ss, ls, n, sv)
                ss, n, sv = t, 0, 0
            ls = max(ls, t) if n > 0 else t
            n += 1
            sv += int(v)
        state.update((ss, ls, n, sv))
        # close via event-time timeout once the watermark passes the gap
        # (clamped above the current watermark — very late but
        # in-watermark data could otherwise schedule a past timeout)
        state.setTimeoutTimestamp(
            max(
                ls // 1000 + gap_us // 1000,
                state.getCurrentWatermarkMs() + 1,
            )
        )

    return fn


def stateful_sessionize(
    points: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """points stream (doc_id, ts, token) → closed-session rows.

    Emits a session when (a) a later point of the same series arrives
    more than ``gap`` after it ends (in-stream split), or (b) the
    event-time watermark passes session_end + gap (timeout) — so every
    session is emitted exactly once, in append mode."""
    n, unit = gap.split()
    secs = {"second": 1, "minute": 60, "hour": 3600}[unit.rstrip("s")]
    gap_us = int(n) * secs * _US
    return (
        points.withWatermark("ts", watermark)
        .groupBy("doc_id")
        .applyInPandasWithState(
            _session_fn(gap_us),
            OUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
