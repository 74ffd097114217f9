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
from pyspark.sql import functions as F
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


# ------------------------------------------------------ percentile state
Q_OUT_SCHEMA = (
    "event_type string, tick timestamp, q string, n_points long, "
    "value_est double"
)
Q_STATE_SCHEMA = "q_sketch binary, n_points long"
_Q_LABELS = [("p50", 0.5), ("p90", 0.9), ("p99", 0.99)]


def _quantile_fn(window_ms: int, k: int):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        from repurpose_spark.functions.qsketch import QuantileSketch

        event_type, tick = key
        if state.hasTimedOut:
            # watermark passed the window end: no in-watermark data can
            # still land in it — emit the long-form estimates and clear
            qb, _n = state.get
            state.remove()
            sk = QuantileSketch.from_bytes(bytes(qb))
            vals = sk.quantiles([p for _, p in _Q_LABELS])
            yield pd.DataFrame(
                {
                    "event_type": [event_type] * len(_Q_LABELS),
                    "tick": [pd.Timestamp(tick)] * len(_Q_LABELS),
                    "q": [lab for lab, _ in _Q_LABELS],
                    "n_points": [sk.n] * len(_Q_LABELS),
                    "value_est": vals,
                }
            )
            return
        import numpy as np

        batch = pd.concat(list(pdfs))
        if state.exists:
            qb, _n = state.get
            sk = QuantileSketch.from_bytes(bytes(qb))
        else:
            sk = QuantileSketch(k)
        sk.update(batch["value"].to_numpy(dtype=np.float64, na_value=np.nan))
        state.update((sk.to_bytes(), sk.n))
        tick_ms = int(pd.Timestamp(tick).value // 1_000_000)
        state.setTimeoutTimestamp(
            max(tick_ms + window_ms, state.getCurrentWatermarkMs() + 1)
        )

    return fn


def stateful_quantile_tier(
    events: DataFrame,
    watermark: str = "1 hour",
    window: str = "day",
    k: int = 512,
) -> DataFrame:
    """Streaming twin of the batch percentile tier
    (rollup.py::rollup_quantile_sketch): the per-(event_type, window)
    state IS the mergeable KLL sketch — each micro-batch folds its
    values into the checkpointed sketch bytes, so a window's p50/p90/p99
    update incrementally without re-reading raw (the same
    non-mergeability wall as streaming distinct counts: exact
    percentiles would need every value in state).  Unlike the HLL twin
    (`incremental.py::incremental_uniques_rollup`, a built-in typed
    aggregate), the KLL sketch has no JVM aggregate, so this rides
    ``applyInPandasWithState`` with BINARY state — the pattern for any
    custom sketch.  Emits the long-form (q, value_est) rows the batch
    tier's `quantile_rows` emits, once the watermark passes the window
    end (append mode, exactly once)."""
    window_ms = {"hour": 3_600_000, "day": 86_400_000}[window]
    return (
        events.withColumn("tick", F.date_trunc(window, F.col("ts")))
        .withWatermark("ts", watermark)
        .groupBy("event_type", "tick")
        .applyInPandasWithState(
            _quantile_fn(window_ms, k),
            Q_OUT_SCHEMA,
            Q_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


# --------------------------------------------------- Page-Hinkley state
PH_OUT_SCHEMA = (
    "event_type string, calib_n long, calib_sum long, n_scored long, "
    "max_ph_scaled long, max_ph double, first_alarm_ts timestamp"
)
PH_STATE_SCHEMA = (
    "rn long, sc long, p long, m long, scored long, max_ph long, "
    "first_alarm long"
)


def _ph_fn(calib: int, delta: int, lam: int):
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        event_type = key[0]
        if state.hasTimedOut:
            rn, sc, p, m, scored, max_ph, first_alarm = state.get
            state.remove()
            if rn <= calib:
                return  # burn-in never finished: batch omits the key too
            yield pd.DataFrame(
                {
                    "event_type": [event_type],
                    "calib_n": [calib],
                    "calib_sum": [sc],
                    "n_scored": [rn - calib],
                    "max_ph_scaled": [max_ph],
                    "max_ph": [max_ph / calib],
                    "first_alarm_ts": [
                        pd.Timestamp(first_alarm, unit="us")
                        if first_alarm >= 0
                        else pd.NaT
                    ],
                }
            )
            return
        rows = pd.concat(list(pdfs)).sort_values("tick")
        ts_us = (rows["tick"].astype("int64") // 1000).to_numpy()
        vs = rows["v"].to_numpy()
        if state.exists:
            rn, sc, p, m, scored, max_ph, first_alarm = state.get
        else:
            rn, sc, p, m, scored, max_ph, first_alarm = 0, 0, 0, 0, 0, 0, -1
        for t, v in zip(ts_us, vs):
            rn += 1
            v = int(v)
            if rn <= calib:
                sc += v
                continue
            p += calib * v - sc - calib * delta
            m = p if not scored else min(m, p)
            scored = 1
            ph = p - m
            max_ph = max(max_ph, ph)
            if first_alarm < 0 and ph > calib * lam:
                first_alarm = int(t)
        state.update((rn, sc, p, m, scored, max_ph, first_alarm))
        state.setTimeoutTimestamp(
            max(int(ts_us[-1]) // 1000 + 1, state.getCurrentWatermarkMs() + 1)
        )

    return fn


def stateful_page_hinkley(
    ticks: DataFrame,
    calib: int = 24,
    delta: int = 0,
    lam: int = 0,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming twin of the batch Page–Hinkley alarm
    (operators/drift.py::page_hinkley): the per-key state IS the five
    integers the batch recursion carries (burn-in count + sum, prefix
    sum P, prefix min M, peak PH, first-alarm tick) — a live monitor
    updates micro-batch by micro-batch without re-reading history,
    which is the entire point of an ONLINE drift detector.  Input is a
    tick stream (event_type, tick, v) delivered time-ordered per key
    (the module's ingest contract: cross-file disorder must stay under
    the watermark; in-batch rows are sorted by the handler).

    Integer state makes the streaming/batch equivalence EXACT, not
    approximate: the drained final row per key is byte-identical to the
    batch operator on the same input — certified by the SAME DuckDB
    oracle (the doc_stream_minhash_probe pattern).  Emits once per key
    when the watermark passes its last tick (append mode, exactly
    once); keys still inside burn-in emit nothing, matching the batch
    omission rule."""
    return (
        ticks.withWatermark("tick", watermark)
        .groupBy("event_type")
        .applyInPandasWithState(
            _ph_fn(int(calib), int(delta), int(lam)),
            PH_OUT_SCHEMA,
            PH_STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
