"""Ordered funnel + retention cohorts (operators/funnel.py): hand-built
timelines pin the strict-order semantics and the cohort arithmetic."""

import datetime as dt

import pytest

from repurpose_spark.operators.funnel import funnel_counts, retention_cohorts


def _t(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        # u1: full ordered funnel
        (1, _t(1, 1), "view"),
        (1, _t(1, 2), "click"),
        (1, _t(2, 3), "purchase"),
        # u2: click BEFORE view → stalls at view (strict order)
        (2, _t(1, 5), "click"),
        (2, _t(1, 6), "view"),
        # u3: view+click same ts → strict > excludes the click
        (3, _t(1, 7), "view"),
        (3, _t(1, 7), "click"),
        # u4: purchase only → never enters (no anchor)
        (4, _t(1, 8), "purchase"),
        # u5: view then click, no purchase
        (5, _t(3, 1), "view"),
        (5, _t(4, 1), "click"),
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    ).cache()


def test_funnel_strict_order(ev):
    got = {
        r["step"]: (r["step_name"], r["n_users"])
        for r in funnel_counts(
            ev, ["view", "click", "purchase"]
        ).collect()
    }
    assert got[1] == ("view", 4)  # u1, u2, u3, u5 (u4 has no anchor)
    assert got[2] == ("click", 2)  # u1, u5 (u2 out of order, u3 tied ts)
    assert got[3] == ("purchase", 1)  # u1
    # monotone non-increasing
    assert got[1][1] >= got[2][1] >= got[3][1]


def test_funnel_needs_two_steps(ev):
    with pytest.raises(ValueError):
        funnel_counts(ev, ["view"])


def test_retention_cohorts_hand_values(spark):
    rows = [
        # u1 first seen day 0; returns day 1 and day 3 (twice — distinct)
        (1, _t(1, 1)),
        (1, _t(2, 5)),
        (1, _t(4, 1)),
        (1, _t(4, 9)),
        # u2 first seen day 0 only
        (2, _t(1, 12)),
        # u3 first seen day 2; returns day 3
        (3, _t(3, 2)),
        (3, _t(4, 2)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r["cohort_day"], r["day_offset"]): r["n_users"]
        for r in retention_cohorts(ev).collect()
    }
    d0 = int(_t(1).timestamp()) // 86400
    assert got[(d0, 0)] == 2  # u1, u2
    assert got[(d0, 1)] == 1  # u1
    assert got[(d0, 3)] == 1  # u1 (two events, one distinct day-user)
    assert got[(d0 + 2, 0)] == 1 and got[(d0 + 2, 1)] == 1  # u3
    assert (d0, 2) not in got
    # max_offset prunes the tail
    pruned = retention_cohorts(ev, max_offset=1).collect()
    assert all(r["day_offset"] <= 1 for r in pruned)


class TestLastTouch:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_id long, event_type string"
        )

    def test_hand_attribution(self, spark):
        import datetime as dt
        from repurpose_spark.operators.funnel import last_touch

        t0 = dt.datetime(2024, 1, 1)
        h = dt.timedelta(hours=1)
        rows = [
            (1, t0 + 0 * h, 1, "click"),
            (1, t0 + 1 * h, 2, "view"),
            (1, t0 + 2 * h, 3, "click"),
            (1, t0 + 3 * h, 4, "purchase"),   # ← click at t0+2h, gap 3600
            (2, t0 + 0 * h, 5, "purchase"),   # no prior touch
            (3, t0 + 0 * h, 6, "click"),
            (3, t0 + 100 * h, 7, "purchase"),  # gap 100h > 48h horizon
        ]
        out = {r["user_id"]: r for r in last_touch(
            self._df(spark, rows), "purchase", "click",
            horizon_s=48 * 3600, tie_cols=("event_id",),
        ).collect()}
        assert out[1]["last_touch_ts"] == t0 + 2 * h
        assert out[1]["gap_s"] == 3600 and out[1]["attributed"] is True
        assert out[2]["last_touch_ts"] is None
        assert out[2]["gap_s"] is None and out[2]["attributed"] is False
        assert out[3]["gap_s"] == 100 * 3600 and out[3]["attributed"] is False

    def test_strictly_prior_same_timestamp(self, spark):
        import datetime as dt
        from repurpose_spark.operators.funnel import last_touch

        t0 = dt.datetime(2024, 1, 1)
        # click shares the purchase's timestamp but has a SMALLER tie id
        # → it IS strictly prior in the (ts, event_id) total order
        rows = [(1, t0, 1, "click"), (1, t0, 2, "purchase")]
        r = last_touch(
            self._df(spark, rows), "purchase", "click",
            horizon_s=60, tie_cols=("event_id",),
        ).collect()[0]
        assert r["last_touch_ts"] == t0 and r["gap_s"] == 0
        assert r["attributed"] is True

    def test_latest_of_many_touches_wins(self, spark):
        import datetime as dt
        from repurpose_spark.operators.funnel import last_touch

        t0 = dt.datetime(2024, 1, 1)
        m = dt.timedelta(minutes=1)
        rows = [(1, t0 + i * m, i, "click") for i in range(5)]
        rows.append((1, t0 + 10 * m, 99, "purchase"))
        r = last_touch(
            self._df(spark, rows), "purchase", "click",
            horizon_s=3600, tie_cols=("event_id",),
        ).collect()[0]
        assert r["last_touch_ts"] == t0 + 4 * m and r["gap_s"] == 360
