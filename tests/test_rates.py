"""Counter increase (reset-aware) and time-weighted average: hand-
checkable semantics, PromQL reset rule, trapezoid attribution and
single-sample fallback, exact-integer-path partition invariance."""

import pytest
from pyspark.sql import functions as F

from repurpose_spark.operators.rates import counter_increase, time_weighted_avg


def _series(spark, rows):
    return spark.createDataFrame(
        rows, "k string, ts string, v double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_counter_increase_with_resets(spark):
    """10→15→3(reset)→8 in one day: increase = 5 + 3 + 5 = 13; first
    sample contributes nothing; next-day lone sample's delta (8→20)
    lands in ITS day (later-sample attribution)."""
    df = _series(
        spark,
        [
            ("a", "2024-01-01 00:00:00", 10.0),
            ("a", "2024-01-01 06:00:00", 15.0),
            ("a", "2024-01-01 12:00:00", 3.0),
            ("a", "2024-01-01 18:00:00", 8.0),
            ("a", "2024-01-02 00:00:00", 20.0),
        ],
    )
    out = {
        r.tick.day: (r.increase, r.n_deltas)
        for r in counter_increase(df, ["k"], "ts", "v", "day").collect()
    }
    assert out[1] == (13.0, 3)
    assert out[2] == (12.0, 1)


def test_counter_series_are_independent(spark):
    df = _series(
        spark,
        [
            ("a", "2024-01-01 00:00:00", 100.0),
            ("b", "2024-01-01 01:00:00", 1.0),
            ("a", "2024-01-01 02:00:00", 110.0),
            ("b", "2024-01-01 03:00:00", 4.0),
        ],
    )
    out = {
        r.k: r.increase
        for r in counter_increase(df, ["k"], "ts", "v", "day").collect()
    }
    assert out == {"a": 10.0, "b": 3.0}


def test_twa_trapezoid_and_fallback(spark):
    """v=0 for 12h then v=100 for the rest: trapezoid over [0h,12h,24h→
    only segments within the day] — 0→100 over 12h averages 50, then no
    further segment; day 2 has one sample → plain-average fallback."""
    df = _series(
        spark,
        [
            ("a", "2024-01-01 00:00:00", 0.0),
            ("a", "2024-01-01 12:00:00", 100.0),
            ("a", "2024-01-02 00:00:00", 7.0),
        ],
    )
    out = {
        r.tick.day: (r.twa, r.n_points)
        for r in time_weighted_avg(df, ["k"], "ts", "v", "day").collect()
    }
    assert out[1] == (50.0, 2)  # single segment, mean of endpoints
    assert out[2] == (7.0, 1)   # fallback
    # burst robustness: 10 samples at v=0 in one minute then v=100 for
    # the rest of the day — plain mean is ~9, TWA is ~100·(1-1/1440)
    rows = [("b", f"2024-01-01 00:00:{s:02d}", 0.0) for s in range(10)]
    rows += [("b", "2024-01-01 00:01:00", 100.0),
             ("b", "2024-01-01 23:59:00", 100.0)]
    out2 = time_weighted_avg(
        _series(spark, rows), ["k"], "ts", "v", "day"
    ).collect()[0]
    assert out2.twa > 99.0


def test_twa_int_scale_is_partition_invariant(spark):
    """The exact-integer path must return bit-identical doubles at any
    partition count (the float path is ulp-sensitive to sum order —
    the int path is the certifiable one)."""
    df = spark.range(5000).select(
        (F.col("id") % 3).cast("string").alias("k"),
        F.timestamp_seconds(
            F.lit(1_700_000_000) + (F.col("id") * 7919) % (2 * 86400)
        ).alias("ts"),
        (F.round(((F.col("id") * 104729) % 10000) / 100.0, 2)).alias("v"),
    ).groupBy("k", "ts").agg(F.max("v").alias("v"))
    a = sorted(
        map(
            tuple,
            time_weighted_avg(
                df.repartition(13), ["k"], "ts", "v", "day", int_scale=100
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            time_weighted_avg(
                df.coalesce(1), ["k"], "ts", "v", "day", int_scale=100
            ).collect(),
        )
    )
    assert a == b and len(a) == 9


def test_twa_int_scale_survives_int64_overflow_scale(spark):
    """Review finding: (v + v')·Δt_µs wraps int64 for large gauges ×
    multi-hour gaps under non-ANSI mode; the decimal path must return
    the exact trapezoid instead of wrapped garbage."""
    big = 2.0e7  # cents scale 1e9 each endpoint; 12h gap ≈ 4.3e13 µs
    df = _series(
        spark,
        [
            ("a", "2024-01-01 00:00:00", big),
            ("a", "2024-01-01 12:00:00", 3 * big),
            ("a", "2024-01-01 23:00:00", 3 * big),
        ],
    )
    out = time_weighted_avg(
        df, ["k"], "ts", "v", "day", int_scale=100
    ).collect()[0]
    # exact: (2e7..6e7 ramp over 12h averages 2·big) then (6e7)·11h
    want = (2 * big * 12 + 3 * big * 11) / 23
    assert out.twa > 0 and abs(out.twa - want) / want < 1e-12


class TestRateLimitAdmission:
    def _run(self, spark, secs, **kw):
        import datetime as dt

        from repurpose_spark.operators.rates import rate_limit_admission

        t0 = dt.datetime(2024, 1, 1)
        rows = [("u", t0 + dt.timedelta(seconds=s), i)
                for i, s in enumerate(secs)]
        df = spark.createDataFrame(rows, "k string, ts timestamp, eid long")
        out = rate_limit_admission(
            df, ["k"], ts_col="ts", tie_cols=("eid",), **kw
        ).collect()
        return sorted(out, key=lambda r: r["eid"])

    def test_hand_burst_rejected(self, spark):
        # cap 10, refill 1/s, cost 10: burst at t=0,1,2 → only first
        # admitted; t=12 has refilled 10 → admitted again
        out = self._run(spark, [0, 1, 2, 12], cap=10, refill_per_s=1, cost=10)
        assert [r["admitted"] for r in out] == [True, False, False, True]
        assert [r["bucket_before"] for r in out] == [10, 1, 2, 10]
        assert [r["bucket_after"] for r in out] == [0, 1, 2, 0]
        assert [r["gap_s"] for r in out] == [0, 1, 1, 10]

    def test_cap_clamps_long_idle(self, spark):
        # a week of idle still refills only to cap
        out = self._run(spark, [0, 604800], cap=7, refill_per_s=3, cost=5)
        assert out[1]["bucket_before"] == 7

    def test_rejected_events_do_not_consume(self, spark):
        # cost > cap: nothing ever admitted, bucket rides the clamp
        out = self._run(spark, [0, 100], cap=3, refill_per_s=1, cost=5)
        assert [r["admitted"] for r in out] == [False, False]
        assert [r["bucket_after"] for r in out] == [3, 3]

    def test_random_brute_force(self, spark):
        import random

        rng = random.Random(412)
        secs = sorted(rng.sample(range(0, 5000), 60))
        cap, refill, cost = 40, 2, 25
        out = self._run(spark, secs, cap=cap, refill_per_s=refill, cost=cost)
        b, prev = cap, None
        for r, s in zip(out, secs):
            g = 0 if prev is None else s - prev
            prev = s
            b = min(cap, b + refill * g)
            ok = b >= cost
            assert (r["gap_s"], r["bucket_before"], r["admitted"]) == (g, b, ok)
            if ok:
                b -= cost
            assert r["bucket_after"] == b

    def test_max_points_guard(self, spark):
        import pytest as _pt

        with _pt.raises(Exception, match="max_points"):
            self._run(spark, list(range(30)), cap=5, refill_per_s=1,
                      cost=5, max_points=10)
