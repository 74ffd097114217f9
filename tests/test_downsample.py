"""OHLC / rolling z-score / EWMA / LTTB (operators/downsample.py) and
duplicate_spans (operators/dedup.py — the exact-substring fifth tier).

EWMA follows the repo's mirrored-oracle rule (BASELINE.md round-5
lesson): the driver oracle mirrors the closed form, so this file pins
HAND-COMPUTED absolute values too."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from repurpose_spark.operators.downsample import (
    _ewma_block,
    _lttb_series,
    ewma,
    lttb,
    ohlc,
    rolling_zscore,
)
from repurpose_spark.operators.dedup import duplicate_spans


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, minute // 60, minute % 60, second)


def test_ohlc_hand_values(spark):
    rows = [
        # (key, ts, seq, v) — one hour bucket, deliberate ts tie at open
        ("a", _ts(5), 2, 10.0),
        ("a", _ts(5), 1, 7.0),   # same ts, lower seq → THE open
        ("a", _ts(20), 3, 99.0),
        ("a", _ts(59), 4, 3.0),  # latest → close
        ("a", _ts(70), 5, 42.0),  # second bucket
        ("b", _ts(10), 6, 5.0),
    ]
    df = spark.createDataFrame(rows, "key string, ts timestamp, seq long, v double")
    out = {
        (r["key"], r["tick"].hour): r
        for r in ohlc(df, ["key"], "ts", "v", seq_col="seq").collect()
    }
    a0 = out[("a", 0)]
    assert (a0["open"], a0["high"], a0["low"], a0["close"]) == (7.0, 99.0, 3.0, 3.0)
    assert a0["n_points"] == 4 and a0["sum_v"] == 119.0
    assert out[("a", 1)]["open"] == out[("a", 1)]["close"] == 42.0
    assert out[("b", 0)]["n_points"] == 1


def test_rolling_zscore_matches_pandas(spark):
    rng = np.random.RandomState(7)
    vals = rng.randint(0, 1000, size=300) / 10.0
    rows = [("s", _ts(i // 60, i % 60), float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "key string, ts timestamp, v double")
    got = {
        r["ts"]: r["zscore"]
        for r in rolling_zscore(df, ["key"], "ts", "v", n=50, min_points=10).collect()
    }
    s = pd.Series(vals)
    mu = s.rolling(50, min_periods=1).mean().shift(1)
    sd = s.rolling(50, min_periods=1).std(ddof=0).shift(1)
    cnt = s.rolling(50, min_periods=1).count().shift(1).fillna(0)
    for i, (ts, _, v) in enumerate([(r[1], None, r[2]) for r in rows]):
        exp = None
        if cnt[i] >= 10 and sd[i] > 0:
            exp = (v - mu[i]) / sd[i]
        if exp is None:
            assert got[ts] is None
        else:
            assert got[ts] == pytest.approx(exp, rel=1e-9)


def test_ewma_hand_values(spark):
    # α=0.5: y = [1, 1.5, 2.25, 5.125] — independently hand-computed
    rows = [("s", _ts(i), float(x)) for i, x in enumerate([1, 2, 3, 8])]
    df = spark.createDataFrame(rows, "key string, ts timestamp, v double")
    out = sorted(
        ewma(df, ["key"], "ts", "v", alpha=0.5).collect(), key=lambda r: r["ts"]
    )
    assert [r["ewma"] for r in out] == pytest.approx([1.0, 1.5, 2.25, 5.125])


def test_ewma_block_rescale_matches_scalar_recursion():
    rng = np.random.RandomState(3)
    x = rng.rand(1000) * 500
    for alpha in (0.05, 0.3, 0.9):
        got = _ewma_block(x, alpha, block=64)
        y = x[0]
        exact = [y]
        for v in x[1:]:
            y = alpha * v + (1 - alpha) * y
            exact.append(y)
        np.testing.assert_allclose(got, np.array(exact), rtol=1e-12)
    # a block-overflow regression guard: the naive whole-series rescale
    # of 0.7^-4000 overflows double; the blocked path must not
    long = rng.rand(4000)
    assert np.isfinite(_ewma_block(long, 0.3, block=256)).all()


def test_ewma_partition_invariance(spark):
    rows = [("s", _ts(i // 60, i % 60), float((i * 37) % 101)) for i in range(500)]
    df1 = spark.createDataFrame(rows, "key string, ts timestamp, v double")
    a = sorted(ewma(df1, ["key"], "ts", "v").collect(), key=lambda r: r["ts"])
    b = sorted(
        ewma(df1.repartition(7), ["key"], "ts", "v").collect(),
        key=lambda r: r["ts"],
    )
    assert [r["ewma"] for r in a] == [r["ewma"] for r in b]


def test_lttb_series_hand_case():
    # 6 points → 4 out: keep ends; bucket1 = idx {1,2}, bucket2 = {3,4}
    x = np.array([0.0, 1, 2, 3, 4, 5])
    y = np.array([0.0, 0, 10, 0, 5, 0])
    picks = _lttb_series(x, y, 4)
    assert picks[0] == 0 and picks[-1] == 5
    assert picks[1] == 2  # the y=10 spike forms the largest triangle
    # bucket2 vs prev pick (2,10) and end (5,0): area(3,0)=20 > area(4,5)=5
    assert picks[2] == 3
    # n_out >= n → identity
    assert list(_lttb_series(x, y, 10)) == list(range(6))


def test_lttb_spark_matches_local_and_is_partition_invariant(spark):
    n = 720
    rows = [
        ("s", _ts(i // 60, i % 60), float((i * i * 7) % 1009))
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "key string, ts timestamp, v double")
    out = sorted(
        lttb(df, ["key"], "ts", "v", n_out=48).collect(), key=lambda r: r["ts"]
    )
    assert len(out) == 48
    x = np.array(
        [dt.datetime.timestamp(r[1]) for r in rows], dtype=np.float64
    )
    y = np.array([r[2] for r in rows])
    idx = _lttb_series(x, y, 48)
    assert [r["v"] for r in out] == [y[i] for i in idx]
    out2 = sorted(
        lttb(df.repartition(13), ["key"], "ts", "v", n_out=48).collect(),
        key=lambda r: r["ts"],
    )
    assert [r["v"] for r in out2] == [r["v"] for r in out]


def test_duplicate_spans_merges_overlaps(spark):
    # doc A repeats "t0..t4" twice (positions 0..4 and 7..11) and shares
    # "u0..u3 x" with doc B; window=3 → overlapping windows must merge
    a = "t0 t1 t2 t3 t4 q1 q2 t0 t1 t2 t3 t4 z9"
    b = "u0 u1 u2 u3 v8 t1 t2 t3"
    c = "u0 u1 u2 u3 w1 w2"
    df = spark.createDataFrame(
        [("A", a), ("B", b), ("C", c)], "doc_id string, text string"
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"]): r["n_windows"]
        for r in duplicate_spans(df, window=3).collect()
    }
    # A: "t0..t4" occurs twice → windows at 0,1,2 and 7,8,9 → two spans
    # 0-4 and 7-11; plus "t1 t2 t3" also matches doc B at its 5..7 —
    # already inside both spans.
    assert got[("A", 0, 4)] == 3
    assert got[("A", 7, 11)] == 3
    # B: "t1 t2 t3" at 5..7 duplicates A; "u0 u1 u2 u3" shared with C →
    # windows 0,1 → span 0..3
    assert got[("B", 0, 3)] == 2
    assert got[("B", 5, 7)] == 1
    assert got[("C", 0, 3)] == 2
    assert len(got) == 5


def test_duplicate_spans_short_and_unique_docs(spark):
    df = spark.createDataFrame(
        [("A", "a b"), ("B", "c d e f g"), ("C", "a b")],
        "doc_id string, text string",
    )
    # A and C are shorter than the window → no grams → no spans; B's
    # grams are unique
    assert duplicate_spans(df, window=3).count() == 0


def test_rolling_zscore_exact_matches_float_path(spark):
    # signed z² from integer window moments must equal sign(z)·z² of the
    # float path wherever both are defined (same guard semantics), and
    # be bit-identical across partition layouts
    rows = [("s", _ts(i // 60, i % 60), int((i * 37) % 211)) for i in range(200)]
    df = spark.createDataFrame(rows, "key string, ts timestamp, v long")
    zf = {
        r["ts"]: r["zscore"]
        for r in rolling_zscore(
            df, ["key"], "ts", "v", n=24, min_points=10
        ).collect()
    }
    ze = {
        r["ts"]: r["z2"]
        for r in rolling_zscore(
            df, ["key"], "ts", "v", n=24, min_points=10, exact=True
        ).collect()
    }
    assert set(zf) == set(ze)
    both = 0
    for ts, z in zf.items():
        if z is None:
            assert ze[ts] is None
        else:
            assert ze[ts] == pytest.approx(np.sign(z) * z * z, rel=1e-9)
            both += 1
    assert both > 100  # the fixture genuinely exercises the scored region
    ze2 = {
        r["ts"]: r["z2"]
        for r in rolling_zscore(
            df.repartition(13), ["key"], "ts", "v",
            n=24, min_points=10, exact=True,
        ).collect()
    }
    assert ze == ze2  # byte-exact, not approx: the integer-moment claim


def test_rolling_zscore_exact_constant_window_is_null(spark):
    # constant predecessors → zero variance → NULL, never ±inf/NaN
    rows = [("s", _ts(i), 5) for i in range(30)] + [("s", _ts(30), 9)]
    df = spark.createDataFrame(rows, "key string, ts timestamp, v long")
    out = rolling_zscore(
        df, ["key"], "ts", "v", n=24, min_points=10, exact=True
    ).collect()
    assert all(r["z2"] is None for r in out)


def test_autocorr_matches_numpy(spark):
    from repurpose_spark.operators.downsample import autocorr

    rng = np.random.RandomState(11)
    # strong daily-ish cycle (period 24) + noise, integer counts
    base = 50 + 30 * np.sin(2 * np.pi * np.arange(600) / 24)
    vals = (base + rng.randint(0, 20, size=600)).astype(np.int64)
    rows = [("s", _ts(i // 60, i % 60), int(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "key string, ts timestamp, v long")
    got = {
        r["lag"]: r
        for r in autocorr(df, ["key"], "ts", "v", lags=(1, 24)).collect()
    }
    for k in (1, 24):
        x, y = vals[k:].astype(float), vals[:-k].astype(float)
        exp = np.corrcoef(x, y)[0, 1]
        assert got[k]["n_pairs"] == len(vals) - k
        assert got[k]["acf"] == pytest.approx(exp, rel=1e-12)
    # the cycle must actually show: lag-24 ACF far above lag-1
    assert got[24]["acf"] > 0.8 > abs(got[1]["acf"] - 0.8)


def test_autocorr_partition_invariance_and_constant_null(spark):
    from repurpose_spark.operators.downsample import autocorr

    rows = [("s", _ts(i // 60, i % 60), int((i * 37) % 101)) for i in range(500)]
    rows += [("flat", _ts(i // 60, i % 60), 7) for i in range(100)]
    df = spark.createDataFrame(rows, "key string, ts timestamp, v long")
    a = sorted(
        autocorr(df, ["key"], "ts", "v").collect(),
        key=lambda r: (r["key"], r["lag"]),
    )
    b = sorted(
        autocorr(df.repartition(7), ["key"], "ts", "v").collect(),
        key=lambda r: (r["key"], r["lag"]),
    )
    # byte-identical across partition layouts (exact integer moments)
    assert [(r["key"], r["lag"], r["n_pairs"], r["acf"]) for r in a] == [
        (r["key"], r["lag"], r["n_pairs"], r["acf"]) for r in b
    ]
    flat = [r for r in a if r["key"] == "flat"]
    assert flat and all(r["acf"] is None for r in flat)


# ---- M4 downsample ----------------------------------------------------


def test_m4_hand_values(spark):
    from repurpose_spark.operators.downsample import m4

    rows = [
        ("a", _ts(5), 10.0),
        ("a", _ts(20), 99.0),   # max
        ("a", _ts(40), -1.0),   # min
        ("a", _ts(59), 3.0),    # last
        ("a", _ts(70), 42.0),   # lone point, second bucket
    ]
    df = spark.createDataFrame(rows, "key string, ts timestamp, v double")
    out = {(r["key"], r["tick"].hour): r for r in m4(df, ["key"]).collect()}
    a0 = out[("a", 0)]
    assert (a0["ts_first"], a0["v_first"]) == (_ts(5), 10.0)
    assert (a0["ts_min"], a0["v_min"]) == (_ts(40), -1.0)
    assert (a0["ts_max"], a0["v_max"]) == (_ts(20), 99.0)
    assert (a0["ts_last"], a0["v_last"]) == (_ts(59), 3.0)
    assert a0["n_points"] == 4
    a1 = out[("a", 1)]
    assert a1["ts_first"] == a1["ts_min"] == a1["ts_max"] == a1["ts_last"] == _ts(70)


def test_m4_points_dedup_and_tie_rules(spark):
    from repurpose_spark.operators.downsample import m4_points

    rows = [
        # bucket 0: first IS the max and last IS the min → point set of 2
        ("a", _ts(5), 9.0),
        ("a", _ts(50), 1.0),
        # bucket 1: v-ties — vmin must pick EARLIEST of the 2.0s, vmax
        # the LATEST of the 7.0s (documented lexicographic rule)
        ("a", _ts(61), 7.0),
        ("a", _ts(62), 2.0),
        ("a", _ts(63), 2.0),
        ("a", _ts(64), 7.0),
    ]
    df = spark.createDataFrame(rows, "key string, ts timestamp, v double")
    got = sorted(
        (r["tick"].hour, r["ts"], r["v"]) for r in m4_points(df, ["key"]).collect()
    )
    assert got == [
        (0, _ts(5), 9.0),
        (0, _ts(50), 1.0),
        (1, _ts(61), 7.0),   # first
        (1, _ts(62), 2.0),   # earliest min
        (1, _ts(64), 7.0),   # latest max == last (deduped)
    ]


# ---- two-window mean-shift changepoint ---------------------------------


def test_mean_shift_hand_values(spark):
    from repurpose_spark.operators.downsample import mean_shift

    # step series: 10,10,10,10 then 30,30,30,30 — with n=2 the shift at
    # the boundary row (index 4) is (30+30)/2 - (10+10)/2 = 20
    vals = [10, 10, 10, 10, 30, 30, 30, 30]
    rows = [("s", _ts(i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "key string, ts timestamp, v long")
    out = mean_shift(df, ["key"], "ts", "v", n=2, peak_radius=2)
    got = {r["ts"]: (r["shift"], r["is_peak"]) for r in out.collect()}
    # rows 0,1 lack a full left window; row 7 lacks a full right window
    assert got[_ts(0)][0] is None and got[_ts(1)][0] is None
    assert got[_ts(7)][0] is None
    assert got[_ts(2)][0] == 0.0 and got[_ts(3)][0] == 10.0
    assert got[_ts(4)][0] == 20.0 and got[_ts(5)][0] == 10.0
    assert got[_ts(6)][0] == 0.0
    # non-maximum suppression: only the boundary row peaks in its ±2 hood
    assert got[_ts(4)][1] is True
    assert got[_ts(3)][1] is False and got[_ts(5)][1] is False


def test_mean_shift_single_exchange(spark):
    from repurpose_spark.operators.downsample import mean_shift

    rows = [("s", _ts(i), i % 7) for i in range(50)]
    df = spark.createDataFrame(rows, "key string, ts timestamp, v long")
    plan = (
        mean_shift(df, ["key"], "ts", "v", n=5, peak_radius=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # all three window passes ride one clustering: exactly one shuffle
    assert plan.count("Exchange hashpartitioning") == 1


def test_holt_matches_scalar_replay(spark):
    import numpy as np

    from repurpose_spark.operators.downsample import holt

    rng = np.random.RandomState(21)
    vals = [int(v) for v in rng.randint(0, 1000, size=200)]
    rows = [("s", _ts(i), v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "key string, tick timestamp, v long")
    got = {
        r["tick"]: r
        for r in holt(df, ["key"], "tick", "v", alpha=0.3, beta=0.1).collect()
    }
    # identical arithmetic order → byte-exact equality with the replay
    l, b = float(vals[0]), 0.0
    assert got[_ts(0)]["level"] == l and got[_ts(0)]["trend"] == 0.0
    for i in range(1, 200):
        lt = 0.3 * float(vals[i]) + (1.0 - 0.3) * (l + b)
        b = 0.1 * (lt - l) + (1.0 - 0.1) * b
        l = lt
        r = got[_ts(i)]
        assert r["level"] == l and r["trend"] == b and r["forecast"] == l + b, i


def test_holt_constant_series_has_zero_trend(spark):
    from repurpose_spark.operators.downsample import holt

    rows = [("s", _ts(i), 42) for i in range(50)]
    df = spark.createDataFrame(rows, "key string, tick timestamp, v long")
    out = holt(df, ["key"], "tick", "v").collect()
    assert all(r["level"] == 42.0 and r["trend"] == 0.0 for r in out)


def test_holt_tracks_linear_ramp(spark):
    # on x_t = t the forecast converges toward the true next value
    from repurpose_spark.operators.downsample import holt

    rows = [("s", _ts(i), i * 10) for i in range(300)]
    df = spark.createDataFrame(rows, "key string, tick timestamp, v long")
    last = sorted(
        holt(df, ["key"], "tick", "v").collect(), key=lambda r: r["tick"]
    )[-1]
    # next true value is 3000; converged Holt sits within a few percent
    assert abs(last["forecast"] - 3000.0) < 60.0


def test_sax_breakpoints_and_hand_symbols(spark):
    from repurpose_spark.operators.downsample import sax, sax_breakpoints

    bps = sax_breakpoints(4)
    assert bps[1] == 0.0 and bps[0] == -bps[2]
    # 8 points, 4 frames of 2: frame means 1, 3, 5, 7; mean 4,
    # sd_pop sqrt(...) -> z-signs split symbols a/b/c/d exactly
    rows = [("s", i, v) for i, v in enumerate([0, 2, 2, 4, 4, 6, 6, 8])]
    df = spark.createDataFrame(rows, "key string, tick long, v long")
    out = {
        r["frame"]: (r["paa"], r["symbol"])
        for r in sax(df, ["key"], "tick", "v", n_frames=4, alphabet=4).collect()
    }
    assert [out[f][0] for f in range(4)] == [1.0, 3.0, 5.0, 7.0]
    # z = (paa-4)/sd with sd_pop ~ 2.449: z = [-1.22, -0.41, 0.41, 1.22]
    # vs breakpoints (-0.674, 0, 0.674) -> symbols a, b, c, d
    assert [out[f][1] for f in range(4)] == ["a", "b", "c", "d"]


def test_sax_constant_series_null_symbol_and_partition_invariance(spark):
    from repurpose_spark.operators.downsample import sax

    rows = [("c", i, 5) for i in range(12)]
    rng = np.random.RandomState(3)
    rows += [("r", i, int(rng.randint(0, 1000))) for i in range(37)]
    ref = None
    for parts in (1, 8):
        df = spark.createDataFrame(
            rows, "key string, tick long, v long"
        ).repartition(parts)
        got = sorted(
            (r["key"], r["frame"], r["n_pts"], r["paa"], r["symbol"])
            for r in sax(df, ["key"], "tick", "v", n_frames=8).collect()
        )
        if ref is None:
            ref = got
        else:
            assert got == ref  # byte-identical across layouts
    consts = [g for g in ref if g[0] == "c"]
    assert len(consts) == 8 and all(g[4] is None for g in consts)
    # ragged split: 37 points over 8 frames -> sizes differ by <=1
    sizes = [g[2] for g in ref if g[0] == "r"]
    assert sum(sizes) == 37 and max(sizes) - min(sizes) <= 1


def test_sax_zero_python_plan(spark):
    # the sax plan must stay entirely JVM-side: no Arrow/Python eval
    from repurpose_spark.operators.downsample import sax

    df = spark.createDataFrame(
        [("s", i, i) for i in range(16)], "key string, tick long, v long"
    )
    plan = sax(df, ["key"], "tick", "v")._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_haar_energy_hand_values(spark):
    from repurpose_spark.operators.downsample import haar_energy

    # series a: 8 points → 4+2+1 coefficients across 3 levels
    vals = [4.0, 2.0, 6.0, 8.0, 1.0, 1.0, 5.0, 3.0]
    rows = [("a", _ts(m), m, v) for m, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "key string, ts timestamp, event_id long, value double"
    )
    out = {
        (r["key"], r["level"]): (r["n_coef"], r["detail_e8"])
        for r in haar_energy(
            df, keys=("key",), order_cols=("event_id",), levels=3
        ).collect()
    }
    # l1 details: (4-2)/2=1, (6-8)/2=-1, 0, 1 → ticks 1e4 → e8: 3e8
    assert out[("a", 1)] == (4, 3 * 10**8)
    # l1 approx: 3, 7, 1, 4 → l2 details: (3-7)/2=-2, (1-4)/2=-1.5
    assert out[("a", 2)] == (2, (2 * 10**4) ** 2 + (15 * 10**3) ** 2)
    # l2 approx: 5, 2.5 → l3 detail: 1.25
    assert out[("a", 3)] == (1, (125 * 10**2) ** 2)


def test_haar_energy_tail_drop_and_partition_invariance(spark):
    from repurpose_spark.operators.downsample import haar_energy

    # 7 points: l1 pairs 3 (7th dropped), l2 pairs 1 (3rd l1 approx
    # dropped), l3 has 0 complete pairs → no level-3 row for the key
    vals = [float(x) for x in (9, 1, 4, 4, 2, 8, 99)]
    rows = [("k", _ts(m), m, v) for m, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "key string, ts timestamp, event_id long, value double"
    )
    got = sorted(
        map(
            tuple,
            haar_energy(
                df, keys=("key",), order_cols=("event_id",), levels=3
            ).collect(),
        )
    )
    assert [(k, lv, n) for k, lv, n, _ in got] == [("k", 1, 3), ("k", 2, 1)]
    repartitioned = sorted(
        map(
            tuple,
            haar_energy(
                df.repartition(7),
                keys=("key",),
                order_cols=("event_id",),
                levels=3,
            ).collect(),
        )
    )
    assert repartitioned == got


class TestEquidepthProfile:
    def test_ntile_balance_and_stats(self, spark):
        from repurpose_spark.operators.downsample import equidepth_profile

        rows = [("k", i, v) for i, v in enumerate([5, 1, 9, 3, 7, 2, 8, 4, 6])]
        df = spark.createDataFrame(rows, "k string, rid long, v long")
        out = equidepth_profile(df, ["k"], "v", tie_cols=("rid",), k=4)
        got = {r["tile"]: r.asDict() for r in out.collect()}
        # n=9, k=4: tile sizes 3,2,2,2 over sorted [1..9]
        assert [got[t]["n"] for t in (1, 2, 3, 4)] == [3, 2, 2, 2]
        assert (got[1]["min_v"], got[1]["max_v"], got[1]["sum_v"]) == (1, 3, 6)
        assert (got[4]["min_v"], got[4]["max_v"]) == (8, 9)

    def test_k_validation(self, spark):
        import pytest as _pt

        from repurpose_spark.operators.downsample import equidepth_profile

        df = spark.createDataFrame([("k", 1, 1)], "k string, rid long, v long")
        with _pt.raises(ValueError, match="k must"):
            equidepth_profile(df, ["k"], "v", k=0)
