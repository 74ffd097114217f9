"""Robust statistics (operators/robust.py) and co-occurrence lift
(operators/cooccur.py).

Mirrored-oracle rule (BASELINE.md round-5 lesson): the driver oracles
mirror the same algebra, so this file pins HAND-COMPUTED values and
independent pandas/numpy references too."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from repurpose_spark.operators.cooccur import bigram_lift
from repurpose_spark.operators.robust import (
    cross_corr,
    mad_flags,
    rolling_median,
    seasonal_profile,
    seasonal_residual,
)


def _hr(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(hours=i)


def test_rolling_median_matches_pandas(spark):
    rng = np.random.RandomState(11)
    vals = rng.randint(0, 100, size=200)
    rows = [("s", _hr(i), int(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "key string, ts timestamp, v long")
    got = {
        r["ts"]: r["med"]
        for r in rolling_median(
            df, ["key"], "ts", "v", before=3, after=3
        ).collect()
    }
    ref = (
        pd.Series(vals).rolling(window=7, center=True, min_periods=1).median()
    )
    for i in range(200):
        # int64 medians are dyadic rationals — compare EXACTLY
        assert got[_hr(i)] == ref.iloc[i], i


def test_rolling_median_single_exchange(spark):
    df = spark.createDataFrame(
        [("s", _hr(i), i) for i in range(10)],
        "key string, ts timestamp, v long",
    )
    plan = rolling_median(df, ["key"], "ts", "v")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_mad_flags_hand_values(spark):
    # median 4.5, devs sorted [.5,.5,1.5,1.5,2.5,2.5,3.5,95.5] → MAD 2.0,
    # threshold 3·2.0 = 6.0: only the 100 flags
    vals = [1, 2, 3, 4, 5, 6, 7, 100]
    df = spark.createDataFrame(
        [("a", _hr(i), v) for i, v in enumerate(vals)],
        "key string, ts timestamp, v long",
    )
    out = {r["v"]: r for r in mad_flags(df, ["key"], "ts", "v", k=3).collect()}
    assert out[100]["med"] == 4.5 and out[100]["mad"] == 2.0
    assert out[100]["is_outlier"] is True
    assert all(out[v]["is_outlier"] is False for v in vals if v != 100)


def test_mad_zero_series_emits_null_flags(spark):
    # ≥50 % of slots at the median → MAD 0 → honest NULL, never all-True
    df = spark.createDataFrame(
        [("a", _hr(i), v) for i, v in enumerate([5, 5, 5, 5, 5, 9])],
        "key string, ts timestamp, v long",
    )
    out = mad_flags(df, ["key"], "ts", "v").collect()
    assert all(r["is_outlier"] is None for r in out)
    assert all(r["mad"] == 0.0 for r in out)


def _grid(rows):
    return "grp string, s string, ts timestamp, v long", rows


def test_cross_corr_detects_exact_shift(spark):
    rng = np.random.RandomState(3)
    x = rng.randint(0, 50, size=32)
    rows = [("g", "a", _hr(i), int(x[i])) for i in range(30)]
    # y leads x by 2 slots: y[t] = x[t+2] → at lag 2, y_{t−2} = x_t
    rows += [("g", "b", _hr(i), int(x[i + 2])) for i in range(30)]
    schema, rows = _grid(rows)
    df = spark.createDataFrame(rows, schema)
    out = {
        r["lag"]: r
        for r in cross_corr(
            df, ["grp"], "s", "a", "b", ts_col="ts", value_col="v",
            lags=(0, 2),
        ).collect()
    }
    assert out[2]["xcf"] == 1.0  # identical pairs → exactly 1
    assert out[2]["n_pairs"] == 28
    ref0 = np.corrcoef(x[:30], x[2:32])[0, 1]
    assert out[0]["xcf"] == pytest.approx(ref0, rel=1e-12)


def test_cross_corr_constant_series_is_null(spark):
    rows = [("g", "a", _hr(i), 7) for i in range(10)]
    rows += [("g", "b", _hr(i), i) for i in range(10)]
    schema, rows = _grid(rows)
    df = spark.createDataFrame(rows, schema)
    out = cross_corr(df, ["grp"], "s", "a", "b", lags=(0,)).collect()
    assert len(out) == 1 and out[0]["xcf"] is None


def test_seasonal_residual_zero_on_pure_seasonal_signal(spark):
    # v is a pure function of (weekday, hour) over 3 full weeks → the
    # profile reproduces every slot exactly and residuals vanish
    rows = [
        ("k", _hr(i), _hr(i).weekday() * 100 + _hr(i).hour)
        for i in range(21 * 24)
    ]
    df = spark.createDataFrame(rows, "key string, ts timestamp, v long")
    out = seasonal_residual(df, ["key"], "ts", "v").collect()
    assert len(out) == 21 * 24
    assert all(r["resid"] == 0.0 for r in out)
    prof = seasonal_profile(df, ["key"], "ts", "v").collect()
    assert len(prof) == 168
    assert all(p["n_slots"] == 3 for p in prof)


def test_seasonal_profile_mean_hand_value(spark):
    # two Mondays 00:00 with 4 and 5 → mean 4.5; dow is ISO Monday=0
    rows = [
        ("k", dt.datetime(2024, 1, 1, 0), 4),   # Monday
        ("k", dt.datetime(2024, 1, 8, 0), 5),   # next Monday
        ("k", dt.datetime(2024, 1, 7, 0), 9),   # Sunday
    ]
    df = spark.createDataFrame(rows, "key string, ts timestamp, v long")
    prof = {
        (p["dow"], p["hod"]): p
        for p in seasonal_profile(df, ["key"], "ts", "v").collect()
    }
    assert prof[(0, 0)]["mean_v"] == 4.5 and prof[(0, 0)]["n_slots"] == 2
    assert prof[(6, 0)]["mean_v"] == 9.0


def test_bigram_lift_hand_values(spark):
    # corpus: "x y x y" + "x y z" → N=7; c(x)=3 c(y)=3 c(z)=1;
    # bigrams (x,y)=3 (y,x)=1 (y,z)=1
    df = spark.createDataFrame(
        [("X y x Y",), ("x y z",)], "text string"
    )
    got = [
        (r["w1"], r["w2"], r["c_xy"], r["c_x"], r["c_y"], r["lift"])
        for r in bigram_lift(df, min_count=1, k=10).collect()
    ]
    # lift ties (x,y) and (y,z) at exactly 7/3 break on w1
    assert got == [
        ("x", "y", 3, 3, 3, 21.0 / 9.0),
        ("y", "z", 1, 3, 1, 7.0 / 3.0),
        ("y", "x", 1, 3, 3, 7.0 / 9.0),
    ]


def test_bigram_lift_min_count_and_k(spark):
    df = spark.createDataFrame([("x y x y",), ("x y z",)], "text string")
    got = bigram_lift(df, min_count=2, k=10).collect()
    assert [(r["w1"], r["w2"]) for r in got] == [("x", "y")]
    got1 = bigram_lift(df, min_count=1, k=1).collect()
    assert len(got1) == 1 and got1[0]["w1"] == "x"


def test_hampel_hand_values(spark):
    # flat-10 series with one spike: window median 10, window MAD > 0
    # via the neighbours 9/11 — the spike repairs to the median
    vals = [10, 9, 11, 10, 100, 10, 9, 11, 10]
    df = spark.createDataFrame(
        [("a", _hr(i), v) for i, v in enumerate(vals)],
        "key string, ts timestamp, v long",
    )
    from repurpose_spark.operators.robust import hampel

    out = {
        r["ts"]: r
        for r in hampel(df, ["key"], "ts", "v", half_width=3, k=3).collect()
    }
    spike = out[_hr(4)]
    assert spike["is_spike"] is True and spike["repaired"] == spike["med"]
    assert out[_hr(0)]["is_spike"] is False
    assert out[_hr(0)]["repaired"] == 10.0


def test_hampel_zero_mad_window_passthrough(spark):
    # a constant window has MAD 0 → honest NULL flag, value passes
    vals = [5, 5, 5, 5, 5, 5, 5]
    df = spark.createDataFrame(
        [("a", _hr(i), v) for i, v in enumerate(vals)],
        "key string, ts timestamp, v long",
    )
    from repurpose_spark.operators.robust import hampel

    out = hampel(df, ["key"], "ts", "v", half_width=2).collect()
    assert all(r["is_spike"] is None for r in out)
    assert all(r["repaired"] == 5.0 for r in out)


def test_hampel_matches_python_replay(spark):
    rng = np.random.RandomState(5)
    vals = [int(v) for v in rng.randint(0, 40, size=120)]
    df = spark.createDataFrame(
        [("a", _hr(i), v) for i, v in enumerate(vals)],
        "key string, ts timestamp, v long",
    )
    from repurpose_spark.operators.robust import hampel

    got = {
        r["ts"]: r
        for r in hampel(df, ["key"], "ts", "v", half_width=3, k=3).collect()
    }

    def interp_median(xs):
        s = sorted(xs)
        n = len(s)
        return float(s[n // 2]) if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2

    for i in range(120):
        w = vals[max(0, i - 3): i + 4]
        med = interp_median(w)
        mad = interp_median([abs(float(e) - med) for e in w])
        r = got[_hr(i)]
        assert r["med"] == med and r["mad"] == mad, i
        if mad > 0:
            assert r["is_spike"] is (abs(vals[i] - med) > 3 * mad), i
        else:
            assert r["is_spike"] is None, i


def test_rolling_corr_matches_exact_replay(spark):
    import math

    rng = np.random.RandomState(9)
    xs = [int(v) for v in rng.randint(0, 30, size=100)]
    ys = [int(v) for v in rng.randint(0, 30, size=100)]
    rows = [("g", _hr(i), xs[i], ys[i]) for i in range(100)]
    df = spark.createDataFrame(
        rows, "grp string, ts timestamp, x long, y long"
    )
    from repurpose_spark.operators.robust import rolling_corr

    got = {
        r["ts"]: r for r in rolling_corr(df, ["grp"], "ts", "x", "y", n=10).collect()
    }
    for i in range(100):
        r = got[_hr(i)]
        if i < 9:
            assert r["rcorr"] is None and r["n_w"] == i + 1
            continue
        wx, wy = xs[i - 9: i + 1], ys[i - 9: i + 1]
        n = 10
        sx, sy = sum(wx), sum(wy)
        sxy = sum(a * b for a, b in zip(wx, wy))
        sxx, syy = sum(a * a for a in wx), sum(b * b for b in wy)
        va, vb = n * sxx - sx * sx, n * syy - sy * sy
        if va > 0 and vb > 0:
            # the same 3 IEEE ops → byte-exact equality
            ref = float(n * sxy - sx * sy) / (
                math.sqrt(float(va)) * math.sqrt(float(vb))
            )
            assert r["rcorr"] == ref, i
        else:
            assert r["rcorr"] is None, i


def test_seasonal_decompose_constant_series(spark):
    rows = [("k", _hr(i), 7) for i in range(21 * 24)]
    df = spark.createDataFrame(rows, "key string, ts timestamp, v long")
    from repurpose_spark.operators.robust import seasonal_decompose

    out = seasonal_decompose(df, ["key"], "ts", "v", half_width=12).collect()
    assert len(out) == 21 * 24
    assert all(
        r["trend"] == 7.0 and r["seasonal"] == 0.0 and r["resid"] == 0.0
        for r in out
    )


def test_seasonal_decompose_matches_python_replay(spark):
    rng = np.random.RandomState(13)
    vals = [int(v) for v in rng.randint(0, 20, size=14 * 24)]
    rows = [("k", _hr(i), vals[i]) for i in range(14 * 24)]
    df = spark.createDataFrame(rows, "key string, ts timestamp, v long")
    from repurpose_spark.operators.robust import seasonal_decompose

    got = {
        r["ts"]: r
        for r in seasonal_decompose(df, ["key"], "ts", "v", half_width=12).collect()
    }
    trend = (
        pd.Series(vals)
        .rolling(window=25, center=True, min_periods=1)
        .median()
    )
    d2 = [int(2 * (vals[i] - trend.iloc[i])) for i in range(len(vals))]
    prof: dict = {}
    for i in range(len(vals)):
        kk = (_hr(i).weekday(), _hr(i).hour)
        prof.setdefault(kk, []).append(d2[i])
    for i in range(len(vals)):
        kk = (_hr(i).weekday(), _hr(i).hour)
        seasonal = float(sum(prof[kk])) / (2 * len(prof[kk]))
        r = got[_hr(i)]
        assert r["trend"] == trend.iloc[i], i
        assert r["seasonal"] == seasonal, i
        assert r["resid"] == float(d2[i]) / 2 - seasonal, i


def test_token_entropy_hand_values(spark):
    import math

    from repurpose_spark.operators.cooccur import token_entropy

    df = spark.createDataFrame(
        [(1, "x x y"), (2, "a b c d"), (3, "z z z z")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in token_entropy(df).collect()}
    # H = ln(N) − (1/N)·Σ c·ln c
    assert got[1]["n_tok"] == 3
    assert got[1]["entropy"] == pytest.approx(
        math.log(3) - (2 * math.log(2)) / 3, rel=1e-12
    )
    assert got[2]["entropy"] == pytest.approx(math.log(4), rel=1e-12)
    assert got[3]["entropy"] == 0.0  # fully repetitive → zero entropy
    # diversity orders the scores
    assert got[2]["entropy"] > got[1]["entropy"] > got[3]["entropy"]


def test_theil_sen_hand_values(spark):
    # y = 3x + 10 with one wild outlier at x=4: OLS slope moves far
    # from 3, Theil-Sen stays exactly 3 (the outlier touches only 4 of
    # the 15 pairwise slopes - below the breakdown point)
    from repurpose_spark.operators.robust import theil_sen

    pts = [(0, 10), (1, 13), (2, 16), (3, 19), (4, 1000)]
    df = spark.createDataFrame(
        [("s", t, v) for t, v in pts], "key string, t long, v long"
    )
    row = theil_sen(df, ["key"], "t", "v").collect()[0]
    assert row["slope"] == 3.0
    # residuals at slope 3: [10,10,10,10,988] -> lower median 10
    assert row["icpt"] == 10.0
    assert row["n_pts"] == 5 and row["n_pairs"] == 10


def test_theil_sen_matches_numpy_replay_and_partition_invariance(spark):
    from repurpose_spark.operators.robust import theil_sen

    rng = np.random.RandomState(7)
    rows = []
    for k in ("a", "b"):
        for t in range(40):
            rows.append((k, t, int(rng.randint(-500, 500) + 7 * t)))
    ref = {}
    for k in ("a", "b"):
        t = np.array([r[1] for r in rows if r[0] == k], dtype=np.int64)
        v = np.array([r[2] for r in rows if r[0] == k], dtype=np.int64)
        i, j = np.triu_indices(len(t), 1)
        s = np.sort((v[j] - v[i]).astype(float) / (t[j] - t[i]).astype(float))
        slope = s[(s.size - 1) // 2]
        resid = np.sort(v.astype(float) - slope * t.astype(float))
        ref[k] = (slope, resid[(resid.size - 1) // 2])
    for parts in (1, 7):
        df = spark.createDataFrame(rows, "key string, t long, v long").repartition(
            parts
        )
        got = {
            r["key"]: (r["slope"], r["icpt"])
            for r in theil_sen(df, ["key"], "t", "v").collect()
        }
        assert got == ref, parts


def test_theil_sen_degenerate_and_cap(spark):
    from repurpose_spark.operators.robust import theil_sen

    # single point: no pairs -> NULL slope/icpt, counted row survives
    df = spark.createDataFrame([("s", 5, 42)], "key string, t long, v long")
    row = theil_sen(df, ["key"], "t", "v").collect()[0]
    assert row["slope"] is None and row["icpt"] is None
    assert row["n_pts"] == 1 and row["n_pairs"] == 0
    # duplicate-t pairs are excluded from the slope multiset
    df2 = spark.createDataFrame(
        [("s", 0, 0), ("s", 0, 100), ("s", 1, 3)],
        "key string, t long, v long",
    )
    row2 = theil_sen(df2, ["key"], "t", "v").collect()[0]
    assert row2["n_pairs"] == 2  # (0,0)-(1,3) and (0,100)-(1,3) only
    # max_points guard raises rather than going quadratic on raw data
    big = spark.createDataFrame(
        [("s", i, i) for i in range(30)], "key string, t long, v long"
    )
    with pytest.raises(Exception, match="max_points"):
        theil_sen(big, ["key"], "t", "v", max_points=10).collect()


def test_duckdb_quantile_disc_is_lower_median():
    # the ev_theil_sen certification rests on this engine fact: DuckDB's
    # quantile_disc(x, 0.5) picks EXACTLY sorted(x)[(n-1)//2]
    import duckdb

    con = duckdb.connect()
    cases = [
        [1.0, 2.0, 3.0, 4.0],
        [5.0, 1.0, 9.0],
        [2.0, 2.0, 7.0, 7.0],
        [1.0, 2.0],
        [0.1 + 0.2, 0.3, -1.5, -1.5],  # near-tie doubles
    ]
    for vals in cases:
        got = con.execute(
            "SELECT quantile_disc(x, 0.5) FROM (SELECT unnest(?::DOUBLE[]) x)",
            [vals],
        ).fetchone()[0]
        assert got == np.sort(vals)[(len(vals) - 1) // 2], vals


# ---------------------------------------------------------------- trimmed


class TestTrimmedAgg:
    def _run(self, spark, vals, frac=0.1):
        from repurpose_spark.operators.robust import trimmed_agg

        rows = [("g", i, v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "g string, rid long, v long")
        out = trimmed_agg(
            df, by=("g",), value_col="v", tie_cols=("rid",), trim_frac=frac
        )
        return out.collect()[0].asDict()

    def test_drops_k_each_tail(self, spark):
        # n=10, k=1: drop min (−1000) and max (1000)
        got = self._run(spark, [-1000, 1, 2, 3, 4, 5, 6, 7, 8, 1000])
        assert got["n_total"] == 10
        assert got["n_kept"] == 8
        assert got["sum_kept"] == sum(range(1, 9))
        assert (got["min_kept"], got["max_kept"]) == (1, 8)

    def test_kept_multiset_tie_invariant(self, spark):
        # ties straddle the cut: k=1 on [5,5,5,9] drops ONE 5 and the 9
        got = self._run(spark, [5, 5, 5, 9], frac=0.25)
        assert got["n_kept"] == 2
        assert got["sum_kept"] == 10
        assert (got["min_kept"], got["max_kept"]) == (5, 5)

    def test_small_group_keeps_nothing(self, spark):
        # n=2, frac=0.5 is invalid; frac=0.49 → k=0 keeps all;
        # n=1 with frac just under .5 → k=0 too.  Empty-kept needs
        # n ≤ 2k, i.e. frac high enough: n=3, frac=0.4 → k=1, keeps 1
        got = self._run(spark, [1, 2, 3], frac=0.4)
        assert (got["n_kept"], got["sum_kept"]) == (1, 2)

    def test_zero_frac_is_plain_agg(self, spark):
        got = self._run(spark, [4, 2, 9], frac=0.0)
        assert got["n_kept"] == 3
        assert got["sum_kept"] == 15

    def test_validates_frac(self, spark):
        from repurpose_spark.operators.robust import trimmed_agg

        df = spark.createDataFrame([("g", 1, 1)], "g string, rid long, v long")
        with pytest.raises(ValueError, match="trim_frac"):
            trimmed_agg(df, by=("g",), value_col="v", trim_frac=0.5)


# ---------------------------------------------------------------- heaps


class TestHeapsSlope:
    def test_matches_numpy_fit(self, spark):
        from repurpose_spark.operators.cooccur import heaps_slope

        docs = [
            ("s", "d0", "a b c"),
            ("s", "d1", "a b d e"),
            ("s", "d2", "a f"),
            ("s", "d3", "g g g h"),
        ]
        df = spark.createDataFrame(docs, "source string, doc_id string, text string")
        got = heaps_slope(df, by=("source",)).collect()[0].asDict()
        # boundaries: N = 3,7,9,13  V = 3,5,6,8
        assert got["n_docs"] == 4
        assert got["vocab"] == 8
        N = np.array([3, 7, 9, 13], dtype=float)
        V = np.array([3, 5, 6, 8], dtype=float)
        x, y = np.log(N), np.log(V)
        beta = ((len(x) * (x * y).sum() - x.sum() * y.sum())
                / (len(x) * (x * x).sum() - x.sum() ** 2))
        assert abs(got["heaps_beta"] - beta) < 1e-9

    def test_empty_doc_repeats_boundary(self, spark):
        from repurpose_spark.operators.cooccur import heaps_slope

        docs = [("s", "d0", "a b"), ("s", "d1", " "), ("s", "d2", "c")]
        df = spark.createDataFrame(docs, "source string, doc_id string, text string")
        got = heaps_slope(df, by=("source",)).collect()[0].asDict()
        # d1 tokenizes to nothing: boundary repeats (N=2, V=2)
        assert got["n_docs"] == 3
        assert got["vocab"] == 3

    def test_single_doc_null_beta(self, spark):
        from repurpose_spark.operators.cooccur import heaps_slope

        df = spark.createDataFrame(
            [("s", "d0", "a b a")], "source string, doc_id string, text string"
        )
        got = heaps_slope(df, by=("source",)).collect()[0].asDict()
        assert got["n_docs"] == 1 and got["vocab"] == 2
        assert got["heaps_beta"] is None


# ---------------------------------------------------------------- spearman


class TestSpearmanCorr:
    def _run(self, spark, pairs):
        from repurpose_spark.operators.robust import spearman_corr

        df = spark.createDataFrame(
            [("g", x, y) for x, y in pairs], "g string, x long, y long"
        )
        return spearman_corr(df, by=("g",), x_col="x", y_col="y").collect()[
            0
        ].asDict()

    def test_perfect_monotone_nonlinear(self, spark):
        # y = x^3 is monotone: Pearson < 1 but Spearman == 1 exactly
        got = self._run(spark, [(1, 1), (2, 8), (3, 27), (4, 64)])
        assert got["n_pairs"] == 4
        # sqrt(v)*sqrt(v) rounds once, so "exactly 1" lands within
        # 1 ulp — deterministically (the oracle matches byte-for-byte)
        assert abs(got["spearman_rho"] - 1.0) < 1e-15

    def test_ties_average_ranks(self, spark):
        # x = [1,2,2,3], y = [10,20,20,40]: tied middle pair on both
        # sides → average ranks align perfectly, rho == 1.0
        got = self._run(spark, [(1, 10), (2, 20), (2, 20), (3, 40)])
        assert abs(got["spearman_rho"] - 1.0) < 1e-15
        # break the tie correspondence: x ties where y doesn't
        got2 = self._run(spark, [(1, 10), (2, 20), (2, 30), (3, 40)])
        assert 0.9 < got2["spearman_rho"] < 1.0

    def test_reversed_is_minus_one(self, spark):
        got = self._run(spark, [(1, 30), (2, 20), (3, 10)])
        assert abs(got["spearman_rho"] + 1.0) < 1e-15

    def test_constant_side_null(self, spark):
        got = self._run(spark, [(1, 5), (2, 5), (3, 5)])
        assert got["spearman_rho"] is None


# ---------------------------------------------------------------- drawdown


class TestMaxDrawdown:
    def _run(self, spark, flows):
        from repurpose_spark.operators.robust import max_drawdown

        rows = [("g", i, f) for i, f in enumerate(flows)]
        df = spark.createDataFrame(rows, "g string, t long, flow long")
        return max_drawdown(
            df, by=("g",), ts_col="t", value_col="flow"
        ).collect()[0].asDict()

    def test_classic_shape(self, spark):
        # cum: 10, 30, 15, 5, 25 → peak 30, trough-after-peak 5 → dd 25
        got = self._run(spark, [10, 20, -15, -10, 20])
        assert got["n_points"] == 5
        assert got["final_v"] == 25
        assert got["peak_v"] == 30
        assert got["max_drawdown"] == 25

    def test_monotone_up_zero_drawdown(self, spark):
        got = self._run(spark, [1, 2, 3])
        assert got["max_drawdown"] == 0
        assert got["peak_v"] == got["final_v"] == 6

    def test_all_down(self, spark):
        # cum: -5, -9, -12 → peak -5, dd = 7
        got = self._run(spark, [-5, -4, -3])
        assert got["peak_v"] == -5
        assert got["max_drawdown"] == 7


class TestMannKendall:
    def _run(self, spark, series, **kw):
        from repurpose_spark.operators.robust import mann_kendall

        rows = [("k", t, v) for t, v in enumerate(series)]
        df = spark.createDataFrame(rows, "k string, t long, v long")
        return mann_kendall(df, ["k"], ts_col="t", value_col="v", **kw).collect()[0]

    def test_strictly_increasing(self, spark):
        import math

        n = 10
        r = self._run(spark, list(range(n)))
        assert r["s"] == n * (n - 1) // 2 == 45
        var18 = n * (n - 1) * (2 * n + 5) - n * 1 * 0 * 7  # no ties
        assert r["var18"] == n * (n - 1) * (2 * n + 5)
        assert r["z"] == (45 - 1) / math.sqrt(r["var18"] / 18.0)

    def test_all_tied_null_z(self, spark):
        r = self._run(spark, [7] * 6)
        assert r["s"] == 0 and r["var18"] == 0 and r["z"] is None

    def test_balanced_zero_z(self, spark):
        # v = [0,1,0,1,...]: S sums to a small value; force S=0 with a
        # palindrome-ish shape instead: [1,2,1] → pairs (1,2)+,(1,1)0,(2,1)- → 0
        r = self._run(spark, [1, 2, 1])
        assert r["s"] == 0 and r["z"] == 0.0

    def test_random_brute_force_with_ties(self, spark):
        import math
        import random

        rng = random.Random(411)
        v = [rng.randrange(0, 8) for _ in range(60)]  # heavy ties
        r = self._run(spark, v)
        s = sum(
            (0 < v[j] - v[i]) - (v[j] - v[i] < 0)
            for i in range(60) for j in range(i + 1, 60)
        )
        from collections import Counter
        tie18 = sum(t * (t - 1) * (2 * t + 5) for t in Counter(v).values())
        var18 = 60 * 59 * 125 - tie18
        assert (r["s"], r["var18"]) == (s, var18)
        want = (s - (1 if s > 0 else -1)) / math.sqrt(var18 / 18.0) if s else 0.0
        assert r["z"] == want

    def test_max_points_guard(self, spark):
        import pytest as _pt

        with _pt.raises(Exception, match="max_points"):
            self._run(spark, list(range(30)), max_points=10)
