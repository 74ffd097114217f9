"""PSI population-drift monitor (operators/drift.py)."""

import datetime as dt
import math

import numpy as np
import pytest

from repurpose_spark.operators.drift import psi_drift, value_bins

import pyspark.sql.functions as F


def _day(d, i=0):
    return dt.datetime(2024, 1, d, i % 24, (i * 7) % 60)


def _psi_ref(cur, ref, n_bins, smooth):
    """Plain-python PSI on dense count lists, same ordered fold."""
    nc, nr = sum(cur), sum(ref)
    acc = 0.0
    for c, r in zip(cur, ref):
        p = (c + smooth) / (nc + smooth * n_bins)
        q = (r + smooth) / (nr + smooth * n_bins)
        acc = acc + (p - q) * math.log(p / q)
    return acc


def test_value_bins_clamp(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (24.9,), (25.0,), (499.0,), (600.0,)], "v double"
    )
    got = [r["bin"] for r in value_bins(df, "v", 0.0, 500.0, 20).collect()]
    assert got == [0, 0, 0, 1, 19, 19]
    with pytest.raises(ValueError):
        value_bins(df, "v", 5.0, 5.0, 20)


def test_psi_matches_reference_fold(spark):
    rng = np.random.RandomState(3)
    rows = []
    # day 1: uniform; day 2: shifted — a drift the index must flag
    for i in range(400):
        rows.append(("k", _day(1, i), float(rng.uniform(0, 100))))
    for i in range(300):
        rows.append(("k", _day(2, i), float(rng.uniform(40, 100))))
    df = spark.createDataFrame(rows, "key string, ts timestamp, v double")
    out = psi_drift(
        df, ["key"], F.date_trunc("day", F.col("ts")), "v",
        lo=0.0, hi=100.0, n_bins=10, smooth=0.5,
    ).collect()
    by_day = {r["slice"].day: r for r in out}
    assert by_day[1]["psi"] is None and by_day[1]["n_ref"] is None
    vals = [r[2] for r in rows]
    bins1 = np.histogram([v for k, t, v in rows if t.day == 1], bins=10, range=(0, 100))[0]
    bins2 = np.histogram([v for k, t, v in rows if t.day == 2], bins=10, range=(0, 100))[0]
    want = _psi_ref(list(bins2), list(bins1), 10, 0.5)
    assert by_day[2]["psi"] == pytest.approx(want, rel=1e-12)
    assert by_day[2]["psi"] > 0.25  # conventional "act" threshold
    assert (by_day[2]["n_cur"], by_day[2]["n_ref"]) == (300, 400)


def test_psi_identical_slices_near_zero(spark):
    rows = [("k", _day(d, i), float(i % 50)) for d in (1, 2) for i in range(200)]
    df = spark.createDataFrame(rows, "key string, ts timestamp, v double")
    out = {
        r["slice"].day: r["psi"]
        for r in psi_drift(
            df, ["key"], F.date_trunc("day", F.col("ts")), "v",
            lo=0.0, hi=50.0, n_bins=5, smooth=0.5,
        ).collect()
    }
    assert out[2] == 0.0  # identical histograms → exactly zero


def test_psi_skips_missing_days_and_keys_independent(spark):
    rows = (
        [("a", _day(1, i), 1.0) for i in range(10)]
        + [("a", _day(5, i), 9.0) for i in range(10)]  # gap: 5 follows 1
        + [("b", _day(2, i), 5.0) for i in range(10)]
    )
    df = spark.createDataFrame(rows, "key string, ts timestamp, v double")
    out = psi_drift(
        df, ["key"], F.date_trunc("day", F.col("ts")), "v",
        lo=0.0, hi=10.0, n_bins=10, smooth=0.5,
    ).collect()
    a5 = [r for r in out if r["key"] == "a" and r["slice"].day == 5][0]
    assert a5["n_ref"] == 10 and a5["psi"] is not None  # day 1 is the ref
    b2 = [r for r in out if r["key"] == "b"][0]
    assert b2["psi"] is None  # other keys' slices are not references


def test_psi_partition_invariance(spark):
    rng = np.random.RandomState(11)
    rows = [
        ("k%d" % (i % 3), _day(1 + i % 4, i), float(rng.uniform(0, 80)))
        for i in range(600)
    ]
    df = spark.createDataFrame(rows, "key string, ts timestamp, v double")

    def run(d):
        return sorted(
            (r["key"], r["slice"], r["n_cur"], r["n_ref"], r["psi"])
            for r in psi_drift(
                d, ["key"], F.date_trunc("day", F.col("ts")), "v",
                lo=0.0, hi=80.0, n_bins=16, smooth=0.5,
            ).collect()
        )

    assert run(df.repartition(1)) == run(df.repartition(17, "ts"))


# ---------------------------------------------------------------------------
# fano_factor
# ---------------------------------------------------------------------------

from repurpose_spark.operators.drift import fano_factor  # noqa: E402


def _fano_rows(out):
    return {r["event_type"]: r for r in out.collect()}


def test_fano_hand_values(spark):
    # uniform: 3 events on each of days 1..4 → var 0 → fano 0
    # bursty: 12 events on day 1, 0 on days 2-3, 0+1 on day 4
    rows = [("uni", _day(d, i)) for d in (1, 2, 3, 4) for i in range(3)]
    rows += [("burst", _day(1, i)) for i in range(12)]
    rows += [("burst", _day(4, 0))]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = _fano_rows(fano_factor(df, ["event_type"], width_s=86400))
    u = got["uni"]
    assert (u["n_buckets"], u["n_events"], u["fano"]) == (4, 12, 0.0)
    b = got["burst"]
    # counts over the CLOSED range: [12, 0, 0, 1] — silent days count
    assert b["n_buckets"] == 4 and b["n_events"] == 13
    n, s1, s2 = 4, 13, 12 * 12 + 1
    want = round((n * s2 - s1 * s1) / ((n - 1) * s1), 6)
    assert b["fano"] == pytest.approx(want, abs=0)


def test_fano_single_bucket_null(spark):
    rows = [("k", _day(1, i)) for i in range(5)]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = _fano_rows(fano_factor(df, ["event_type"], width_s=86400))["k"]
    assert out["n_buckets"] == 1 and out["fano"] is None


def test_fano_poisson_near_one(spark):
    rng = np.random.RandomState(5)
    rows = []
    for d in range(1, 29):
        for _ in range(int(rng.poisson(40))):
            rows.append(("p", _day(d, int(rng.randint(0, 24 * 60)))))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = _fano_rows(fano_factor(df, ["event_type"], width_s=86400))["p"]
    assert 0.4 < out["fano"] < 2.5  # dispersion ≈ 1 for Poisson counts


def test_fano_partition_invariance(spark):
    rng = np.random.RandomState(7)
    rows = [
        ("k%d" % (i % 3), _day(1 + int(rng.randint(0, 9)), i))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")

    def run(d):
        return sorted(map(tuple, fano_factor(d, ["event_type"]).collect()))

    assert run(df.repartition(1)) == run(df.repartition(13, "ts"))


class TestAllanVariance:
    def _run(self, spark, secs, taus=(10,)):
        import datetime as dt

        from repurpose_spark.operators.drift import allan_variance

        base = dt.datetime(2024, 1, 1)
        rows = [("k", base + dt.timedelta(seconds=int(s))) for s in secs]
        df = spark.createDataFrame(rows, "k string, ts timestamp")
        out = allan_variance(df, ["k"], taus=taus)
        return {r["tau"]: r.asDict() for r in out.collect()}

    def test_hand_dense_series(self, spark):
        # tau=10 buckets: counts [2, 1, 3] → diffs (-1, 2) → sq sum 5
        got = self._run(spark, [1, 2, 11, 21, 22, 23])[10]
        assert got["n_buckets"] == 3
        assert got["diff_sq_sum"] == 5
        assert got["allan_var"] == 5 / (2 * 2)

    def test_gap_counts_as_zero_bucket(self, spark):
        # buckets 0 (c=2) and 2 (c=1): implicit zero bucket between →
        # pairs (2→0)² + (0→1)² = 5 over M−1 = 2 pairs
        got = self._run(spark, [1, 2, 25])[10]
        assert got["n_buckets"] == 3
        assert got["diff_sq_sum"] == 5
        assert got["allan_var"] == 5 / 4

    def test_single_bucket_null(self, spark):
        got = self._run(spark, [1, 2, 3])[10]
        assert got["n_buckets"] == 1
        assert got["allan_var"] is None

    def test_white_noise_falls_with_tau(self, spark):
        import numpy as np

        rng = np.random.default_rng(7)
        secs = sorted(rng.integers(0, 40000, size=4000).tolist())
        got = self._run(spark, secs, taus=(100, 400))
        # rate-normalized Allan deviation falls for white arrivals as
        # tau grows: avar scales ~tau (Poisson), so avar/tau² falls
        a100 = got[100]["allan_var"] / 100**2
        a400 = got[400]["allan_var"] / 400**2
        assert a400 < a100

    def test_validation(self, spark):
        import pytest as _pt

        from repurpose_spark.operators.drift import allan_variance

        df = spark.createDataFrame([("k",)], "k string")
        with _pt.raises(ValueError, match="taus"):
            allan_variance(df, ["k"], taus=())


class TestInterarrivalCV:
    def _run(self, spark, secs):
        import datetime as dt

        from repurpose_spark.operators.drift import interarrival_cv

        base = dt.datetime(2024, 1, 1)
        rows = [("k", i, base + dt.timedelta(seconds=int(s)))
                for i, s in enumerate(secs)]
        df = spark.createDataFrame(rows, "k string, eid long, ts timestamp")
        out = interarrival_cv(df, ["k"], tie_cols=("eid",))
        return out.collect()[0].asDict()

    def test_metronomic_is_zero(self, spark):
        got = self._run(spark, [0, 10, 20, 30])
        assert got["n_gaps"] == 3
        assert got["cv2"] == 0.0

    def test_hand_value(self, spark):
        # gaps [1, 3]: cv2 = (2*(1+9) - 16)/16 = 4/16
        got = self._run(spark, [0, 1, 4])
        assert (got["sum_gap_s"], got["sum_gap_sq"]) == (4, 10)
        assert got["cv2"] == 0.25

    def test_single_gap_null(self, spark):
        got = self._run(spark, [0, 5])
        assert got["n_gaps"] == 1 and got["cv2"] is None


class TestBenfordProfile:
    def test_digit_extraction_and_share(self, spark):
        from repurpose_spark.operators.drift import benford_profile

        vals = [1, 19, 100, 2, 25, 999, 0, -7]  # 0 and -7 excluded
        df = spark.createDataFrame(
            [("k", v) for v in vals], "k string, v long"
        )
        got = {r["digit"]: (r["n"], r["share"])
               for r in benford_profile(df, ["k"], "v").collect()}
        assert got[1] == (3, 3 / 6)
        assert got[2] == (2, 2 / 6)
        assert got[9] == (1, 1 / 6)
        assert set(got) == {1, 2, 9}

    def test_power_of_ten_edge(self, spark):
        # 10^k values land on digit 1 exactly (the float-log10 trap
        # this operator avoids by construction)
        from repurpose_spark.operators.drift import benford_profile

        df = spark.createDataFrame(
            [("k", 10), ("k", 100), ("k", 1000)], "k string, v long"
        )
        got = benford_profile(df, ["k"], "v").collect()
        assert len(got) == 1 and got[0]["digit"] == 1 and got[0]["n"] == 3


class TestKsDrift:
    def test_identical_slices_zero(self, spark):
        from repurpose_spark.operators.drift import ks_drift

        rows = [("k", d, v) for d in (1, 2) for v in (10, 20, 20, 30)]
        df = spark.createDataFrame(rows, "k string, slice long, v long")
        out = ks_drift(df, ["k"], slice_col="slice", value_col="v").collect()
        assert len(out) == 1
        r = out[0]
        assert (r["slice"], r["n_prev"], r["n_cur"], r["ks"]) == (2, 4, 4, 0.0)

    def test_hand_shift(self, spark):
        from repurpose_spark.operators.drift import ks_drift

        # prev: {1,2}, cur: {2,3} → D at x=1: |1/2−0|=0.5; x=2: |1−1/2|=0.5;
        # x=3: 0 → ks = 0.5
        rows = [("k", 1, 1), ("k", 1, 2), ("k", 2, 2), ("k", 2, 3)]
        df = spark.createDataFrame(rows, "k string, slice long, v long")
        r = ks_drift(df, ["k"], slice_col="slice", value_col="v").collect()[0]
        assert r["ks"] == 0.5

    def test_disjoint_supports_full_separation(self, spark):
        from repurpose_spark.operators.drift import ks_drift

        rows = [("k", 1, v) for v in (1, 2, 3)] + [("k", 2, v) for v in (10, 11)]
        df = spark.createDataFrame(rows, "k string, slice long, v long")
        r = ks_drift(df, ["k"], slice_col="slice", value_col="v").collect()[0]
        assert r["ks"] == 1.0 and (r["n_prev"], r["n_cur"]) == (3, 2)

    def test_consecutive_observed_pairs_and_brute_force(self, spark):
        from repurpose_spark.operators.drift import ks_drift

        import random
        rng = random.Random(410)
        data = {}  # (k, slice) -> values; slice 5 is skipped for k=a
        rows = []
        for k, slices in (("a", [1, 2, 4]), ("b", [1, 2])):
            for s in slices:
                vals = [rng.randrange(0, 30) for _ in range(40)]
                data[(k, s)] = vals
                rows += [(k, s, v) for v in vals]
        df = spark.createDataFrame(rows, "k string, slice long, v long")
        out = {(r["k"], r["slice"]): r["ks"]
               for r in ks_drift(df, ["k"], slice_col="slice",
                                 value_col="v").collect()}
        # pairs follow OBSERVED predecessors: (a,2)←1, (a,4)←2, (b,2)←1
        assert set(out) == {("a", 2), ("a", 4), ("b", 2)}

        def brute(pv, cv):
            sup = sorted(set(pv) | set(cv))
            best = 0.0
            for x in sup:
                fp = sum(1 for t in pv if t <= x) / len(pv)
                fc = sum(1 for t in cv if t <= x) / len(cv)
                best = max(best, abs(fp - fc))
            return best

        assert out[("a", 2)] == brute(data[("a", 1)], data[("a", 2)])
        assert out[("a", 4)] == brute(data[("a", 2)], data[("a", 4)])
        assert out[("b", 2)] == brute(data[("b", 1)], data[("b", 2)])
