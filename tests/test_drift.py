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
