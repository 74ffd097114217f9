"""state_runs / transition_matrix / page_hinkley / seasonal_naive_skill
/ weighted_priority_sample: hand-computed small frames plus randomized
brute-force cross-checks (the session-12 certification pattern)."""

import datetime as dt
import hashlib
import random

import pytest

from pyspark.sql import functions as F


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


# ---------------------------------------------------------------- runs


class TestStateRuns:
    def test_hand_islands(self, spark):
        from repurpose_spark.operators.states import state_runs

        rows = [
            ("u1", _ts(0), 1, "a"),
            ("u1", _ts(1), 2, "a"),
            ("u1", _ts(2), 3, "b"),
            ("u1", _ts(3), 4, "a"),
            ("u2", _ts(0), 5, "c"),
        ]
        df = spark.createDataFrame(rows, "k string, ts timestamp, eid long, s string")
        got = {
            (r["k"], r["run_id"]): (r["s"], r["n"], r["start_ts"], r["end_ts"])
            for r in state_runs(
                df, ["k"], ts_col="ts", state_col="s", tie_cols=("eid",)
            ).collect()
        }
        assert got == {
            ("u1", 1): ("a", 2, _ts(0), _ts(1)),
            ("u1", 2): ("b", 1, _ts(2), _ts(2)),
            ("u1", 3): ("a", 1, _ts(3), _ts(3)),
            ("u2", 1): ("c", 1, _ts(0), _ts(0)),
        }

    def test_tie_order_decides_runs(self, spark):
        from repurpose_spark.operators.states import state_runs

        # same timestamp: eid breaks the tie, so a,b,a = 3 runs
        rows = [("u", _ts(0), i, s) for i, s in enumerate(["a", "b", "a"])]
        df = spark.createDataFrame(rows, "k string, ts timestamp, eid long, s string")
        out = state_runs(df, ["k"], state_col="s", tie_cols=("eid",)).collect()
        assert sorted((r["run_id"], r["s"]) for r in out) == [
            (1, "a"), (2, "b"), (3, "a"),
        ]

    def test_random_brute_force(self, spark):
        from repurpose_spark.operators.states import state_runs

        rng = random.Random(405)
        rows, expect = [], {}
        for k in ("p", "q", "r"):
            states = [rng.choice("xyz") for _ in range(50)]
            rows += [(k, _ts(0) + dt.timedelta(minutes=i), i, s)
                     for i, s in enumerate(states)]
            runs, cur = [], None
            for s in states:
                if cur != s:
                    runs.append([s, 0])
                    cur = s
                runs[-1][1] += 1
            for rid, (s, n) in enumerate(runs, 1):
                expect[(k, rid)] = (s, n)
        df = spark.createDataFrame(rows, "k string, ts timestamp, eid long, s string")
        got = {
            (r["k"], r["run_id"]): (r["s"], r["n"])
            for r in state_runs(
                df, ["k"], state_col="s", tie_cols=("eid",)
            ).collect()
        }
        assert got == expect


# ---------------------------------------------------------- transitions


class TestTransitionMatrix:
    def test_hand_matrix(self, spark):
        from repurpose_spark.operators.states import transition_matrix

        rows = [
            ("u1", _ts(0), 1, "a"),
            ("u1", _ts(1), 2, "b"),
            ("u1", _ts(2), 3, "a"),
            ("u2", _ts(0), 4, "a"),
            ("u2", _ts(1), 5, "b"),
        ]
        df = spark.createDataFrame(rows, "k string, ts timestamp, eid long, s string")
        got = {
            (r["from_state"], r["to_state"]): (r["n"], r["p"])
            for r in transition_matrix(
                df, ["k"], state_col="s", tie_cols=("eid",)
            ).collect()
        }
        assert got == {("a", "b"): (2, 1.0), ("b", "a"): (1, 1.0)}

    def test_row_normalization_and_counts(self, spark):
        from repurpose_spark.operators.states import transition_matrix

        rng = random.Random(406)
        rows, pairs = [], {}
        for k in range(8):
            states = [rng.choice("abc") for _ in range(40)]
            rows += [(f"u{k}", _ts(0) + dt.timedelta(minutes=i), i, s)
                     for i, s in enumerate(states)]
            for f, t in zip(states, states[1:]):
                pairs[(f, t)] = pairs.get((f, t), 0) + 1
        df = spark.createDataFrame(rows, "k string, ts timestamp, eid long, s string")
        out = transition_matrix(
            df, ["k"], state_col="s", tie_cols=("eid",)
        ).collect()
        got_n = {(r["from_state"], r["to_state"]): r["n"] for r in out}
        assert got_n == pairs
        for r in out:
            tot = sum(n for (f, _), n in pairs.items() if f == r["from_state"])
            assert r["p"] == pytest.approx(r["n"] / tot, abs=0)

    def test_stratified_by(self, spark):
        from repurpose_spark.operators.states import transition_matrix

        rows = [
            ("u1", _ts(0), 1, "a", "s1"),
            ("u1", _ts(1), 2, "b", "s1"),
            ("u2", _ts(0), 3, "a", "s2"),
            ("u2", _ts(1), 4, "b", "s2"),
        ]
        df = spark.createDataFrame(
            rows, "k string, ts timestamp, eid long, s string, src string"
        )
        out = transition_matrix(
            df, ["k"], state_col="s", tie_cols=("eid",), by=["src"]
        ).collect()
        assert sorted((r["src"], r["from_state"], r["to_state"], r["n"])
                      for r in out) == [("s1", "a", "b", 1), ("s2", "a", "b", 1)]


# --------------------------------------------------------- page-hinkley


def _ph_brute(values, calib, delta, lam):
    """Reference PH on one key: returns (d, sc, n_scored, max_ph_scaled,
    first_alarm_idx)."""
    d = min(calib, len(values))
    sc = sum(values[:calib])
    p, m = 0, None
    best = 0
    first = None
    for i, x in enumerate(values[calib:], start=calib):
        p += d * x - sc - d * delta
        m = p if m is None else min(m, p)
        ph = p - m
        best = max(best, ph)
        if first is None and ph > d * lam:
            first = i
    return d, sc, len(values) - min(calib, len(values)), best, first


class TestPageHinkley:
    def test_step_change_fires_once(self, spark):
        from repurpose_spark.operators.drift import page_hinkley

        # 6 calib ticks at 10, then a jump to 20: e = 6*20-60-6*0 = 60
        # per tick.  Classical PH subtracts the min over OBSERVED prefix
        # sums, so the first scored tick is ph=0 and ph grows 60/tick
        # after it; alarm (lam=15 → d·λ=90) fires at ph=120, the THIRD
        # post-jump tick
        vals = [10] * 6 + [20] * 4
        rows = [("k", _ts(i), v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "k string, ts timestamp, v long")
        out = page_hinkley(
            df, ["k"], ts_col="ts", value_col="v", calib=6, delta=0, lam=15
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["calib_n"], r["calib_sum"], r["n_scored"]) == (6, 60, 4)
        assert r["max_ph_scaled"] == 3 * 60
        assert r["max_ph"] == pytest.approx(30.0, abs=0)
        assert r["first_alarm_ts"] == _ts(8)

    def test_quiet_series_never_fires(self, spark):
        from repurpose_spark.operators.drift import page_hinkley

        rows = [("k", _ts(i), 10) for i in range(12)]
        df = spark.createDataFrame(rows, "k string, ts timestamp, v long")
        r = page_hinkley(df, ["k"], value_col="v", calib=6, lam=1).collect()[0]
        assert r["first_alarm_ts"] is None
        assert r["max_ph_scaled"] == 0

    def test_short_key_omitted(self, spark):
        from repurpose_spark.operators.drift import page_hinkley

        rows = [("k", _ts(i), 10) for i in range(3)]
        df = spark.createDataFrame(rows, "k string, ts timestamp, v long")
        assert page_hinkley(df, ["k"], value_col="v", calib=6).count() == 0

    def test_random_brute_force(self, spark):
        from repurpose_spark.operators.drift import page_hinkley

        rng = random.Random(407)
        rows, expect = [], {}
        for k in ("a", "b", "c", "d"):
            vals = [rng.randrange(0, 50) for _ in range(60)]
            rows += [(k, _ts(0) + dt.timedelta(hours=i), v)
                     for i, v in enumerate(vals)]
            expect[k] = _ph_brute(vals, calib=10, delta=2, lam=30)
        df = spark.createDataFrame(rows, "k string, ts timestamp, v long")
        out = page_hinkley(
            df, ["k"], value_col="v", calib=10, delta=2, lam=30
        ).collect()
        assert len(out) == len(expect)
        for r in out:
            d, sc, n, best, first = expect[r["k"]]
            assert (r["calib_n"], r["calib_sum"], r["n_scored"],
                    r["max_ph_scaled"]) == (d, sc, n, best)
            want_ts = (None if first is None
                       else _ts(0) + dt.timedelta(hours=first))
            assert r["first_alarm_ts"] == want_ts


# ------------------------------------------------------- seasonal skill


class TestSeasonalSkill:
    def test_pure_seasonal_beats_naive(self, spark):
        from repurpose_spark.operators.downsample import seasonal_naive_skill

        # period-4 sawtooth repeated exactly: seasonal error 0, naive > 0
        vals = [0, 5, 10, 5] * 6
        rows = [("k", _ts(0) + dt.timedelta(hours=i), v)
                for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "k string, tick timestamp, v long")
        r = seasonal_naive_skill(
            df, ["k"], ts_col="tick", value_col="v", period=4
        ).collect()[0]
        assert r["sae_seasonal"] == 0 and r["n_seasonal"] == 20
        assert r["n1"] == 23 and r["sae_naive1"] == 5 * 23
        assert r["mase"] == 0.0

    def test_random_brute_force(self, spark):
        from repurpose_spark.operators.downsample import seasonal_naive_skill

        rng = random.Random(408)
        vals = [rng.randrange(0, 100) for _ in range(50)]
        rows = [("k", _ts(0) + dt.timedelta(hours=i), v)
                for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "k string, tick timestamp, v long")
        r = seasonal_naive_skill(
            df, ["k"], ts_col="tick", value_col="v", period=24
        ).collect()[0]
        s1 = sum(abs(a - b) for a, b in zip(vals[1:], vals))
        s24 = sum(abs(a - b) for a, b in zip(vals[24:], vals))
        assert (r["n1"], r["sae_naive1"]) == (49, s1)
        assert (r["n_seasonal"], r["sae_seasonal"]) == (26, s24)
        assert r["mase"] == (s24 * 49) / (s1 * 26)

    def test_short_key_null_mase(self, spark):
        from repurpose_spark.operators.downsample import seasonal_naive_skill

        rows = [("k", _ts(i), 10) for i in range(5)]
        df = spark.createDataFrame(rows, "k string, tick timestamp, v long")
        r = seasonal_naive_skill(
            df, ["k"], ts_col="tick", value_col="v", period=24
        ).collect()[0]
        assert r["n_seasonal"] == 0 and r["mase"] is None


# ------------------------------------------------------ weighted sample


def _u20(doc_id, seed):
    h = hashlib.md5(f"{doc_id}\x1f{seed}".encode()).hexdigest()
    return int(h[:5], 16) + 1


class TestWeightedPrioritySample:
    def test_matches_brute_force(self, spark):
        from repurpose_spark.operators.sampling import weighted_priority_sample

        rng = random.Random(409)
        rows = [(i, "s" + str(i % 3), rng.randrange(1, 5000))
                for i in range(300)]
        df = spark.createDataFrame(rows, "doc_id long, source string, w long")
        got = {
            (r["source"], r["doc_id"])
            for r in weighted_priority_sample(
                df, ["source"], 7, id_col="doc_id", weight_col="w", seed="t"
            ).collect()
        }
        expect = set()
        for g in ("s0", "s1", "s2"):
            cand = [(u := _u20(i, "t"), u / w, i)
                    for i, s, w in rows if s == g]
            for _, _, i in sorted((key, i, i) for _, key, i in cand)[:7]:
                expect.add((g, i))
        assert got == expect

    def test_weight_bias(self, spark):
        from repurpose_spark.operators.sampling import weighted_priority_sample

        # one group: heavy docs (w=10000) vs light (w=1); a 50-doc draw
        # from 100+100 should be overwhelmingly heavy
        rows = [(i, "g", 10000 if i < 100 else 1) for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, source string, w long")
        out = weighted_priority_sample(
            df, ["source"], 50, id_col="doc_id", weight_col="w", seed="b"
        ).collect()
        n_heavy = sum(1 for r in out if r["doc_id"] < 100)
        assert len(out) == 50 and n_heavy >= 45

    def test_nonpositive_weight_excluded(self, spark):
        from repurpose_spark.operators.sampling import weighted_priority_sample

        rows = [(1, "g", 0), (2, "g", -5), (3, "g", None), (4, "g", 7)]
        df = spark.createDataFrame(rows, "doc_id long, source string, w long")
        out = weighted_priority_sample(
            df, ["source"], 3, id_col="doc_id", weight_col="w", seed=""
        ).collect()
        assert [r["doc_id"] for r in out] == [4]

    def test_partitioning_invariance(self, spark):
        from repurpose_spark.operators.sampling import weighted_priority_sample

        rows = [(i, "g" + str(i % 2), 1 + i % 37) for i in range(400)]
        df = spark.createDataFrame(rows, "doc_id long, source string, w long")
        picks = []
        for nparts in (1, 7):
            out = weighted_priority_sample(
                df.repartition(nparts), ["source"], 9,
                id_col="doc_id", weight_col="w", seed="p",
            ).collect()
            picks.append(sorted((r["source"], r["doc_id"]) for r in out))
        assert picks[0] == picks[1]


# --------------------------------------------------------- availability


class TestAvailability:
    def _run(self, spark, flags):
        from repurpose_spark.operators.states import availability

        rows = [("k", _ts(0) + dt.timedelta(hours=i), bool(f))
                for i, f in enumerate(flags)]
        df = spark.createDataFrame(rows, "k string, tick timestamp, up boolean")
        return availability(df, ["k"], ts_col="tick", up_col="up").collect()[0]

    def test_hand_sla(self, spark):
        # up: 1 1 0 0 0 1 0 1 → 8 ticks, 4 up, 2 outages, worst 3 @ t=2h
        r = self._run(spark, [1, 1, 0, 0, 0, 1, 0, 1])
        assert (r["n_ticks"], r["n_up"], r["n_down"]) == (8, 4, 4)
        assert r["availability"] == 0.5
        assert (r["n_outages"], r["longest_down"]) == (2, 3)
        assert r["longest_down_start"] == _ts(2)

    def test_never_down(self, spark):
        r = self._run(spark, [1, 1, 1])
        assert (r["n_down"], r["n_outages"]) == (0, 0)
        assert r["longest_down"] is None and r["longest_down_start"] is None
        assert r["availability"] == 1.0

    def test_tied_worst_earliest_wins(self, spark):
        # outages of length 2 at t=1 and t=5 → earliest start reported
        r = self._run(spark, [1, 0, 0, 1, 1, 0, 0, 1])
        assert r["longest_down"] == 2
        assert r["longest_down_start"] == _ts(1)

    def test_single_row_never_duplicated_by_join(self, spark):
        # two distinct down-run LENGTHS, worst joined exactly once
        r = self._run(spark, [0, 0, 0, 1, 0])
        assert r["n_outages"] == 2 and r["longest_down"] == 3
        assert r["longest_down_start"] == _ts(0)
