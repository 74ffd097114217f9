"""Randomized brute-force cross-checks for the session-12 operators.

Each test replays the operator's semantics in plain Python/numpy over
seeded random inputs and asserts equality (exact for the int64
operators, 1e-12 for the float finishes) — the same discipline as
test_property_misc / test_packing_property: the Spark plan and a
20-line reference must agree on arbitrary data, not just hand cases.
"""

import datetime as dt
import random

import numpy as np


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=int(s))


class TestIntervalUnionProperty:
    def test_matches_bruteforce(self, spark):
        from repurpose_spark.operators.intervals import interval_union

        rng = random.Random(42)
        rows, truth = [], {}
        for key in ("a", "b", "c"):
            ivs = []
            for _ in range(rng.randint(5, 40)):
                s = rng.randint(0, 5000)
                e = s + rng.randint(-5, 600)  # some invalid on purpose
                rows.append((key, _ts(s), _ts(e)))
                if e > s:
                    ivs.append((s, e))
            # brute force: per-second coverage + concurrency
            cov = set()
            depth = {}
            for s, e in ivs:
                for t in range(s, e):
                    cov.add(t)
                    depth[t] = depth.get(t, 0) + 1
            truth[key] = (
                len(ivs),
                len(cov) * 1_000_000,
                max(depth.values()) if depth else None,
            )
        df = spark.createDataFrame(rows, "k string, start timestamp, end timestamp")
        got = {
            r["k"]: (r["n_intervals"], r["covered_us"], r["max_concurrency"])
            for r in interval_union(df, by=("k",)).collect()
        }
        assert got == {k: v for k, v in truth.items() if v[0] > 0}

    def test_subsecond_precision(self, spark):
        from repurpose_spark.operators.intervals import interval_union

        base = dt.datetime(2024, 1, 1)
        us = dt.timedelta(microseconds=1)
        df = spark.createDataFrame(
            [("k", base, base + 3 * us), ("k", base + 2 * us, base + 5 * us)],
            "k string, start timestamp, end timestamp",
        )
        got = interval_union(df, by=("k",)).collect()[0]
        assert got["covered_us"] == 5
        assert got["max_concurrency"] == 2


class TestTrimmedAggProperty:
    def test_matches_numpy_trim(self, spark):
        from repurpose_spark.operators.robust import trimmed_agg

        rng = random.Random(7)
        rows = []
        truth = {}
        for g in range(6):
            vals = [rng.randint(-50, 50) for _ in range(rng.randint(1, 60))]
            rows += [(f"g{g}", i, v) for i, v in enumerate(vals)]
            n = len(vals)
            k = int(n * 0.15)
            kept = sorted(vals)[k : n - k]
            truth[f"g{g}"] = (
                n,
                len(kept),
                sum(kept) if kept else None,
                min(kept) if kept else None,
                max(kept) if kept else None,
            )
        df = spark.createDataFrame(rows, "g string, rid long, v long")
        out = trimmed_agg(
            df, by=("g",), value_col="v", tie_cols=("rid",), trim_frac=0.15
        )
        got = {
            r["g"]: (r["n_total"], r["n_kept"], r["sum_kept"], r["min_kept"], r["max_kept"])
            for r in out.collect()
        }
        assert got == truth


class TestSpearmanProperty:
    def test_matches_numpy_avg_ranks(self, spark):
        from repurpose_spark.operators.robust import spearman_corr

        rng = np.random.default_rng(3)
        x = rng.integers(0, 20, size=200)  # heavy ties
        y = (x * 3 + rng.integers(0, 15, size=200)).astype(int)

        def avg_rank(a):
            order = np.argsort(a, kind="stable")
            r = np.empty(len(a), dtype=float)
            sa = a[order]
            i = 0
            while i < len(a):
                j = i
                while j < len(a) and sa[j] == sa[i]:
                    j += 1
                r[order[i:j]] = (i + j + 1) / 2.0  # 1-based average rank
                i = j
            return r

        rx, ry = avg_rank(x), avg_rank(y)
        want = np.corrcoef(rx, ry)[0, 1]
        df = spark.createDataFrame(
            [("g", int(a), int(b)) for a, b in zip(x, y)],
            "g string, x long, y long",
        )
        got = spearman_corr(df, by=("g",), x_col="x", y_col="y").collect()[0]
        assert got["n_pairs"] == 200
        assert abs(got["spearman_rho"] - want) < 1e-12


class TestSystematicSampleProperty:
    def test_draw_count_and_whale_guarantee(self, spark):
        from repurpose_spark.operators.sampling import systematic_sample

        rng = random.Random(11)
        rows = [("s", i, rng.randint(0, 300)) for i in range(300)]
        df = spark.createDataFrame(rows, "source string, doc_id long, n_tok long")
        stride, offset = 123, 45
        sel = systematic_sample(
            df, stride=stride, offset=offset
        ).collect()
        total = sum(w for _, _, w in rows)
        # exactly one selected doc per grid point inside the axis
        n_grid = len([k for k in range(0, total) if k % stride == offset % stride and k >= offset]) if total > offset else 0
        n_grid = max(0, (total - 1 - offset) // stride + 1) if total > offset else 0
        assert len(sel) == len({r["doc_id"] for r in sel})
        assert sum(1 for _ in sel) <= n_grid  # one doc may cover many grid points
        covered = sum(max(0, (r["start"] + r["n_tok"] - 1 - offset) // stride - r["grid_k"] + 1) for r in sel)
        assert covered == n_grid
        # any doc at least stride tokens long is ALWAYS selected
        ids = {r["doc_id"] for r in sel}
        for _, i, w in rows:
            if w >= stride:
                assert i in ids


class TestAllanVarianceProperty:
    def test_matches_dense_replay(self, spark):
        from repurpose_spark.operators.drift import allan_variance

        rng = random.Random(5)
        secs = sorted(rng.randint(0, 3000) for _ in range(400))
        base = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [("k", base + dt.timedelta(seconds=s)) for s in secs],
            "k string, ts timestamp",
        )
        got = {r["tau"]: r.asDict() for r in allan_variance(df, ["k"], taus=(7, 60)).collect()}
        epoch = int(base.replace(tzinfo=dt.timezone.utc).timestamp())
        for tau in (7, 60):
            b = [(epoch + s) // tau for s in secs]
            lo, hi = min(b), max(b)
            dense = [0] * (hi - lo + 1)
            for x in b:
                dense[x - lo] += 1
            diffs = np.diff(np.array(dense, dtype=np.int64))
            want_sq = int((diffs * diffs).sum())
            assert got[tau]["n_buckets"] == hi - lo + 1
            assert got[tau]["diff_sq_sum"] == want_sq
            assert got[tau]["allan_var"] == want_sq / (2.0 * (hi - lo))


class TestInterarrivalCVProperty:
    def test_matches_numpy(self, spark):
        from repurpose_spark.operators.drift import interarrival_cv

        rng = random.Random(9)
        secs = sorted(rng.randint(0, 100000) for _ in range(500))
        base = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [("k", i, base + dt.timedelta(seconds=s)) for i, s in enumerate(secs)],
            "k string, eid long, ts timestamp",
        )
        got = interarrival_cv(df, ["k"], tie_cols=("eid",)).collect()[0]
        g = np.diff(np.array(secs, dtype=np.int64))
        n, s1, s2 = len(g), int(g.sum()), int((g * g).sum())
        assert (got["n_gaps"], got["sum_gap_s"], got["sum_gap_sq"]) == (n, s1, s2)
        assert got["cv2"] == float(n * s2 - s1 * s1) / float(s1 * s1)
