"""Deterministic bottom-k sampling (operators/sampling.py) and
bucket-over-bucket trending terms (operators/cooccur.py::trending_terms).

Sampling contract: exactly the rows a naive global
row_number-over-hash window would pick — but computed without ever
shuffling the corpus — identical at every partition count and across
runs; seed changes the sample, content doesn't move between groups.
Trending contract: hand-checkable lifts, gap re-entry as new, and the
exact-int division discipline."""

from datetime import datetime

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from repurpose_spark.operators.cooccur import trending_terms
from repurpose_spark.operators.sampling import sample_bottom_k, sample_hash_expr


def _docs(spark, n=200, parts=4):
    return spark.range(0, n, 1, parts).select(
        F.format_string("doc%04d", F.col("id")).alias("doc_id"),
        F.element_at(
            F.array(F.lit("web"), F.lit("books"), F.lit("code")),
            (F.col("id") % 3).cast("int") + 1,
        ).alias("source"),
        (F.col("id") * 17 % 97).alias("payload"),
    )


def _naive(df, keys, k, id_col, seed):
    w = Window.partitionBy(*keys).orderBy(
        sample_hash_expr(id_col, seed), F.col(id_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def _key(df):
    return sorted(tuple(r) for r in df.collect())


def test_matches_naive_window(spark):
    df = _docs(spark)
    got = sample_bottom_k(df, ["source"], 7, seed="s1")
    want = _naive(df, ["source"], 7, "doc_id", "s1")
    assert _key(got) == _key(want)
    assert got.groupBy("source").count().where("count != 7").count() == 0


def test_partition_invariance(spark):
    base = _key(sample_bottom_k(_docs(spark, parts=1), ["source"], 5))
    for parts in (3, 16):
        assert (
            _key(sample_bottom_k(_docs(spark, parts=parts), ["source"], 5))
            == base
        )


def test_small_group_returns_whole_group(spark):
    df = _docs(spark, n=9)  # 3 per source
    got = sample_bottom_k(df, ["source"], 25)
    assert got.count() == 9


def test_seed_changes_sample(spark):
    df = _docs(spark)
    a = {r["doc_id"] for r in sample_bottom_k(df, ["source"], 10, seed="a").collect()}
    b = {r["doc_id"] for r in sample_bottom_k(df, ["source"], 10, seed="b").collect()}
    assert a != b


def test_payload_columns_survive(spark):
    df = _docs(spark)
    got = sample_bottom_k(df, ["source"], 4)
    assert got.columns == df.columns
    payload = {r["doc_id"]: r["payload"] for r in df.collect()}
    for r in got.collect():
        assert r["payload"] == payload[r["doc_id"]]


def test_global_sample_no_keys(spark):
    got = sample_bottom_k(_docs(spark), [], 13)
    want = _naive(_docs(spark), [], 13, "doc_id", "")
    assert _key(got) == _key(want)


def test_k_validation(spark):
    with pytest.raises(ValueError, match="positive"):
        sample_bottom_k(_docs(spark), ["source"], 0)


# ------------------------------------------------------------ trending
def test_trending_hand_values(spark):
    # hour 0: a×2 b×1 — hour 1: a×4 b×1 c×1
    rows = [(0, "a")] * 2 + [(0, "b")] + [(1, "a")] * 4 + [(1, "b"), (1, "c")]
    pts = spark.createDataFrame(
        [(datetime(2020, 1, 1, h), t) for h, t in rows], "ts timestamp, token string"
    )
    out = {
        (r["tick"].hour, r["token"]): (r["c_now"], r["c_prev"], r["lift"], r["rn"])
        for r in trending_terms(pts, "hour", k=10).collect()
    }
    # hour 0: everything is new (prev 0)
    assert out[(0, "a")] == (2, 0, 3.0, 1)
    assert out[(0, "b")] == (1, 0, 2.0, 2)
    # hour 1: a quadruples (5/3), b flat (1.0), c new (2.0)
    assert out[(1, "a")] == (4, 2, 5.0 / 3.0, 2)
    assert out[(1, "b")] == (1, 1, 1.0, 3)
    assert out[(1, "c")] == (1, 0, 2.0, 1)  # new beats the riser


def test_trending_gap_reenters_as_new(spark):
    rows = [(0, "a"), (2, "a"), (2, "a")]  # silent in hour 1
    pts = spark.createDataFrame(
        [(datetime(2020, 1, 1, h), t) for h, t in rows], "ts timestamp, token string"
    )
    out = {
        r["tick"].hour: (r["c_now"], r["c_prev"])
        for r in trending_terms(pts, "hour", k=5).collect()
    }
    assert out[2] == (2, 0)  # NOT compared against the stale hour-0 count


def test_trending_top_k_and_ties(spark):
    # equal lifts tie-break by term ascending
    rows = [(0, "x"), (0, "y"), (0, "z")]
    pts = spark.createDataFrame(
        [(datetime(2020, 1, 1, h), t) for h, t in rows], "ts timestamp, token string"
    )
    got = [
        (r["token"], r["rn"])
        for r in trending_terms(pts, "hour", k=2).orderBy("rn").collect()
    ]
    assert got == [("x", 1), ("y", 2)]


def test_trending_partition_invariance(spark):
    rows = [
        (h, f"t{(h * 13 + i) % 7}") for h in range(4) for i in range(h * 5 + 3)
    ]
    data = [(datetime(2020, 1, 1, h), t) for h, t in rows]
    outs = []
    for parts in (1, 8):
        pts = spark.createDataFrame(
            data, "ts timestamp, token string"
        ).repartition(parts)
        outs.append(
            sorted(tuple(r) for r in trending_terms(pts, "hour", k=4).collect())
        )
    assert outs[0] == outs[1]


def test_trending_unit_validation(spark):
    pts = spark.createDataFrame(
        [(datetime(2020, 1, 1), "a")], "ts timestamp, token string"
    )
    with pytest.raises(ValueError, match="unit"):
        trending_terms(pts, "month")
    with pytest.raises(ValueError, match="smoothing"):
        trending_terms(pts, "hour", smoothing=0)


# ------------------------------------------------------------- systematic


class TestSystematicSample:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "source string, doc_id long, n_tok long"
        )

    def test_hand_selection(self, spark):
        from repurpose_spark.operators.sampling import systematic_sample

        # axis: d1 [0,3) d2 [3,10) d3 [10,12) d4 [12,20); grid 0,5,10,15
        df = self._df(
            spark, [("s", 1, 3), ("s", 2, 7), ("s", 3, 2), ("s", 4, 8)]
        )
        got = {
            r["doc_id"]: (r["start"], r["grid_k"])
            for r in systematic_sample(df, stride=5).collect()
        }
        # d1 contains 0; d2 contains 5; d3 contains 10; d4 contains 15
        assert got == {1: (0, 0), 2: (3, 1), 3: (10, 2), 4: (12, 3)}

    def test_pps_property_and_offset(self, spark):
        from repurpose_spark.operators.sampling import systematic_sample

        # tiny docs between two whales: whales always in, minnows not
        rows = [("s", 1, 100)] + [("s", i, 1) for i in range(2, 12)] + [
            ("s", 99, 100)
        ]
        df = self._df(spark, rows)
        ids = {r["doc_id"] for r in systematic_sample(df, stride=90).collect()}
        assert 1 in ids and 99 in ids
        assert len(ids) <= 3
        # offset shifts the grid deterministically
        ids_off = {
            r["doc_id"]
            for r in systematic_sample(df, stride=90, offset=50).collect()
        }
        assert 1 in ids_off

    def test_zero_weight_never_selected(self, spark):
        from repurpose_spark.operators.sampling import systematic_sample

        df = self._df(spark, [("s", 1, 0), ("s", 2, 4), ("s", 3, 0)])
        ids = {r["doc_id"] for r in systematic_sample(df, stride=2).collect()}
        assert ids == {2}

    def test_partition_count_independent(self, spark):
        from repurpose_spark.operators.sampling import systematic_sample

        rows = [
            ("s%d" % (i % 3), i, 1 + (i * 7) % 23) for i in range(200)
        ]
        df = self._df(spark, rows)
        a = sorted(
            tuple(r)
            for r in systematic_sample(
                df, stride=37, num_partitions=2
            ).collect()
        )
        b = sorted(
            tuple(r)
            for r in systematic_sample(
                df, stride=37, num_partitions=13
            ).collect()
        )
        assert a == b and len(a) > 0

    def test_validation(self, spark):
        from repurpose_spark.operators.sampling import systematic_sample

        df = self._df(spark, [("s", 1, 1)])
        import pytest as _pt

        with _pt.raises(ValueError, match="stride"):
            systematic_sample(df, stride=0)
        with _pt.raises(ValueError, match="offset"):
            systematic_sample(df, stride=5, offset=5)


class TestGiniConcentration:
    def _run(self, spark, weights):
        from repurpose_spark.operators.cooccur import gini_concentration

        df = spark.createDataFrame(
            [("s", i, w) for i, w in enumerate(weights)],
            "source string, doc_id long, nt long",
        )
        return gini_concentration(df, "nt", by=("source",)).collect()[
            0
        ].asDict()

    def test_equal_weights_zero(self, spark):
        got = self._run(spark, [5, 5, 5, 5])
        assert got["n_docs"] == 4 and got["total_w"] == 20
        assert got["gini"] == 0.0

    def test_one_hot_is_n_minus_1_over_n(self, spark):
        got = self._run(spark, [0, 0, 0, 12])
        assert got["gini"] == (4 - 1) / 4

    def test_known_value(self, spark):
        # sorted [1,2,3,4]: G = Σ(2i-n-1)x / (n Σx) = (−3·1 −1·2 +1·3 +3·4)/(4·10)
        got = self._run(spark, [3, 1, 4, 2])
        assert got["gini"] == 10 / 40

    def test_single_doc_null(self, spark):
        got = self._run(spark, [7])
        assert got["gini"] is None


class TestUnigramKL:
    def test_matches_hand_math(self, spark):
        import math

        from repurpose_spark.operators.cooccur import unigram_kl

        docs = [("a", "x y x"), ("a", "y z"), ("b", "x q q")]
        df = spark.createDataFrame(docs, "source string, text string")
        got = {
            (r["src_a"], r["src_b"]): (r["n_types"], r["kl_nats"])
            for r in unigram_kl(df).collect()
        }
        # corpus: a = {x:2, y:2, z:1} (N=5), b = {x:1, q:2} (N=3), |V|=4
        pa = {"x": 0.4, "y": 0.4, "z": 0.2}
        qb = {"x": 1.5 / 5, "y": 0.5 / 5, "z": 0.5 / 5}
        want_ab = sum(p * (math.log(p) - math.log(qb[w])) for w, p in pa.items())
        assert got[("a", "b")][0] == 3
        assert abs(got[("a", "b")][1] - want_ab) < 1e-12
        # KL is asymmetric; the reverse direction uses b's vocabulary
        assert got[("b", "a")][0] == 2
        assert got[("b", "a")][1] != got[("a", "b")][1]

    def test_identical_slices_near_zero(self, spark):
        from repurpose_spark.operators.cooccur import unigram_kl

        docs = [("a", "x x y"), ("b", "x x y")]
        df = spark.createDataFrame(docs, "source string, text string")
        got = {(r["src_a"], r["src_b"]): r["kl_nats"] for r in unigram_kl(df).collect()}
        # identical NON-uniform distributions: only smoothing separates
        # p (MLE) from q (smoothed) — small but positive.  (A uniform
        # pair would give exactly 0: additive smoothing is a fixed
        # point at the uniform distribution.)
        assert 0 < got[("a", "b")] < 0.5


class TestOovRate:
    def test_hand_case(self, spark):
        from repurpose_spark.operators.cooccur import oov_rate

        docs = [
            ("a", "x x x y"),   # x:3 y:1
            ("b", "x z z q"),   # z:2 q:1
        ]
        df = spark.createDataFrame(docs, "source string, text string")
        # vocab_k=2 → top-2 by (count desc, word): x(4), z(2)
        got = {r["source"]: r.asDict()
               for r in oov_rate(df, vocab_k=2).collect()}
        assert (got["a"]["n_tokens"], got["a"]["n_oov"]) == (4, 1)  # y
        assert got["a"]["oov_rate"] == 0.25
        assert (got["b"]["n_tokens"], got["b"]["n_oov"]) == (4, 1)  # q
        assert got["b"]["oov_rate"] == 0.25

    def test_count_tie_breaks_by_word(self, spark):
        from repurpose_spark.operators.cooccur import oov_rate

        # all words count 1: vocab_k=1 must pick the alphabetically
        # first ('a'), deterministically
        df = spark.createDataFrame(
            [("s", "b a c")], "source string, text string"
        )
        got = oov_rate(df, vocab_k=1).collect()[0]
        assert got["n_oov"] == 2

    def test_validation(self, spark):
        import pytest as _pt

        from repurpose_spark.operators.cooccur import oov_rate

        df = spark.createDataFrame([("s", "x")], "source string, text string")
        with _pt.raises(ValueError, match="vocab_k"):
            oov_rate(df, vocab_k=0)
