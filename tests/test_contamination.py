"""Decontamination: broadcast gram join flags eval-overlapping docs."""

from repurpose_spark.operators.contamination import flag_contaminated


def test_flags_overlapping_docs_only(spark):
    bench = spark.createDataFrame(
        [("q1", "what is the capital of france")],
        "doc_id string, text string",
    )
    docs = spark.createDataFrame(
        [
            ("t1", "paris is the capital of france and a big city"),
            ("t2", "completely unrelated text about spark joins"),
            ("t3", "the capital of france appears verbatim right here"),
        ],
        "doc_id string, text string",
    )
    got = {
        r["doc_id"]: r["n_hit_grams"]
        for r in flag_contaminated(docs, bench, n=10).collect()
    }
    assert set(got) == {"t1", "t3"}
    assert all(v >= 1 for v in got.values())


def test_min_hits_threshold(spark):
    bench = spark.createDataFrame(
        [("q1", "alpha beta gamma delta")], "doc_id string, text string"
    )
    docs = spark.createDataFrame(
        # shares exactly the grams of one short span
        [("t1", "xxxx alpha beta xxxx")],
        "doc_id string, text string",
    )
    low = flag_contaminated(docs, bench, n=10, min_hits=1).count()
    high = flag_contaminated(docs, bench, n=10, min_hits=50).count()
    assert low == 1 and high == 0
