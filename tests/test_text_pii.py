"""Repetition signal and PII scrubbing."""

from pyspark.sql import functions as F

from repurpose_spark.functions.text import (
    pii_counts,
    repetition_ratio,
    scrub_pii,
)


def _one(spark, text, col):
    return (
        spark.createDataFrame([(text,)], "text string")
        .select(col("text").alias("v"))
        .first()["v"]
    )


def test_repetition_ratio_bounds(spark):
    assert _one(spark, "short", repetition_ratio) == 0.0  # < n chars
    # all-distinct text repeats nothing
    assert _one(spark, "abcdefghijklmnopqrstuvwxyz", repetition_ratio) == 0.0
    # heavy repetition scores high
    v = _one(spark, "spam spam spam spam spam spam spam spam", repetition_ratio)
    assert v > 0.5


def test_scrub_pii_redacts_and_counts(spark):
    text = (
        "mail me at jane.doe+x@example.org or call +1 (555) 123-4567, "
        "server at 10.0.0.1, backup jane@ex.co"
    )
    scrubbed = _one(spark, text, scrub_pii)
    assert "<EMAIL>" in scrubbed and "<PHONE>" in scrubbed and "<IPV4>" in scrubbed
    assert "example.org" not in scrubbed and "10.0.0.1" not in scrubbed
    c = _one(spark, text, pii_counts)
    assert (c["n_email"], c["n_ipv4"], c["n_phone"]) == (2, 1, 1)


def test_scrub_pii_clean_text_unchanged(spark):
    text = "no sensitive content here at all"
    assert _one(spark, text, scrub_pii) == text
    c = _one(spark, text, pii_counts)
    assert (c["n_email"], c["n_ipv4"], c["n_phone"]) == (0, 0, 0)


def test_lexical_diversity_vs_bruteforce(spark):
    """In-row run-length formulation vs a Counter-based replay on texts
    with dupes, case folds, unicode spacing, and blanks."""
    from collections import Counter

    from repurpose_spark.functions.text import lexical_diversity

    texts = [
        "a b a c  b a",
        "",
        "   ",
        "x",
        "Dog dog DOG cat",
        "one two two three three three",
        "tab\tsep\nnewline  mixed\t\tws",
        "ä Ä unicode ä",
    ]
    rows = (
        spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                              "id long, text string")
        .select("id", lexical_diversity("text").alias("ld"))
        .select("id", "ld.*")
        .collect()
    )
    for r in rows:
        words = [w for w in texts[r["id"]].lower().split() if w]
        c = Counter(words)
        assert r["n_tok"] == len(words)
        assert r["n_types"] == len(c)
        assert r["n_hapax"] == sum(1 for v in c.values() if v == 1)


def test_lexical_diversity_plan_has_no_exchange(spark):
    """The whole computation is one map-only projection: zero shuffles."""
    from repurpose_spark.functions.text import lexical_diversity

    df = spark.createDataFrame(
        [(i, "w%d w%d x" % (i, i % 3)) for i in range(100)],
        "id long, text string",
    )
    plan = (
        df.select("id", lexical_diversity("text").alias("ld"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
