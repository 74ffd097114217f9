"""End-to-end curation pipeline: lang filter → quality threshold →
exact dedup → near-dup removal, plus the single-scan stage report.

The reference has no curation surface; this is the graft-mandated
training-data extension composing the certified primitives (lang_id,
quality_score, fingerprint64, dedup_minhash_lsh).
"""

import pytest
from pyspark.sql import functions as F

from repurpose_spark.operators.curation import (
    curate_documents,
    curation_report,
)

# long, stopword-rich english text scores well on quality_score
GOOD = (
    "the quick brown fox jumps over the lazy dog and then it runs far "
    "away into the deep green forest to hide from the loud hunters that "
    "were chasing it for hours in the cold morning rain of this autumn"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        ("d0", GOOD),
        ("d1", GOOD),  # exact dup of d0 → dropped (d0 canonical)
        ("d2", GOOD.replace("green", "dark")),  # near dup of d0 → dropped
        ("d3", "der die und ist der die und ist der die und ist " * 8),  # de
        ("d4", "!!! ??? *** !!! ??? ***"),  # punct-heavy, low quality
        (
            "d5",
            "the data engine is made of many joins and it is fast and "
            "the planner is good at pruning all of the columns that it "
            "does not need for this query of the benchmark suite today",
        ),  # good english, unrelated content → kept
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_curate_keeps_canonical_and_drops_near_dups(docs):
    out = curate_documents(
        docs,
        langs=("en",),
        min_quality=0.5,
        minhash_kwargs=dict(k=4, bands=4, threshold=0.3, step=1),
    )
    kept = {r["doc_id"] for r in out.collect()}
    assert kept == {"d0", "d5"}
    row = out.where(F.col("doc_id") == "d0").first()
    assert row["lang_pred"] == "en"
    assert row["q"] >= 0.5


def test_curate_without_near_dup_stage(docs):
    out = curate_documents(docs, near_dup=False)
    kept = {r["doc_id"] for r in out.collect()}
    # near-dup d2 survives; exact dup d1 still collapses into d0
    assert kept == {"d0", "d2", "d5"}


def test_curation_report_counts(docs):
    rep = {
        r["stage"]: r["n_docs"]
        for r in curation_report(docs, langs=("en",)).collect()
    }
    assert rep == {
        "1_input": 6,
        "2_lang": 4,  # d3 is de, d4 is 'other'
        "3_quality": 4,  # all english rows here pass 0.5
        "4_exact_dedup": 3,  # d0/d1 collapse
    }


def test_curate_plan_has_no_cartesian(docs):
    plan = curate_documents(docs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_curate_components_policy_merges_transitive_chain(spark):
    """keep_first on a chain A~B, B~C (A!~C) keeps A and C; the
    components policy keeps only the cluster min."""
    import pytest as _pytest

    base = GOOD
    rows = [
        ("a", base),
        ("b", base.replace("green", "dark")),
        ("c", base.replace("green", "dark").replace("quick", "rapid")),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    kw = dict(k=4, bands=4, threshold=0.3, step=1)

    first = curate_documents(docs, minhash_kwargs=kw)
    comps = curate_documents(
        docs, near_dup_policy="components", minhash_kwargs=kw
    )
    kept_first = {r["doc_id"] for r in first.collect()}
    kept_comps = {r["doc_id"] for r in comps.collect()}
    assert kept_comps == {"a"}
    # greedy policy drops every doc_b — depending on which pairs verify,
    # it keeps at least the min and never more than the component count
    assert "a" in kept_first

    with _pytest.raises(ValueError):
        curate_documents(docs, near_dup_policy="nope")


def test_curate_components_policy_custom_id_col(spark):
    """components policy with a non-default id_col used to crash with an
    analysis error (id_col not forwarded to connected_components —
    ADVICE r2)."""
    rows = [
        ("x1", GOOD),
        ("x2", GOOD.replace("green", "dark")),
        ("x3", GOOD.replace("green", "dark").replace("quick", "rapid")),
    ]
    docs = spark.createDataFrame(rows, "uid string, text string")
    out = curate_documents(
        docs,
        id_col="uid",
        near_dup_policy="components",
        minhash_kwargs=dict(k=4, bands=4, threshold=0.3, step=1),
    )
    assert {r["uid"] for r in out.collect()} == {"x1"}


def test_curate_boilerplate_stage(spark):
    # two hot keys: the banner (case variants normalize together, in
    # b0/b1/b2/b4) and the footer (b0/b3).  b4 is banner-heavy: its
    # quality only clears the 0.7 bar once the boilerplate drops.
    # b2/b3 share their body line under DIFFERENT boilerplate — at line
    # granularity that shared body is itself cross-corpus-hot, so the
    # cleaning stage GUTS both pages and the quality bar then drops
    # them (full-dup content shared between exactly-two docs dies at
    # the line tier before exact dedup ever sees it).
    banner = "*** COOKIE BANNER *** | HOME | ABOUT | CONTACT |"
    footer = "Copyright ACME 2026 - All Rights Reserved"
    body2 = GOOD.replace("fox", "owl").replace("autumn", "spring")
    rows = [
        ("b0", banner + "\n" + GOOD + "\n" + footer),
        ("b1", banner.lower() + "\n" + GOOD.replace("fox", "cat")),
        ("b2", banner + "\n" + body2),
        ("b3", footer + "\n" + body2),
        (
            "b4",
            "\n".join([banner] * 10 + [GOOD.replace("autumn", "winter")]),
        ),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    kw = dict(min_quality=0.7, near_dup=False)

    plain = {
        r["doc_id"]: r["q"] for r in curate_documents(docs, **kw).collect()
    }
    # banner-diluted b4 misses the bar; b2/b3 both survive (their raw
    # fingerprints differ by banner case)
    assert set(plain) == {"b0", "b1", "b2", "b3"}
    assert plain["b2"] < 0.95  # scored WITH the banner in place

    out = {
        r["doc_id"]: r["q"]
        for r in curate_documents(docs, boilerplate=True, **kw).collect()
    }
    # b4's clean body clears the bar; b2/b3 are gutted (their whole
    # body is a shared line) and fall to the quality filter
    assert set(out) == {"b0", "b1", "b4"}
    assert all(q > 0.95 for q in out.values())  # scored on clean bodies

    # kwargs forward: min_docs=20 -> nothing is hot -> plain behavior
    none_hot = curate_documents(docs, boilerplate={"min_docs": 20}, **kw)
    assert {r["doc_id"] for r in none_hot.collect()} == set(plain)
