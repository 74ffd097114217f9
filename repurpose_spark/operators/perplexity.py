"""Perplexity-style quality filtering: score documents under a character
trigram model trained on a reference corpus (the CCNet/LLaMA-recipe
"perplexity filter", reduced to a deterministic trigram LM so the score
is exactly reproducible in ANSI SQL).

Model: Laplace-smoothed trigram-given-bigram log-probabilities

    logp(abc) = ln( (count3(abc) + 1) / (count2(ab) + V) )

trained on the reference side; a document's score is the MEAN logp over
its trigram positions (higher = more reference-like).  ``V`` is a fixed
smoothing constant, not a data statistic, so scoring is a pure function
of (doc text, reference corpus).

Scale shape: the model is bounded by the character-trigram alphabet
(≤ |charset|³ distinct rows, millions at worst for unicode-light text) —
it BROADCASTS; the corpus explodes to one row per trigram position and
map-side-joins the model, then one partial+final average per doc.  The
corpus is never shuffled; only (doc_id, logp) pairs aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from repurpose_spark.plans.parallelism import ensure_parallelism

V_SMOOTH = 32768  # fixed Laplace denominator constant


def _grams(text_col: str, n: int):
    t = F.col(text_col)
    idx = F.sequence(F.lit(1), F.greatest(F.length(t) - (n - 1), F.lit(1)))
    return F.explode(F.transform(idx, lambda i: t.substr(i, F.lit(n))))


def trigram_model(
    ref: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(tri, logp) rows of the smoothed trigram model."""
    r = ensure_parallelism(ref)
    tri = r.select(_grams(text_col, 3).alias("tri")).groupBy("tri").agg(
        F.count("*").alias("c3")
    )
    bi = r.select(_grams(text_col, 2).alias("bi")).groupBy("bi").agg(
        F.count("*").alias("c2")
    )
    return (
        tri.withColumn("bi", F.col("tri").substr(1, 2))
        .join(bi, "bi")
        .select(
            "tri",
            F.log((F.col("c3") + 1) / (F.col("c2") + F.lit(V_SMOOTH))).alias(
                "logp"
            ),
        )
    )


def trigram_logprob_scores(
    docs: DataFrame,
    ref: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tri, avg_logp) per document; unseen trigrams score the
    smoothed floor ln(1/V).  Docs shorter than 3 chars score the floor
    over their single padded gram — deterministic, never null."""
    model = trigram_model(ref, text_col)
    d = ensure_parallelism(docs).select(
        F.col(id_col), _grams(text_col, 3).alias("tri")
    )
    floor = F.log(F.lit(1.0) / F.lit(float(V_SMOOTH)))
    scored = d.join(F.broadcast(model), "tri", "left").select(
        id_col, F.coalesce("logp", floor).alias("logp")
    )
    return scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tri"),
        F.avg("logp").alias("avg_logp"),
    )
