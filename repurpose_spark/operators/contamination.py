"""Benchmark decontamination: flag training documents that share long
character n-grams with an evaluation/benchmark set.

The standard pre-training hygiene pass (GPT-3 appendix-C style: a doc
is contaminated if any long n-gram collides with the eval set).  Shape:

* the benchmark side is SMALL (eval suites, not corpora) — its distinct
  gram set is broadcast, so the training corpus is scanned once with a
  map-side hash join and NEVER shuffled;
* per-doc hit counts come from one partial+final aggregate over the
  exploded (doc, gram) hits — only colliding grams survive the join,
  so the aggregate input is tiny in the common (clean) case.

Grams are the same character shingles the dedup family uses
(:func:`repurpose_spark.operators.dedup.shingles`), so the oracle
replays the pass with UNNEST + JOIN + COUNT(DISTINCT) exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from repurpose_spark.operators.dedup import shingles
from repurpose_spark.plans.parallelism import ensure_parallelism


def flag_contaminated(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 8,
    step: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_hits: int = 1,
) -> DataFrame:
    """(id, n_hit_grams) for every training doc sharing >= ``min_hits``
    distinct n-grams with the benchmark set."""
    grams = (
        bench.select(
            F.explode(shingles(text_col, n, step=step)).alias("gram")
        )
        .distinct()
    )
    doc_grams = ensure_parallelism(docs).select(
        F.col(id_col),
        F.explode(shingles(text_col, n, step=step)).alias("gram"),
    )
    # grams are DISTINCT per doc by construction (shingles() applies
    # array_distinct before the explode), so count == count_distinct
    # exactly — and count aggregates map-side into one row per doc
    # instead of shipping every surviving (doc, gram) string through
    # count_distinct's dedup exchange (guide §2.3: measured at sf1.0,
    # 13.2M of 13.3M gram rows survive the bench join, so that exchange
    # carried virtually the whole exploded corpus)
    hits = (
        doc_grams.join(F.broadcast(grams), "gram")
        .groupBy(id_col)
        .agg(F.count("gram").alias("n_hit_grams"))
    )
    return hits.where(F.col("n_hit_grams") >= min_hits)
