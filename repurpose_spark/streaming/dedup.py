"""Streaming exact dedup: the Structured-Streaming twin of
:func:`repurpose_spark.operators.dedup.dedup_exact`.

An ingest feed re-delivers documents (at-least-once sources, retried
producers, crawl re-fetches).  This operator drops exact-content
re-deliveries *incrementally*: each document's 64-bit content
fingerprint is held in the state store and any row whose fingerprint
was already seen within the watermark horizon is discarded —
``dropDuplicatesWithinWatermark``, so state is bounded by the horizon
(fingerprints older than max-event-time − delay are evicted), not by
corpus size.

Scale shape: state is keyed by the fingerprint (one 64-bit key + one
timestamp per distinct live document), partitioned by the same hash the
downstream tier shuffle uses.  No shingles, no text in state.

Semantics note vs the batch op: batch ``dedup_exact`` keeps the min-id
copy of each group; the streaming op keeps the FIRST-ARRIVED copy
(within a micro-batch, an arbitrary-but-single one) — the right policy
when re-deliveries are identical payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from repurpose_spark.functions.text import fingerprint64


def streaming_dedup_exact(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    delay: str = "1 hour",
) -> DataFrame:
    """docs stream (… text, ts) → stream with exact-content re-deliveries
    dropped; duplicates arriving within ``delay`` of the first copy's
    event time are suppressed."""
    return (
        docs.withColumn("__fp", fingerprint64(text_col))
        .withWatermark(ts_col, delay)
        .dropDuplicatesWithinWatermark(["__fp"])
        .drop("__fp")
    )


def streaming_curate(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    langs: tuple = ("en",),
    min_quality: float = 0.5,
    delay: str = "1 hour",
) -> DataFrame:
    """Streaming twin of the batch curation pipeline's stateless prefix
    plus exact dedup: lang filter → quality threshold → within-watermark
    exact dedup.  lang_id/quality_score are pure column expressions, so
    they run unchanged inside a micro-batch; the only stateful stage is
    the fingerprint dedup (state bounded by the watermark horizon).
    Near-dup LSH stays batch-side — its self-join is not expressible in
    a single stream (stream-stream self-joins need both sides retained
    forever); a production topology runs it as a periodic compaction
    over the stream's output table."""
    from repurpose_spark.functions.text import lang_id, quality_score

    kept = docs.where(
        lang_id(F.col(text_col)).isin(list(langs))
        & (quality_score(F.col(text_col)) >= F.lit(min_quality))
    )
    return streaming_dedup_exact(kept, text_col, ts_col, delay)
