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


def run_streaming_minhash_probe(
    stream_docs: DataFrame,
    index_docs: DataFrame | None,
    sink_path: str,
    checkpoint_dir: str,
    index_path: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    bands: int = 4,
    shingle_n: int = 8,
    threshold: float = 0.6,
    step: int = 2,
    use_md5: bool = False,
    timeout_sec: int = 300,
) -> None:
    """Streaming NEAR-dup detection against the existing corpus — the
    missing half of ``streaming_curate``'s note: exact dedup streams
    natively (state = fingerprints), but LSH's self-join does not.  What
    DOES stream is the production shape: each ingest micro-batch probed
    against a STATIC history index via
    :func:`operators.dedup.minhash_probe` inside ``foreachBatch``.
    Per-pair results are independent of the micro-batch split (every
    stream doc is compared to the index alone), so the drained sink
    equals the one-shot batch probe over the same documents EXACTLY —
    regardless of how the stream was chopped — and within-stream dups
    remain the periodic batch self-join's job, as documented above.

    Resumability is Spark's own offset log: AvailableNow drains what
    exists and stops; a rerun after new files land probes ONLY the
    delta (the sink keeps prior batches' pairs — append mode), which is
    the per-ingest cost contract of the batch probe made continuous.
    Each sink row carries ``ingest_batch`` (the foreachBatch epoch) as
    lineage, mirroring the tier pipeline's per-batch ledger rows.

    Pass ``index_path`` (a :func:`materialize_dedup_index` table) to
    probe the pruned scale path instead of banding ``index_docs`` from
    scratch every micro-batch."""
    from repurpose_spark.operators.dedup import (
        minhash_probe,
        minhash_probe_indexed,
    )

    def _probe(batch_df: DataFrame, batch_id: int) -> None:
        if index_path is not None:
            pairs = minhash_probe_indexed(
                batch_df.sparkSession, index_path, batch_df,
                id_col=id_col, text_col=text_col, k=k, bands=bands,
                shingle_n=shingle_n, threshold=threshold, step=step,
                use_md5=use_md5,
            )
        else:
            pairs = minhash_probe(
                index_docs, batch_df,
                id_col=id_col, text_col=text_col, k=k, bands=bands,
                shingle_n=shingle_n, threshold=threshold, step=step,
                use_md5=use_md5,
            )
        pairs.withColumn("ingest_batch", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(sink_path)

    q = (
        stream_docs.writeStream.foreachBatch(_probe)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
