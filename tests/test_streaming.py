"""Structured-Streaming incremental rollup: AvailableNow drains emit
exactly the batch-rollup values for every completed (watermark-passed)
window; the second drain resumes from the offset log and only appends."""

import pytest
from pyspark.sql import functions as F

from repurpose_spark.config import EngineConfig
from repurpose_spark.operators.reorient import sequences_to_points
from repurpose_spark.operators.rollup import rollup_points
from repurpose_spark.sources.synthetic import synth_sequences
from repurpose_spark.streaming.incremental import (
    incremental_hourly_rollup,
    run_available_now,
)

CFG = EngineConfig(n_cells=8)
TIER_COLS = ["cell_id", "doc_id", "tick", "n_points", "sum_v", "min_v", "max_v"]


def _rows(df):
    return sorted(map(tuple, df.select(*TIER_COLS).collect()))


def test_incremental_drains_match_batch(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # points stream, fed in event-time order: first hours 0-1 (pos<128),
    # then the rest — the natural incremental-ingest pattern.  Each
    # ingest step is ONE file (coalesce): a doc's rows span multiple
    # part-files of an uncoalesced write and every file starts at the
    # chunk's first timestamp, so multi-file appends carry hours of
    # cross-file disorder — far beyond the 30-minute watermark bound —
    # and the source may legitimately drop the later files' rows as
    # late.  The watermark contract bounds INGEST disorder; the fixture
    # must honor it the way a real time-ordered feed does.
    pts = sequences_to_points(synth_sequences(spark, 200), CFG).select(
        "doc_id", "ts", "token"
    )
    pts.where(F.col("pos") < 128).coalesce(1).write.mode("append").parquet(src)

    stream = incremental_hourly_rollup(spark, src, CFG, watermark="30 minutes", max_files_per_trigger=1)
    run_available_now(stream, out, ckpt)
    got1 = spark.read.parquet(out)
    batch_all = rollup_points(
        sequences_to_points(synth_sequences(spark, 200), CFG, with_ts=False),
        3600, dt_seconds=CFG.dt_seconds, epoch=CFG.epoch,
    ).cache()

    # emitted rows must be exact batch-tier rows (watermark-complete ones)
    got1_set = _rows(got1)
    assert len(got1_set) > 0
    batch_by_key = {r[:3]: r for r in _rows(batch_all)}
    for r in got1_set:
        assert batch_by_key[r[:3]] == r
    # the first window [0,1h) is certainly complete (max ts 2:07, wm 1:37)
    ticks1 = {r[2] for r in got1_set}
    assert min(batch_by_key)[2] in ticks1

    # feed the remaining positions as two event-time-ordered single-file
    # ingest steps (separate appends → distinct mtimes → fed in order);
    # resume from the checkpoint.  Chunk 2 starts 1 minute after chunk
    # 1's max, so the advancing watermark never crosses unseen rows.
    for lo, hi in ((128, 192), (192, 10**9)):
        pts.where(
            (F.col("pos") >= lo) & (F.col("pos") < hi)
        ).coalesce(1).write.mode("append").parquet(src)
    stream2 = incremental_hourly_rollup(spark, src, CFG, watermark="30 minutes", max_files_per_trigger=1)
    run_available_now(stream2, out, ckpt)
    got2_set = _rows(spark.read.parquet(out))

    # monotone append, no duplicates, still exact batch values
    assert set(got1_set) <= set(got2_set)
    keys2 = [r[:3] for r in got2_set]
    assert len(keys2) == len(set(keys2))
    for r in got2_set:
        assert batch_by_key[r[:3]] == r
    # run 2 completed more windows than run 1
    assert len(got2_set) > len(got1_set)


def test_stateful_sessionize_splits_and_times_out(spark, tmp_path):
    """applyInPandasWithState sessionization: an in-stream gap splits and
    emits immediately; an open session closes by event-time timeout once
    a later drain advances the watermark past session_end + gap."""
    import datetime as dt

    from repurpose_spark.streaming.stateful import stateful_sessionize

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    t0 = dt.datetime(2020, 1, 1, 10, 0, 0)

    def pts(doc, offsets_min):
        return [(doc, t0 + dt.timedelta(minutes=m), 7) for m in offsets_min]

    # docA: burst at 10:00-10:05, then 13:00 (>30min gap → split);
    # docB: one burst, stays open after drain 1.
    # one FILE per logical batch (coalesce) — maxFilesPerTrigger=1 feeds
    # files as micro-batches, so file = event-time-ordered ingest unit
    batch1 = pts("A", [0, 2, 5]) + pts("A", [180]) + pts("B", [0, 1])
    spark.createDataFrame(
        batch1, "doc_id string, ts timestamp, token int"
    ).coalesce(1).write.mode("append").parquet(src)

    def drain():
        stream = stateful_sessionize(
            spark.readStream.schema("doc_id string, ts timestamp, token int")
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            gap="30 minutes",
            watermark="10 minutes",
        )
        q = (
            stream.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    drain()
    got1 = {
        (r["doc_id"], r["session_start"], r["session_end"]): (
            r["n_points"], r["sum_v"],
        )
        for r in spark.read.parquet(out).collect()
    }
    # the in-stream split emitted A's first burst: 3 points, sum 21
    key_a1 = ("A", t0, t0 + dt.timedelta(minutes=5))
    assert got1[key_a1] == (3, 21)
    # B timed out WITHIN drain 1: A's 13:00 point advanced the watermark
    # to 12:50, past B's 10:01 + 30min timeout
    assert got1[("B", t0, t0 + dt.timedelta(minutes=1))] == (2, 14)
    # A's 13:00 session (timeout 13:30 > watermark 12:50) is still open
    assert len(got1) == 2

    # drain 2: one far-future point advances the watermark past the open
    # session's end + gap → it times out and emits exactly once
    spark.createDataFrame(
        pts("C", [24 * 60]), "doc_id string, ts timestamp, token int"
    ).coalesce(1).write.mode("append").parquet(src)
    drain()
    got2 = {
        (r["doc_id"], r["session_start"], r["session_end"]): (
            r["n_points"], r["sum_v"],
        )
        for r in spark.read.parquet(out).collect()
    }
    assert got2[("A", t0 + dt.timedelta(minutes=180),
                 t0 + dt.timedelta(minutes=180))] == (1, 7)
    # exactly-once: drain-1 rows unchanged, no duplicate session keys
    assert set(got1) <= set(got2)
    assert len(got2) == len(got1) + 1


def test_streaming_dedup_exact_horizon(spark, tmp_path):
    """dropDuplicatesWithinWatermark twin of dedup_exact: an exact-content
    re-delivery within the horizon is dropped; once the watermark passes
    first_ts + delay the fingerprint is evicted and the content re-admits
    (bounded state)."""
    import datetime as dt

    from repurpose_spark.streaming.dedup import streaming_dedup_exact

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t0 = dt.datetime(2020, 6, 1, 10, 0, 0)

    def write(rows):
        spark.createDataFrame(
            rows, "doc_id string, text string, ts timestamp"
        ).coalesce(1).write.mode("append").parquet(src)

    def drain():
        stream = streaming_dedup_exact(
            spark.readStream.schema("doc_id string, text string, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            delay="1 hour",
        )
        q = (
            stream.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return {r["doc_id"] for r in spark.read.parquet(out).collect()}

    # A kept; B is an exact re-delivery (whitespace-normalized) → dropped
    write([("A", "same text here", t0),
           ("B", "  same   text here ", t0 + dt.timedelta(minutes=5)),
           ("C", "different text entirely", t0 + dt.timedelta(minutes=10))])
    assert drain() == {"A", "C"}

    # D re-delivers A's content at 13:00; watermark at batch start is
    # 10:10-1h → A's fingerprint still live → D dropped
    write([("D", "same text here", t0 + dt.timedelta(hours=3))])
    assert drain() == {"A", "C"}

    # E re-delivers at 13:30; watermark is now 12:00 > 10:00+1h → A's
    # fingerprint was evicted → E re-admits (state bounded by horizon)
    write([("E", "same text here", t0 + dt.timedelta(hours=3, minutes=30))])
    assert drain() == {"A", "C", "E"}


def test_streaming_curate_filters_and_dedups(spark, tmp_path):
    """Stateless lang/quality exprs + watermarked exact dedup compose in
    one stream: non-english and low-quality rows drop in-batch, an exact
    re-delivery within the horizon drops statefully."""
    import datetime as dt

    from repurpose_spark.streaming.dedup import streaming_curate

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t0 = dt.datetime(2021, 1, 1, 8, 0, 0)
    good = (
        "the quick brown fox jumps over the lazy dog and then it runs "
        "far away into the deep green forest to hide from the hunters "
        "that were chasing it for hours in the cold morning rain today"
    )
    rows = [
        ("A", good, t0),
        ("B", "  " + good + " ", t0),  # exact dup after normalization
        ("C", "der die und ist " * 20, t0),  # german → dropped
        ("D", "!!! ??? ***", t0),  # low quality → dropped
    ]
    spark.createDataFrame(
        rows, "doc_id string, text string, ts timestamp"
    ).coalesce(1).write.mode("append").parquet(src)

    stream = streaming_curate(
        spark.readStream.schema("doc_id string, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert kept == {"A"}


def test_streaming_uniques_sketch_matches_exact_within_error(spark, tmp_path):
    """The streaming HLL tier's state is the sketch itself: a drained
    AvailableNow run must land within the sketch error of the exact
    per-(type, day) distinct count, with the exact columns (n_points)
    matching the batch answer byte-for-byte; a resumed drain over new
    files only appends (no re-read of the first chunk)."""
    from datetime import datetime

    from repurpose_spark.streaming.incremental import (
        incremental_uniques_rollup,
        run_available_now,
    )

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # deterministic events: 3 types, 4 days, heavy user overlap so
    # distinct << count (the shape the sketch exists for)
    ev = spark.range(40_000).select(
        F.concat(F.lit("t"), (F.col("id") % 3).cast("string")).alias(
            "event_type"
        ),
        F.timestamp_seconds(
            F.lit(1_700_000_000) + (F.col("id") * 7919) % (4 * 86400)
        ).alias("ts"),
        ((F.col("id") * 104729) % 5000).alias("user_id"),
    )
    ev.orderBy("ts").coalesce(1).write.parquet(src)
    import time as _time

    _time.sleep(1.05)
    spark.createDataFrame(
        [("__sentinel__", datetime(2031, 1, 1), 0)],
        "event_type string, ts timestamp, user_id long",
    ).coalesce(1).write.mode("append").parquet(src)

    run_available_now(
        incremental_uniques_rollup(spark, src, watermark="1 hour"), out, ckpt
    )
    got = {
        (r.event_type, r.tick): r
        for r in spark.read.parquet(out).where(
            F.col("event_type") != "__sentinel__"
        ).collect()
    }
    exact = {
        (r.event_type, r.tick): r
        for r in ev.groupBy(
            "event_type", F.date_trunc("day", "ts").alias("tick")
        ).agg(
            F.count("user_id").alias("n_points"),
            F.count_distinct("user_id").alias("n_exact"),
        ).collect()
    }
    assert set(got) == set(exact) and len(got) >= 9
    for k, g in got.items():
        e = exact[k]
        assert g.n_points == e.n_points  # exact column: byte-match
        assert abs(g.n_distinct_est - e.n_exact) <= 0.08 * e.n_exact + 1


def test_streaming_quantile_tier_within_rank_bound(spark, tmp_path):
    """Binary KLL state through applyInPandasWithState: a drained
    AvailableNow run must emit long-form (q, value_est) rows whose
    estimates land within the rank bound of the exact per-(type, day)
    quantiles, with n_points byte-matching the exact count."""
    import numpy as np
    from datetime import datetime

    from repurpose_spark.streaming.incremental import run_available_now
    from repurpose_spark.streaming.stateful import stateful_quantile_tier

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    ev = spark.range(30_000).select(
        F.concat(F.lit("t"), (F.col("id") % 3).cast("string")).alias(
            "event_type"
        ),
        F.timestamp_seconds(
            F.lit(1_700_000_000) + (F.col("id") * 7919) % (4 * 86400)
        ).alias("ts"),
        ((((F.col("id") * 104729) % 1000) ** 2) / 1000.0).alias("value"),
    )
    ev.orderBy("ts").coalesce(1).write.parquet(src)
    import time as _time

    _time.sleep(1.05)
    spark.createDataFrame(
        [("__sentinel__", datetime(2031, 1, 1), 0.0)],
        "event_type string, ts timestamp, value double",
    ).coalesce(1).write.mode("append").parquet(src)

    stream = stateful_quantile_tier(
        spark.readStream.schema(
            "event_type string, ts timestamp, value double"
        ).option("maxFilesPerTrigger", 4).parquet(src),
        watermark="1 hour",
    )
    run_available_now(stream, out, ckpt)
    got = spark.read.parquet(out).where(
        F.col("event_type") != "__sentinel__"
    ).collect()
    pdf = ev.select(
        "event_type", F.date_trunc("day", "ts").alias("tick"), "value"
    ).toPandas()
    groups = {
        k: np.sort(g["value"].to_numpy())
        for k, g in pdf.groupby(["event_type", "tick"])
    }
    # 4 days of seconds offset from a mid-day epoch → 5 partial calendar
    # days × 3 types
    assert len(got) == 3 * len(groups) and len(groups) == 15
    for r in got:
        data = groups[(r.event_type, r.tick)]
        assert r.n_points == len(data)
        q = {"p50": 0.5, "p90": 0.9, "p99": 0.99}[r.q]
        lo = np.searchsorted(data, r.value_est, side="left") / len(data)
        hi = np.searchsorted(data, r.value_est, side="right") / len(data)
        assert lo - 0.02 <= q <= hi + 0.02, (r, lo, hi)


def test_batch_and_streaming_sessionize_agree(spark, tmp_path):
    """Cross-certification: the streaming sessionizer's drained output
    must equal the batch sessionize frame on identical input — the
    batch twin carries the exact SQL oracle (ev_sessions), so equality
    here certifies the streaming semantics transitively."""
    from datetime import datetime

    from repurpose_spark.operators.sessions import sessionize
    from repurpose_spark.streaming.incremental import run_available_now
    from repurpose_spark.streaming.stateful import stateful_sessionize

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # ~86 points/doc over 6h → mean inter-arrival ≈250 s, so a
    # 1-minute gap splits each doc into many sessions
    pts = spark.range(600).select(
        F.concat(F.lit("d"), (F.col("id") % 7)).alias("doc_id"),
        F.timestamp_seconds(
            F.lit(1_600_000_000) + (F.col("id") * 104729) % (6 * 3600)
        ).alias("ts"),
        (F.col("id") % 13).cast("int").alias("token"),
    )
    pts.orderBy("ts").coalesce(1).write.parquet(src)
    import time as _time

    _time.sleep(1.05)
    spark.createDataFrame(
        [("__sentinel__", datetime(2031, 1, 1), 0)],
        "doc_id string, ts timestamp, token int",
    ).coalesce(1).write.mode("append").parquet(src)

    stream = stateful_sessionize(
        spark.readStream.schema("doc_id string, ts timestamp, token int")
        .option("maxFilesPerTrigger", 4)
        .parquet(src),
        gap="1 minute",
        watermark="10 minutes",
    )
    run_available_now(stream, out, ckpt)
    got = sorted(
        map(
            tuple,
            spark.read.parquet(out)
            .where(F.col("doc_id") != "__sentinel__")
            .collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            sessionize(
                pts, gap="1 minute", key_cols=["doc_id"],
                ts_col="ts", value_col="token",
            )
            .select(
                "doc_id", "session_start", "session_end",
                "n_points", "sum_v",
            )
            .collect(),
        )
    )
    assert len(got) > 20 and got == want


def test_streaming_minhash_probe_matches_batch_and_resumes(spark, tmp_path):
    """The foreachBatch near-dup probe equals the one-shot batch probe
    over the same docs regardless of the micro-batch split; a rerun
    after a new file lands probes ONLY the delta (offset-log resume),
    appending its pairs with fresh ingest_batch lineage."""
    from repurpose_spark.operators.dedup import minhash_probe
    from repurpose_spark.streaming.dedup import run_streaming_minhash_probe

    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep green forest to hide from the loud hunters"
    )
    index = spark.createDataFrame(
        [(0, base), (1, base.replace("green", "dark")),
         (2, "totally unrelated corpus row about parquet row groups")],
        "doc_id long, text string",
    )
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def write(rows):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(src)

    def drain():
        run_streaming_minhash_probe(
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            index, out, ckpt, k=8, bands=8, threshold=0.3, step=1,
        )
        return spark.read.parquet(out)

    # two files -> two micro-batches
    write([(10, base.replace("quick", "swift"))])
    write([(11, "another unrelated ingest document"), (12, base)])
    got = drain()
    batch_docs = spark.read.parquet(src)
    want = {
        (r["new_id"], r["index_id"]): r["jaccard"]
        for r in minhash_probe(
            index, batch_docs, k=8, bands=8, threshold=0.3, step=1
        ).collect()
    }
    assert {
        (r["new_id"], r["index_id"]): r["jaccard"] for r in got.collect()
    } == want
    assert (12, 0) in want and want[(12, 0)] == 1.0
    n_batches_1 = got.select("ingest_batch").distinct().count()
    assert n_batches_1 >= 2  # the split really was multi-micro-batch

    # delta resume: one new near-dup file; rerun drains ONLY it
    write([(13, base.replace("lazy", "idle"))])
    got2 = spark.createDataFrame(drain().collect(), got.schema)
    new_rows = got2.where(F.col("new_id") == 13)
    assert new_rows.count() > 0
    assert got2.count() == len(want) + new_rows.count()  # old pairs kept once
    assert (
        new_rows.select(F.min("ingest_batch")).first()[0] >= n_batches_1
    )  # fresh epoch, not a reprocess


def test_streaming_page_hinkley_equals_batch(spark, tmp_path):
    """Integer state ⇒ the drained streaming PH final rows equal the
    batch operator byte-for-byte on the same tick stream, with the
    state crossing a real micro-batch boundary (two time-ordered files,
    maxFilesPerTrigger=1)."""
    import datetime as dt
    import time

    from pyspark.sql import functions as F

    from repurpose_spark.operators.drift import page_hinkley
    from repurpose_spark.streaming.incremental import run_available_now
    from repurpose_spark.streaming.stateful import stateful_page_hinkley

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # k1: quiet 10s then a jump (alarm); k2: quiet forever (no alarm);
    # k3: only 4 ticks (inside burn-in -> omitted by both)
    for i in range(20):
        rows.append(("k1", t0 + dt.timedelta(hours=i), 10 if i < 12 else 40))
        rows.append(("k2", t0 + dt.timedelta(hours=i), 10))
    for i in range(4):
        rows.append(("k3", t0 + dt.timedelta(hours=i), 10))
    df = spark.createDataFrame(rows, "event_type string, tick timestamp, v long")

    src = str(tmp_path / "in")
    half = t0 + dt.timedelta(hours=9)
    df.where(F.col("tick") <= F.lit(half)).orderBy("tick").coalesce(1) \
        .write.mode("append").parquet(src)
    time.sleep(1.05)
    df.where(F.col("tick") > F.lit(half)).orderBy("tick").coalesce(1) \
        .write.mode("append").parquet(src)
    time.sleep(1.05)
    spark.createDataFrame(
        [("__sentinel__", dt.datetime(2030, 1, 1), 0)],
        "event_type string, tick timestamp, v long",
    ).coalesce(1).write.mode("append").parquet(src)

    ticks = (
        spark.readStream.schema("event_type string, tick timestamp, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    stream = stateful_page_hinkley(ticks, calib=6, delta=0, lam=15,
                                   watermark="1 hour")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_available_now(stream, out, ckpt)
    got = {
        r["event_type"]: r
        for r in spark.read.parquet(out)
        .where(F.col("event_type") != "__sentinel__")
        .collect()
    }
    want = {
        r["event_type"]: r
        for r in page_hinkley(
            df, ["event_type"], ts_col="tick", value_col="v",
            calib=6, delta=0, lam=15,
        ).collect()
    }
    assert set(got) == set(want) == {"k1", "k2"}  # k3 omitted by both
    for k in want:
        for c in ("calib_n", "calib_sum", "n_scored", "max_ph_scaled",
                  "max_ph", "first_alarm_ts"):
            assert got[k][c] == want[k][c], (k, c)
    assert want["k1"]["first_alarm_ts"] is not None
    assert want["k2"]["first_alarm_ts"] is None
