"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the engine's operator inventory (SURVEY.md §2) over
the driver tables at sf_dir plus the engine's own deterministic synthetic
``sequences`` table (closed-form, so DuckDB can regenerate it in SQL).
``oracle_sql()`` carries the ANSI twin for every SQL-expressible query.

Float-safety: aggregates of doubles are cast to DECIMAL before summing
(exact in both engines); ratios/cosines are rounded; time deltas are exact
integer microseconds — so value-hash comparison is deterministic.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from repurpose_spark.config import EngineConfig
from repurpose_spark.operators.collocate import collocate
from repurpose_spark.operators.dedup import (
    dedup_minhash_lsh,
    dedup_simhash,
    exact_dup_groups,
)
from repurpose_spark.operators.encode import decode_series, encode_series
from repurpose_spark.operators.gapfill import gap_fill
from repurpose_spark.operators.reorient import points_to_sequences, sequences_to_points
from repurpose_spark.operators.rollup import rollup, rollup_from_partials
from repurpose_spark.operators.similarity import (
    brute_force_topk,
    cosine_scores,
    lsh_topk,
)
from repurpose_spark.functions.text import (
    minhash_signature,
    punct_ratio,
    ws_token_count,
)
from repurpose_spark.sources.synthetic import synth_sequences
from repurpose_spark.sources.testdata import load_table

CFG = EngineConfig(n_cells=32)
N_SYNTH = 400  # synthetic sequences for the engine-flagship queries


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _wide(df: DataFrame) -> DataFrame:
    """Widen a narrow scan before a CPU-heavy per-row projection.

    The sf* fixture tables are single-row-group parquet files — an
    unsplittable one-task scan, so regex/hash-heavy projections would
    run single-threaded regardless of core count.  No-op on wide scans
    (the 100 TB case: thousands of splits, no added shuffle)."""
    from repurpose_spark.plans.parallelism import ensure_parallelism

    return ensure_parallelism(df)


# --------------------------------------------------------------------------
# engine-flagship queries over the closed-form synthetic sequences table
# --------------------------------------------------------------------------

def q_seq_reorient_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Img2Ts + inverse: explode → shuffle-by-cell → reassemble; emit
    closed-form-checkable per-doc facts (round-trip invariant)."""
    seqs = synth_sequences(spark, N_SYNTH)
    back = points_to_sequences(sequences_to_points(seqs, CFG), CFG)
    return back.select(
        "doc_id",
        "n_tok",
        "source",
        F.aggregate(
            "tokens", F.lit(0).cast("long"), lambda a, x: a + x.cast("long")
        ).alias("token_sum"),
        F.element_at("tokens", 1).cast("long").alias("tok_first"),
        F.element_at("tokens", -1).cast("long").alias("tok_last"),
    )


def q_seq_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = sequences_to_points(synth_sequences(spark, N_SYNTH), CFG)
    return (
        rollup(pts, "hour", key_cols=["doc_id"])
        .select(
            "doc_id",
            "tick",
            "n_points",
            F.col("sum_v").cast("long").alias("sum_v"),
            F.col("min_v").cast("long").alias("min_v"),
            F.col("max_v").cast("long").alias("max_v"),
        )
    )


def q_seq_daily_from_partials(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = sequences_to_points(synth_sequences(spark, N_SYNTH), CFG)
    hourly = rollup(pts, "hour", key_cols=["doc_id"])
    return rollup_from_partials(hourly, "day", key_cols=["doc_id"]).select(
        "doc_id",
        "tick",
        "n_points",
        F.col("sum_v").cast("long").alias("sum_v"),
        F.col("min_v").cast("long").alias("min_v"),
        F.col("max_v").cast("long").alias("max_v"),
    )


def q_seq_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = sequences_to_points(synth_sequences(spark, N_SYNTH), CFG)
    hourly = rollup(pts, "hour", key_cols=["doc_id"])
    dense = gap_fill(
        hourly, "hour", key_cols=["doc_id"], fill_values={"n_points": 0}
    )
    return dense.select(
        "doc_id", "tick", F.col("n_points").cast("long").alias("n_points")
    )


def q_seq_collocate_2h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of collocation of a sparse derived obs stream (pos % 7 == 3)
    onto a 2h tick axis — reference bfill/tolerance/limit=1 semantics."""
    pts = sequences_to_points(synth_sequences(spark, N_SYNTH), CFG)
    obs = pts.where(F.col("pos") % 7 == 3).select(
        "doc_id", F.col("ts").alias("obs_ts"), F.col("token").alias("v")
    )
    ticks = [f"2020-01-01 {h:02d}:00:00" for h in (0, 2, 4)]
    out = collocate(obs, ticks, key_cols=["doc_id"], ts_col="obs_ts")
    return out.select(
        "doc_id",
        "tick",
        (F.unix_micros("obs_ts") - F.unix_micros("tick")).alias("delta_us"),
        F.col("v").cast("long").alias("v"),
    )


def q_seq_salted_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit-salting path: two-phase hourly rollup keyed by source on
    the *skewed* synthetic table (giant docs), bit-identical to the plain
    groupBy (operators/skew.py)."""
    from repurpose_spark.operators.skew import (
        detect_hot_keys,
        rollup_points_salted,
    )

    pts = sequences_to_points(
        synth_sequences(spark, N_SYNTH, skew=True), CFG, with_ts=False
    )
    hot = detect_hot_keys(pts, ["source"], threshold=0.2)
    out = rollup_points_salted(
        pts, 3600, key_cols=["source"], fine_col="doc_id", buckets=8,
        hot_keys=hot, dt_seconds=CFG.dt_seconds, epoch=CFG.epoch,
    )
    return out.select(
        "source",
        "tick",
        "n_points",
        F.col("sum_v").cast("long").alias("sum_v"),
        F.col("min_v").cast("long").alias("min_v"),
        F.col("max_v").cast("long").alias("max_v"),
    )


def q_seq_gorilla_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack hourly tiers per series (DoD ts + DoD ints + XOR floats),
    decode back — exact inverse (bit-exactness asserted in pytest).
    The decoded output IS the hourly tier + avg, which the _SEQ_CTE oracle
    regenerates in SQL — so the driver certifies the codec round-trip
    end-to-end (ref semantics: ts2img.py:413-419)."""
    pts = sequences_to_points(synth_sequences(spark, N_SYNTH), CFG)
    hourly = rollup(pts, "hour").withColumn(
        "avg_v", F.col("sum_v") / F.col("n_points")
    )
    tier = hourly.select("cell_id", "doc_id", "tick", "sum_v", "avg_v")
    packed = encode_series(tier, int_cols=["sum_v"], float_cols=["avg_v"])
    out = decode_series(packed, int_cols=["sum_v"], float_cols=["avg_v"])
    # cell_id = pmod(xxhash64(doc_id), n) has no SQL twin — drop it from
    # the wire format (it stays the encode/partition key)
    return out.select(
        "doc_id",
        "tick",
        F.col("sum_v").cast("long").alias("sum_v"),
        F.col("avg_v").cast("double").alias("avg_v"),
    )


def q_seq_preprocess_hook(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 preprocess hook: user fn per series via applyInPandas
    (ts2img.py:284-303 semantics) — here mean-centering each series."""
    from repurpose_spark.operators.hooks import apply_per_series

    pts = sequences_to_points(synth_sequences(spark, N_SYNTH), CFG, with_ts=False)

    def center(pdf):
        return pdf.assign(centered=pdf.token - pdf.token.mean())[
            ["doc_id", "pos", "centered"]
        ]

    out = apply_per_series(
        pts.select("doc_id", "pos", "token"),
        [center],
        "doc_id string, pos int, centered double",
        key_cols=["doc_id"],
        sort_within="pos",
    )
    return out.select("doc_id", "pos", F.round("centered", 6).alias("centered"))


def q_seq_pack_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized concat-and-chunk packing of the synthetic sequences
    into 4096-token training examples (distributed prefix sum + boundary
    slicing, pieces reassembled by stream offset).  Emits per-example
    content facts (count + token sum) the oracle regenerates from the
    closed-form stream."""
    from repurpose_spark.operators.packing import materialize_packs

    packs = materialize_packs(synth_sequences(spark, N_SYNTH), 4096, by="source")
    return packs.select(
        "source",
        "pack_id",
        F.col("n_tok").cast("long").alias("n_tokens"),
        F.aggregate(
            "tokens", F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("sum_tok"),
    )


def q_seq_ortho_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OrthoMultiTs dense layout (img2ts.py:68-76): shared tick axis per
    group ('source' as the cell so the oracle can reproduce membership),
    per-series aligned value arrays; emits alignment facts."""
    from repurpose_spark.operators.ortho import ortho_layout

    pts = sequences_to_points(synth_sequences(spark, N_SYNTH), CFG, with_ts=False)
    from repurpose_spark.operators.rollup import rollup_points

    hourly = rollup_points(
        pts, 3600, key_cols=["source", "doc_id"],
        dt_seconds=CFG.dt_seconds, epoch=CFG.epoch,
    )
    o = ortho_layout(
        hourly, key_cols=["source", "doc_id"], cell_col="source"
    )
    return o.select(
        "source",
        "doc_id",
        F.size("ticks").alias("n_ticks"),
        F.size(F.filter("values", lambda v: v.isNotNull())).alias("n_obs"),
        F.aggregate(
            F.filter("values", lambda v: v.isNotNull()),
            F.lit(0).cast("long"),
            lambda a, v: a + v,
        ).alias("sum_values"),
    )


def q_ev_project_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+P2: projection + rename dict + per-variable dtype cast
    (variable_rename img2ts.py:677-695, ts_dtypes img2ts.py:684-691)."""
    ev = _t(spark, sf_dir, "events")
    renames = {"event_id": "eid", "event_type": "etype"}
    casts = {"value": "decimal(18,2)", "user_id": "int"}
    out = ev.select("event_id", "event_type", "user_id", "value")
    for old, new in renames.items():
        out = out.withColumnRenamed(old, new)
    for c, t in casts.items():
        out = out.withColumn(c, F.col(c).cast(t))
    # hash-stable final type: decimal internally, double on the wire
    return out.withColumn("value", F.col("value").cast("double"))


def q_ev_drop_empty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 drop_empty (ts2img.py:388-400): drop hourly slices whose values
    are all missing; emit surviving slices with row counts."""
    ev = _t(spark, sf_dir, "events")
    by_tick = ev.groupBy(F.date_trunc("hour", "ts").alias("tick")).agg(
        F.count("*").alias("n_rows"),
        F.count(
            F.when(
                F.col("value").isNotNull() & ~F.isnan("value"), F.lit(1)
            )
        ).alias("n_valid"),
    )
    return by_tick.where(F.col("n_valid") > 0).select(
        "tick", "n_rows", "n_valid"
    )


def q_ev_exact_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 exact temporal join (stack.py:339-340 intersect1d): hourly ticks
    present for BOTH 'click' and 'purchase' streams, inner-joined."""
    ev = _t(spark, sf_dir, "events")
    def axis(et):
        return (
            ev.where(F.col("event_type") == et)
            .groupBy(F.date_trunc("hour", "ts").alias("tick"))
            .agg(F.count("*").alias(f"n_{et}"))
        )
    a, b = axis("click"), axis("purchase")
    return a.join(b, "tick", "inner")


def _resample_fixture(spark):
    """Closed-form grids (reference test style): 10x10 integer targets,
    20x20 half-step sources with value (s*13) % 101."""
    from repurpose_spark.operators.resample import build_neighbor_pairs

    targets = [(t, float(t % 10), float(t // 10)) for t in range(100)]
    sources = [(s, (s % 20) * 0.5, (s // 20) * 0.5) for s in range(400)]
    pairs = build_neighbor_pairs(spark, targets, sources, k=4, max_dist=0.75)
    src = spark.range(400).select(
        F.col("id").alias("key"),
        ((F.col("id") * 13) % 101).cast("double").alias("v"),
    )
    return pairs, src


def q_knn_resample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2+A2: Hamming-weighted 4-NN resample onto the target grid.
    Weights rounded->decimal so sums are exact in both engines."""
    from repurpose_spark.operators.resample import hamming_weight

    pairs, src = _resample_fixture(spark)
    w = F.round(hamming_weight(F.col("dist"), 0.75), 9).cast("decimal(12,9)")
    j = src.join(F.broadcast(pairs), src.key == pairs.source_key)
    return j.groupBy("target_key").agg(
        F.count("*").alias("n_neighbours"),
        F.sum(
            (F.col("dist") == 0).cast("int") * F.col("v").cast("long")
        ).alias("v_exact"),
        F.sum(w * F.col("v").cast("decimal(12,2)"))
        .cast("decimal(28,11)")
        .cast("double")
        .alias("sum_wv"),
        F.sum(w).cast("decimal(20,9)").cast("double").alias("sum_w"),
    )


def q_knn_resample_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: nearest-neighbour resample with distance gate (P5)."""
    from repurpose_spark.operators.resample import resample_nn

    pairs, src = _resample_fixture(spark)
    out = resample_nn(src, pairs, ["v"], key_col="key", max_dist=0.25)
    return out.select(
        "target_key", "dist", F.col("v").cast("long").alias("v")
    )


# --------------------------------------------------------------------------
# events: time-series operator surface on driver data
# --------------------------------------------------------------------------

def _ev_hourly(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("tick")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_v"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )
    )


def q_ev_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ev_hourly(spark, sf_dir).withColumn(
        "sum_v", F.col("sum_v").cast("double")
    )


def q_ev_daily_from_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """partial+final: daily re-aggregated from hourly partials (A4)."""
    h = _ev_hourly(spark, sf_dir)
    return (
        h.groupBy("event_type", F.date_trunc("day", "tick").alias("tick"))
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_v").cast("decimal(18,2)").cast("double").alias("sum_v"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
    )


def _ev_routed(spark, sf_dir, bucket_seconds, tiers_wanted):
    """Shared body for the routed-rollup queries: build the requested
    continuous-aggregate tiers from events, let plans/router.py pick the
    serving tier, and assert the route it chose."""
    from repurpose_spark.plans.router import routed_rollup

    h = _ev_hourly(spark, sf_dir).withColumnRenamed("n_events", "n_points")
    tiers = {"hourly": (h, 3600)}
    if "daily" in tiers_wanted:
        d = rollup_from_partials(h, "day", key_cols=["event_type"])
        tiers["daily"] = (d, 86400)
    out, source = routed_rollup(
        bucket_seconds, tiers, key_cols=["event_type"]
    )
    assert source == tiers_wanted[-1], (source, tiers_wanted)
    return out.select(
        "event_type",
        "tick",
        F.col("n_points").alias("n_events"),
        F.col("sum_v").cast("decimal(18,2)").cast("double").alias("sum_v"),
        "min_v",
        "max_v",
    )


def q_ev_rollup_routed_6h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-side tier routing (plans/router.py): a 6 h bucket query is
    served from the hourly continuous-aggregate tier — the coarsest
    registered tier whose resolution divides the width (3600 | 21600) —
    never re-scanning raw events (the reference's per-resolution output
    dirs make this the caller's job; here it is a plan-time decision).
    The exact oracle aggregates raw events directly, so a wrong route,
    wrong unix-bucket arithmetic, or lossy partial merge breaks the
    hash."""
    return _ev_routed(spark, sf_dir, 21600, ["hourly"])


def q_ev_rollup_routed_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-hop routed rollup: weekly buckets served from the DAILY tier
    (itself partials-of-partials from hourly), certifying that mergeable
    partials stay exact through two re-aggregations plus the router's
    unix-week bucketing (weeks are NOT date_trunc('week') — they are
    epoch-aligned 604800 s bins, which the oracle replays exactly)."""
    return _ev_routed(spark, sf_dir, 604800, ["hourly", "daily"])


def q_ev_rollup_realtime_6h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-time continuous aggregate (plans/router.py::realtime_rollup):
    the hourly tier is deliberately materialized only up to an UNALIGNED
    mid-range watermark (2024-01-10 07:31:09); buckets before the
    watermark's 6 h boundary are served from the tier, the boundary
    bucket and the live tail from raw — and the union must byte-match
    the oracle's all-raw aggregate.  A seam (double-counted or dropped
    boundary bucket) or a wrong cut breaks the hash."""
    from datetime import datetime

    from repurpose_spark.plans.router import realtime_rollup

    wm = datetime(2024, 1, 10, 7, 31, 9)
    ev = _t(spark, sf_dir, "events").withColumn(
        "value_dec", F.col("value").cast("decimal(18,2)")
    )
    h = (
        ev.where(F.col("ts") < F.lit(wm))
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("tick"))
        .agg(
            F.count("*").alias("n_points"),
            F.sum("value_dec").alias("sum_v"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )
    )
    out, source = realtime_rollup(
        21600,
        {"hourly": (h, 3600)},
        raw=ev,
        materialized_until=wm,
        key_cols=["event_type"],
        ts_col="ts",
        value_col="value_dec",
    )
    assert source == "hourly"
    return out.select(
        "event_type",
        "tick",
        F.col("n_points").alias("n_events"),
        F.col("sum_v").cast("decimal(18,2)").cast("double").alias("sum_v"),
        "min_v",
        "max_v",
    )


def q_ev_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = _ev_hourly(spark, sf_dir).select("event_type", "tick", "n_events")
    dense = gap_fill(
        h, "hour", key_cols=["event_type"], fill_values={"n_events": 0}
    )
    return dense.select(
        "event_type", "tick", F.col("n_events").cast("long").alias("n_events")
    )


def q_ev_asof_6h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of collocation of per-user event streams onto a 6h axis
    (J3, stack.py:263-309 semantics); exact integer-us deltas."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    obs = ev.groupBy("user_id", "ts").agg(F.min("value").alias("v"))
    lo, hi = ev.agg(
        F.date_trunc("day", F.min("ts")), F.max("ts")
    ).first()
    import datetime as _dt

    ticks = []
    t = lo
    while t <= hi:
        ticks.append(t)
        t = t + _dt.timedelta(hours=6)
    out = collocate(obs, ticks, key_cols=["user_id"], ts_col="ts")
    return out.select(
        "user_id",
        "tick",
        (F.unix_micros("obs_ts") - F.unix_micros("tick")).alias("delta_us"),
        F.col("v").cast("decimal(18,2)").cast("double").alias("v"),
    )


def q_ev_max_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: per-series max gap between consecutive observations
    (t_max_delta, stack.py:240-261)."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    gaps = ev.select(
        "user_id",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("g"),
    )
    return gaps.groupBy("user_id").agg(F.max("g").alias("max_gap_us"))


def q_ev_first_per_slot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: 1-per-slot dedup — earliest event per (user, hour)."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy(
        "user_id", F.date_trunc("hour", "ts")
    ).orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select(
            "user_id",
            F.date_trunc("hour", "ts").alias("tick"),
            "event_id",
            F.col("value").cast("decimal(18,2)").cast("double").alias("v"),
        )
    )


def q_ev_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-tier in one pass: GROUPING SETS ((type,hour),(type,day)) —
    the one-job form of the raw→hourly→daily tier family (SURVEY §2.4)."""
    ev = _t(spark, sf_dir, "events")
    ev.createOrReplaceTempView("__ev")
    return spark.sql(
        """
        SELECT event_type,
               CASE WHEN GROUPING(date_trunc('hour', ts)) = 0
                    THEN 'hour' ELSE 'day' END AS tier,
               COALESCE(date_trunc('hour', ts), date_trunc('day', ts)) AS tick,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
        FROM __ev
        GROUP BY GROUPING SETS (
          (event_type, date_trunc('hour', ts)),
          (event_type, date_trunc('day', ts))
        )
        """
    )


def q_ev_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frame spec: 3-hour trailing mean over the hourly tier."""
    from pyspark.sql import Window

    h = _ev_hourly(spark, sf_dir).select("event_type", "tick", "n_events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("tick")
        .rowsBetween(-2, 0)
    )
    return h.select(
        "event_type",
        "tick",
        "n_events",
        F.avg("n_events").over(w).cast("decimal(18,4)").cast("double").alias("ma3"),
    )


def q_ev_validity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: scrub nulls/NaN/sentinels before aggregation
    (img2ts.py:607-609 sentinel list)."""
    ev = _t(spark, sf_dir, "events")
    clean = ev.where(
        F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & ~F.isnan("value")
        & (F.col("value") != -9999.0)
    )
    return clean.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_v"),
    )


# --------------------------------------------------------------------------
# TPC-H-ish relational operator surface
# --------------------------------------------------------------------------

def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(
                (dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))).cast(
                    "decimal(28,4)"
                )
            ).cast("double").alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join with broadcast dims (J-class; Catalyst picks BHJ for
    nation/customer, SMJ/SHJ for the fact-fact join)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    dec = lambda col: F.col(col).cast("decimal(18,2)")  # noqa: E731
    rev = (dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))).cast(
        "decimal(28,4)"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def q_semi_join_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 subset-selection as a broadcast left-semi join
    (np.isin analog, img2ts.py:388-402)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_size") >= 25)
    sub = li.join(
        F.broadcast(p.select("p_partkey")),
        li.l_partkey == F.col("p_partkey"),
        "left_semi",
    )
    return sub.groupBy("l_suppkey").agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
    )


def q_topk_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-class top-k per group: 3 priciest orders per market segment."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey")
    )
    return (
        j.withColumn("rk", F.row_number().over(w))
        .where("rk <= 3")
        .select(
            "c_mktsegment",
            "rk",
            "o_orderkey",
            F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("price"),
        )
    )


# --------------------------------------------------------------------------
# documents / embeddings: training-data ops
# --------------------------------------------------------------------------

def q_doc_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting, both estimators in one certified row (consolidated
    with the former doc_bpe_tokens per VERDICT r2 #1): whitespace tokens
    + BPE-ish (word runs + punctuation chars) estimate."""
    from repurpose_spark.functions.text import bpe_ish_token_count

    d = _wide(_t(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        "n_chars",
        ws_token_count("text").cast("long").alias("n_ws_tokens"),
        bpe_ish_token_count("text").cast("long").alias("n_bpe"),
    )


def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.round(punct_ratio("text"), 4).alias("punct_ratio"),
        F.length("text").cast("long").alias("len"),
    )


def q_doc_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


def q_doc_exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    g = exact_dup_groups(d)  # engine op: xxhash64 fingerprint grouping
    return g.select(
        "doc_id", "canonical_id", F.col("group_size").cast("long").alias("group_size")
    )


def q_doc_minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (k=4, 8-char shingles) — md5-based so the SQL
    oracle reproduces them byte-for-byte."""
    d = _wide(_t(spark, sf_dir, "documents"))
    sig = minhash_signature("text", k=4, shingle=8)
    return d.select(
        "doc_id",
        *[F.element_at(sig, i + 1).alias(f"sig{i}") for i in range(4)],
    )


def q_doc_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline (band bucket join + exact
    Jaccard verify).  md5 hash family so the DuckDB oracle reproduces
    candidates and verification byte-for-byte (the xxhash64 family is the
    cheap scale path, pytest-covered).  2-row bands: candidate probability
    J^2 per band — single-row bands admit ~170x more candidates at sf0.1
    (1.7M vs 10.6k) for the identical verified output."""
    d = _t(spark, sf_dir, "documents")
    return dedup_minhash_lsh(
        d, k=4, bands=2, shingle_n=8, threshold=0.3, step=2, use_md5=True
    )


def q_doc_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidates (banded Hamming).  md5-chunk hash
    family so the DuckDB oracle recomputes fingerprints, chunk-collision
    candidates and Hamming verification exactly (simhash64/xxhash64 is
    the scale family, pytest-covered)."""
    d = _t(spark, sf_dir, "documents")
    return dedup_simhash(d, max_hamming=16, use_md5=True)


def q_doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram-heuristic language ID (signature-word votes)."""
    from repurpose_spark.functions.text import lang_id

    d = _wide(_t(spark, sf_dir, "documents"))
    return d.select("doc_id", lang_id("text").alias("lang_pred"))


def q_doc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite Gopher/C4-style quality score (length/punct/stopword)."""
    from repurpose_spark.functions.text import quality_score

    d = _wide(_t(spark, sf_dir, "documents"))
    return d.select("doc_id", quality_score("text").alias("q"))


def q_doc_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token estimate: word runs + punctuation chars."""
    from repurpose_spark.functions.text import bpe_ish_token_count

    d = _wide(_t(spark, sf_dir, "documents"))
    return d.select(
        "doc_id", bpe_ish_token_count("text").cast("long").alias("n_bpe")
    )


def q_doc_neardup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the verified MinHash near-dup pairs —
    every document labelled with the min doc_id reachable through
    near-dup edges (transitive dedup groups, not just pairs).  Oracle:
    DuckDB recursive CTE computes the same transitive closure."""
    from repurpose_spark.operators.graph import connected_components

    d = _t(spark, sf_dir, "documents")
    pairs = dedup_minhash_lsh(
        d, k=4, bands=2, shingle_n=8, threshold=0.3, step=2, use_md5=True
    )
    return connected_components(pairs, vertices=d)


def q_doc_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation pipeline: lang filter → quality threshold →
    exact dedup → MinHash near-dup removal (md5 family so the DuckDB
    oracle replays every stage byte-for-byte)."""
    from repurpose_spark.operators.curation import curate_documents

    d = _t(spark, sf_dir, "documents")
    return curate_documents(
        d,
        langs=("en",),
        min_quality=0.5,
        minhash_kwargs=dict(
            k=4, bands=2, shingle_n=8, threshold=0.3, step=2, use_md5=True
        ),
    )


def q_doc_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stage survivor counts of the curation pipeline (single-scan
    conditional aggregate — the lineage row a curation run logs)."""
    from repurpose_spark.operators.curation import curation_report

    d = _t(spark, sf_dir, "documents")
    return curation_report(d, langs=("en",), min_quality=0.5)


def q_doc_pack_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: per-source id-ordered token
    stream chunked at a 4096-char budget; each doc labelled with the
    chunk holding its start (distributed two-phase prefix sum — never a
    single-task global window)."""
    from repurpose_spark.operators.packing import pack_sequences

    d = _t(spark, sf_dir, "documents")
    return pack_sequences(d, 4096, by="source", len_col="n_chars")


def q_doc_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified train/val/test split (md5-bucketed,
    content-stable) — per (source, split) counts."""
    from repurpose_spark.operators.packing import split_assign

    d = _t(spark, sf_dir, "documents")
    s = split_assign(d, {"train": 0.8, "val": 0.1, "test": 0.1})
    return s.groupBy("source", "split").agg(F.count("*").alias("n_docs"))


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping retrieval chunks: 2000-char windows, 1000-char stride
    (map-side only — no shuffle)."""
    from repurpose_spark.operators.packing import chunk_documents

    d = _wide(_t(spark, sf_dir, "documents"))
    return chunk_documents(d, size=2000, stride=1000)


def q_doc_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture resampling: src0 downsampled to 0.4, src1 upsampled
    2.5 epochs, everything else kept once — per-doc epoch rows (the
    exact sample, not just counts, so the oracle certifies every
    keep/skip decision)."""
    from repurpose_spark.operators.packing import sample_mixture

    d = _t(spark, sf_dir, "documents")
    s = sample_mixture(d, {"src0": 0.4, "src1": 2.5}, seed="mix")
    return s.select("doc_id", "source", F.col("epoch").cast("long").alias("epoch"))


def q_doc_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: every 50th doc plays the eval set;
    training docs sharing any 8-gram with it are flagged with their
    distinct-hit count (broadcast gram join, corpus never shuffled)."""
    from repurpose_spark.operators.contamination import flag_contaminated

    d = _t(spark, sf_dir, "documents")
    bench = d.where(F.col("doc_id") % 50 == 0)
    train = d.where(F.col("doc_id") % 50 != 0)
    return flag_contaminated(train, bench, n=8)


def q_emb_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs via hyperplane-LSH buckets +
    exact verify.  Approximate candidates → rows-only driver check."""
    from repurpose_spark.operators.similarity import embedding_near_dup_pairs

    e = _t(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(e, threshold=0.2, n_planes=6)


def q_emb_neardup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive embedding near-dup clusters: connected components over
    the verified hyperplane-LSH pair graph (same pair config as
    emb_near_dup_pairs); every vector labelled with its cluster min."""
    from repurpose_spark.operators.graph import connected_components
    from repurpose_spark.operators.similarity import embedding_near_dup_pairs

    e = _t(spark, sf_dir, "embeddings")
    pairs = embedding_near_dup_pairs(e, threshold=0.2, n_planes=6)
    return connected_components(
        pairs, src="vec_a", dst="vec_b", vertices=e, id_col="vec_id"
    )


def q_emb_knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space quality diagnostic: majority label among the
    top-5 cosine-ranked LSH-bucket neighbours vs own label."""
    from repurpose_spark.operators.similarity import knn_label_vote

    e = _t(spark, sf_dir, "embeddings")
    return knn_label_vote(e, k=5, n_planes=6)


def q_emb_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: k-means coarse quantizer, nprobe-pruned exact re-rank.
    Approximate → rows-only driver check."""
    from repurpose_spark.operators.similarity import ivf_centroids, ivf_topk

    e = _t(spark, sf_dir, "embeddings")
    qv = e.orderBy("vec_id").select("embedding").first()[0]
    cent = ivf_centroids(e, n_clusters=8, sample=512)
    return ivf_topk(e, [float(x) for x in qv], cent, k=10, nprobe=2)


def q_mm_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal: decode fake-codec binaries via mapInPandas; closed-form
    payload means so DuckDB can regenerate the expected stats in SQL."""
    from repurpose_spark.operators.multimodal import decode_media, synth_media

    media = synth_media(spark, 200, kind="image")
    out = decode_media(media)
    return out.select(
        "doc_id", "width", "height", "channels",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        F.round("mean_intensity", 6).alias("mean_intensity"),
    )


def q_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal: video frame sampling (multi-row mapInPandas)."""
    from repurpose_spark.operators.multimodal import sample_frames, synth_media

    media = synth_media(spark, 200, kind="video")
    out = sample_frames(media, every=2)
    return out.select(
        "doc_id", "frame_idx", "width", "height",
        F.round("mean_intensity", 6).alias("mean_intensity"),
    )


def q_mm_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal audio: REAL PCM-WAV containers (stdlib wave format)
    decoded via the Arrow-batched decode_audio; the payload is the
    closed-form integer waveform so DuckDB regenerates every stat —
    including RMS — exactly."""
    from repurpose_spark.operators.multimodal import decode_audio, synth_media

    media = synth_media(spark, 200, kind="audio")
    out = decode_audio(media)
    return out.select(
        "doc_id", "n_samples", "sample_rate", "channels", "sample_width",
        "n_bytes", F.round("rms", 6).alias("rms"),
    )


def q_mm_png_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal: REAL 8-bit PNG containers (stdlib zlib decode, all
    five scanline filters cycled across the table) over the closed-form
    pixels, so DuckDB regenerates the expected stats in SQL.  n_bytes is
    deliberately not projected — deflate length isn't closed-form."""
    from repurpose_spark.operators.multimodal import decode_media, synth_media

    media = synth_media(spark, 200, kind="png")
    out = decode_media(media)
    return out.select(
        "doc_id", "width", "height", "channels",
        F.round("mean_intensity", 6).alias("mean_intensity"),
    )


def q_mm_gif_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal: REAL animated GIF89a containers (stdlib variable-width
    LZW decode, per-frame compositing) sampled frame-by-frame.  The
    grayscale palette maps each closed-form index straight to its RGB
    value, so DuckDB regenerates every per-frame mean exactly."""
    from repurpose_spark.operators.multimodal import sample_frames, synth_media

    media = synth_media(spark, 200, kind="gif")
    out = sample_frames(media, every=2)
    return out.select(
        "doc_id", "frame_idx", "width", "height",
        F.round("mean_intensity", 6).alias("mean_intensity"),
    )


def q_mm_jpeg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal: REAL baseline JPEG containers (stdlib Huffman decode,
    numpy IDCT, 4:4:4 / 4:2:0 alternating) over the closed-form pixels.
    JPEG is LOSSY, so this rides the error-bound oracle: DuckDB computes
    the exact pre-encode mean; the decoded mean must land within the
    codec's measured tolerance (exact columns still byte-matched)."""
    from repurpose_spark.operators.multimodal import decode_media, synth_media

    media = synth_media(spark, 200, kind="jpeg")
    out = decode_media(media)
    return out.select(
        "doc_id", "width", "height", "channels", "mean_intensity"
    )


def q_mm_adpcm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal audio: REAL IMA-ADPCM WAV containers (format tag
    0x0011, 4-bit lossy — the compressed twin of the PCM path) decoded
    via the same Arrow-batched decode_audio.  ADPCM is LOSSY, so this
    rides the error-bound oracle: DuckDB computes the exact pre-encode
    RMS; the decoded RMS must land within the codec's measured
    tolerance.  RMS is projected in int16 units (not the normalized
    [-1, 1] scale) so the checker's `rel*exact + 1` bound is dominated
    by the relative term, not the +1 absolute slack."""
    from repurpose_spark.operators.multimodal import decode_audio, synth_media

    media = synth_media(spark, 200, kind="adpcm")
    out = decode_audio(media)
    return out.select(
        "doc_id", "n_samples", "sample_rate", "channels", "sample_width",
        (F.col("rms") * 32768.0).alias("rms_i16"),
    )


def q_mm_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal VIDEO: REAL Motion-JPEG AVI containers (RIFF chunk
    walk, one baseline JPEG per 00dc chunk, 4:4:4/4:2:0 alternating)
    sampled frame-by-frame — the first camera-grade video format in the
    engine; until round 5 video meant the synthetic FAKV fixture.  JPEG
    frames are LOSSY, so the per-frame mean rides the error-bound
    oracle: DuckDB regenerates the exact pre-encode mean per (doc,
    frame); the decoded mean must land within the codec tolerance while
    doc_id/frame_idx/width/height byte-match."""
    from repurpose_spark.operators.multimodal import sample_frames, synth_media

    media = synth_media(spark, 200, kind="avi")
    out = sample_frames(media, every=2)
    return out.select(
        "doc_id", "frame_idx", "width", "height", "mean_intensity"
    )


def q_mm_flac_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal audio: REAL FLAC containers (pure-stdlib lossless
    codec — fixed/LPC prediction + Rice residuals, per-frame CRC-16 and
    whole-stream MD5 verified on decode) over the SAME closed-form
    waveform as the PCM `mm_audio_stats` fixture.  LOSSLESS means the
    oracle is EXACT (hash-matched RMS), unlike the lossy jpeg/adpcm
    error-bound entries.  n_bytes is not projected — the compressed
    length isn't closed-form."""
    from repurpose_spark.operators.multimodal import decode_audio, synth_media

    media = synth_media(spark, 200, kind="flac")
    out = decode_audio(media)
    return out.select(
        "doc_id", "n_samples", "sample_rate", "channels", "sample_width",
        F.round("rms", 6).alias("rms"),
    )


def _drain_stream(spark, write_src, sentinel_row, sentinel_schema,
                  build_stream, finish) -> DataFrame:
    """Shared sentinel-drain harness for the streaming driver queries
    (one copy of the timing-sensitive protocol): stage the input files,
    sleep past the mtime granularity, append the far-future sentinel
    LAST (the file source orders it into the final micro-batch, its
    watermark advance flushes every real window), drain AvailableNow,
    and materialize the filtered result before the temp dirs vanish."""
    import shutil
    import tempfile
    import time as _time

    from repurpose_spark.streaming.incremental import run_available_now

    base = tempfile.mkdtemp(prefix="stream_drain_")
    src, out, ckpt = f"{base}/in", f"{base}/out", f"{base}/ckpt"
    try:
        write_src(src)
        _time.sleep(1.05)  # sentinel file must sort after the data (mtime)
        spark.createDataFrame(
            [sentinel_row], sentinel_schema
        ).coalesce(1).write.mode("append").parquet(src)
        run_available_now(build_stream(src), out, ckpt)
        res = finish(spark.read.parquet(out))
        rows = res.collect()
        return spark.createDataFrame(rows, res.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def q_seq_stream_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-Streaming incremental rollup, oracle-certified against
    the batch semantics (VERDICT r4 #7 — streaming gains a driver-contract
    surface): the closed-form points drain through an AvailableNow
    readStream → watermarked window agg → parquet sink; a far-future
    sentinel row (written last, so the file source orders it into the
    final micro-batch) advances the watermark past every real window and
    the no-data flush batch emits them all — the drained output equals
    the batch hourly rollup EXACTLY, which is what the shared
    seq_hourly_rollup DuckDB oracle asserts.  Result is materialized
    before the temp dirs are removed."""
    from datetime import datetime

    from repurpose_spark.streaming.incremental import incremental_hourly_rollup

    pts = sequences_to_points(synth_sequences(spark, N_SYNTH), CFG).select(
        "doc_id", "ts", "token"
    )
    return _drain_stream(
        spark,
        lambda src: pts.repartition(4).write.parquet(src),
        ("__sentinel__", datetime(2021, 1, 1), 0),
        "doc_id string, ts timestamp, token int",
        lambda src: incremental_hourly_rollup(
            spark, src, CFG, watermark="30 minutes", max_files_per_trigger=4
        ),
        lambda df: df.where(F.col("doc_id") != "__sentinel__").select(
            "doc_id",
            "tick",
            "n_points",
            F.col("sum_v").cast("long").alias("sum_v"),
            F.col("min_v").cast("long").alias("min_v"),
            F.col("max_v").cast("long").alias("max_v"),
        ),
    )


def q_ev_stream_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming distinct-count tier, value-certified: the events table
    drains through an AvailableNow readStream whose state IS the per-
    (event_type, day) HLL sketch (incremental_uniques_rollup) — a day's
    unique-user estimate updates micro-batch by micro-batch without
    re-reading raw, the thing exact count_distinct cannot do in a
    stream.  Same sentinel-advanced-watermark drain as seq_stream_hourly
    (far-future row written last flushes every real window); certified
    by the SAME error-bound oracle as the batch sketch tier (exact
    columns byte-matched, estimate within 0.08 of DuckDB's exact COUNT
    DISTINCT per row)."""
    from datetime import datetime

    from repurpose_spark.streaming.incremental import incremental_uniques_rollup

    ev = _t(spark, sf_dir, "events").select(
        "event_type", "ts", F.col("user_id").cast("long").alias("user_id")
    )
    return _drain_stream(
        spark,
        # one time-ordered file per ingest step (the module's ingest
        # contract: cross-file disorder must stay under the watermark)
        lambda src: ev.orderBy("ts").coalesce(1).write.parquet(src),
        ("__sentinel__", datetime(2030, 1, 1), 0),
        "event_type string, ts timestamp, user_id long",
        lambda src: incremental_uniques_rollup(spark, src, watermark="1 hour"),
        lambda df: df.where(F.col("event_type") != "__sentinel__").select(
            "event_type",
            "tick",
            F.col("n_points").cast("long").alias("n_points"),
            F.col("n_distinct_est").cast("long").alias("n_distinct_est"),
        ),
    )


def q_ev_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (operators/sessions.py): per-user sessions
    split on 30-minute quiet gaps — lag marks starts, a running sum
    numbers sessions, one aggregate emits (start, end, n, sum).  One
    exchange on the key; the flag/cumsum/agg reuse its clustering.
    Values sum as exact integer cents.  EXACT oracle: DuckDB mirrors
    the identical lag/cumsum construction (and the same double-seconds
    gap arithmetic).  This is also the streaming sessionizer's
    certification path — pytest asserts frame equality between the two
    on shared input."""
    from repurpose_spark.operators.sessions import sessionize

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts",
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    return sessionize(
        ev, gap="30 minutes", key_cols=["user_id"], ts_col="ts",
        value_col="v",
    ).select(
        "user_id", "session_start", "session_end",
        F.col("n_points").cast("long").alias("n_points"),
        F.col("sum_v").cast("long").alias("sum_cents"),
    )


def q_ev_counter_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reset-aware counter increase (PromQL ``increase()`` semantics,
    operators/rates.py): a deterministic wrapped counter is built from
    the event stream (cumulative integer cents mod 10^6 per event_type
    — the wrap IS the reset), then per-day increases sum the positive
    deltas and count resets as post-reset values.  Exact oracle: all
    arithmetic is integer, so DuckDB reproduces every delta
    byte-for-byte."""
    from repurpose_spark.operators.rates import counter_increase
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    c0 = ev.groupBy("event_type", "ts").agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("c0")
    )
    w = Window.partitionBy("event_type").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    series = c0.select(
        "event_type", "ts", (F.sum("c0").over(w) % 1_000_000).alias("counter")
    )
    return counter_increase(
        series, ["event_type"], "ts", "counter", "day"
    ).select(
        "event_type", "tick",
        F.col("increase").cast("long").alias("increase"),
        F.col("n_deltas").cast("long").alias("n_deltas"),
    )


def q_ev_time_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trapezoidal time-weighted average (TimescaleDB
    ``time_weight('Linear')`` parity, operators/rates.py): per
    (event_type, day), segments between consecutive samples integrate
    (v_i+v_{i+1})/2·Δt; single-sample buckets fall back to the plain
    mean.  ``int_scale=100`` runs the whole integral in exact integer
    arithmetic (scaled longs × unix_micros), so the double result is
    bit-identical across engines and partition layouts — what makes a
    float aggregate certifiable byte-for-byte."""
    from repurpose_spark.operators.rates import time_weighted_avg

    ev = _t(spark, sf_dir, "events")
    base = ev.groupBy("event_type", "ts").agg(
        (
            F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0
        ).alias("value")
    )
    return time_weighted_avg(
        base, ["event_type"], "ts", "value", "day", int_scale=100
    ).select(
        "event_type", "tick", "twa",
        F.col("n_points").cast("long").alias("n_points"),
    )


def q_ev_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill fill modes (TimescaleDB locf/interpolate parity): the
    hourly per-type average densifies over the global tick axis, then
    holes take (a) the last observation carried forward and (b) the
    time-weighted linear blend of the bracketing observations — both
    pure JVM window compositions (operators/gapfill.py:fill_forward/
    fill_interpolate), one exchange on the keys over the POST-densify
    frame, never raw.  Leading/trailing holes stay NULL in interpolate
    (no extrapolation), leading stay NULL in locf — edge semantics the
    oracle reproduces exactly."""
    from repurpose_spark.operators.gapfill import (
        fill_forward,
        fill_interpolate,
        gap_fill,
    )

    ev = _t(spark, sf_dir, "events")
    # average over exact integer cents (the fixture has 2-decimal
    # values): integer sums are associative, so the double division is
    # bit-identical across engines — float-sum order would otherwise
    # flip the 6th decimal on .5-boundary rows
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("tick")
    ).agg(
        (
            (
                F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0
            ) / F.count("value")
        ).alias("v")
    )
    dense = gap_fill(hourly, "hour", key_cols=["event_type"])
    out = fill_interpolate(
        fill_forward(dense, ["event_type"], "tick", ["v"]),
        ["event_type"], "tick", ["v"],
    )
    return out.select(
        "event_type",
        "tick",
        F.round("v_locf", 6).alias("v_locf"),
        F.round("v_interp", 6).alias("v_interp"),
    )


def q_ev_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candlestick downsample (operators/downsample.py::ohlc): hourly
    open/high/low/close/count/sum per event_type over the per-timestamp
    cent totals.  Order-aware yet still an ASSOCIATIVE fold — open and
    close are min/max of struct(ts, v), so the plan is the same
    partial+final HashAggregate as any rollup: one exchange carrying
    bucket partials, never samples.  Timestamps are unique per series
    after the pre-aggregation, so the edges are deterministic under any
    partitioning; all values exact integer cents.  EXACT oracle:
    DuckDB arg_min/arg_max on the same pre-aggregated series."""
    from repurpose_spark.operators.downsample import ohlc

    ev = _t(spark, sf_dir, "events")
    series = ev.groupBy("event_type", "ts").agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("v")
    )
    return ohlc(
        series, ["event_type"], ts_col="ts", value_col="v", unit="hour"
    ).select(
        "event_type", "tick", "open", "high", "low", "close",
        F.col("n_points").cast("long").alias("n_points"),
        F.col("sum_v").cast("long").alias("sum_v"),
    )


def q_ev_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Causal rolling anomaly score over the hourly tier
    (operators/downsample.py::rolling_zscore, exact mode): per
    event_type, each hour's event count scored against the 24 hours
    strictly before it (min 10).  The exact path emits the signed
    squared score from the window's integer moments — (c·x−S)² /
    (c·Q−S²) is two exact int64s and one IEEE division, so a float
    anomaly score becomes byte-certifiable and partition-invariant
    (same trick as the TWA integral).  One exchange on the series key;
    count/sum/sum-of-squares share a single window frame.  EXACT
    oracle: DuckDB mirrors the integer-moment construction."""
    from repurpose_spark.operators.downsample import rolling_zscore

    h = _ev_hourly(spark, sf_dir).select(
        "event_type", "tick", F.col("n_events").cast("long").alias("n_events")
    )
    return rolling_zscore(
        h, ["event_type"], ts_col="tick", value_col="n_events",
        n=24, min_points=10, exact=True,
    ).select("event_type", "tick", "n_events", "z2")


def q_ev_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series EWMA smoother (operators/downsample.py::ewma) over the
    hourly cent-total tier: y₀ = x₀, y_t = 0.3·x_t + 0.7·y_{t−1}, one
    grouped Arrow batch per series (block-rescaled vectorized recursion
    — no per-row Python, no overflow at any series length).  Sequential
    by definition, so certification is ERROR-BOUND: DuckDB replays the
    scalar recursion through a recursive CTE and each estimate must sit
    within 1e-9 relative of it — the engine's block re-anchoring keeps
    float drift at ~machine epsilon per block, orders of magnitude
    inside the bound, while any recurrence bug (wrong α, off-by-one,
    unsorted batch) lands far outside.  Output is scaled to micro-cents
    so the checker's +1 absolute slack is negligible at this value
    scale."""
    from repurpose_spark.operators.downsample import ewma

    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("tick")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("v"))
    return ewma(
        hourly, ["event_type"], ts_col="tick", value_col="v", alpha=0.3
    ).select(
        "event_type", "tick", "v",
        (F.col("ewma") * 1e6).alias("ewma_micro"),
    )


def q_ev_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-Triangle-Three-Buckets visual downsample (Steinarsson
    2013; operators/downsample.py::lttb) of each event_type's hourly
    cent-total series to 24 points — a SEQUENTIAL algorithm (each pick
    feeds the next triangle) certified EXACTLY: timestamps enter as
    exact epoch-ms float64 integers, values as exact integer cents, and
    bucket edges are pure integer arithmetic, so every triangle area is
    a correctly-rounded double both engines compute identically and the
    per-bucket argmax (ties → lowest index) is deterministic.  The
    DuckDB twin precomputes best-pick-given-previous-pick per bucket
    with a window, then replays the recursion as a recursive-CTE pure
    join.  Engine-side the series is one grouped Arrow batch (tier
    input — bounded by construction), Python O(n_out) per series."""
    from repurpose_spark.operators.downsample import lttb

    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("tick")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("v"))
    return lttb(
        hourly, ["event_type"], ts_col="tick", value_col="v", n_out=24
    ).select("event_type", "tick", "v")


def q_ev_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series autocorrelation at lags 1/2/24 over the gap-filled
    hourly count grid (operators/downsample.py::autocorr) — the
    seasonality diagnostic; lag 24 reads the daily cycle directly.
    EXACT certification via the integer-moment trick (rolling_zscore /
    TWA family): every Pearson term over the dense grid's int64 counts
    is an exact integer, and the final num/(sqrt·sqrt) is three
    correctly-rounded IEEE ops, so the float ACF is byte-identical
    across engines and partition layouts.  The oracle mirrors the
    dense-grid + lag + moment construction in SQL."""
    from repurpose_spark.operators.downsample import autocorr

    h = _ev_hourly(spark, sf_dir).select("event_type", "tick", "n_events")
    dense = gap_fill(
        h, "hour", key_cols=["event_type"], fill_values={"n_events": 0}
    )
    return autocorr(
        dense, ["event_type"], ts_col="tick", value_col="n_events",
        lags=(1, 2, 24),
    ).select("event_type", "lag", "n_pairs", "acf")


def q_ev_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed interval join (operators/intervals.py::interval_join) —
    the range-overlap shape Spark lacks natively: each 'error' event
    opens a 2-hour incident window [ts, ts+2h) keyed by user-group, and
    every click/view landing inside a window of its group is attributed
    to it.  The plan is an EQUI hash join on (grp, hour-bucket) with an
    exact refine predicate — never a nested-loop/cartesian (the naive
    theta-join plan); each window fans out over ≤3 hourly buckets and
    a point's single bucket guarantees pair uniqueness without dedup.
    EXACT oracle: DuckDB runs the naive inequality join — the bucketing
    must be semantics-free."""
    ev = _t(spark, sf_dir, "events")
    grp = (F.col("user_id") % 8).alias("grp")
    ivs = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("iid"),
        grp,
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end_ts"),
    )
    pts = ev.where(F.col("event_type").isin("click", "view")).select(
        grp,
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    # r06: the bucketed join materialized the full points×windows
    # fan-out (12M rows at sf1.0) only to aggregate it away; the
    # prefix-sum sweep computes the identical (count, sum) per interval
    # from two probe rows per window — output-equal by construction
    # (exact int64 running totals, [start, end) boundary semantics
    # preserved by probe-before-point ordering), proven against the
    # unchanged DuckDB oracle
    from repurpose_spark.operators.intervals import interval_point_counts

    return interval_point_counts(
        pts, ivs, on=["grp"], ts_col="ts",
        start_col="start_ts", end_col="end_ts",
        sum_col="cents", id_cols=["iid"],
        count_alias="n_in", sum_alias="sum_cents",
    )


def q_ev_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 visual downsample (operators/downsample.py::m4_points, Jugel
    et al. VLDB 2014): per (event_type, hour) the deduplicated ≤4-point
    set {first, min, max, last} over the per-timestamp integer-cent
    series — the minimal point set whose rendering is pixel-identical
    to the full series.  Associative fold (four struct min/max), so the
    plan is one partial+final HashAggregate like any rollup; the dedup
    is array_distinct in the projection, no extra shuffle.  EXACT
    oracle: DuckDB struct min/max (same lexicographic tie rules) with
    UNION's set semantics doing the dedup."""
    from repurpose_spark.operators.downsample import m4_points

    ev = _t(spark, sf_dir, "events")
    series = ev.groupBy("event_type", "ts").agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("v")
    )
    return m4_points(series, ["event_type"], ts_col="ts", value_col="v")


def q_ev_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-window mean-shift changepoint score
    (operators/downsample.py::mean_shift) over the gap-filled hourly
    count grid: each hour's score is mean(next 24h) − mean(prev 24h),
    with non-maximum suppression flagging the locally strongest |shift|
    in a ±12 h neighbourhood — the classic level-shift detector on the
    tier a monitoring stack would watch.  EXACT certification via the
    integer-moment contract: both window sums are exact int64 over the
    dense grid's counts and the score is ONE IEEE division by 24, so
    the float (and the peak flags compared from identical floats) are
    byte-stable across engines and partitionings.  One hash exchange on
    the series key feeds all three window passes."""
    from repurpose_spark.operators.downsample import mean_shift

    h = _ev_hourly(spark, sf_dir).select("event_type", "tick", "n_events")
    dense = gap_fill(
        h, "hour", key_cols=["event_type"], fill_values={"n_events": 0}
    )
    return mean_shift(
        dense, ["event_type"], ts_col="tick", value_col="n_events",
        n=24, peak_radius=12,
    ).select("event_type", "tick", "n_events", "shift", "is_peak")


def q_ev_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index drift monitor
    (operators/drift.py::psi_drift): per event_type, each day's value
    histogram (20 fixed bins over [0, 500)) scored against the previous
    observed day — the standard "did today's data stop looking like
    yesterday's" ingestion alarm.  One partial+final count aggregate is
    the only pass over raw; the bin-vector build and the lag window run
    on keys × days rows.  EXACT certification: exact int64 bin counts,
    one IEEE division per smoothed frequency, one libm ln per bin, and
    the cross-bin sum is an ORDERED left fold over the dense bin array
    (F.aggregate ↔ DuckDB list_reduce — never a shuffle-order float
    sum), and PSI terms are nonnegative by construction so no −0.0
    asymmetry.  Residual divergence is the engines' libm ln ulp only
    (measured ≤1.5e-15 abs, 134/145 rows bit-identical at sf0.001) —
    far inside the checker's 9-decimal contract, and partition-layout
    invariant on the Spark side (test-enforced)."""
    from repurpose_spark.operators.drift import psi_drift

    ev = _t(spark, sf_dir, "events")
    return psi_drift(
        ev,
        ["event_type"],
        F.date_trunc("day", F.col("ts")),
        "value",
        lo=0.0,
        hi=500.0,
        n_bins=20,
        smooth=0.5,
    )


def q_doc_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplicated-span detection (the fifth dedup tier,
    Lee et al. 2022; operators/dedup.py::duplicate_spans): every 8-word
    window occurring ≥2 times corpus-wide, merged per document into
    maximal spans by a gaps-and-islands window.  All pure JVM: the
    window explode fuses into the scan, the gram count is partial+final
    (map-side combine bounds the exchange by distinct grams), and only
    bucket-colliding windows join back.  EXACT oracle: DuckDB replays
    the identical split → window → count → merge construction."""
    from repurpose_spark.operators.dedup import duplicate_spans

    d = _wide(_t(spark, sf_dir, "documents")).select(
        "doc_id", F.trim(F.col("text")).alias("text")
    )
    return duplicate_spans(
        d, id_col="doc_id", text_col="text", window=8, min_count=2
    ).select(
        "doc_id",
        F.col("span_start").cast("long").alias("span_start"),
        F.col("span_end").cast("long").alias("span_end"),
        F.col("n_windows").cast("long").alias("n_windows"),
    )


def q_doc_top_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters with an EXACT oracle: per-(lang, source) top-5
    words via the Misra–Gries candidate pass + exact verify
    (operators/heavyhitters.py) — the third non-mergeable aggregate
    family (after distinct counts and percentiles).  The shuffle
    carries O(partitions × groups × m) candidate counters instead of
    every distinct (group, word) pair; the verify pass makes the
    emitted counts exact, so DuckDB's full top-k must byte-match,
    including the per-group ``guaranteed`` self-certification flag."""
    from repurpose_spark.operators.heavyhitters import top_words

    d = _wide(_t(spark, sf_dir, "documents"))
    return top_words(d, key_cols=["lang", "source"], k=5, m=256).select(
        "lang", "source", "word",
        F.col("n").cast("long").alias("n"),
        F.col("rnk").cast("int").alias("rnk"),
        "guaranteed",
    )


def q_doc_bpe_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned BPE, certified end-to-end: train a real merge table on
    the corpus (distributed word-frequency pass → classic merge
    learning, operators/bpe.py), encode every document with the learned
    ranks (broadcast + Arrow-batched), then detokenize JVM-side.  The
    exact oracle is the losslessness invariant: the round-tripped text
    must byte-match DuckDB's whitespace-normalized lowercased source —
    a wrong merge table, wrong rank priority, or lossy EOW handling all
    corrupt at least one document.  (That the learned merges are
    CORRECT classic-BPE is pytest-certified against an independent
    brute-force reference, tests/test_bpe.py.)"""
    from repurpose_spark.operators.bpe import EOW, bpe_encode, train_bpe

    d = _wide(_t(spark, sf_dir, "documents")).select("doc_id", "text")
    merges = train_bpe(d, n_merges=120, max_word_forms=20_000)
    enc = bpe_encode(d, merges)
    return enc.select(
        "doc_id",
        F.trim(
            F.regexp_replace(
                F.concat_ws("", F.col("bpe_tokens")), EOW, " "
            )
        ).alias("detok_text"),
    )


def q_ev_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile continuous aggregate: daily p50/p90/p99 of event value
    per event_type via mergeable KLL sketch tiers (hourly sketches →
    merge → daily), the percentile twin of the HLL distinct tier.  Raw
    values never shuffle: per-partition partial sketches (mapInPandas)
    → O(partitions × groups) 4 KB blobs → per-group merge.  Certified by
    the BRACKET oracle — the honest shape for a rank-error sketch:
    DuckDB computes exact quantile values at q∓0.02 (4-5× the measured
    rank error at k=512); each estimate must land inside its bracket
    while event_type/tick/q/n_points byte-match."""
    from repurpose_spark.operators.rollup import (
        quantile_rows,
        rollup_qsketch_from_partials,
        rollup_quantile_sketch,
    )

    ev = _t(spark, sf_dir, "events")
    hourly = rollup_quantile_sketch(
        ev, "hour", "value", key_cols=["event_type"]
    )
    daily = rollup_qsketch_from_partials(
        hourly, "day", key_cols=["event_type"]
    )
    return quantile_rows(daily).select(
        "event_type", "tick", "q", "n_points", "value_est"
    )


def q_ev_stream_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming percentile tier, bracket-certified: events drain
    through an AvailableNow readStream whose per-(event_type, day)
    state IS the KLL sketch bytes (applyInPandasWithState — the custom-
    binary-state pattern; exact streaming percentiles would hold every
    value in state).  Same sentinel-advanced-watermark drain as the
    other streaming queries; certified by the SAME bracket oracle as
    the batch percentile tier — estimates between DuckDB's exact
    quantile values at q∓0.02, exact columns byte-matched."""
    from datetime import datetime

    from repurpose_spark.streaming.stateful import stateful_quantile_tier

    ev = _t(spark, sf_dir, "events").select("event_type", "ts", "value")
    return _drain_stream(
        spark,
        lambda src: ev.orderBy("ts").coalesce(1).write.parquet(src),
        ("__sentinel__", datetime(2030, 1, 1), 0.0),
        "event_type string, ts timestamp, value double",
        lambda src: stateful_quantile_tier(
            spark.readStream.schema(
                "event_type string, ts timestamp, value double"
            ).option("maxFilesPerTrigger", 8).parquet(src),
            watermark="1 hour",
        ),
        lambda df: df.where(F.col("event_type") != "__sentinel__").select(
            "event_type", "tick", "q", "n_points", "value_est"
        ),
    )


def q_ev_daily_uniques_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count continuous aggregate: daily unique users per
    event_type via HLL sketch tiers (hourly sketches → hll_union_agg
    day merge — never re-reads raw).  NO oracle_sql twin BY DESIGN:
    sketch estimates are error-bounded, not byte-stable (see
    rollup.py::rollup_distinct_sketch's determinism caveat), and
    DuckDB's approx_count_distinct is a different HLL implementation —
    the driver records the weaker rows-only check; exactness-adjacent
    guarantees are pytest-enforced (test_rollup.py)."""
    from repurpose_spark.operators.rollup import (
        rollup_distinct_sketch,
        rollup_sketch_from_partials,
        with_distinct_estimate,
    )

    ev = _t(spark, sf_dir, "events")
    hourly = rollup_distinct_sketch(
        ev, "hour", "user_id", key_cols=["event_type"]
    )
    daily = with_distinct_estimate(
        rollup_sketch_from_partials(hourly, "day", key_cols=["event_type"])
    )
    return daily.select(
        "event_type", "tick", "n_points", "n_distinct_est"
    ).orderBy("event_type", "tick")


def q_doc_quality_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring, signals + composite in one certified row
    (consolidated with the former doc_quality and doc_quality_score per
    VERDICT r2 #1): stopword ratio, uppercase ratio, mean word length,
    punctuation ratio, length, and the Gopher/C4-style composite score —
    all fused into ONE scan (one row of JVM expressions per doc)."""
    from repurpose_spark.functions.text import (
        mean_word_len,
        quality_score,
        stopword_ratio,
        upper_ratio,
    )

    d = _wide(_t(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.round(stopword_ratio("text"), 6).alias("stopword_ratio"),
        F.round(upper_ratio("text"), 6).alias("upper_ratio"),
        F.round(mean_word_len("text"), 6).alias("mean_word_len"),
        F.round(punct_ratio("text"), 4).alias("punct_ratio"),
        F.length("text").cast("long").alias("len"),
        quality_score("text").alias("q"),
    )


def q_doc_trigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style filter: every 50th doc trains a Laplace-smoothed
    char-trigram model (broadcast); the rest score mean trigram logp."""
    from repurpose_spark.operators.perplexity import trigram_logprob_scores

    d = _t(spark, sf_dir, "documents")
    ref = d.where(F.col("doc_id") % 50 == 0)
    train = d.where(F.col("doc_id") % 50 != 0)
    s = trigram_logprob_scores(train, ref)
    return s.select(
        "doc_id", "n_tri", F.round("avg_logp", 4).alias("avg_logp")
    )


def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signal: fraction of 10-gram positions
    whose gram repeats within the doc."""
    from repurpose_spark.functions.text import repetition_ratio

    d = _wide(_t(spark, sf_dir, "documents"))
    return d.select(
        "doc_id", F.round(repetition_ratio("text", 10), 6).alias("rep_ratio")
    )


def q_doc_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing lineage: typed redaction counts (email → ipv4 →
    phone, applied sequentially) + scrubbed length."""
    from repurpose_spark.functions.text import pii_counts, scrub_pii

    d = _wide(_t(spark, sf_dir, "documents"))
    c = pii_counts("text")
    return d.select(
        "doc_id",
        c.getField("n_email").cast("long").alias("n_email"),
        c.getField("n_ipv4").cast("long").alias("n_ipv4"),
        c.getField("n_phone").cast("long").alias("n_phone"),
        F.length(scrub_pii("text")).cast("long").alias("len_scrubbed"),
    )


def q_doc_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprinting (Rabin windows + anchor
    subset): per doc, window count, content-defined anchor count
    (h % 32 == 0) and min/max window hash."""
    from repurpose_spark.functions.text import rolling_hashes

    d = _wide(_t(spark, sf_dir, "documents"))
    hs = rolling_hashes("text", window=8)
    return d.select(
        "doc_id",
        F.size(hs).alias("n_windows"),
        F.size(F.filter(hs, lambda h: h % 32 == 0)).alias("n_anchors"),
        F.array_min(hs).alias("min_h"),
        F.array_max(hs).alias("max_h"),
    )


def q_doc_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard on a deterministic candidate set (adjacent
    doc pairs) — the LSH verification kernel, oracle-checked."""
    from repurpose_spark.operators.dedup import ngram_jaccard, shingles

    d = _wide(_t(spark, sf_dir, "documents")).select("doc_id", "text")
    sh = d.select("doc_id", shingles("text", n=6).alias("sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = a.join(
        b,
        (F.col("a.doc_id") + 1 == F.col("b.doc_id"))
        & (F.col("a.doc_id") % 2 == 0),
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.sh").alias("sh_a"),
        F.col("b.sh").alias("sh_b"),
    )
    return pairs.select(
        "doc_a", "doc_b",
        F.round(ngram_jaccard(pairs), 6).alias("jaccard"),
    )


def q_emb_cosine_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    qv = (
        e.orderBy("vec_id").select("embedding").first()[0]
    )
    return cosine_scores(e, [float(x) for x in qv], round_to=4)


def q_emb_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    qv = e.orderBy("vec_id").select("embedding").first()[0]
    return brute_force_topk(e, [float(x) for x in qv], k=10)


def q_emb_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN scale path: hyperplane-LSH bucket filter + exact re-rank.
    Approximate → rows-only driver check."""
    e = _t(spark, sf_dir, "embeddings")
    qv = e.orderBy("vec_id").select("embedding").first()[0]
    return lsh_topk(e, [float(x) for x in qv], k=10, n_planes=6)


# --------------------------------------------------------------------------
# driver contract
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full engine pipeline on sf0.001 events + synthetic tier."""
    return q_ev_hourly_rollup(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # EXACTLY 50 entries: the driver certifies the first 50 in dict order
    # (VERDICT r2 #1 — r2 had 61 and positions 51-61 got no CORRECTNESS
    # row).  Redundant queries whose semantics are subsumed by another
    # green row live in extra_queries() (still bench/check runnable):
    #   seq_hourly_rollup / ev_hourly_rollup  — the *_daily_from_* rows
    #     compute the same hourly partials as stage 1;
    #   ev_gapfill_hourly — seq_gapfill_hourly (P8/R3);
    #   ev_asof_6h, ev_first_per_slot — seq_collocate_2h (J3/W2/O5);
    #   doc_quality, doc_quality_score — merged INTO doc_quality_signals;
    #   doc_bpe_tokens — merged INTO doc_token_counts;
    #   doc_lang_stats — plain groupBy; doc_lang_id carries the lang-ID op;
    #   doc_minhash_sig — stage 1 of doc_minhash_pairs (oracle recomputes
    #     the signatures);
    #   emb_cosine_scores — emb_topk ranks the same cosine expression.
    return {
        "seq_reorient_roundtrip": q_seq_reorient_roundtrip,
        "seq_daily_from_partials": q_seq_daily_from_partials,
        "seq_gapfill_hourly": q_seq_gapfill_hourly,
        "seq_collocate_2h": q_seq_collocate_2h,
        "seq_salted_rollup": q_seq_salted_rollup,
        "seq_gorilla_roundtrip": q_seq_gorilla_roundtrip,
        "seq_preprocess_hook": q_seq_preprocess_hook,
        "seq_ortho_layout": q_seq_ortho_layout,
        "seq_pack_examples": q_seq_pack_examples,
        "ev_project_cast": q_ev_project_cast,
        "ev_drop_empty": q_ev_drop_empty,
        "ev_exact_time_join": q_ev_exact_time_join,
        "knn_resample_weighted": q_knn_resample_weighted,
        "knn_resample_nn": q_knn_resample_nn,
        "ev_daily_from_hourly": q_ev_daily_from_hourly,
        "ev_max_gap": q_ev_max_gap,
        "ev_grouping_sets": q_ev_grouping_sets,
        "ev_moving_avg": q_ev_moving_avg,
        "ev_validity_filter": q_ev_validity_filter,
        "tpch_q1": q_tpch_q1,
        "revenue_by_nation": q_revenue_by_nation,
        "semi_join_parts": q_semi_join_parts,
        "topk_orders_per_segment": q_topk_orders_per_segment,
        "doc_token_counts": q_doc_token_counts,
        "doc_exact_dup_groups": q_doc_exact_dup_groups,
        "doc_minhash_pairs": q_doc_minhash_pairs,
        "doc_simhash_pairs": q_doc_simhash_pairs,
        "doc_quality_signals": q_doc_quality_signals,
        "doc_rolling_fingerprint": q_doc_rolling_fingerprint,
        "doc_repetition": q_doc_repetition,
        "doc_trigram_lm": q_doc_trigram_lm,
        "doc_pii": q_doc_pii,
        "doc_ngram_jaccard": q_doc_ngram_jaccard,
        "doc_lang_id": q_doc_lang_id,
        "doc_curation": q_doc_curation,
        "doc_neardup_components": q_doc_neardup_components,
        "doc_pack_assignments": q_doc_pack_assignments,
        "doc_contamination": q_doc_contamination,
        "doc_mixture": q_doc_mixture,
        "doc_chunks": q_doc_chunks,
        "doc_split_counts": q_doc_split_counts,
        "doc_curation_report": q_doc_curation_report,
        "emb_topk": q_emb_topk,
        "emb_lsh_topk": q_emb_lsh_topk,
        "emb_near_dup_pairs": q_emb_near_dup_pairs,
        "emb_neardup_components": q_emb_neardup_components,
        "emb_knn_label_vote": q_emb_knn_label_vote,
        "emb_ivf_topk": q_emb_ivf_topk,
        "mm_decode_stats": q_mm_decode_stats,
        "mm_frame_sample": q_mm_frame_sample,
    }


def q_ev_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling median (operators/robust.py::rolling_median) over
    the gap-filled hourly count grid, ±3 slots — the robust smoother a
    spike can't drag (the moving-average twin is ev_moving_avg).  One
    Window = one hash exchange + in-partition sort, same plan as the
    moving average.  EXACT: interpolated median of int64 counts is a
    dyadic rational (n.0/n.5) both engines compute identically
    (quantile_cont ↔ percentile parity verified)."""
    from repurpose_spark.operators.robust import rolling_median

    h = _ev_hourly(spark, sf_dir).select("event_type", "tick", "n_events")
    dense = gap_fill(
        h, "hour", key_cols=["event_type"], fill_values={"n_events": 0}
    )
    return rolling_median(
        dense, ["event_type"], ts_col="tick", value_col="n_events",
        before=3, after=3,
    )


def q_ev_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAD outlier mask (operators/robust.py::mad_flags): flag grid
    slots with |x − median| > 3·MAD per series — the robust z-score
    (stddev-based thresholds break when the outliers inflate the
    stddev; MAD's breakdown point is 50 %).  Two tiny per-series
    percentile aggregates broadcast back; the grid never shuffles.
    EXACT: median is n.0/n.5, deviations are halves, MAD quarters —
    all dyadic rationals; 3·MAD and the compare are exact."""
    from repurpose_spark.operators.robust import mad_flags

    h = _ev_hourly(spark, sf_dir).select("event_type", "tick", "n_events")
    dense = gap_fill(
        h, "hour", key_cols=["event_type"], fill_values={"n_events": 0}
    )
    return mad_flags(
        dense, ["event_type"], ts_col="tick", value_col="n_events", k=3
    )


def q_ev_lag_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged cross-correlation (operators/robust.py::cross_corr)
    between the click and error hourly-count series of each user
    bucket at lags 0/1/24 — "do errors follow clicks, and by how many
    hours?", the cross-series sibling of ev_autocorr.  One window on
    the error side + one co-partitioned (grp, tick) equi-join + one
    moment aggregate.  EXACT via the integer-moment contract: int64
    sums, then 3 correctly-rounded IEEE ops."""
    from repurpose_spark.operators.robust import cross_corr

    ev = _t(spark, sf_dir, "events")
    h = ev.groupBy(
        (F.col("user_id") % 4).alias("grp"),
        "event_type",
        F.date_trunc("hour", "ts").alias("tick"),
    ).agg(F.count("*").alias("n_events"))
    dense = gap_fill(
        h, "hour", key_cols=["grp", "event_type"],
        fill_values={"n_events": 0},
    )
    return cross_corr(
        dense, ["grp"], series_col="event_type", a="click", b="error",
        ts_col="tick", value_col="n_events", lags=(0, 1, 24),
    )


def q_ev_seasonal_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive residual (operators/robust.py::seasonal_residual):
    each hourly grid slot minus its series' (ISO-weekday, hour-of-day)
    profile mean — the series with weekly/daily cycles removed, which
    is what level-shift and outlier detectors should consume.  The
    O(series × 168) profile broadcasts back; the grid never shuffles.
    EXACT: the mean is one IEEE division of exact int64s, the residual
    one subtraction of identical doubles (weekday ↔ isodow−1)."""
    from repurpose_spark.operators.robust import seasonal_residual

    h = _ev_hourly(spark, sf_dir).select("event_type", "tick", "n_events")
    dense = gap_fill(
        h, "hour", key_cols=["event_type"], fill_values={"n_events": 0}
    )
    return seasonal_residual(
        dense, ["event_type"], ts_col="tick", value_col="n_events"
    )


def q_doc_bigram_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining (operators/cooccur.py::bigram_lift): top-40
    adjacent token pairs by lift = (c_xy·N)/(c_x·c_y) — the exact
    rational core of PMI (ln is the one libm step engines may round
    differently; lift carries the identical ordering and IS bitwise
    certifiable).  Bigrams are map-side arrays_zip of two slices (no
    positional self-join); counts are partial+final HashAggregates;
    top-k is TakeOrderedAndProject with (lift, w1, w2) total order."""
    from repurpose_spark.operators.cooccur import bigram_lift

    d = _wide(_t(spark, sf_dir, "documents"))
    return bigram_lift(d, text_col="text", min_count=3, k=40)


def q_ev_hampel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel despike filter (operators/robust.py::hampel): flag and
    repair grid slots deviating > 3 window-MADs from the ±3-slot
    window median — the windowed refinement of ev_mad_outliers (a
    global MAD misses spikes riding a trend).  Pure JVM: frame values
    ride one collect_list on the SAME window spec as the frame median;
    deviations are an in-row transform + array_sort + index pick — one
    exchange total.  EXACT: frame median n.0/n.5, deviations halves,
    deviation-median quarters — dyadic rationals picked identically."""
    from repurpose_spark.operators.robust import hampel

    h = _ev_hourly(spark, sf_dir).select("event_type", "tick", "n_events")
    dense = gap_fill(
        h, "hour", key_cols=["event_type"], fill_values={"n_events": 0}
    )
    return hampel(
        dense, ["event_type"], ts_col="tick", value_col="n_events",
        half_width=3, k=3,
    )


def q_ev_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 48-hour rolling Pearson correlation
    (operators/robust.py::rolling_corr) between each user bucket's
    click and error hourly-count series — how the coupling cross_corr
    summarizes drifts over time ("rolling beta").  All five moment
    sums share ONE window spec (one exchange + sort); partial windows
    emit NULL.  EXACT: int64 frame sums + 3 IEEE ops per row."""
    from repurpose_spark.operators.robust import rolling_corr

    ev = _t(spark, sf_dir, "events")
    h = ev.groupBy(
        (F.col("user_id") % 4).alias("grp"),
        "event_type",
        F.date_trunc("hour", "ts").alias("tick"),
    ).agg(F.count("*").alias("n_events"))
    dense = gap_fill(
        h, "hour", key_cols=["grp", "event_type"],
        fill_values={"n_events": 0},
    )
    x = dense.where(F.col("event_type") == "click").select(
        "grp", "tick", F.col("n_events").alias("x")
    )
    y = dense.where(F.col("event_type") == "error").select(
        "grp", "tick", F.col("n_events").alias("y")
    )
    j = x.join(y, ["grp", "tick"])
    return rolling_corr(j, ["grp"], ts_col="tick", x_col="x", y_col="y", n=48)


def q_ev_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive STL-lite decomposition
    (operators/robust.py::seasonal_decompose): value = trend (±12-slot
    rolling MEDIAN — robust to the spikes the residual should expose)
    + seasonal ((weekday × hour) mean of the detrended series) +
    resid.  One window exchange + one O(series × 168) broadcast-back
    profile.  EXACT via the int-scale trick: the trend is a dyadic
    half so 2·(value − trend) is an exact int64; int sums are
    shuffle-order-free; one IEEE division + one subtraction."""
    from repurpose_spark.operators.robust import seasonal_decompose

    h = _ev_hourly(spark, sf_dir).select("event_type", "tick", "n_events")
    dense = gap_fill(
        h, "hour", key_cols=["event_type"], fill_values={"n_events": 0}
    )
    return seasonal_decompose(
        dense, ["event_type"], ts_col="tick", value_col="n_events",
        half_width=12,
    )


def q_seq_token_hampel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Hampel despike filter applied to the graft's own payload:
    each synthetic doc's token-value series (one point per position,
    60 s grid — regular by construction, no gap_fill needed) gets the
    ±3-slot window-median/MAD repair.  Same certification as
    ev_hampel; the per-doc series is exactly the unit repurpose hands
    to its per-cell hooks (img2ts.py:652-668), here as one declarative
    plan over 64k token points."""
    from repurpose_spark.operators.robust import hampel

    pts = sequences_to_points(synth_sequences(spark, N_SYNTH), CFG).select(
        "doc_id", "ts", F.col("token").cast("long").alias("token")
    )
    return hampel(
        pts, ["doc_id"], ts_col="ts", value_col="token",
        half_width=3, k=3,
    )


def q_ev_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear (double-exponential) forecast baseline
    (operators/downsample.py::holt) over the hourly cent-total tier:
    level/trend recursion (α=0.3, β=0.1, b₀=0) emitting the one-step-
    ahead forecast level+trend — the trend-aware sibling of ev_ewma,
    one grouped Arrow batch per series.  Sequential by definition →
    ERROR-BOUND certification: DuckDB replays the coupled recursion in
    a two-column recursive CTE; each forecast must sit within 1e-9
    relative (micro-cent scaling makes the checker's +1 slack
    negligible), while a wrong α/β, swapped update order, or unsorted
    batch lands far outside."""
    from repurpose_spark.operators.downsample import holt

    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("tick")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("v"))
    return holt(
        hourly, ["event_type"], ts_col="tick", value_col="v",
        alpha=0.3, beta=0.1,
    ).select(
        "event_type",
        "tick",
        "v",
        (F.col("forecast") * 1e6).alias("forecast_micro"),
    )


def q_doc_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram entropy (operators/cooccur.py::
    token_entropy) — the distribution-level repetition/quality signal
    (Gopher-style): H = ln(N) − (1/N)·Σ c·ln c over the whitespace
    tokens.  Two doc-keyed partial+final aggregates, no joins, no
    Python.  The ln terms are libm-dependent → ERROR-BOUND
    certification at 1e-9 relative on the micro-nat scale; doc_id and
    n_tok byte-match."""
    from repurpose_spark.operators.cooccur import token_entropy

    d = _wide(_t(spark, sf_dir, "documents"))
    return token_entropy(d, text_col="text").select(
        "doc_id",
        "n_tok",
        (F.col("entropy") * 1e6).alias("entropy_micro"),
    )


def q_doc_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document lexical diversity (functions/text.py::
    lexical_diversity): exact n_tok / n_types / n_hapax plus type-token
    ratio and hapax share.  Computed IN-ROW from one sorted token array
    (run-length facts) — a map-only whole-stage-codegen pass with ZERO
    exchanges, where the oracle's natural two-aggregate formulation
    shuffles the exploded word stream twice.  Counts are exact int64s
    and the ratios are single int64/int64 IEEE divisions, so the hash
    must byte-match."""
    from repurpose_spark.functions.text import lexical_diversity

    d = _wide(_t(spark, sf_dir, "documents"))
    ld = d.select(
        "doc_id", lexical_diversity("text").alias("ld")
    ).select("doc_id", "ld.*")
    return ld.select(
        "doc_id",
        "n_tok",
        "n_types",
        "n_hapax",
        F.when(
            F.col("n_tok") > 0, F.col("n_types") / F.col("n_tok")
        ).alias("ttr"),
        F.when(
            F.col("n_tok") > 0, F.col("n_hapax") / F.col("n_tok")
        ).alias("hapax_share"),
    )


def q_seq_trending_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-over-bucket token-frequency lift (operators/cooccur.py::
    trending_terms) over the synthetic sequence points — "what's
    trending this hour" with +1 smoothing, gap re-entry as new, and
    per-bucket top-25 under the (lift desc, token) total order.  One
    partial+final count aggregate is the only raw pass; the adjacency
    lag and the rank ride two ledger-sized window exchanges.  EXACT:
    counts are int64 and the lift one IEEE division, so rows AND ranks
    byte-match the DuckDB twin."""
    from repurpose_spark.operators.cooccur import trending_terms

    pts = sequences_to_points(synth_sequences(spark, N_SYNTH), CFG)
    return trending_terms(pts, "hour", term_col="token", k=25).withColumn(
        "token", F.col("token").cast("long")
    )


def q_doc_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup probe (operators/dedup.py::minhash_probe):
    a deterministic ~25 % slice of the corpus (md5(doc_id) first hex in
    0-3) plays the ingest batch, the rest the history index; the batch
    is banded with the SAME md5 family and equi-joined against the
    index bands — never against itself, never all-pairs.  The
    production dedup shape: per-ingest cost scales with the batch, not
    the corpus.  EXACT oracle: candidates AND verified Jaccard replayed
    in SQL (the doc_minhash_pairs construction with the split cut)."""
    from repurpose_spark.operators.dedup import minhash_probe

    d = _t(spark, sf_dir, "documents")
    is_batch = F.substring(
        F.md5(F.col("doc_id").cast("string")), 1, 1
    ).isin("0", "1", "2", "3")
    return minhash_probe(
        d.where(~is_batch),
        d.where(is_batch),
        k=4,
        bands=2,
        shingle_n=8,
        threshold=0.3,
        step=2,
        use_md5=True,
    )


def q_doc_stream_minhash_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming near-dup probe (streaming/dedup.py::
    run_streaming_minhash_probe), oracle-certified against the BATCH
    semantics: the same md5 25 % ingest cut as doc_minhash_incremental
    drains as multiple micro-batches (maxFilesPerTrigger=1) through a
    foreachBatch probe of the static history index.  Per-pair results
    are independent of the micro-batch split, so the drained sink
    equals the one-shot probe EXACTLY — the SAME DuckDB oracle replays
    candidates and verified Jaccard in SQL.  Result is materialized
    before the temp dirs are removed."""
    import shutil
    import tempfile

    from repurpose_spark.streaming.dedup import run_streaming_minhash_probe

    d = _t(spark, sf_dir, "documents")
    is_batch = F.substring(
        F.md5(F.col("doc_id").cast("string")), 1, 1
    ).isin("0", "1", "2", "3")
    base = tempfile.mkdtemp(prefix="stream_probe_")
    src, out, ckpt = f"{base}/in", f"{base}/out", f"{base}/ckpt"
    try:
        d.where(is_batch).repartition(3).write.parquet(src)
        run_streaming_minhash_probe(
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            d.where(~is_batch),
            out,
            ckpt,
            k=4,
            bands=2,
            shingle_n=8,
            threshold=0.3,
            step=2,
            use_md5=True,
        )
        res = spark.read.parquet(out).select("new_id", "index_id", "jaccard")
        return spark.createDataFrame(res.collect(), res.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def q_doc_ingest_accepted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL history-aware dedup ingest loop
    (operators/ingest.py::ingest_with_dedup), oracle-certified end to
    end: three deterministic md5 cuts of the corpus ingest sequentially
    into a scratch Warehouse — batch 2 additionally re-delivers every
    '0'-cut history doc under a fresh id (exact re-delivery → history
    probe at jaccard 1.0) and a second copy of every '5'-cut doc (caught
    by the within-batch exact stage).  The result is the final table's
    (doc_id, ingest_no) rows.  EXACT oracle: all four stages — exact
    window-min, within-batch LSH keep-first, and the stratified history
    probe vs each prior ingest's ACCEPTED set — replayed in SQL with the
    same md5 signature family (k=4, bands=2, shingle 8 step 2,
    threshold 0.3)."""
    import shutil
    import tempfile

    from repurpose_spark.operators.ingest import ingest_with_dedup
    from repurpose_spark.sources.tables import Warehouse

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    c = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    redeliver = d.where(c == "0").select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"), "text"
    )
    indup = d.where(c == "5").select(
        (F.col("doc_id") + F.lit(20_000_000)).alias("doc_id"), "text"
    )
    batches = [
        d.where(c.isin(*"01234")),
        d.where(c.isin(*"56789")).unionByName(redeliver).unionByName(indup),
        d.where(~c.isin(*"0123456789")),
    ]
    base = tempfile.mkdtemp(prefix="ingest_oracle_")
    try:
        wh = Warehouse(spark, base + "/wh")
        for i, b in enumerate(batches, 1):
            ingest_with_dedup(
                wh,
                b.withColumn("ingest_no", F.lit(i)),
                minhash_kwargs=dict(
                    k=4, bands=2, shingle_n=8, step=2, use_md5=True,
                    threshold=0.3,
                ),
            )
        res = wh.read("documents").select("doc_id", "ingest_no")
        return spark.createDataFrame(res.collect(), res.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def q_doc_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 scoring (operators/retrieval.py::bm25_scores) of the
    corpus against a 4-term query — the lexical-retrieval leg beside
    embedding ANN and chunking.  The corpus text is scanned once and
    never shuffled (hits-only explode, broadcast stats/df); the per-doc
    score is an in-row ORDERED fold.  idf takes ln → ERROR-BOUND
    certification at 1e-9 relative on the micro scale; doc_id, dl,
    n_hits byte-match."""
    from repurpose_spark.operators.retrieval import bm25_scores

    d = _t(spark, sf_dir, "documents")
    return bm25_scores(d, ["dup", "scan", "spark", "window"]).select(
        "doc_id",
        "dl",
        "n_hits",
        (F.col("score") * 1e6).alias("score_micro"),
    )


def q_doc_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus duplicate-line removal (operators/lines.py::
    remove_boilerplate_lines) — the C4/CCNet boilerplate stage: a line
    whose normalized key occurs in ≥2 DISTINCT documents drops; unique
    lines keep their order and original form.  The fixture corpus is
    single-line, so the query synthesizes the web shape it targets: a
    per-source header (hot: ~source-count docs share it), the unique
    body, and a footer that is a shared copyright line for doc_id%3==0
    (case-varied on %6==0 to exercise lower(trim) matching) and a
    unique id line otherwise.  Hot detection is an exact two-phase
    distinct-count; hot keys broadcast back; one exchange on doc_id
    rebuilds cleaned texts.  EXACT oracle: DuckDB replays the identical
    split → distinct-doc count → anti-join → ordered string_agg."""
    from repurpose_spark.operators.lines import remove_boilerplate_lines

    d = _wide(_t(spark, sf_dir, "documents")).select(
        "doc_id",
        F.concat(
            F.lit("source: "),
            F.col("source"),
            F.lit("\n"),
            F.col("text"),
            F.lit("\n"),
            F.when(
                F.col("doc_id") % 6 == 0, F.lit("copyright acme corp")
            )
            .when(F.col("doc_id") % 3 == 0, F.lit("Copyright ACME Corp"))
            .otherwise(
                F.concat(F.lit("id: "), F.col("doc_id").cast("string"))
            ),
        ).alias("text"),
    )
    return remove_boilerplate_lines(d, min_docs=2).select(
        "doc_id",
        "text_clean",
        F.col("n_lines").cast("long").alias("n_lines"),
        F.col("n_removed").cast("long").alias("n_removed"),
    )


def q_doc_sample_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source 25-doc sample (operators/sampling.py::
    sample_bottom_k): rank by md5(doc_id || seed), keep each group's k
    smallest — content-stable eval-holdout sampling (k=10 of the 25+
    docs per source at every SF, so selection is really exercised).  The plan never
    shuffles the corpus: per-partition bottom-k heaps (mapInPandas)
    feed a survivors-only global rank, winners broadcast back as a
    left-semi join.  EXACT oracle: DuckDB ranks the identical md5
    strings with the identical tiebreak."""
    from repurpose_spark.operators.sampling import sample_bottom_k

    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return sample_bottom_k(d, ["source"], 10, id_col="doc_id", seed="r5")


def q_ev_sax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolic signature (operators/downsample.py::sax): each
    event_type's hourly-count series → 24 PAA frames → alphabet-4
    N(0,1) symbols — the classic fixed-width series sketch (Lin/Keogh
    2003) for whole-series similarity over a rollup tier (reference
    analog: a per-cell signature of the img2ts.py:652-668 series).
    EXACT: frame assignment is int64 arithmetic, the PAA mean is one
    IEEE division of exact int64s, and the symbol comparison runs in
    the integer-moment domain (A > β·c_f·√V — see the operator
    docstring) so no compounded float ever differs between engines.
    Zero Python; one exchange on the series key."""
    from repurpose_spark.operators.downsample import sax

    h = _ev_hourly(spark, sf_dir).select("event_type", "tick", "n_events")
    return sax(
        h, ["event_type"], ts_col="tick", value_col="n_events",
        n_frames=24, alphabet=4,
    )


def q_ev_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend (operators/robust.py::theil_sen) of each
    event_type's daily cent-total series over a day-index axis — the
    median-of-pairwise-slopes trend whose 29 % breakdown point survives
    outlier days that would drag an OLS fit (pairs with hampel /
    mad_flags as the robust-monitoring tier).  EXACT: day index and
    cents are exact ints; every slope is one IEEE division; slope and
    intercept are LOWER MEDIANS (exact order statistics, no
    interpolation) — DuckDB's quantile_disc(…, 0.5) picks the identical
    element (probed in tests/test_robust.py).  O(n²) pairs per series
    is bounded by the daily tier (n ≈ 365/series-year), one Arrow
    batch per series, one exchange."""
    from repurpose_spark.operators.robust import theil_sen

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
    pts = daily.select(
        "event_type",
        F.datediff(F.col("day"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("t"),
        F.col("cents").alias("v"),
    )
    return theil_sen(pts, ["event_type"], ts_col="t", value_col="v")


def q_emb_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic dedup (operators/semdedup.py::semantic_dedup,
    Abbas et al. 2023): hash-seeded medoid clusters (k=8, the
    content-stable md5 rank of the sampling family), then within each
    cluster every member with a higher-priority near-duplicate at
    cosine ≥ 0.3 is dropped — priority (centroid_cos ASC, id ASC) keeps
    the member LEAST like its centroid, the paper's best keep rule.
    EXACT oracle: both engines fold the dot products sequentially
    (F.aggregate / list_dot_product), the kept-set compares UNROUNDED
    doubles, and DuckDB replays seed rank, lowest-sid-ties argmax, and
    the drop join verbatim.  Plan: in-row assignment (literal seed
    arrays, zero shuffle — test-enforced), one cluster_id self-join."""
    from repurpose_spark.operators.semdedup import semantic_dedup

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return semantic_dedup(e, k=8, threshold=0.3)


def q_emb_cluster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster audit of the semantic-dedup assignment
    (operators/semdedup.py::cluster_profile): size + min/max centroid
    cosine per hash-seeded cluster.  Extremes, not means, so the values
    stay EXACT (a distributed float sum is partition-order-dependent;
    an order statistic of bitwise-reproducible doubles is not)."""
    from repurpose_spark.operators.semdedup import cluster_profile

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return cluster_profile(e, k=8)


def q_doc_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplicate overlap matrix (operators/dedup.py::
    source_overlap): the doc_minhash_pairs verified near-dups rolled up
    per unordered source pair — the table curation teams read before
    setting mixture weights (RefinedWeb/Dolma report exactly this).
    Pair side broadcasts (AQE; dup pairs ≪ corpus), similarity mass
    summed as exact int64 1e-4 ticks so the aggregate is shuffle-order-
    free.  EXACT oracle: the minhash-pair SQL plus two source joins and
    the same integer-tick rollup."""
    from repurpose_spark.operators.dedup import (
        dedup_minhash_lsh,
        source_overlap,
    )

    d = _t(spark, sf_dir, "documents")
    pairs = dedup_minhash_lsh(
        d, k=4, bands=2, shingle_n=8, threshold=0.3, step=2, use_md5=True
    )
    return source_overlap(pairs, d)


def q_ev_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano-factor burstiness monitor (operators/drift.py::fano_factor):
    index of dispersion of daily event counts per event_type over the
    CLOSED bucket range (silent days count 0) — PSI's companion alarm:
    PSI watches WHAT arrives drifting, this watches HOW it arrives
    (≈1 Poisson, ≫1 bursty).  EXACT: counts/moments are int64, fano
    folds to (n·s2−s1²)/((n−1)·s1) — exact integer numerator and
    denominator, ONE IEEE division."""
    from repurpose_spark.operators.drift import fano_factor

    ev = _t(spark, sf_dir, "events")
    return fano_factor(ev, ["event_type"], ts_col="ts", width_s=86400)


def q_ev_haar_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haar wavelet detail-energy spectrum (operators/downsample.py::
    haar_energy): per event_type, the unnormalized Haar pyramid's detail
    energy at 3 dyadic scales — Fano's companion: Fano says a key is
    bursty, this says at WHICH timescale.  EXACT: details quantize to
    int64 1e-4 ticks BEFORE squaring (detail_e8 is an integer sum,
    shuffle-order-free); the approx chain is one IEEE add + halving per
    level, identical in both engines."""
    from repurpose_spark.operators.downsample import haar_energy

    ev = _t(spark, sf_dir, "events")
    return haar_energy(
        ev,
        keys=("event_type",),
        ts_col="ts",
        value_col="value",
        order_cols=("event_id",),
        levels=3,
    )


def q_ev_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered 3-step funnel (operators/funnel.py::
    funnel_counts): users whose earliest view precedes their earliest
    subsequent click precedes their earliest subsequent purchase —
    first-touch attribution over the raw stream.  After the first
    per-user min-aggregate every join side is one row per user, so
    nothing user-sized reshuffles.  EXACT: timestamp comparisons and
    counts only, no float arithmetic anywhere."""
    from repurpose_spark.operators.funnel import funnel_counts

    ev = _t(spark, sf_dir, "events")
    return funnel_counts(ev, ["view", "click", "purchase"])


def q_ev_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention triangle (operators/funnel.py::retention_cohorts):
    first-activity-day cohorts × day offset, distinct active users per
    cell, offsets pruned at 7.  EXACT: epoch-day int64 arithmetic and
    distinct counts only."""
    from repurpose_spark.operators.funnel import retention_cohorts

    ev = _t(spark, sf_dir, "events")
    return retention_cohorts(ev, max_offset=7)


def q_doc_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit per source (operators/cooccur.py::zipf_slope):
    OLS slope of ln(freq) on ln(rank) over the freq≥2 vocabulary —
    the corpus-health monitor (natural text ≈ −1; tokenizer bugs and
    template spam bend it).  n_ranks certifies byte-exactly; the slope
    certifies under the error-bound oracle (rel 1e-6 — JVM vs libm ln
    differ by 1 ulp on ~1%% of inputs and the moment sums are
    order-dependent doubles, both ~1e-12 effects)."""
    from repurpose_spark.operators.cooccur import zipf_slope

    d = _t(spark, sf_dir, "documents")
    return zipf_slope(d, by=("source",), min_freq=2)


def q_ev_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured schema-on-read: extract a typed field from the
    events table's JSON ``props`` bag (the observability-pipeline shape
    — a fixed relational core plus a free-form attribute bag) and roll
    it up per event_type.  ``get_json_object`` evaluates JVM-side
    inside the scan's codegen span — no UDF, no second pass; the cast
    to long makes every aggregate integer-exact.  EXACT oracle:
    DuckDB's ->> extraction with the identical cast."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    # r06: extract once in a child projection — embedding the extraction
    # in each of the four aggregate expressions parsed the JSON bag four
    # times per row (guide §1.2 per-task work); same values
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def q_ev_dtw_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DTW template matching (operators/dtw.py::dtw_to_references):
    score each event_type's CLOSED-range hourly arrival-count series
    (silent hours = 0, fano's discipline) against a burst template
    under unconstrained time warping — "which streams' arrival shape
    looks like this incident signature".  EXACT: counts are int64, so
    every DP cell is |int−int| + min of exact values — integer-valued
    end to end; a cell's value is the same expression tree in ANY DP
    visit order, so the numpy anti-diagonal kernel and the oracle's
    unrolled row-DP recursive CTE agree byte-for-byte."""
    from repurpose_spark.operators.dtw import dtw_to_references

    ev = _t(spark, sf_dir, "events")
    h = F.floor(F.unix_timestamp(F.col("ts")) / F.lit(3600)).cast("long")
    per = ev.groupBy("event_type", h.alias("h")).agg(
        F.count("*").alias("c")
    )
    bounds = per.groupBy("event_type").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = bounds.select(
        "event_type", F.explode(F.sequence("h0", "h1")).alias("h")
    )
    dense = grid.join(per, ["event_type", "h"], "left").select(
        "event_type",
        "h",
        F.coalesce("c", F.lit(0)).cast("double").alias("c"),
    )
    refs = spark.createDataFrame(
        [("burst", [0.0, 10.0, 40.0, 80.0, 40.0, 10.0, 0.0, 0.0])],
        "ref_id string, pattern array<double>",
    )
    return dtw_to_references(
        dense, refs, keys=("event_type",), ts_col="h", value_col="c"
    )


def q_doc_edit_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-similarity verification tier (operators/dedup.py::
    edit_distance_pairs): Levenshtein over the banded-MinHash candidate
    pairs, kept when edit_sim = 1 − dist/max_len ≥ 0.8 — the "same page,
    small diff" check shingle Jaccard under-reports on long insertions
    (reference analog: exact distance predicate after the cheap spatial
    bucket join, src/repurpose/resample.py:230-244).  md5 family so the
    oracle reproduces candidates; both engines run classic Levenshtein,
    so verification is EXACT — and the entry runs the banded-DP scale
    kernel: max_dist="auto" derives the cap ceil((1−min_sim)·max_len)
    from one projected scan, so banding is output-identical BY
    CONSTRUCTION (3.9× at sf0.1, BENCH_EDIT_r05.json; pytest pins
    full == capped == auto)."""
    from repurpose_spark.operators.dedup import edit_distance_pairs

    d = _t(spark, sf_dir, "documents")
    return edit_distance_pairs(
        d, min_sim=0.8, k=4, bands=2, shingle_n=8, step=2, use_md5=True
    )



def q_ev_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line interval union (operators/intervals.py::
    interval_union): per user-group, the TOTAL time covered by the
    union of 2-hour incident windows opened by error events, plus the
    peak number of simultaneously-open windows — "how much of the day
    was under incident, and how deep did incidents stack".  One
    shuffle on grp feeding two per-key window sorts (merge-intervals
    running-max + the ±1 boundary sweep); every quantity is integer
    epoch micros, so the aggregate is EXACT.  Oracle: DuckDB runs the
    identical sweep — the windowed running max is semantics, not an
    optimization, so both engines must agree byte-for-byte."""
    from repurpose_spark.operators.intervals import interval_union

    ev = _t(spark, sf_dir, "events")
    ivs = ev.where(F.col("event_type") == "error").select(
        (F.col("user_id") % 8).alias("grp"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end_ts"),
    )
    return interval_union(
        ivs, by=("grp",), start_col="start_ts", end_col="end_ts"
    )


def q_ev_trimmed_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-trimmed daily rollup (operators/robust.py::trimmed_agg):
    per (event_type, day) drop the ⌊n·0.1⌋ lowest and highest integer
    cents by rank (ties broken by (ts, event_id), a total order) and
    aggregate the surviving 80 % — the heavy-tail-proof tier a plain
    mean can't give (one stuck sensor at MAX_INT moves the mean
    arbitrarily; it cannot move this).  Trimming by COUNT rather than
    by percentile value keeps everything int64 — no interpolation —
    and the kept VALUE multiset is tie-order-invariant by
    construction, so the oracle is EXACT."""
    from repurpose_spark.operators.robust import trimmed_agg

    ev = _t(spark, sf_dir, "events")
    rows = ev.select(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        "ts",
        "event_id",
    )
    return trimmed_agg(
        rows,
        by=("event_type", "day"),
        value_col="cents",
        tie_cols=("ts", "event_id"),
        trim_frac=0.1,
    )


def q_doc_heaps_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth fit per source (operators/
    cooccur.py::heaps_slope) — Zipf's companion corpus-health monitor:
    V ≈ K·N^β with β ≈ 0.4–0.6 for natural text; dedup failures
    flatten the curve, tokenizer explosions steepen it.  First
    occurrences via one (source, word) min-doc aggregate — no
    stateful distinct scan — then a per-source cumulative window and
    a five-moment OLS of ln V on ln N.  n_docs/vocab certify
    byte-exactly; heaps_beta rides the error-bound oracle (rel 1e-6,
    the same JVM-vs-libm ln + order-dependent moment-sum contract as
    doc_zipf_slope)."""
    from repurpose_spark.operators.cooccur import heaps_slope

    d = _t(spark, sf_dir, "documents")
    return heaps_slope(d, by=("source",))



def q_ev_spearman_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation per event_type (operators/robust.py::
    spearman_corr) between hourly event volume and hourly cent mass —
    "does value track volume, monotonically?" — the outlier-proof
    sibling of ev_lag_corr's Pearson (one whale transaction saturates
    Pearson; ranks cap its leverage at 1/n).  Doubled average ranks
    (2·rank_min + ties − 1) keep every moment int64-exact; the finish
    is the same ≤4 correctly-rounded IEEE ops as the cross-corr
    family, so the oracle is EXACT."""
    from repurpose_spark.operators.robust import spearman_corr

    ev = _t(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hh")
    ).agg(
        F.count(F.lit(1)).alias("x"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("y"),
    )
    return spearman_corr(h, by=("event_type",), x_col="x", y_col="y")


def q_ev_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak-to-trough drawdown per event_type (operators/robust.py::
    max_drawdown) of the net-flow series: each event credits its
    integer cents and burns a flat 500 — the quota/budget-monitoring
    shape ("how far below its high-water mark did the balance fall").
    One window sort by (ts, event_id), all int64 — EXACT oracle:
    DuckDB replays the identical running-sum/running-max scan."""
    from repurpose_spark.operators.robust import max_drawdown

    ev = _t(spark, sf_dir, "events")
    rows = ev.select(
        "event_type",
        "ts",
        "event_id",
        (F.round(F.col("value") * 100).cast("long") - F.lit(500)).alias(
            "flow"
        ),
    )
    return max_drawdown(
        rows,
        by=("event_type",),
        ts_col="ts",
        value_col="flow",
        tie_cols=("event_id",),
    )


def q_doc_token_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration of token mass per source (operators/
    cooccur.py::gini_concentration) — the mixture-health companion to
    doc_zipf_slope/doc_heaps_beta: is a source's token budget spread
    across documents or locked in a few megadocs?  The numerator is
    assembled from two exact int64 sums, so the only float op is one
    correctly-rounded division — EXACT oracle."""
    from repurpose_spark.operators.cooccur import gini_concentration

    d = _t(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != F.lit("")
    )
    rows = d.select(
        "source", "doc_id", F.size(toks).cast("long").alias("nt")
    )
    return gini_concentration(rows, "nt", by=("source",), id_col="doc_id")


def q_doc_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted systematic (PPS) sample per source (operators/
    sampling.py::systematic_sample): documents laid end-to-end on
    their cumulative token axis, one draw per 500-token grid point —
    "sample training docs by token mass, not by count", the PPS
    counterpart of doc_sample_bottomk's uniform hash sample.  Rides
    pack_sequences' two-phase distributed prefix sum (no driver scan,
    partition-count-independent); selection is one integer predicate,
    so the selected id set is EXACT — DuckDB replays the cumsum."""
    from repurpose_spark.operators.sampling import systematic_sample

    d = _t(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != F.lit("")
    )
    rows = d.select(
        "source", "doc_id", F.size(toks).cast("long").alias("n_tok")
    )
    return systematic_sample(
        rows, stride=500, by="source", id_col="doc_id", weight_col="n_tok"
    )



def q_doc_source_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise unigram-LM KL divergence between sources (operators/
    cooccur.py::unigram_kl) — the distributional drift matrix
    complementing doc_source_overlap's duplicate matrix: two sources
    can share zero documents yet read identically, and vice versa.
    KL(p_a‖q_b) over a's observed vocabulary, q_b additively smoothed
    over the global vocab (finite cost for unseen words — the
    held-out LM-eval shape).  Every post-vocabulary frame is
    O(|V|·sources); totals and |V| ride broadcasts.  n_types certifies
    byte-exactly; kl_nats rides the error-bound oracle (rel 1e-6,
    the zipf/heaps ln contract)."""
    from repurpose_spark.operators.cooccur import unigram_kl

    d = _t(spark, sf_dir, "documents")
    return unigram_kl(d, by="source", alpha=0.5)



def q_ev_allan_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allan variance of arrival rates per event_type (operators/
    drift.py::allan_variance) at three averaging timescales — the
    third standing ingestion alarm next to PSI (what arrives) and
    Fano (how bursty): it localizes WHICH timescale a stream is
    unstable at.  Closed-range semantics with NO gap-fill pass (the
    implicit-zero pairs fold into c² terms on one lag window); counts
    and the squared-diff sum are int64 end to end and allan_var is
    one correctly-rounded division — EXACT oracle."""
    from repurpose_spark.operators.drift import allan_variance

    ev = _t(spark, sf_dir, "events")
    out = allan_variance(
        ev, ["event_type"], ts_col="ts", taus=(3600, 7200, 21600)
    )
    return out.withColumn("tau", F.col("tau").cast("long"))



def q_ev_interarrival_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival CV² per event_type (operators/drift.py::
    interarrival_cv) — the bucket-free arrival-process alarm (CV² = 1
    Poisson, > 1 clumped, < 1 metronomic) completing the PSI / Fano /
    Allan family without a width parameter.  Integer-second gaps from
    one window sort; CV² folds to exact int64 numerator/denominator
    and ONE division — EXACT oracle."""
    from repurpose_spark.operators.drift import interarrival_cv

    ev = _t(spark, sf_dir, "events")
    return interarrival_cv(
        ev, ["event_type"], ts_col="ts", tie_cols=("event_id",)
    )


def q_ev_equidepth_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth quartile profile of integer cents per event_type
    (operators/downsample.py::equidepth_profile): rank-balanced NTILE
    tiles under the (cents, ts, event_id) total order, each reporting
    exact count/min/max/sum — the interpolation-free dual of the
    fixed-edge histogram.  EXACT oracle: SQL-standard NTILE agrees
    tile-for-tile under a total order."""
    from repurpose_spark.operators.downsample import equidepth_profile

    ev = _t(spark, sf_dir, "events")
    rows = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        "ts",
        "event_id",
    )
    return equidepth_profile(
        rows, ["event_type"], "cents", tie_cols=("ts", "event_id"), k=4
    )


def q_ev_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of integer cents per event_type
    (operators/drift.py::benford_profile) — the fabricated-data /
    unit-mixup check: digit via the decimal string's first character
    (no float log10 — its 1-ulp edges at powers of ten would make the
    bucket engine-dependent), counts int64, share one correctly-
    rounded division.  EXACT oracle."""
    from repurpose_spark.operators.drift import benford_profile

    ev = _t(spark, sf_dir, "events")
    rows = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    return benford_profile(rows, ["event_type"], "cents")



def q_doc_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OOV rate per source against the corpus top-500 vocabulary
    (operators/cooccur.py::oov_rate) — the tokenizer-coverage monitor:
    a source drifting away from the fitted vocabulary (new language,
    template flood, mojibake) shows up as a rising OOV share before
    quality scores move.  Vocabulary = top-k under the (count desc,
    word) total order via TakeOrderedAndProject (distributed partial
    top-k, never a one-task vocab sort), membership via broadcast
    left join; counts int64 + ONE division — EXACT oracle."""
    from repurpose_spark.operators.cooccur import oov_rate

    d = _t(spark, sf_dir, "documents")
    return oov_rate(d, by=("source",), vocab_k=500)


def q_ev_state_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length islands of each user's event-type stream
    (operators/states.py::state_runs) — gaps-and-islands RLE: maximal
    runs of an unchanged state with start/end/length, the categorical
    compression tier and "how long do sessions stay in state X"
    monitor (reference analog: consumers of the per-cell ordered
    series img2ts.py builds).  Run ids and counts are exact int64
    under the (ts, event_id) total order; one hash exchange on
    user_id, one sort, and the run aggregate reuses the partitioning
    (subset-clustering) — EXACT oracle."""
    from repurpose_spark.operators.states import state_runs

    ev = _t(spark, sf_dir, "events")
    return state_runs(
        ev, ["user_id"], ts_col="ts", state_col="event_type",
        tie_cols=("event_id",),
    )


def q_ev_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types across user
    sequences (operators/states.py::transition_matrix) — the
    behavioral fingerprint: counts and row-normalized probabilities of
    event_type → next event_type, the template/bot detector (scripted
    agents have near-degenerate rows) and the first-order perplexity
    baseline for any sequence model.  Counts int64, ``p`` ONE IEEE
    division; the corpus exchanges once on user_id, the matrix
    aggregate moves only |states|²-sized partials — EXACT oracle."""
    from repurpose_spark.operators.states import transition_matrix

    ev = _t(spark, sf_dir, "events")
    return transition_matrix(
        ev, ["user_id"], ts_col="ts", state_col="event_type",
        tie_cols=("event_id",),
    )


def q_ev_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page–Hinkley online drift alarm per event_type
    (operators/drift.py::page_hinkley) over the gap-filled hourly
    count grid — the SEQUENTIAL complement of ev_changepoint's offline
    two-window scan: at which tick would a live monitor calibrated on
    the first 24 h (slack δ=1 event/h, threshold λ=50) have FIRST
    fired?  The denominator-clearing trick keeps every running
    quantity int64 (running sums/mins of integers are evaluation-
    order-proof), so the alarm tick itself is byte-stable — EXACT
    oracle, including the NULL never-fired keys."""
    from repurpose_spark.operators.drift import page_hinkley

    h = _ev_hourly(spark, sf_dir).select("event_type", "tick", "n_events")
    dense = gap_fill(
        h, "hour", key_cols=["event_type"], fill_values={"n_events": 0}
    )
    return page_hinkley(
        dense, ["event_type"], ts_col="tick", value_col="n_events",
        calib=24, delta=1, lam=50,
    )


def q_ev_seasonal_skill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive vs naive-1 forecast skill (MASE) per event_type
    (operators/downsample.py::seasonal_naive_skill) on the gap-filled
    hourly count grid with a 24 h season — the model-selection gate in
    front of ev_holt / ev_seasonal_decompose: mase < 1 ⇒ the daily
    pattern beats persistence, fit something seasonal.  Both MAE
    numerators are exact int64 sums of row-lag deltas on the dense
    grid; mase is ONE division of exact int64 cross-products — EXACT
    oracle."""
    from repurpose_spark.operators.downsample import seasonal_naive_skill

    h = _ev_hourly(spark, sf_dir).select("event_type", "tick", "n_events")
    dense = gap_fill(
        h, "hour", key_cols=["event_type"], fill_values={"n_events": 0}
    )
    return seasonal_naive_skill(
        dense, ["event_type"], ts_col="tick", value_col="n_events",
        period=24,
    )


def q_doc_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weight-proportional 10-doc sample per source
    (operators/sampling.py::weighted_priority_sample) — priority
    sampling (Duffield/Lund/Thorup): rank by u/n_chars with u a 20-bit
    uniform from md5(doc_id‖seed), keep each source's 10 smallest —
    "sample the review queue by token mass, reproducibly", the
    weighted sibling of doc_sample_bottomk.  Same never-shuffle-the-
    corpus plan (local bottom-k heaps → survivor rank → broadcast
    semi-join); the rank key is ONE IEEE division of exact int64s —
    EXACT oracle (DuckDB parses the identical hex prefix and ranks the
    identical doubles)."""
    from repurpose_spark.operators.sampling import weighted_priority_sample

    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return weighted_priority_sample(
        d, ["source"], 10, id_col="doc_id", weight_col="n_chars",
        seed="r5w",
    )


def q_ev_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift of the cent distribution per
    event_type between consecutive observed days
    (operators/drift.py::ks_drift) — the BIN-FREE complement of
    ev_drift_psi: D = max|F_prev − F_cur| over the merged support, so
    location shifts, variance changes, and new modes all register with
    no bin-edge or smoothing choice.  One corpus-sized count aggregate;
    everything after is support-sized (pair join on the tiny slice
    axis, one window sort per day-pair).  CDF steps are exact int64
    cumulations with two IEEE divisions per support point; the max of
    identical doubles is engine-independent — EXACT oracle."""
    from repurpose_spark.operators.drift import ks_drift

    ev = _t(spark, sf_dir, "events")
    rows = ev.select(
        "event_type",
        F.date_trunc("day", "ts").alias("slice"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return ks_drift(rows, ["event_type"], slice_col="slice",
                    value_col="cents")


def q_ev_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution
    (operators/funnel.py::last_touch): for every purchase, the user's
    most recent strictly-prior click and whether it falls inside a
    7-day window — the dual of ev_funnel's first-touch ordering
    ("which click gets credit for this purchase").  The latest prior
    touch is a running MAX of conditionally-projected timestamps over
    strictly-preceding rows (MAX skips NULLs by SQL semantics — no
    IGNORE NULLS dialect divergence); gap exact integer seconds,
    attribution an integer predicate — EXACT oracle including the
    NULL no-prior-touch rows.  One exchange on user_id, one sort."""
    from repurpose_spark.operators.funnel import last_touch

    ev = _t(spark, sf_dir, "events")
    return last_touch(
        ev, conv_type="purchase", touch_type="click",
        horizon_s=7 * 86400, tie_cols=("event_id",),
    )


def q_ev_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall trend significance test
    (operators/robust.py::mann_kendall) of each event_type's daily
    cent-total series — the non-parametric IS-there-a-trend companion
    the Theil–Sen slope (ev_theil_sen, same daily frame) is always
    paired with: sign statistic S, tie-corrected Var·18, and the
    continuity-corrected z.  EXACT: S and Var·18 are exact int64; z is
    division → sqrt → division on identical inputs (sqrt IS correctly
    rounded, unlike ln) — DuckDB replays the O(n²) sign sum as a
    self-join, bounded by the daily tier."""
    from repurpose_spark.operators.robust import mann_kendall

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
    pts = daily.select(
        "event_type",
        F.datediff(F.col("day"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("t"),
        F.col("cents").alias("v"),
    )
    return mann_kendall(pts, ["event_type"], ts_col="t", value_col="v")


def q_doc_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-occurrence novelty share per document
    (operators/dedup.py::novelty_rate) — the incremental-crawl metric
    dup_spans can't give: each word 8-gram is novel only in the doc
    holding its corpus-wide minimum doc_id (ingest order), and each
    doc's score is its novel share among its DISTINCT grams — re-crawls
    and template floods rank near 0, fresh text near 1.  Two inherent
    corpus-sized shuffles (gram arbiter window, doc aggregate), string
    gram keys so the oracle certifies the algorithm with no hash-parity
    assumption.  Counts int64 + ONE division — EXACT oracle."""
    from repurpose_spark.operators.dedup import novelty_rate

    d = _wide(_t(spark, sf_dir, "documents")).select(
        "doc_id", F.trim(F.col("text")).alias("text")
    )
    return novelty_rate(d, id_col="doc_id", text_col="text", window=8)


def q_ev_availability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Availability / SLA rollup per event_type
    (operators/states.py::availability) over the gap-filled hourly grid
    — the composition showcase: gap_fill densifies the tier, state_runs
    finds the outage islands (up = any event that hour), one aggregate
    answers the SLA report (uptime share, outage count, worst outage
    length and start — earliest-wins among ties by exact total order).
    Counts int64, availability ONE division; the worst-outage start
    joins back on the RUN frame (tiny) — EXACT oracle incl. the
    no-outage NULL columns."""
    from repurpose_spark.operators.states import availability

    h = _ev_hourly(spark, sf_dir).select("event_type", "tick", "n_events")
    dense = gap_fill(
        h, "hour", key_cols=["event_type"], fill_values={"n_events": 0}
    ).withColumn("up", F.col("n_events") > 0)
    return availability(dense, ["event_type"], ts_col="tick", up_col="up")


def q_ev_stream_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Page–Hinkley drift alarm
    (streaming/stateful.py::stateful_page_hinkley), value-certified
    against the batch operator: the dense hourly grid drains through an
    AvailableNow readStream in TWO strictly time-ordered files
    (maxFilesPerTrigger=1, so the five-integer per-key state genuinely
    crosses a micro-batch boundary) plus the far-future sentinel; the
    watermark flush emits one final row per key that must equal
    ev_page_hinkley byte-for-byte — integer state makes the
    streaming/batch equivalence EXACT, so this shares the batch DuckDB
    oracle (the doc_stream_minhash_probe pattern)."""
    from datetime import datetime

    from repurpose_spark.streaming.stateful import stateful_page_hinkley

    h = _ev_hourly(spark, sf_dir).select("event_type", "tick", "n_events")
    dense = gap_fill(
        h, "hour", key_cols=["event_type"], fill_values={"n_events": 0}
    ).select("event_type", "tick", F.col("n_events").cast("long").alias("v"))
    lo, hi = dense.agg(F.min("tick"), F.max("tick")).collect()[0]
    mid = lo + (hi - lo) / 2

    def write_src(src):
        import time as _time

        dense.where(F.col("tick") <= F.lit(mid)).orderBy(
            "tick"
        ).coalesce(1).write.mode("append").parquet(src)
        _time.sleep(1.05)  # second file must sort after the first (mtime)
        dense.where(F.col("tick") > F.lit(mid)).orderBy(
            "tick"
        ).coalesce(1).write.mode("append").parquet(src)

    def build(src):
        ticks = (
            spark.readStream.schema("event_type string, tick timestamp, v long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return stateful_page_hinkley(
            ticks, calib=24, delta=1, lam=50, watermark="1 hour"
        )

    return _drain_stream(
        spark,
        write_src,
        ("__sentinel__", datetime(2030, 1, 1), 0),
        "event_type string, tick timestamp, v long",
        build,
        lambda df: df.where(F.col("event_type") != "__sentinel__").select(
            "event_type", "calib_n", "calib_sum", "n_scored",
            "max_ph_scaled", "max_ph", "first_alarm_ts",
        ),
    )


def q_ev_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-bucket admission replay per user
    (operators/rates.py::rate_limit_admission) — which events a 1-token
    bucket refilling 1 token/hour (unit = 1/3600 token: cap 3600,
    refill 1/s, cost 3600) would have admitted: the traffic-policing /
    abuse-forensics view of the events stream.  Rejection feedback
    (only admitted events consume) makes the recursion irreducibly
    sequential — one of the two deliberately sequential operators —
    but ALL state is int64, so unlike the EWMA family the oracle is
    EXACT, not error-bound: DuckDB replays the identical integer
    recursion in a recursive CTE and every admission bit and bucket
    level matches byte-for-byte."""
    from repurpose_spark.operators.rates import rate_limit_admission

    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    return rate_limit_admission(
        ev, ["user_id"], ts_col="ts", cap=3600, refill_per_s=1,
        cost=3600, tie_cols=("event_id",),
    )


def q_emb_int8_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 embedding storage tier
    (operators/similarity.py::int8_quantize_embeddings): per-dimension
    corpus-bound scalar quantization to 255 levels with the summed
    squared reconstruction error per vector — the 4×-smaller vector
    storage tier and its migration quality report.  One partial+final
    2·64-scalar bounds aggregate (bounded driver literal), then a
    map-side-only codes pass — nothing shuffles at any scale.  Codes
    EXACT; the sse is the same ordered IEEE fold in both engines
    (float32→float64 widening exact, nonneg-term 0.0-init ≡
    first-element-init) — EXACT oracle (DuckDB list comprehension
    replays the identical expressions)."""
    from repurpose_spark.operators.similarity import int8_quantize_embeddings

    emb = _t(spark, sf_dir, "embeddings")
    return int8_quantize_embeddings(emb, dim=64)


def q_doc_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric quote-inclusion pairs by the overlap coefficient
    |A∩B|/min(|A|,|B|) (operators/dedup.py::overlap_coeff_pairs) — the
    detector for a short doc quoted verbatim inside a long one, which
    Jaccard structurally caps at |A|/|B|; candidates reuse the
    minhash_pairs banded md5 LSH (same shuffle discipline), the
    verification kernel swaps Jaccard for the Szymkiewicz–Simpson
    coefficient.  EXACT oracle: DuckDB replays candidates AND the
    overlap verification with the identical md5 signature family."""
    from repurpose_spark.operators.dedup import overlap_coeff_pairs

    d = _t(spark, sf_dir, "documents")
    return overlap_coeff_pairs(
        d, k=4, bands=2, shingle_n=8, threshold=0.5, step=2, use_md5=True
    )


def q_doc_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cluster-level KEEP decision
    (operators/graph.py::canonical_per_component) — the step the
    pair/component views stop short of: per near-dup connected
    component, keep the highest-quality doc (ties to min doc_id), with
    the member count whose n−1 is the removal tally.  Composes
    doc_neardup_components' min-label propagation with the
    quality_score expression; the canonical window runs on the
    doc-sized component frame.  EXACT oracle: the recursive-CTE
    closure + the quality replay + the same (q desc, doc_id) window."""
    from repurpose_spark.functions.text import quality_score
    from repurpose_spark.operators.graph import (
        canonical_per_component,
        connected_components,
    )

    d = _wide(_t(spark, sf_dir, "documents"))
    pairs = dedup_minhash_lsh(
        d, k=4, bands=2, shingle_n=8, threshold=0.3, step=2, use_md5=True
    )
    comp = connected_components(pairs, vertices=d)
    labeled = comp.join(
        d.select("doc_id", quality_score("text").alias("q")), "doc_id"
    )
    return canonical_per_component(labeled, "q")


def extra_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Queries subsumed by a queries() green row (see the note there) —
    excluded from the driver's 50-entry certification window but still
    exercised by bench.py and tools/check_entry.py --extra."""
    return {
        "seq_hourly_rollup": q_seq_hourly_rollup,
        "ev_hourly_rollup": q_ev_hourly_rollup,
        "ev_gapfill_hourly": q_ev_gapfill_hourly,
        "ev_asof_6h": q_ev_asof_6h,
        "ev_first_per_slot": q_ev_first_per_slot,
        "doc_quality": q_doc_quality,
        "doc_quality_score": q_doc_quality_score,
        "doc_bpe_tokens": q_doc_bpe_tokens,
        "doc_lang_stats": q_doc_lang_stats,
        "doc_minhash_sig": q_doc_minhash_sig,
        "emb_cosine_scores": q_emb_cosine_scores,
        "mm_audio_stats": q_mm_audio_stats,
        "mm_png_stats": q_mm_png_stats,
        "mm_gif_frames": q_mm_gif_frames,
        "mm_video_frames": q_mm_video_frames,
        "mm_jpeg_stats": q_mm_jpeg_stats,
        "mm_adpcm_stats": q_mm_adpcm_stats,
        "mm_flac_stats": q_mm_flac_stats,
        "seq_stream_hourly": q_seq_stream_hourly,
        "ev_stream_uniques": q_ev_stream_uniques,
        "ev_daily_uniques_sketch": q_ev_daily_uniques_sketch,
        "ev_value_quantiles": q_ev_value_quantiles,
        "ev_stream_quantiles": q_ev_stream_quantiles,
        "doc_bpe_roundtrip": q_doc_bpe_roundtrip,
        "doc_top_words": q_doc_top_words,
        "ev_gapfill_locf": q_ev_gapfill_locf,
        "ev_counter_rate": q_ev_counter_rate,
        "ev_time_weighted": q_ev_time_weighted,
        "ev_rollup_routed_6h": q_ev_rollup_routed_6h,
        "ev_rollup_routed_week": q_ev_rollup_routed_week,
        "doc_lexical_diversity": q_doc_lexical_diversity,
        "ev_rollup_realtime_6h": q_ev_rollup_realtime_6h,
        "ev_sessions": q_ev_sessions,
        "ev_ohlc": q_ev_ohlc,
        "ev_rolling_zscore": q_ev_rolling_zscore,
        "ev_ewma": q_ev_ewma,
        "ev_lttb": q_ev_lttb,
        "ev_autocorr": q_ev_autocorr,
        "doc_dup_spans": q_doc_dup_spans,
        "ev_interval_join": q_ev_interval_join,
        "ev_m4": q_ev_m4,
        "ev_changepoint": q_ev_changepoint,
        "ev_drift_psi": q_ev_drift_psi,
        "ev_rolling_median": q_ev_rolling_median,
        "ev_mad_outliers": q_ev_mad_outliers,
        "ev_lag_corr": q_ev_lag_corr,
        "ev_seasonal_residual": q_ev_seasonal_residual,
        "doc_bigram_lift": q_doc_bigram_lift,
        "ev_hampel": q_ev_hampel,
        "ev_rolling_corr": q_ev_rolling_corr,
        "ev_seasonal_decompose": q_ev_seasonal_decompose,
        "seq_token_hampel": q_seq_token_hampel,
        "ev_holt": q_ev_holt,
        "doc_token_entropy": q_doc_token_entropy,
        "seq_trending_tokens": q_seq_trending_tokens,
        "doc_sample_bottomk": q_doc_sample_bottomk,
        "doc_line_dedup": q_doc_line_dedup,
        "doc_bm25": q_doc_bm25,
        "doc_minhash_incremental": q_doc_minhash_incremental,
        "doc_stream_minhash_probe": q_doc_stream_minhash_probe,
        "doc_ingest_accepted": q_doc_ingest_accepted,
        "ev_sax": q_ev_sax,
        "ev_theil_sen": q_ev_theil_sen,
        "emb_semdedup": q_emb_semdedup,
        "emb_cluster_profile": q_emb_cluster_profile,
        "doc_source_overlap": q_doc_source_overlap,
        "ev_burstiness": q_ev_burstiness,
        "doc_edit_dup_pairs": q_doc_edit_dup_pairs,
        "ev_haar_energy": q_ev_haar_energy,
        "ev_dtw_template": q_ev_dtw_template,
        "ev_props_stats": q_ev_props_stats,
        "doc_zipf_slope": q_doc_zipf_slope,
        "ev_funnel": q_ev_funnel,
        "ev_retention": q_ev_retention,
        "ev_interval_coverage": q_ev_interval_coverage,
        "ev_trimmed_daily": q_ev_trimmed_daily,
        "doc_heaps_beta": q_doc_heaps_beta,
        "ev_spearman_hourly": q_ev_spearman_hourly,
        "ev_max_drawdown": q_ev_max_drawdown,
        "doc_token_gini": q_doc_token_gini,
        "doc_systematic_sample": q_doc_systematic_sample,
        "doc_source_kl": q_doc_source_kl,
        "ev_allan_variance": q_ev_allan_variance,
        "ev_interarrival_cv": q_ev_interarrival_cv,
        "ev_equidepth_profile": q_ev_equidepth_profile,
        "ev_benford": q_ev_benford,
        "doc_oov_rate": q_doc_oov_rate,
        "ev_state_runs": q_ev_state_runs,
        "ev_markov": q_ev_markov,
        "ev_page_hinkley": q_ev_page_hinkley,
        "ev_seasonal_skill": q_ev_seasonal_skill,
        "doc_weighted_sample": q_doc_weighted_sample,
        "ev_ks_drift": q_ev_ks_drift,
        "ev_last_touch": q_ev_last_touch,
        "ev_mann_kendall": q_ev_mann_kendall,
        "doc_novelty": q_doc_novelty,
        "ev_availability": q_ev_availability,
        "ev_stream_page_hinkley": q_ev_stream_page_hinkley,
        "ev_rate_limit": q_ev_rate_limit,
        "emb_int8_roundtrip": q_emb_int8_roundtrip,
        "doc_overlap_pairs": q_doc_overlap_pairs,
        "doc_canonical": q_doc_canonical,
    }


def error_bound_oracles() -> dict[str, dict]:
    """Value oracles for estimate-typed queries (VERDICT r4 #2 — the HLL
    sketch tier was the one rows-only registry entry).  The SQL computes
    the EXACT answer on DuckDB; the checker aligns rows on the exact
    columns (everything except ``est_col``), requires those to match
    byte-for-byte, and asserts |est − exact| ≤ rel_err·exact + 1 per row.

    ``rel_err``: hll_sketch_agg at lg_k=12 has relative standard error
    ~1.04/sqrt(2^12) ≈ 1.6 %; 0.08 is a 5σ bound — a wrong pipeline
    (e.g. sum-of-hourly-distincts, the overcount this tier exists to
    avoid) overshoots by the recurrence factor, far outside it."""
    out = {
        "mm_jpeg_stats": {
            # exact per-doc mean of the closed-form pixel family; the
            # decoded mean after a q95 444/420 round trip sits well
            # inside 2 % + 1 (measured ≤0.5 absolute on this fixture —
            # DC coefficients quantize at step ≤2)
            "sql": """
WITH d AS (
  SELECT i, 16 + i % 8 AS w, 16 + (i * 3) % 8 AS h
  FROM range(200) r(i)
)
SELECT printf('doc%08d', i) AS doc_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       3 AS channels,
       (SELECT avg((i + 7 * j.x) % 251)
        FROM unnest(generate_series(0, w * h * 3 - 1)) j(x))
         AS mean_intensity
FROM d
""",
            "est_col": "mean_intensity",
            "rel_err": 0.02,
        },
        # the video twin: same closed-form pixel family per (doc, frame)
        # as the GIF oracle but RGB; q95 MJPEG round trip measured
        # ≤0.26 absolute on this fixture, far inside 2 % + 1
        "mm_video_frames": {
            "sql": """
WITH d AS (
  SELECT i, 16 + i % 8 AS w, 16 + (i * 3) % 8 AS h, 2 + i % 4 AS nf
  FROM range(200) r(i)
),
fr AS (
  SELECT d.*, f.x AS frame_idx
  FROM d, unnest(generate_series(0, nf - 1)) f(x)
  WHERE f.x % 2 = 0
)
SELECT printf('doc%08d', i) AS doc_id,
       CAST(frame_idx AS INT) AS frame_idx,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       (SELECT avg(((i + frame_idx) + 7 * j.x) % 251)
        FROM unnest(generate_series(0, w * h * 3 - 1)) j(x))
         AS mean_intensity
FROM fr
""",
            "est_col": "mean_intensity",
            "rel_err": 0.02,
        },
        "mm_adpcm_stats": {
            # exact per-doc RMS of the closed-form int16 ramp, in int16
            # units (~9.2k, so the +1 slack is negligible); the 4-bit
            # IMA-ADPCM round trip measures 0.0150 worst relative on
            # this deterministic fixture (worst rows are the ones whose
            # period wrap forces a step-index escalation) — stable, so
            # 0.02 always holds
            "sql": """
WITH d AS (
  SELECT i, 400 + 100 * (i % 4) AS n FROM range(200) r(i)
),
s AS (
  SELECT i, n, (((i * 31 + j.x * 7) % 4001) - 2000) * 8 AS v
  FROM d, unnest(generate_series(0, n - 1)) j(x)
)
SELECT printf('doc%08d', i) AS doc_id,
       CAST(n AS BIGINT) AS n_samples,
       16000 AS sample_rate,
       1 AS channels,
       2 AS sample_width,
       sqrt(avg(CAST(v AS DOUBLE) * v)) AS rms_i16
FROM s
GROUP BY i, n
""",
            "est_col": "rms_i16",
            "rel_err": 0.02,
        },
        "ev_daily_uniques_sketch": {
            "sql": """
SELECT event_type,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS tick,
       COUNT(user_id) AS n_points,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct_est
FROM events GROUP BY 1, 2
""",
            "est_col": "n_distinct_est",
            "rel_err": 0.08,
        },
        # streaming twin: identical exact/estimate contract, the data
        # path is readStream -> stateful sketch agg -> drained parquet
        "ev_stream_uniques": {
            "sql": """
SELECT event_type,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS tick,
       COUNT(user_id) AS n_points,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct_est
FROM events GROUP BY 1, 2
""",
            "est_col": "n_distinct_est",
            "rel_err": 0.08,
        },
        # percentile tier: BRACKET mode — a rank-error sketch cannot be
        # certified by a value-relative bound on heavy-tailed data (1 %
        # of rank near p99 can move the VALUE 25 %), so DuckDB emits the
        # exact quantile values at q∓0.02 and the estimate must land
        # between them (measured rank error ≤0.005 at k=512 under heavy
        # merging — 4× inside the bracket)
        "ev_value_quantiles": {
            "sql": """
WITH g AS (
  SELECT event_type,
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS tick,
         COUNT(value) AS n_points,
         quantile_disc(value, 0.48) AS lo50,
         quantile_disc(value, 0.52) AS hi50,
         quantile_disc(value, 0.88) AS lo90,
         quantile_disc(value, 0.92) AS hi90,
         quantile_disc(value, 0.97) AS lo99,
         quantile_disc(value, 1.00) AS hi99
  FROM events GROUP BY 1, 2
)
SELECT event_type, tick, 'p50' AS q, n_points,
       lo50 AS value_lo, hi50 AS value_hi FROM g
UNION ALL
SELECT event_type, tick, 'p90', n_points, lo90, hi90 FROM g
UNION ALL
SELECT event_type, tick, 'p99', n_points, lo99, hi99 FROM g
""",
            "est_col": "value_est",
            "bracket": {"lo_col": "value_lo", "hi_col": "value_hi"},
        },
        # EWMA: sequential by definition, so DuckDB replays the SCALAR
        # recursion through a recursive CTE; the engine's block-rescaled
        # vectorized form re-anchors on the carry every 256 points, so
        # its drift is ~machine epsilon per block — rel_err 1e-9 is ~6
        # orders of magnitude of headroom for float noise yet any
        # recurrence bug (wrong α, off-by-one, unsorted batch) moves
        # values by ~α·|x−y| ≫ bound.  Output in micro-cents so the
        # checker's +1 absolute slack is negligible at this scale.
        "ev_ewma": {
            "sql": """
WITH RECURSIVE h AS (
  SELECT event_type,
         CAST(date_trunc('hour', ts) AS TIMESTAMP) AS tick,
         SUM(CAST(round(value * 100) AS BIGINT)) AS v
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT event_type, tick, v,
         row_number() OVER (PARTITION BY event_type ORDER BY tick) AS rn
  FROM h
),
rec AS (
  SELECT event_type, tick, v, rn, CAST(v AS DOUBLE) AS y
  FROM r WHERE rn = 1
  UNION ALL
  SELECT r.event_type, r.tick, r.v, r.rn, 0.3 * r.v + 0.7 * rec.y
  FROM rec JOIN r ON r.event_type = rec.event_type
                 AND r.rn = rec.rn + 1
)
SELECT event_type, tick, CAST(v AS BIGINT) AS v,
       y * 1e6 AS ewma_micro
FROM rec
""",
            "est_col": "ewma_micro",
            "rel_err": 1e-9,
        },
        # coupled level/trend recursion replayed as a two-column
        # recursive CTE — same contract as ev_ewma
        "ev_holt": {
            "sql": """
WITH RECURSIVE h AS (
  SELECT event_type,
         CAST(date_trunc('hour', ts) AS TIMESTAMP) AS tick,
         SUM(CAST(round(value * 100) AS BIGINT)) AS v
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT event_type, tick, v,
         row_number() OVER (PARTITION BY event_type ORDER BY tick) AS rn
  FROM h
),
rec AS (
  SELECT event_type, tick, v, rn,
         CAST(v AS DOUBLE) AS l, CAST(0 AS DOUBLE) AS b
  FROM r WHERE rn = 1
  UNION ALL
  SELECT r.event_type, r.tick, r.v, r.rn,
         0.3 * r.v + 0.7 * (rec.l + rec.b),
         0.1 * ((0.3 * r.v + 0.7 * (rec.l + rec.b)) - rec.l)
           + 0.9 * rec.b
  FROM rec JOIN r ON r.event_type = rec.event_type
                 AND r.rn = rec.rn + 1
)
SELECT event_type, tick, CAST(v AS BIGINT) AS v,
       (l + b) * 1e6 AS forecast_micro
FROM rec
""",
            "est_col": "forecast_micro",
            "rel_err": 1e-9,
        },
        # ln terms are libm-dependent and the float sum shuffle-order-
        # dependent at ~1e-16 — the exact cols (doc_id, n_tok) byte-match
        "doc_token_entropy": {
            "sql": """
WITH d AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     x -> x <> '') AS l
  FROM documents
),
t AS (SELECT doc_id, unnest(l) AS w FROM d),
c AS (SELECT doc_id, w, COUNT(*) AS c FROM t GROUP BY 1, 2),
a AS (
  SELECT doc_id, SUM(c) AS n,
         SUM(c * ln(CAST(c AS DOUBLE))) AS slc
  FROM c GROUP BY 1
)
SELECT doc_id, CAST(n AS BIGINT) AS n_tok,
       (ln(CAST(n AS DOUBLE)) - slc / n) * 1e6 AS entropy_micro
FROM a
""",
            "est_col": "entropy_micro",
            "rel_err": 1e-9,
        },
        # same ln caveat as entropy: idf is the one libm step; tf/df/dl
        # and the corpus stats are exact, so a wrong k1/b, a missed
        # term, or an avgdl drift lands far outside 1e-9
        "doc_bm25": {
            "sql": """
WITH tok AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     x -> x <> '') AS l
  FROM documents
),
stats AS (
  SELECT COUNT(*) AS n_docs,
         CAST(SUM(len(l)) AS DOUBLE) / COUNT(*) AS avgdl
  FROM tok
),
w AS (SELECT doc_id, len(l) AS dl, unnest(l) AS t FROM tok),
tf AS (
  SELECT doc_id, dl, t, COUNT(*) AS tf FROM w
  WHERE t IN ('dup', 'scan', 'spark', 'window') GROUP BY 1, 2, 3
),
dfq AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY 1),
sc AS (
  SELECT f.doc_id, f.dl,
         ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
           * (f.tf * 2.2)
           / (f.tf + 1.2 * (1 - 0.75 + 0.75 * f.dl / s.avgdl)) AS contrib
  FROM tf f JOIN dfq d USING (t) CROSS JOIN stats s
)
SELECT doc_id, CAST(dl AS INT) AS dl, COUNT(*) AS n_hits,
       SUM(contrib) * 1e6 AS score_micro
FROM sc GROUP BY doc_id, dl
""",
            "est_col": "score_micro",
            "rel_err": 1e-9,
        },
        # Zipf slope: the OLS moment sums are IEEE doubles (shuffle-
        # order noise ~1e-12); any logic bug (wrong hapax cut, unsorted
        # rank, off-by-one) moves the slope by orders more than 1e-6
        "doc_zipf_slope": {
            "sql": """
WITH w AS (
  SELECT source,
         unnest(regexp_split_to_array(lower(text), '\\s+')) AS word
  FROM documents
),
c AS (
  SELECT source, word, COUNT(*) AS n
  FROM w WHERE word != '' GROUP BY 1, 2
),
r AS (
  SELECT source, n,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n DESC, word) AS rnk
  FROM c WHERE n >= 2
),
a AS (
  SELECT source, COUNT(*) AS n_ranks,
         SUM(ln(rnk)) AS sx, SUM(ln(n)) AS sy,
         SUM(ln(rnk) * ln(rnk)) AS sxx,
         SUM(ln(rnk) * ln(n)) AS sxy
  FROM r GROUP BY 1
)
SELECT source, n_ranks,
       CASE WHEN n_ranks > 1 THEN
         (n_ranks * sxy - sx * sy) / (n_ranks * sxx - sx * sx)
       END AS zipf_slope
FROM a
""",
            "est_col": "zipf_slope",
            "rel_err": 1e-6,
        },
        "doc_heaps_beta": {
            "sql": """
WITH dn AS (
  SELECT source, doc_id,
         len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                         x -> x != '')) AS nt
  FROM documents
),
w AS (
  SELECT source, doc_id,
         unnest(regexp_split_to_array(lower(text), '\\s+')) AS word
  FROM documents
),
fo AS (
  SELECT source, word, MIN(doc_id) AS doc_id
  FROM w WHERE word != '' GROUP BY 1, 2
),
nw AS (SELECT source, doc_id, COUNT(*) AS new_w FROM fo GROUP BY 1, 2),
cum AS (
  SELECT dn.source, dn.doc_id,
         SUM(nt) OVER (PARTITION BY dn.source ORDER BY dn.doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS N,
         SUM(COALESCE(new_w, 0)) OVER (
                       PARTITION BY dn.source ORDER BY dn.doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS V
  FROM dn LEFT JOIN nw
    ON dn.source = nw.source AND dn.doc_id = nw.doc_id
),
pt AS (
  SELECT source, ln(N) AS x, ln(V) AS y, V
  FROM cum WHERE N >= 1 AND V >= 1
),
a AS (
  SELECT source, COUNT(*) AS n_docs, MAX(V) AS vocab,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy
  FROM pt GROUP BY 1
)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(vocab AS BIGINT) AS vocab,
       CASE WHEN n_docs > 1 THEN
         (n_docs * sxy - sx * sy) / (n_docs * sxx - sx * sx)
       END AS heaps_beta
FROM a
""",
            "est_col": "heaps_beta",
            "rel_err": 1e-6,
        },
        "doc_source_kl": {
            "sql": """
WITH w AS (
  SELECT source AS s,
         unnest(regexp_split_to_array(lower(text), '\\s+')) AS word
  FROM documents
),
c AS (
  SELECT s, word, COUNT(*) AS n FROM w WHERE word != '' GROUP BY 1, 2
),
t AS (SELECT s, SUM(n) AS N FROM c GROUP BY 1),
v AS (SELECT CAST(COUNT(DISTINCT word) AS DOUBLE) AS vsz FROM c),
pair AS (
  SELECT a.s AS src_a, tb.s AS src_b,
         CAST(a.n AS DOUBLE) AS n_a, CAST(ta.N AS DOUBLE) AS tot_a,
         CAST(COALESCE(bc.n, 0) AS DOUBLE) AS n_b,
         CAST(tb.N AS DOUBLE) AS tot_b, v.vsz AS vsz
  FROM c a
  JOIN t ta ON ta.s = a.s
  CROSS JOIN t tb
  CROSS JOIN v
  LEFT JOIN c bc ON bc.s = tb.s AND bc.word = a.word
  WHERE tb.s != a.s
)
SELECT src_a, src_b, CAST(COUNT(*) AS BIGINT) AS n_types,
       SUM((n_a / tot_a)
           * (ln(n_a / tot_a)
              - ln((n_b + 0.5) / (tot_b + 0.5 * vsz)))) AS kl_nats
FROM pair GROUP BY 1, 2
""",
            "est_col": "kl_nats",
            "rel_err": 1e-6,
        },
    }
    out["ev_stream_quantiles"] = {
        # streaming twin: identical bracket contract; the data path is
        # readStream -> binary KLL state -> watermark-timeout emission
        "sql": out["ev_value_quantiles"]["sql"],
        "est_col": "value_est",
        "bracket": {"lo_col": "value_lo", "hi_col": "value_hi"},
    }
    return out


# SQL fragments shared by the synthetic-sequence oracles: regenerate the
# closed-form table (FIXTURES.md §1) inside DuckDB.
_SEQ_CTE = f"""
WITH d AS (
  SELECT i, (64 + (i % 193)) AS n_tok FROM range({N_SYNTH}) t(i)
),
pts AS (
  SELECT i, n_tok, u.j AS j, ((i*31 + u.j*7) % 50257) AS token
  FROM d, unnest(generate_series(0, n_tok - 1)) AS u(j)
)
"""


_SEQ_SKEW_CTE = f"""
WITH d AS (
  SELECT i,
         (64 + (i % 193) + CASE WHEN i % 101 = 0 THEN 16384 ELSE 0 END)
           AS n_tok
  FROM range({N_SYNTH}) t(i)
),
pts AS (
  SELECT i, n_tok, u.j AS j, ((i*31 + u.j*7) % 50257) AS token
  FROM d, unnest(generate_series(0, n_tok - 1)) AS u(j)
)
"""


# LSH hyperplanes are pure functions of (dim, n_planes, seed) — embed them
# as SQL literals so DuckDB recomputes signatures/buckets identically and
# the driver certifies the bucket-join + verify ALGORITHM exactly (repr()
# round-trips doubles bit-for-bit).
def _planes_sql(dim: int, n_planes: int, seed: int = 7) -> list[str]:
    from repurpose_spark.operators.similarity import _hyperplanes

    return [
        "[" + ", ".join(repr(float(x)) for x in p) + "]"
        for p in _hyperplanes(dim, n_planes, seed)
    ]


def _sig_sql(e: str, dim: int, n_planes: int) -> str:
    return "(" + " + ".join(
        f"(CASE WHEN list_dot_product({e}, {p}) >= 0 THEN {1 << b} ELSE 0 END)"
        for b, p in enumerate(_planes_sql(dim, n_planes))
    ) + ")"


_EMB_DIM = 64  # driver embeddings table dimension (TESTDATA.md)


def _simhash_oracle_sql() -> str:
    """SQL twin of dedup_simhash(use_md5=True): per-token md5 → 4 hex
    quads → per-bit vote sums → chunk fingerprints → chunk-collision
    candidates → Hamming verify.  Generated programmatically (64 vote
    sums); tokenless docs get all-zero chunks via the LEFT JOIN (a NULL
    vote never exceeds 0, matching Spark's empty-array aggregate)."""
    chunk_exprs = ", ".join(
        f"CAST(concat('0x', substr(md5(w), {1 + 4 * c}, 4)) AS INTEGER) AS c{c}"
        for c in range(4)
    )
    vote_sums = ",\n         ".join(
        f"SUM(CASE WHEN (c{c} & {1 << b}) != 0 THEN 1 ELSE -1 END) AS v{c}_{b}"
        for c in range(4)
        for b in range(16)
    )
    fp_exprs = ",\n         ".join(
        "("
        + " + ".join(
            f"(CASE WHEN v{c}_{b} > 0 THEN {1 << b} ELSE 0 END)"
            for b in range(16)
        )
        + f") AS c{c}"
        for c in range(4)
    )
    hamming = " + ".join(
        f"bit_count(xor(a.c{c}, b.c{c}))" for c in range(4)
    )
    return rf"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                            x -> length(x) > 0)) AS w
  FROM documents
),
ch AS (SELECT doc_id, {chunk_exprs} FROM tok),
v AS (
  SELECT doc_id,
         {vote_sums}
  FROM ch GROUP BY doc_id
),
fp AS (
  SELECT d.doc_id,
         {fp_exprs}
  FROM documents d LEFT JOIN v ON v.doc_id = d.doc_id
),
p AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         {hamming} AS hamming
  FROM fp a JOIN fp b
    ON a.doc_id < b.doc_id
   AND (a.c0 = b.c0 OR a.c1 = b.c1 OR a.c2 = b.c2 OR a.c3 = b.c3)
)
SELECT doc_a, doc_b, hamming FROM p WHERE hamming <= 16
"""


def _ivf_oracle_sql(sf_dir: str = "/root/testdata/sf0.01") -> str | None:
    """IVF twin: refit the (deterministic, seeded, ordered-sample) k-means
    centroids from an INDEPENDENT DuckDB read of the same fixture, embed
    them as literals, and let SQL redo assignment (argmin of elementwise
    squared distance, ties to lowest cid — list_position finds the first
    min, matching ivf_assign's struct-min), probe filter and exact
    re-rank.  Returns None (→ rows-only) if the fixture is unavailable."""
    try:
        import duckdb
        import numpy as np

        from repurpose_spark.operators.similarity import kmeans_fit

        rows = duckdb.sql(
            "SELECT embedding FROM "
            f"'{sf_dir}/embeddings.parquet' "
            "ORDER BY vec_id LIMIT 512"
        ).fetchall()
        x = np.asarray([r[0] for r in rows], dtype=np.float64)
        cent = kmeans_fit(x, 8, iters=5, seed=7)
        qv = x[0]  # min vec_id row == the Spark query vector
        d = ((cent - qv[None, :]) ** 2).sum(axis=1)
        probe = [int(c) for c in np.argsort(d, kind="stable")[:2]]
        cent_sql = "[" + ", ".join(
            "[" + ", ".join(repr(float(v)) for v in c) + "]" for c in cent
        ) + "]"
        return f"""
WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
a AS (
  SELECT vec_id, e,
         list_transform({cent_sql}, c ->
           list_sum(list_transform(list_zip(e, c),
                    z -> (z[1] - z[2]) * (z[1] - z[2]))))
           AS ds
  FROM s
),
g AS (SELECT vec_id, e, list_position(ds, list_min(ds)) - 1 AS cid FROM a),
q AS (SELECT e AS qe FROM s ORDER BY vec_id LIMIT 1),
f AS (
  SELECT vec_id,
         round(list_dot_product(e, qe) /
               (sqrt(list_dot_product(e, e)) *
                sqrt(list_dot_product(qe, qe))), 4) AS cosine
  FROM g, q WHERE cid IN ({probe[0]}, {probe[1]})
)
SELECT vec_id, cosine FROM f ORDER BY cosine DESC, vec_id LIMIT 10
"""
    except Exception:
        return None


def oracle_sql(sf_dir: str = "/root/testdata/sf0.01") -> dict[str, str]:
    """Oracles for exactly the queries() keys.  ``sf_dir`` parameterizes
    the one data-dependent oracle (IVF refits centroids from the fixture
    under test — ADVICE r2: a hardcoded sf0.01 path silently certified
    the wrong data at other scales); the driver's no-arg call gets the
    sf0.01 default it runs at."""
    out = _oracle_sql_static()
    out["doc_simhash_pairs"] = _simhash_oracle_sql()
    ivf = _ivf_oracle_sql(sf_dir)
    if ivf:
        out["emb_ivf_topk"] = ivf
    keep = set(queries())
    return {k: v for k, v in out.items() if k in keep}


def extra_oracle_sql() -> dict[str, str]:
    """Oracles for the extra_queries() keys (driver-window overflow)."""
    keep = set(extra_queries())
    return {k: v for k, v in _oracle_sql_static().items() if k in keep}


def _emb_int8_oracle(dim: int = 64) -> str:
    """Programmatic 64-dim SQL twin of int8_quantize_embeddings (the
    doc_simhash_pairs 64-vote pattern): identical bounds, code, and
    reconstruction expressions per dimension, SSE via list_reduce
    (first-element init ≡ the engine's 0.0 init for nonneg terms)."""
    # every operand cast to DOUBLE explicitly: DuckDB's FLOAT−FLOAT
    # stays single-precision, while Spark widens float32 operands to
    # float64 — without the casts the sse drifts in the 9th digit
    mins = ", ".join(f"MIN(embedding[{i}])" for i in range(1, dim + 1))
    maxs = ", ".join(f"MAX(embedding[{i}])" for i in range(1, dim + 1))
    lo, hi, x = ("CAST(b.mn[i] AS DOUBLE)", "CAST(b.mx[i] AS DOUBLE)",
                 "CAST(e.embedding[i] AS DOUBLE)")
    code = (f"CASE WHEN {hi} = {lo} THEN 0 "
            f"ELSE CAST(round(({x} - {lo}) * 255.0 "
            f"/ ({hi} - {lo})) AS INT) END")
    recon = f"({lo} + CAST({code} AS DOUBLE) * ({hi} - {lo}) / 255.0)"
    diff = f"({x} - {recon})"
    return f"""
WITH b AS (
  SELECT [{mins}] AS mn, [{maxs}] AS mx FROM embeddings
)
SELECT e.vec_id,
       [{code} FOR i IN range(1, {dim + 1})] AS codes,
       list_reduce([{diff} * {diff} FOR i IN range(1, {dim + 1})],
                   (a, x) -> a + x) AS sse
FROM embeddings e, b
"""


def _oracle_sql_static() -> dict[str, str]:
    d = _oracle_sql_static_literal()
    # the streaming probe's drained sink equals the one-shot batch probe
    # exactly (pairs are independent of the micro-batch split), so the
    # two queries share one oracle
    d["doc_stream_minhash_probe"] = d["doc_minhash_incremental"]
    # integer state makes the streaming PH final rows equal the batch
    # operator exactly — the two queries share one oracle
    d["ev_stream_page_hinkley"] = d["ev_page_hinkley"]
    d["emb_int8_roundtrip"] = _emb_int8_oracle(64)
    return d


def _oracle_sql_static_literal() -> dict[str, str]:
    return {
        "seq_salted_rollup": _SEQ_SKEW_CTE
        + """
SELECT ['web','books','code','wiki'][(i % 4) + 1] AS source,
       TIMESTAMP '2020-01-01' + ((j*60) // 3600) * INTERVAL 1 HOUR AS tick,
       COUNT(*) AS n_points,
       CAST(SUM(token) AS BIGINT) AS sum_v,
       CAST(MIN(token) AS BIGINT) AS min_v,
       CAST(MAX(token) AS BIGINT) AS max_v
FROM pts GROUP BY (i % 4), (j*60) // 3600
""",
        "seq_reorient_roundtrip": _SEQ_CTE
        + """
SELECT printf('doc%08d', i) AS doc_id,
       CAST(n_tok AS INT) AS n_tok,
       ['web','books','code','wiki'][(i % 4) + 1] AS source,
       CAST(SUM(token) AS BIGINT) AS token_sum,
       CAST(MIN(CASE WHEN j = 0 THEN token END) AS BIGINT) AS tok_first,
       CAST(MIN(CASE WHEN j = n_tok - 1 THEN token END) AS BIGINT) AS tok_last
FROM pts GROUP BY i, n_tok
""",
        "seq_hourly_rollup": _SEQ_CTE
        + """
SELECT printf('doc%08d', i) AS doc_id,
       TIMESTAMP '2020-01-01' + ((j*60) // 3600) * INTERVAL 1 HOUR AS tick,
       COUNT(*) AS n_points,
       CAST(SUM(token) AS BIGINT) AS sum_v,
       CAST(MIN(token) AS BIGINT) AS min_v,
       CAST(MAX(token) AS BIGINT) AS max_v
FROM pts GROUP BY i, (j*60) // 3600
""",
        # the streaming drain is value-identical to the batch hourly
        # rollup BY CONSTRUCTION (sentinel-advanced watermark flushes
        # every real window) — it shares that oracle verbatim
        "seq_stream_hourly": _SEQ_CTE
        + """
SELECT printf('doc%08d', i) AS doc_id,
       TIMESTAMP '2020-01-01' + ((j*60) // 3600) * INTERVAL 1 HOUR AS tick,
       COUNT(*) AS n_points,
       CAST(SUM(token) AS BIGINT) AS sum_v,
       CAST(MIN(token) AS BIGINT) AS min_v,
       CAST(MAX(token) AS BIGINT) AS max_v
FROM pts GROUP BY i, (j*60) // 3600
""",
        "seq_daily_from_partials": _SEQ_CTE
        + """
SELECT printf('doc%08d', i) AS doc_id,
       TIMESTAMP '2020-01-01' AS tick,
       COUNT(*) AS n_points,
       CAST(SUM(token) AS BIGINT) AS sum_v,
       CAST(MIN(token) AS BIGINT) AS min_v,
       CAST(MAX(token) AS BIGINT) AS max_v
FROM pts GROUP BY i
""",
        "seq_gapfill_hourly": _SEQ_CTE
        + """
, hourly AS (
  SELECT i, (j*60) // 3600 AS h, COUNT(*) AS n_points
  FROM pts GROUP BY i, (j*60) // 3600
),
axis AS (
  SELECT unnest(generate_series((SELECT MIN(h) FROM hourly),
                                (SELECT MAX(h) FROM hourly))) AS h
)
SELECT printf('doc%08d', d.i) AS doc_id,
       TIMESTAMP '2020-01-01' + a.h * INTERVAL 1 HOUR AS tick,
       COALESCE(hh.n_points, 0) AS n_points
FROM d CROSS JOIN axis a
LEFT JOIN hourly hh ON hh.i = d.i AND hh.h = a.h
""",
        "seq_collocate_2h": _SEQ_CTE
        + """
, obs AS (
  SELECT i, j*60 AS s, token FROM pts WHERE j % 7 = 3
),
ticks AS (
  SELECT h*7200 AS tick_s,
         lead(h*7200) OVER (ORDER BY h) AS next_s
  FROM (SELECT unnest([0,1,2]) AS h)
),
cand AS (
  SELECT o.i, t.tick_s, t.next_s, MIN(o.s) AS cand_s
  FROM ticks t JOIN obs o ON o.s >= t.tick_s AND o.s - t.tick_s <= 7200
  GROUP BY o.i, t.tick_s, t.next_s
)
SELECT printf('doc%08d', c.i) AS doc_id,
       TIMESTAMP '2020-01-01' + c.tick_s * INTERVAL 1 SECOND AS tick,
       CAST((c.cand_s - c.tick_s) AS BIGINT) * 1000000 AS delta_us,
       CAST(o.token AS BIGINT) AS v
FROM cand c JOIN obs o ON o.i = c.i AND o.s = c.cand_s
WHERE c.next_s IS NULL OR c.cand_s <= c.next_s
""",
        "seq_gorilla_roundtrip": _SEQ_CTE
        + """
SELECT printf('doc%08d', i) AS doc_id,
       TIMESTAMP '2020-01-01' + ((j*60) // 3600) * INTERVAL 1 HOUR AS tick,
       CAST(SUM(token) AS BIGINT) AS sum_v,
       CAST(SUM(token) AS DOUBLE) / COUNT(*) AS avg_v
FROM pts GROUP BY i, (j*60) // 3600
""",
        "seq_preprocess_hook": _SEQ_CTE
        + """
SELECT printf('doc%08d', i) AS doc_id,
       CAST(j AS INT) AS pos,
       round(token - avg(token) OVER (PARTITION BY i), 6) AS centered
FROM pts
""",
        # packing: regenerate the closed-form per-source token stream,
        # chunk every token's global offset, compare per-example facts
        "seq_pack_examples": f"""
WITH d AS (
  SELECT i, (64 + (i % 193)) AS n_tok,
         ['web','books','code','wiki'][CAST(i % 4 AS INT) + 1] AS source
  FROM range({N_SYNTH}) t(i)
),
o AS (
  SELECT i, n_tok, source,
         SUM(n_tok) OVER (PARTITION BY source ORDER BY i
                          ROWS UNBOUNDED PRECEDING) - n_tok AS off
  FROM d
),
pts AS (
  SELECT source, CAST((off + u.j) // 4096 AS BIGINT) AS pack_id,
         ((i*31 + u.j*7) % 50257) AS token
  FROM o, unnest(generate_series(0, n_tok - 1)) AS u(j)
)
SELECT source, pack_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(token) AS BIGINT) AS sum_tok
FROM pts GROUP BY source, pack_id
""",
        "seq_ortho_layout": _SEQ_CTE
        + """
, hourly AS (
  SELECT ['web','books','code','wiki'][(i % 4) + 1] AS source,
         i, (j*60) // 3600 AS h, SUM(token) AS sum_v
  FROM pts GROUP BY 1, 2, 3
),
axis AS (
  SELECT source, COUNT(DISTINCT h) AS n_ticks FROM hourly GROUP BY source
)
SELECT h.source,
       printf('doc%08d', h.i) AS doc_id,
       CAST(a.n_ticks AS INT) AS n_ticks,
       CAST(COUNT(*) AS INT) AS n_obs,
       CAST(SUM(h.sum_v) AS BIGINT) AS sum_values
FROM hourly h JOIN axis a ON a.source = h.source
GROUP BY h.source, h.i, a.n_ticks
""",
        "ev_project_cast": """
SELECT event_id AS eid, event_type AS etype,
       CAST(user_id AS INT) AS user_id,
       CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value
FROM events
""",
        "ev_drop_empty": """
WITH t AS (
  SELECT date_trunc('hour', ts) AS tick,
         COUNT(*) AS n_rows,
         COUNT(CASE WHEN value IS NOT NULL AND NOT isnan(value)
                    THEN 1 END) AS n_valid
  FROM events GROUP BY 1
)
SELECT tick, n_rows, n_valid FROM t WHERE n_valid > 0
""",
        "ev_exact_time_join": """
WITH a AS (
  SELECT date_trunc('hour', ts) AS tick, COUNT(*) AS n_click
  FROM events WHERE event_type = 'click' GROUP BY 1
),
b AS (
  SELECT date_trunc('hour', ts) AS tick, COUNT(*) AS n_purchase
  FROM events WHERE event_type = 'purchase' GROUP BY 1
)
SELECT a.tick, a.n_click, b.n_purchase FROM a JOIN b ON a.tick = b.tick
""",
        "knn_resample_weighted": """
WITH t AS (
  SELECT i AS target_key, CAST(i % 10 AS DOUBLE) AS x,
         CAST(i // 10 AS DOUBLE) AS y
  FROM range(100) r(i)
),
s AS (
  SELECT i AS source_key, (i % 20) * 0.5 AS x, (i // 20) * 0.5 AS y,
         CAST((i * 13) % 101 AS DOUBLE) AS v
  FROM range(400) r(i)
),
pairs AS (
  SELECT t.target_key, s.source_key, s.v,
         sqrt((s.x - t.x)*(s.x - t.x) + (s.y - t.y)*(s.y - t.y)) AS dist,
         row_number() OVER (
           PARTITION BY t.target_key
           ORDER BY sqrt((s.x-t.x)*(s.x-t.x)+(s.y-t.y)*(s.y-t.y)),
                    s.source_key) AS rk
  FROM t JOIN s
    ON sqrt((s.x - t.x)*(s.x - t.x) + (s.y - t.y)*(s.y - t.y)) <= 0.75
),
k AS (
  SELECT *, CAST(round(0.54 + 0.46 * cos(pi() * dist / 0.75), 9)
                 AS DECIMAL(12,9)) AS w
  FROM pairs WHERE rk <= 4
)
SELECT target_key,
       COUNT(*) AS n_neighbours,
       CAST(SUM(CASE WHEN dist = 0 THEN CAST(v AS BIGINT) ELSE 0 END) AS BIGINT) AS v_exact,
       CAST(CAST(SUM(w * CAST(v AS DECIMAL(12,2))) AS DECIMAL(28,11)) AS DOUBLE) AS sum_wv,
       CAST(CAST(SUM(w) AS DECIMAL(20,9)) AS DOUBLE) AS sum_w
FROM k GROUP BY target_key
""",
        "knn_resample_nn": """
WITH t AS (
  SELECT i AS target_key, CAST(i % 10 AS DOUBLE) AS x,
         CAST(i // 10 AS DOUBLE) AS y
  FROM range(100) r(i)
),
s AS (
  SELECT i AS source_key, (i % 20) * 0.5 AS x, (i // 20) * 0.5 AS y,
         (i * 13) % 101 AS v
  FROM range(400) r(i)
),
pairs AS (
  SELECT t.target_key, s.source_key, s.v,
         sqrt((s.x - t.x)*(s.x - t.x) + (s.y - t.y)*(s.y - t.y)) AS dist,
         row_number() OVER (
           PARTITION BY t.target_key
           ORDER BY sqrt((s.x-t.x)*(s.x-t.x)+(s.y-t.y)*(s.y-t.y)),
                    s.source_key) AS rk
  FROM t JOIN s
    ON sqrt((s.x - t.x)*(s.x - t.x) + (s.y - t.y)*(s.y - t.y)) <= 0.75
)
SELECT target_key, dist, CAST(v AS BIGINT) AS v
FROM pairs WHERE rk = 1 AND dist <= 0.25
""",
        # losslessness of the LEARNED tokenizer: whatever merge table
        # training produced, decode(encode(x)) must byte-match the
        # whitespace-normalized lowercased source for every document
        "doc_bpe_roundtrip": """
SELECT doc_id,
       trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS detok_text
FROM documents
""",
        # gap-split sessions: identical lag/cumsum construction, the
        # same double-seconds gap compare (epoch_us/1e6), integer cents
        "ev_sessions": """
WITH p AS (
  SELECT user_id, ts, CAST(round(value * 100) AS BIGINT) AS v
  FROM events
),
f AS (
  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                   OR (epoch_us(ts) / 1000000.0)
                      - (epoch_us(lag(ts) OVER w) / 1000000.0) > 1800
                 THEN 1 ELSE 0 END AS st
  FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT *, SUM(st) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM f
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       CAST(COUNT(v) AS BIGINT) AS n_points,
       CAST(SUM(v) AS BIGINT) AS sum_cents
FROM s GROUP BY user_id, sid
""",
        # OHLC candlestick: arg_min/arg_max on the pre-aggregated
        # per-timestamp series (timestamps unique per group, so the
        # edges are deterministic); integer cents end to end
        "ev_ohlc": """
WITH p AS (
  SELECT event_type, ts,
         SUM(CAST(round(value * 100) AS BIGINT)) AS v
  FROM events GROUP BY 1, 2
)
SELECT event_type,
       CAST(date_trunc('hour', ts) AS TIMESTAMP) AS tick,
       CAST(arg_min(v, ts) AS BIGINT) AS open,
       CAST(MAX(v) AS BIGINT) AS high,
       CAST(MIN(v) AS BIGINT) AS low,
       CAST(arg_max(v, ts) AS BIGINT) AS close,
       CAST(COUNT(v) AS BIGINT) AS n_points,
       CAST(SUM(v) AS BIGINT) AS sum_v
FROM p GROUP BY 1, 2
""",
        # causal rolling z² from exact integer window moments — the
        # numerator/denominator integers are identical in both engines
        # and the single division is IEEE-correctly-rounded, so the
        # double matches byte-for-byte (DuckDB's hugeint intermediates
        # are exact; the casts land on the same values Spark's int64
        # path produces)
        "ev_rolling_zscore": """
WITH h AS (
  SELECT event_type,
         CAST(date_trunc('hour', ts) AS TIMESTAMP) AS tick,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
),
m AS (
  SELECT event_type, tick, n_events,
         COUNT(n_events) OVER w AS c,
         SUM(n_events) OVER w AS s,
         SUM(n_events * n_events) OVER w AS q
  FROM h WINDOW w AS (PARTITION BY event_type ORDER BY tick
                      ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, tick, n_events,
       CASE WHEN c >= 10 AND c * q - s * s > 0
            THEN CAST(sign(c * n_events - s) AS DOUBLE)
                 * (CAST(c * n_events - s AS DOUBLE)
                    * CAST(c * n_events - s AS DOUBLE))
                 / CAST(c * q - s * s AS DOUBLE)
       END AS z2
FROM m
""",
        # LTTB replayed exactly: (1) series with row indices and exact
        # epoch-ms/cent doubles; (2) integer bucket edges (n_out=24 →
        # m=23 edges, 22 interior buckets); (3) per-bucket centroids;
        # (4) best-pick-given-every-possible-previous-pick via one
        # window (areas are correctly-rounded doubles over exact-integer
        # operands — identical in numpy and DuckDB; ties → lowest idx);
        # (5) the sequential dependence as a recursive-CTE pure join;
        # (6) first/last points appended, short series passed through
        "ev_lttb": """
WITH RECURSIVE h AS (
  SELECT event_type,
         CAST(date_trunc('hour', ts) AS TIMESTAMP) AS tick,
         SUM(CAST(round(value * 100) AS BIGINT)) AS v
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT event_type, tick, v,
         row_number() OVER (PARTITION BY event_type ORDER BY tick) - 1
           AS idx,
         COUNT(*) OVER (PARTITION BY event_type) AS n,
         CAST(epoch_ms(tick) AS DOUBLE) AS x,
         CAST(v AS DOUBLE) AS y
  FROM h
),
small AS (SELECT event_type, tick, v FROM r WHERE n <= 24),
big AS (SELECT * FROM r WHERE n > 24),
e AS (
  SELECT s.event_type, s.n, k.k AS k,
         1 + (2 * k.k * (s.n - 2) + 22) // 44 AS edge
  FROM (SELECT DISTINCT event_type, n FROM big) s,
       unnest(generate_series(0, 22)) k(k)
),
bk AS (
  SELECT a.event_type, a.k AS b, a.edge AS lo, b2.edge AS hi
  FROM e a JOIN e b2 ON b2.event_type = a.event_type AND b2.k = a.k + 1
),
cent AS (
  SELECT bk.event_type, bk.b, avg(big.x) AS cx, avg(big.y) AS cy
  FROM bk JOIN big ON big.event_type = bk.event_type
                  AND big.idx >= bk.lo AND big.idx < bk.hi
  GROUP BY 1, 2
),
ctr AS (
  SELECT bk.event_type, bk.b,
         CASE WHEN bk.b <= 20 THEN c.cx ELSE lp.x END AS cx,
         CASE WHEN bk.b <= 20 THEN c.cy ELSE lp.y END AS cy
  FROM bk
  LEFT JOIN cent c ON c.event_type = bk.event_type AND c.b = bk.b + 1
  JOIN (SELECT event_type, x, y FROM big WHERE idx = n - 1) lp
    ON lp.event_type = bk.event_type
),
cand AS (
  SELECT bk.event_type, bk.b, p.idx AS a, p.x AS ax, p.y AS ay
  FROM bk JOIN bk pb ON pb.event_type = bk.event_type
                    AND pb.b = bk.b - 1
       JOIN big p ON p.event_type = bk.event_type
                 AND p.idx >= pb.lo AND p.idx < pb.hi
  UNION ALL
  SELECT bk.event_type, bk.b, p.idx, p.x, p.y
  FROM bk JOIN big p ON p.event_type = bk.event_type AND p.idx = 0
  WHERE bk.b = 0
),
scored AS (
  SELECT c.event_type, c.b, c.a, j.idx AS pick,
         row_number() OVER (
           PARTITION BY c.event_type, c.b, c.a
           ORDER BY abs((c.ax - t.cx) * (j.y - c.ay)
                      - (c.ax - j.x) * (t.cy - c.ay)) DESC,
                    j.idx ASC
         ) AS rk
  FROM cand c
  JOIN ctr t ON t.event_type = c.event_type AND t.b = c.b
  JOIN bk ON bk.event_type = c.event_type AND bk.b = c.b
  JOIN big j ON j.event_type = c.event_type
            AND j.idx >= bk.lo AND j.idx < bk.hi
),
best AS (SELECT event_type, b, a, pick FROM scored WHERE rk = 1),
rec AS (
  SELECT event_type, -1 AS b, 0 AS pick
  FROM (SELECT DISTINCT event_type FROM big) s0
  UNION ALL
  SELECT best.event_type, best.b, best.pick
  FROM rec JOIN best ON best.event_type = rec.event_type
                    AND best.b = rec.b + 1 AND best.a = rec.pick
),
sel AS (
  SELECT event_type, pick AS idx FROM rec
  UNION ALL
  SELECT event_type, n - 1 FROM (SELECT DISTINCT event_type, n FROM big) sl
)
SELECT big.event_type, big.tick, CAST(big.v AS BIGINT) AS v
FROM big JOIN sel ON sel.event_type = big.event_type
                 AND sel.idx = big.idx
UNION ALL
SELECT event_type, tick, CAST(v AS BIGINT) AS v FROM small
""",
        # duplicate-line removal: the identical split → distinct-doc
        # count → anti-join → ordered string_agg construction
        "doc_line_dedup": """
WITH d AS (
  SELECT doc_id,
         'source: ' || source || chr(10) || text || chr(10) ||
         CASE WHEN doc_id % 6 = 0 THEN 'copyright acme corp'
              WHEN doc_id % 3 = 0 THEN 'Copyright ACME Corp'
              ELSE 'id: ' || CAST(doc_id AS VARCHAR) END AS text
  FROM documents
),
l AS (
  SELECT doc_id, u.j AS pos, ls[u.j + 1] AS line,
         lower(trim(ls[u.j + 1])) AS key
  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM d),
       unnest(generate_series(0, len(ls) - 1)) u(j)
),
hot AS (
  SELECT key FROM l WHERE key != ''
  GROUP BY key HAVING COUNT(DISTINCT doc_id) >= 2
)
SELECT l.doc_id,
       COALESCE(string_agg(CASE WHEN h.key IS NULL THEN l.line END,
                           chr(10) ORDER BY l.pos), '') AS text_clean,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN h.key IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_removed
FROM l LEFT JOIN hot h ON l.key = h.key
GROUP BY l.doc_id
""",
        # duplicated-span detection: the identical split → window →
        # corpus count → gaps-and-islands merge construction
        "doc_dup_spans": """
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'),
                     x -> x != '') AS wl
  FROM documents
),
g AS (
  SELECT doc_id, u.j AS start,
         array_to_string(wl[u.j + 1 : u.j + 8], ' ') AS gram
  FROM w, unnest(generate_series(0, len(wl) - 8)) u(j)
  WHERE len(wl) >= 8
),
hot AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2),
dup AS (SELECT g.doc_id, g.start FROM g JOIN hot USING (gram)),
f AS (
  SELECT doc_id, start,
         MAX(start + 7) OVER (
           PARTITION BY doc_id ORDER BY start
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
  FROM dup
),
s AS (
  SELECT doc_id, start,
         SUM(CASE WHEN prev_end IS NULL OR start > prev_end
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY start
                 ROWS UNBOUNDED PRECEDING) AS sid
  FROM f
)
SELECT doc_id,
       CAST(MIN(start) AS BIGINT) AS span_start,
       CAST(MAX(start) + 7 AS BIGINT) AS span_end,
       CAST(COUNT(*) AS BIGINT) AS n_windows
FROM s GROUP BY doc_id, sid
""",
        # reset-aware counter increase: integer arithmetic end to end
        "ev_counter_rate": """
WITH c AS (
  SELECT event_type, ts,
         SUM(CAST(round(value * 100) AS BIGINT)) AS c0
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT event_type, ts,
         SUM(c0) OVER (PARTITION BY event_type ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) % 1000000 AS counter
  FROM c
),
d AS (
  SELECT event_type, ts, counter,
         lag(counter) OVER (PARTITION BY event_type ORDER BY ts) AS prev
  FROM s
)
SELECT event_type,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS tick,
       CAST(SUM(CASE WHEN prev IS NULL THEN NULL
                     WHEN counter >= prev THEN counter - prev
                     ELSE counter END) AS BIGINT) AS increase,
       CAST(COUNT(CASE WHEN prev IS NULL THEN NULL ELSE 1 END) AS BIGINT)
         AS n_deltas
FROM d GROUP BY 1, 2
""",
        # routed rollups: the oracle aggregates RAW events into the same
        # epoch-aligned unix-second bins the router serves from a tier —
        # equality certifies route + bucket arithmetic + partial merges.
        # make_timestamp(µs) keeps both sides TZ-free (Spark session UTC).
        "ev_rollup_routed_6h": """
SELECT event_type,
       make_timestamp(CAST(FLOOR(EPOCH(ts) / 21600) * 21600 * 1000000 AS BIGINT)) AS tick,
       COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_v,
       MIN(value) AS min_v,
       MAX(value) AS max_v
FROM events GROUP BY 1, 2
""",
        "ev_rollup_realtime_6h": """
SELECT event_type,
       make_timestamp(CAST(FLOOR(EPOCH(ts) / 21600) * 21600 * 1000000 AS BIGINT)) AS tick,
       COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_v,
       MIN(value) AS min_v,
       MAX(value) AS max_v
FROM events GROUP BY 1, 2
""",
        "ev_rollup_routed_week": """
SELECT event_type,
       make_timestamp(CAST(FLOOR(EPOCH(ts) / 604800) * 604800 * 1000000 AS BIGINT)) AS tick,
       COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_v,
       MIN(value) AS min_v,
       MAX(value) AS max_v
FROM events GROUP BY 1, 2
""",
        # lexical diversity: the oracle takes the natural two-aggregate
        # road (unnest → word counts → per-doc rollup) that the engine's
        # in-row sorted-run formulation avoids; exact int64 equality plus
        # two single-division doubles.
        "doc_lexical_diversity": """
WITH w AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS word
  FROM documents
),
c AS (
  SELECT doc_id, word, COUNT(*) AS n
  FROM w WHERE word != '' GROUP BY 1, 2
),
agg AS (
  SELECT doc_id,
         CAST(SUM(n) AS BIGINT) AS n_tok,
         COUNT(*) AS n_types,
         CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
  FROM c GROUP BY 1
)
SELECT d.doc_id,
       COALESCE(a.n_tok, 0) AS n_tok,
       COALESCE(a.n_types, 0) AS n_types,
       COALESCE(a.n_hapax, 0) AS n_hapax,
       CASE WHEN COALESCE(a.n_tok, 0) = 0 THEN NULL
            ELSE CAST(a.n_types AS DOUBLE) / a.n_tok END AS ttr,
       CASE WHEN COALESCE(a.n_tok, 0) = 0 THEN NULL
            ELSE CAST(a.n_hapax AS DOUBLE) / a.n_tok END AS hapax_share
FROM documents d LEFT JOIN agg a USING (doc_id)
""",
        # trending: identical count → adjacency-lag → smoothed-division →
        # rank construction; the lift is one IEEE division of exact
        # int64s so rows AND row_numbers must byte-match
        "seq_trending_tokens": _SEQ_CTE
        + """
, c AS (
  SELECT token, (j*60) // 3600 AS b, COUNT(*) AS c_now
  FROM pts GROUP BY token, (j*60) // 3600
),
l AS (
  SELECT token, b, c_now,
         CASE WHEN lag(b) OVER (PARTITION BY token ORDER BY b) = b - 1
              THEN lag(c_now) OVER (PARTITION BY token ORDER BY b)
              ELSE 0 END AS c_prev
  FROM c
),
r AS (
  SELECT token, b, c_now, c_prev,
         CAST(c_now + 1 AS DOUBLE) / CAST(c_prev + 1 AS DOUBLE) AS lift
  FROM l
),
rk AS (
  SELECT *,
         row_number() OVER (PARTITION BY b ORDER BY lift DESC, token) AS rn
  FROM r
)
SELECT TIMESTAMP '2020-01-01' + b * INTERVAL 1 HOUR AS tick,
       CAST(token AS BIGINT) AS token,
       c_now, c_prev, lift, CAST(rn AS INT) AS rn
FROM rk WHERE rn <= 25
""",
        # the sampler's contract IS the naive global window the engine
        # avoids executing: identical md5 strings, identical tiebreak
        "doc_sample_bottomk": """
WITH t AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(doc_id || chr(31) || 'r5'), doc_id) AS rn
  FROM documents
)
SELECT doc_id, source, n_chars FROM t WHERE rn <= 10
""",
        # trapezoidal TWA mirrored in the same exact integer arithmetic
        "ev_time_weighted": """
WITH c AS (
  SELECT event_type, ts,
         SUM(CAST(round(value * 100) AS BIGINT)) AS vint
  FROM events GROUP BY 1, 2
),
seg AS (
  SELECT event_type, ts, vint,
         date_trunc('day', ts) AS tick,
         lead(vint) OVER w AS nv,
         lead(ts) OVER w AS nt
  FROM c
  WINDOW w AS (PARTITION BY event_type ORDER BY ts)
),
g AS (
  SELECT event_type, CAST(tick AS TIMESTAMP) AS tick,
         SUM(CASE WHEN date_trunc('day', nt) = tick
                  THEN (vint + nv) * (epoch_us(nt) - epoch_us(ts)) END)
           AS sa2,
         SUM(CASE WHEN date_trunc('day', nt) = tick
                  THEN epoch_us(nt) - epoch_us(ts) END) AS st,
         SUM(vint) AS sv,
         COUNT(vint) AS n_points
  FROM seg GROUP BY 1, 2
)
SELECT event_type, tick,
       CASE WHEN st IS NOT NULL AND st > 0
            THEN (sa2 / (2.0 * 100)) / st
            ELSE (sv / CAST(100 AS DOUBLE)) / n_points END AS twa,
       CAST(n_points AS BIGINT) AS n_points
FROM g
""",
        # LOCF + linear interpolation over the densified hourly frame;
        # identical arithmetic order both sides, rounded to 6 decimals
        "ev_gapfill_locf": """
WITH h AS (
  SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS tick,
         (SUM(CAST(round(value * 100) AS BIGINT)) / 100.0)
           / COUNT(value) AS v
  FROM events GROUP BY 1, 2
),
b AS (SELECT min(tick) AS lo, max(tick) AS hi FROM h),
axis AS (
  SELECT unnest(generate_series(
    (SELECT lo FROM b), (SELECT hi FROM b), INTERVAL 1 HOUR)) AS tick
),
dense AS (
  SELECT k.event_type, a.tick
  FROM (SELECT DISTINCT event_type FROM h) k, axis a
),
j AS (
  SELECT d.event_type, d.tick, h.v
  FROM dense d LEFT JOIN h ON d.event_type = h.event_type
                           AND d.tick = h.tick
),
x AS (
  SELECT *, epoch(tick) AS t,
    last_value(v IGNORE NULLS) OVER w_p AS pv,
    last_value(CASE WHEN v IS NOT NULL THEN epoch(tick) END IGNORE NULLS)
      OVER w_p AS pt,
    first_value(v IGNORE NULLS) OVER w_f AS nv,
    first_value(CASE WHEN v IS NOT NULL THEN epoch(tick) END IGNORE NULLS)
      OVER w_f AS nt
  FROM j
  WINDOW w_p AS (PARTITION BY event_type ORDER BY tick
                 ROWS UNBOUNDED PRECEDING),
         w_f AS (PARTITION BY event_type ORDER BY tick
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, tick,
       round(pv, 6) AS v_locf,
       round(CASE WHEN v IS NOT NULL THEN v
                  ELSE pv + (nv - pv) * (t - pt) / (nt - pt) END, 6)
         AS v_interp
FROM x
""",
        # exact top-k incl. the MG self-certification flag: guaranteed
        # iff the kth count exceeds n_group/m (m=256 in the query)
        "doc_top_words": """
WITH w AS (
  SELECT lang, source,
         unnest(regexp_split_to_array(lower(text), '\\s+')) AS word
  FROM documents
),
c AS (
  SELECT lang, source, word, COUNT(*) AS n
  FROM w WHERE word != '' GROUP BY 1, 2, 3
),
t AS (SELECT lang, source, SUM(n) AS total FROM c GROUP BY 1, 2),
r AS (
  SELECT c.*, ROW_NUMBER() OVER (
           PARTITION BY lang, source ORDER BY n DESC, word
         ) AS rnk
  FROM c QUALIFY rnk <= 5
)
SELECT r.lang, r.source, r.word, r.n, CAST(r.rnk AS INT) AS rnk,
       (COUNT(*) OVER (PARTITION BY r.lang, r.source) >= 5)
       AND (MIN(r.n) OVER (PARTITION BY r.lang, r.source) * 256) > t.total
         AS guaranteed
FROM r JOIN t USING (lang, source)
""",
        "ev_hourly_rollup": """
SELECT event_type,
       date_trunc('hour', ts) AS tick,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
       MIN(value) AS min_v,
       MAX(value) AS max_v
FROM events GROUP BY 1, 2
""",
        "ev_daily_from_hourly": """
SELECT event_type,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS tick,
       COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_v,
       MIN(value) AS min_v,
       MAX(value) AS max_v
FROM events GROUP BY 1, 2
""",
        "ev_autocorr": """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS tick, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
),
axis AS (
  SELECT unnest(generate_series((SELECT MIN(tick) FROM hourly),
                                (SELECT MAX(tick) FROM hourly),
                                INTERVAL 1 HOUR)) AS tick
),
keys AS (SELECT DISTINCT event_type FROM hourly),
dense AS (
  SELECT k.event_type, a.tick,
         CAST(COALESCE(h.n_events, 0) AS BIGINT) AS x
  FROM keys k CROSS JOIN axis a
  LEFT JOIN hourly h ON h.event_type = k.event_type AND h.tick = a.tick
),
pairs AS (
  SELECT event_type, 1 AS lag, x,
         lag(x, 1) OVER (PARTITION BY event_type ORDER BY tick) AS y
  FROM dense
  UNION ALL
  SELECT event_type, 2 AS lag, x,
         lag(x, 2) OVER (PARTITION BY event_type ORDER BY tick) AS y
  FROM dense
  UNION ALL
  SELECT event_type, 24 AS lag, x,
         lag(x, 24) OVER (PARTITION BY event_type ORDER BY tick) AS y
  FROM dense
),
moments AS (
  SELECT event_type, lag, COUNT(*) AS n_pairs,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy,
         SUM(x*x) AS sxx, SUM(y*y) AS syy
  FROM pairs WHERE y IS NOT NULL GROUP BY 1, 2
)
SELECT event_type, lag, n_pairs,
       CASE WHEN (n_pairs*sxx - sx*sx) > 0 AND (n_pairs*syy - sy*sy) > 0
            THEN CAST(n_pairs*sxy - sx*sy AS DOUBLE)
                 / (sqrt(CAST(n_pairs*sxx - sx*sx AS DOUBLE))
                    * sqrt(CAST(n_pairs*syy - sy*sy AS DOUBLE)))
       END AS acf
FROM moments
""",
        # the oracle is the NAIVE theta-join the operator exists to
        # avoid — bucketing must be invisible in the result multiset
        "ev_interarrival_cv": """
WITH p AS (
  SELECT event_type, epoch_us(ts) // 1000000 AS sec, ts, event_id
  FROM events
),
g AS (
  SELECT event_type,
         sec - LAG(sec) OVER (PARTITION BY event_type
                              ORDER BY ts, event_id) AS g
  FROM p
),
a AS (
  SELECT event_type, COUNT(*) AS n_gaps, SUM(g) AS s1, SUM(g * g) AS s2
  FROM g WHERE g IS NOT NULL GROUP BY 1
)
SELECT event_type, CAST(n_gaps AS BIGINT) AS n_gaps,
       CAST(s1 AS BIGINT) AS sum_gap_s, CAST(s2 AS BIGINT) AS sum_gap_sq,
       CASE WHEN n_gaps > 1 AND s1 > 0 THEN
         CAST(n_gaps * s2 - s1 * s1 AS DOUBLE) / CAST(s1 * s1 AS DOUBLE)
       END AS cv2
FROM a
""",
        "ev_equidepth_profile": """
WITH p AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
         ts, event_id
  FROM events
),
t AS (
  SELECT event_type, cents,
         NTILE(4) OVER (PARTITION BY event_type
                        ORDER BY cents, ts, event_id) AS tile
  FROM p
)
SELECT event_type, tile, CAST(COUNT(*) AS BIGINT) AS n,
       MIN(cents) AS min_v, MAX(cents) AS max_v,
       CAST(SUM(cents) AS BIGINT) AS sum_v
FROM t GROUP BY 1, 2
""",
        "ev_benford": """
WITH p AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
d AS (
  SELECT event_type,
         CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INT) AS digit
  FROM p WHERE cents > 0
),
c AS (
  SELECT event_type, digit, CAST(COUNT(*) AS BIGINT) AS n
  FROM d GROUP BY 1, 2
)
SELECT event_type, digit, n,
       CAST(n AS DOUBLE)
       / CAST(SUM(n) OVER (PARTITION BY event_type) AS DOUBLE) AS share
FROM c
""",
        "ev_allan_variance": """
WITH pts AS (
  SELECT event_type, epoch_us(ts) // 1000000 AS sec FROM events
),
tagged AS (
  SELECT event_type, t.tau, sec // t.tau AS b
  FROM pts CROSS JOIN (VALUES (3600), (7200), (21600)) t(tau)
),
c AS (
  SELECT event_type, tau, b, CAST(COUNT(*) AS BIGINT) AS c
  FROM tagged GROUP BY 1, 2, 3
),
l AS (
  SELECT event_type, tau, b, c,
         LAG(b) OVER (PARTITION BY event_type, tau ORDER BY b) AS pb,
         LAG(c) OVER (PARTITION BY event_type, tau ORDER BY b) AS pc
  FROM c
),
s AS (
  SELECT event_type, tau, b, c,
         CASE WHEN pb IS NULL THEN 0
              WHEN b - pb = 1 THEN (c - pc) * (c - pc)
              ELSE pc * pc + c * c END AS sq
  FROM l
)
SELECT event_type, CAST(tau AS BIGINT) AS tau,
       CAST(MAX(b) - MIN(b) + 1 AS BIGINT) AS n_buckets,
       CAST(SUM(sq) AS BIGINT) AS diff_sq_sum,
       CASE WHEN MAX(b) - MIN(b) + 1 > 1 THEN
         CAST(SUM(sq) AS DOUBLE)
         / (2.0 * CAST(MAX(b) - MIN(b) AS DOUBLE))
       END AS allan_var
FROM s GROUP BY 1, 2
""",
        "ev_spearman_hourly": """
WITH h AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS x,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY event_type, date_trunc('hour', ts)
),
r AS (
  SELECT event_type,
         2 * RANK() OVER (PARTITION BY event_type ORDER BY x)
           + COUNT(*) OVER (PARTITION BY event_type, x) - 1 AS rx,
         2 * RANK() OVER (PARTITION BY event_type ORDER BY y)
           + COUNT(*) OVER (PARTITION BY event_type, y) - 1 AS ry
  FROM h
),
a AS (
  SELECT event_type, COUNT(*) AS n_pairs,
         SUM(rx) AS sx, SUM(ry) AS sy, SUM(rx * ry) AS sxy,
         SUM(rx * rx) AS sxx, SUM(ry * ry) AS syy
  FROM r GROUP BY 1
)
SELECT event_type, CAST(n_pairs AS BIGINT) AS n_pairs,
       CASE WHEN (n_pairs * sxx - sx * sx) > 0
             AND (n_pairs * syy - sy * sy) > 0 THEN
         CAST(n_pairs * sxy - sx * sy AS DOUBLE)
         / (sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE))
            * sqrt(CAST(n_pairs * syy - sy * sy AS DOUBLE)))
       END AS spearman_rho
FROM a
""",
        "ev_max_drawdown": """
WITH p AS (
  SELECT event_type, ts, event_id,
         CAST(round(value * 100) AS BIGINT) - 500 AS flow
  FROM events
),
c AS (
  SELECT event_type, ts, event_id, flow,
         SUM(flow) OVER (PARTITION BY event_type ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS cum
  FROM p
),
m AS (
  SELECT event_type, flow, cum,
         MAX(cum) OVER (PARTITION BY event_type ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS peak
  FROM c
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(SUM(flow) AS BIGINT) AS final_v,
       CAST(MAX(cum) AS BIGINT) AS peak_v,
       CAST(MAX(peak - cum) AS BIGINT) AS max_drawdown
FROM m GROUP BY 1
""",
        "doc_token_gini": """
WITH dn AS (
  SELECT source, doc_id,
         CAST(len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                              x -> x != '')) AS BIGINT) AS nt
  FROM documents
),
r AS (
  SELECT source, nt,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY nt, doc_id) AS i
  FROM dn
),
a AS (
  SELECT source, COUNT(*) AS n_docs, SUM(nt) AS total_w,
         SUM(i * nt) AS six
  FROM r GROUP BY 1
)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(total_w AS BIGINT) AS total_w,
       CASE WHEN n_docs > 1 AND total_w > 0 THEN
         CAST(2 * six - (n_docs + 1) * total_w AS DOUBLE)
         / CAST(n_docs * total_w AS DOUBLE)
       END AS gini
FROM a
""",
        "doc_systematic_sample": """
WITH dn AS (
  SELECT source, doc_id,
         CAST(len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                              x -> x != '')) AS BIGINT) AS n_tok
  FROM documents
),
c AS (
  SELECT source, doc_id, n_tok,
         SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) - n_tok AS start
  FROM dn
),
k AS (
  SELECT source, doc_id, n_tok, start,
         (start + 499) // 500 AS grid_k
  FROM c
)
SELECT source, doc_id, n_tok,
       CAST(start AS BIGINT) AS start, CAST(grid_k AS BIGINT) AS grid_k
FROM k WHERE grid_k * 500 < start + n_tok
""",
        "doc_oov_rate": """
WITH w AS (
  SELECT source,
         unnest(regexp_split_to_array(lower(text), '\\s+')) AS word
  FROM documents
),
ww AS (SELECT source, word FROM w WHERE word != ''),
c AS (SELECT word, COUNT(*) AS n FROM ww GROUP BY 1),
v AS (
  SELECT word FROM c ORDER BY n DESC, word LIMIT 500
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov,
       CASE WHEN COUNT(*) > 0 THEN
         CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE)
       END AS oov_rate
FROM ww LEFT JOIN v ON ww.word = v.word
GROUP BY 1
""",
        "ev_interval_coverage": """
WITH iv AS (
  SELECT user_id % 8 AS grp, epoch_us(ts) AS s,
         epoch_us(ts + INTERVAL 2 HOUR) AS e
  FROM events WHERE event_type = 'error'
),
m AS (
  SELECT grp, s, e,
         max(e) OVER (PARTITION BY grp ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS pe
  FROM iv
),
cov AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_intervals,
         CAST(SUM(GREATEST(0, e - GREATEST(s, COALESCE(pe, s))))
              AS BIGINT) AS covered_us
  FROM m GROUP BY 1
),
ed AS (
  SELECT grp, s AS t, 1 AS d FROM iv
  UNION ALL
  SELECT grp, e AS t, -1 AS d FROM iv
),
sw AS (
  SELECT grp, SUM(d) OVER (PARTITION BY grp ORDER BY t, d
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS depth
  FROM ed
),
mc AS (
  SELECT grp, CAST(MAX(depth) AS INT) AS max_concurrency FROM sw GROUP BY 1
)
SELECT cov.grp, n_intervals, covered_us, max_concurrency
FROM cov JOIN mc USING (grp)
""",
        "ev_trimmed_daily": """
WITH p AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         CAST(round(value * 100) AS BIGINT) AS cents, ts, event_id
  FROM events
),
r AS (
  SELECT event_type, day, cents,
         ROW_NUMBER() OVER (PARTITION BY event_type, day
                            ORDER BY cents, ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type, day) AS n
  FROM p
)
SELECT event_type, day,
       CAST(MAX(n) AS BIGINT) AS n_total,
       CAST(COUNT(CASE WHEN rn > FLOOR(n * 0.1)
                        AND rn <= n - FLOOR(n * 0.1)
                       THEN 1 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN rn > FLOOR(n * 0.1)
                      AND rn <= n - FLOOR(n * 0.1)
                     THEN cents END) AS BIGINT) AS sum_kept,
       MIN(CASE WHEN rn > FLOOR(n * 0.1)
                 AND rn <= n - FLOOR(n * 0.1)
                THEN cents END) AS min_kept,
       MAX(CASE WHEN rn > FLOOR(n * 0.1)
                 AND rn <= n - FLOOR(n * 0.1)
                THEN cents END) AS max_kept
FROM r GROUP BY 1, 2
""",
        "ev_interval_join": """
WITH iv AS (
  SELECT event_id AS iid, user_id % 8 AS grp, ts AS start_ts,
         ts + INTERVAL 2 HOUR AS end_ts
  FROM events WHERE event_type = 'error'
),
p AS (
  SELECT user_id % 8 AS grp, ts,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type IN ('click', 'view')
)
SELECT iv.iid, iv.grp,
       CAST(COUNT(*) AS BIGINT) AS n_in,
       CAST(SUM(p.cents) AS BIGINT) AS sum_cents
FROM iv JOIN p
  ON p.grp = iv.grp AND p.ts >= iv.start_ts AND p.ts < iv.end_ts
GROUP BY 1, 2
""",
        # struct min/max carry the same lexicographic tie rules as
        # Spark's; UNION (set semantics) is the point-set dedup
        "ev_m4": """
WITH p AS (
  SELECT event_type, ts,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY 1, 2
),
b AS (
  SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS tick,
         min({'ts': ts, 'v': v}) AS s_first,
         max({'ts': ts, 'v': v}) AS s_last,
         min({'v': v, 'ts': ts}) AS s_min,
         max({'v': v, 'ts': ts}) AS s_max
  FROM p GROUP BY 1, 2
)
SELECT event_type, tick, (s_first).ts AS ts, (s_first).v AS v FROM b
UNION
SELECT event_type, tick, (s_last).ts, (s_last).v FROM b
UNION
SELECT event_type, tick, (s_min).ts, (s_min).v FROM b
UNION
SELECT event_type, tick, (s_max).ts, (s_max).v FROM b
""",
        # both window sums are exact int64 over the dense grid; shift is
        # one IEEE division by 24.0 → byte-stable, and is_peak compares
        # those identical doubles
        "ev_changepoint": """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS tick, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
),
axis AS (
  SELECT unnest(generate_series((SELECT MIN(tick) FROM hourly),
                                (SELECT MAX(tick) FROM hourly),
                                INTERVAL 1 HOUR)) AS tick
),
keys AS (SELECT DISTINCT event_type FROM hourly),
dense AS (
  SELECT k.event_type, CAST(a.tick AS TIMESTAMP) AS tick,
         CAST(COALESCE(h.n_events, 0) AS BIGINT) AS n_events
  FROM keys k CROSS JOIN axis a
  LEFT JOIN hourly h ON h.event_type = k.event_type AND h.tick = a.tick
),
scored AS (
  SELECT event_type, tick, n_events,
         CASE WHEN COUNT(*) OVER wl = 24 AND COUNT(*) OVER wr = 24
              THEN CAST(SUM(n_events) OVER wr
                        - SUM(n_events) OVER wl AS DOUBLE) / 24.0
         END AS shift
  FROM dense
  WINDOW wl AS (PARTITION BY event_type ORDER BY tick
                ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING),
         wr AS (PARTITION BY event_type ORDER BY tick
                ROWS BETWEEN CURRENT ROW AND 23 FOLLOWING)
)
SELECT event_type, tick, n_events, shift,
       (shift IS NOT NULL AND abs(shift) >=
        MAX(abs(shift)) OVER (PARTITION BY event_type ORDER BY tick
                              ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING))
         AS is_peak
FROM scored
""",
        # bin counts exact int64; smoothed frequencies one IEEE division
        # each; cross-bin sum an ORDERED left fold (list_reduce ↔
        # F.aggregate) — terms are nonnegative so 0.0-init vs
        # first-element-init folds agree bit-for-bit
        "ev_drift_psi": """
WITH b AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS slice,
         LEAST(GREATEST(CAST(floor((value - 0.0) / 25.0) AS INT), 0), 19)
           AS bin,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2, 3
),
ks AS (SELECT DISTINCT event_type, slice FROM b),
grid AS (
  SELECT ks.event_type, ks.slice, i.bin, COALESCE(b.c, 0) AS c
  FROM ks CROSS JOIN (SELECT unnest(range(20)) AS bin) i
  LEFT JOIN b ON b.event_type = ks.event_type
             AND b.slice = ks.slice AND b.bin = i.bin
),
vec AS (
  SELECT event_type, slice, list(c ORDER BY bin) AS v,
         CAST(SUM(c) AS BIGINT) AS n_cur
  FROM grid GROUP BY 1, 2
),
pair AS (
  SELECT event_type, slice, v, n_cur,
         lag(v) OVER (PARTITION BY event_type ORDER BY slice) AS pv,
         lag(n_cur) OVER (PARTITION BY event_type ORDER BY slice) AS n_ref
  FROM vec
)
SELECT event_type, slice, n_cur, n_ref,
  CASE WHEN n_ref IS NOT NULL THEN
    list_reduce(
      list_transform(range(20), i ->
        ((CAST(v[i + 1] AS DOUBLE) + 0.5)
           / (CAST(n_cur AS DOUBLE) + 10.0)
         - (CAST(pv[i + 1] AS DOUBLE) + 0.5)
           / (CAST(n_ref AS DOUBLE) + 10.0))
        * ln(((CAST(v[i + 1] AS DOUBLE) + 0.5)
                / (CAST(n_cur AS DOUBLE) + 10.0))
             / ((CAST(pv[i + 1] AS DOUBLE) + 0.5)
                / (CAST(n_ref AS DOUBLE) + 10.0)))),
      (a, b) -> a + b)
  END AS psi
FROM pair
""",
        # exact interpolated median of int64 counts is a dyadic
        # rational — quantile_cont ↔ percentile parity over the same
        # row frame (edge rows keep their shrunken frame in both)
        "ev_rolling_median": """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS tick, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
),
axis AS (
  SELECT unnest(generate_series((SELECT MIN(tick) FROM hourly),
                                (SELECT MAX(tick) FROM hourly),
                                INTERVAL 1 HOUR)) AS tick
),
keys AS (SELECT DISTINCT event_type FROM hourly),
dense AS (
  SELECT k.event_type, CAST(a.tick AS TIMESTAMP) AS tick,
         CAST(COALESCE(h.n_events, 0) AS BIGINT) AS n_events
  FROM keys k CROSS JOIN axis a
  LEFT JOIN hourly h ON h.event_type = k.event_type AND h.tick = a.tick
)
SELECT event_type, tick, n_events,
       quantile_cont(n_events, 0.5) OVER (
         PARTITION BY event_type ORDER BY tick
         ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS med
FROM dense
""",
        # median n.0/n.5, deviations halves, MAD quarters — all dyadic
        # rationals; 3·MAD and the compare are exact; zero-MAD series
        # emit NULL flags
        "ev_mad_outliers": """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS tick, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
),
axis AS (
  SELECT unnest(generate_series((SELECT MIN(tick) FROM hourly),
                                (SELECT MAX(tick) FROM hourly),
                                INTERVAL 1 HOUR)) AS tick
),
keys AS (SELECT DISTINCT event_type FROM hourly),
dense AS (
  SELECT k.event_type, CAST(a.tick AS TIMESTAMP) AS tick,
         CAST(COALESCE(h.n_events, 0) AS BIGINT) AS n_events
  FROM keys k CROSS JOIN axis a
  LEFT JOIN hourly h ON h.event_type = k.event_type AND h.tick = a.tick
),
med AS (
  SELECT event_type, quantile_cont(n_events, 0.5) AS med
  FROM dense GROUP BY 1
),
dev AS (
  SELECT d.event_type, d.tick, d.n_events, m.med,
         abs(CAST(d.n_events AS DOUBLE) - m.med) AS dev
  FROM dense d JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, quantile_cont(dev, 0.5) AS mad FROM dev GROUP BY 1
)
SELECT dev.event_type, dev.tick, dev.n_events, dev.med, dev.dev, mad.mad,
       CASE WHEN mad.mad > 0 THEN dev.dev > 3 * mad.mad END AS is_outlier
FROM dev JOIN mad USING (event_type)
""",
        # both series dense on the SAME global axis, so lag-then-join
        # (engine) ≡ join-then-lag (oracle); moments exact int64, final
        # value 3 IEEE ops — the autocorr certification, cross-series
        "ev_lag_corr": """
WITH hourly AS (
  SELECT user_id % 4 AS grp, event_type,
         date_trunc('hour', ts) AS tick, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2, 3
),
axis AS (
  SELECT unnest(generate_series((SELECT MIN(tick) FROM hourly),
                                (SELECT MAX(tick) FROM hourly),
                                INTERVAL 1 HOUR)) AS tick
),
keys AS (SELECT DISTINCT grp, event_type FROM hourly),
dense AS (
  SELECT k.grp, k.event_type, a.tick,
         CAST(COALESCE(h.n_events, 0) AS BIGINT) AS v
  FROM keys k CROSS JOIN axis a
  LEFT JOIN hourly h ON h.grp = k.grp AND h.event_type = k.event_type
                    AND h.tick = a.tick
),
x AS (SELECT grp, tick, v AS x FROM dense WHERE event_type = 'click'),
y AS (SELECT grp, tick, v AS y0 FROM dense WHERE event_type = 'error'),
j AS (SELECT x.grp, x.tick, x.x, y.y0 FROM x JOIN y USING (grp, tick)),
pairs AS (
  SELECT grp, 0 AS lag, x, y0 AS y FROM j
  UNION ALL
  SELECT grp, 1 AS lag, x,
         lag(y0, 1) OVER (PARTITION BY grp ORDER BY tick) AS y FROM j
  UNION ALL
  SELECT grp, 24 AS lag, x,
         lag(y0, 24) OVER (PARTITION BY grp ORDER BY tick) AS y FROM j
),
m AS (
  SELECT grp, lag, COUNT(*) AS n_pairs,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy,
         SUM(x*x) AS sxx, SUM(y*y) AS syy
  FROM pairs WHERE y IS NOT NULL GROUP BY 1, 2
)
SELECT grp, CAST(lag AS INT) AS lag, n_pairs,
       CASE WHEN (n_pairs*sxx - sx*sx) > 0 AND (n_pairs*syy - sy*sy) > 0
            THEN CAST(n_pairs*sxy - sx*sy AS DOUBLE)
                 / (sqrt(CAST(n_pairs*sxx - sx*sx AS DOUBLE))
                    * sqrt(CAST(n_pairs*syy - sy*sy AS DOUBLE)))
       END AS xcf
FROM m
""",
        # weekday ↔ isodow−1 (Monday=0); the profile mean is ONE IEEE
        # division of exact int64s and the residual one subtraction of
        # identical doubles
        "ev_seasonal_residual": """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS tick, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
),
axis AS (
  SELECT unnest(generate_series((SELECT MIN(tick) FROM hourly),
                                (SELECT MAX(tick) FROM hourly),
                                INTERVAL 1 HOUR)) AS tick
),
keys AS (SELECT DISTINCT event_type FROM hourly),
dense AS (
  SELECT k.event_type, CAST(a.tick AS TIMESTAMP) AS tick,
         CAST(COALESCE(h.n_events, 0) AS BIGINT) AS n_events
  FROM keys k CROSS JOIN axis a
  LEFT JOIN hourly h ON h.event_type = k.event_type AND h.tick = a.tick
),
g AS (
  SELECT event_type, tick, n_events,
         CAST(isodow(tick) - 1 AS INT) AS dow,
         CAST(hour(tick) AS INT) AS hod
  FROM dense
),
prof AS (
  SELECT event_type, dow, hod,
         CAST(SUM(n_events) AS DOUBLE) / COUNT(*) AS mean_v
  FROM g GROUP BY 1, 2, 3
)
SELECT g.event_type, g.tick, g.n_events, g.dow, g.hod, p.mean_v,
       CAST(g.n_events AS DOUBLE) - p.mean_v AS resid
FROM g JOIN prof p USING (event_type, dow, hod)
""",
        # frame median n.0/n.5, deviations halves, deviation-array
        # median quarters — dyadic rationals, index-PICKED identically;
        # list() over the ordered frame feeds the same sort both sides
        "ev_hampel": """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS tick, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
),
axis AS (
  SELECT unnest(generate_series((SELECT MIN(tick) FROM hourly),
                                (SELECT MAX(tick) FROM hourly),
                                INTERVAL 1 HOUR)) AS tick
),
keys AS (SELECT DISTINCT event_type FROM hourly),
dense AS (
  SELECT k.event_type, CAST(a.tick AS TIMESTAMP) AS tick,
         CAST(COALESCE(h.n_events, 0) AS BIGINT) AS n_events
  FROM keys k CROSS JOIN axis a
  LEFT JOIN hourly h ON h.event_type = k.event_type AND h.tick = a.tick
),
b AS (
  SELECT event_type, tick, n_events,
         quantile_cont(n_events, 0.5) OVER w AS med,
         list(n_events) OVER w AS arr
  FROM dense
  WINDOW w AS (PARTITION BY event_type ORDER BY tick
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
c AS (
  SELECT event_type, tick, n_events, med,
         list_sort(list_transform(arr,
                                  e -> abs(CAST(e AS DOUBLE) - med))) AS s
  FROM b
),
d AS (
  SELECT event_type, tick, n_events, med,
         CASE WHEN len(s) % 2 = 1
              THEN s[CAST((len(s) + 1) / 2 AS INT)]
              ELSE (s[CAST(len(s) / 2 AS INT)]
                    + s[CAST(len(s) / 2 AS INT) + 1]) / 2
         END AS mad
  FROM c
)
SELECT event_type, tick, n_events, med, mad,
       CASE WHEN mad > 0
            THEN abs(CAST(n_events AS DOUBLE) - med) > 3 * mad
       END AS is_spike,
       CASE WHEN mad > 0 AND abs(CAST(n_events AS DOUBLE) - med) > 3 * mad
            THEN med ELSE CAST(n_events AS DOUBLE)
       END AS repaired
FROM d
""",
        # the ev_hampel certification over the graft's token payload:
        # window median / MAD of int64 token values, index-picked
        "seq_token_hampel": _SEQ_CTE
        + """,
b AS (
  SELECT printf('doc%08d', i) AS doc_id,
         TIMESTAMP '2020-01-01' + j * INTERVAL 60 SECOND AS ts,
         CAST(token AS BIGINT) AS token,
         quantile_cont(token, 0.5) OVER w AS med,
         list(token) OVER w AS arr
  FROM pts
  WINDOW w AS (PARTITION BY i ORDER BY j
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
c AS (
  SELECT doc_id, ts, token, med,
         list_sort(list_transform(arr,
                                  e -> abs(CAST(e AS DOUBLE) - med))) AS s
  FROM b
),
d2 AS (
  SELECT doc_id, ts, token, med,
         CASE WHEN len(s) % 2 = 1
              THEN s[CAST((len(s) + 1) / 2 AS INT)]
              ELSE (s[CAST(len(s) / 2 AS INT)]
                    + s[CAST(len(s) / 2 AS INT) + 1]) / 2
         END AS mad
  FROM c
)
SELECT doc_id, ts, token, med, mad,
       CASE WHEN mad > 0
            THEN abs(CAST(token AS DOUBLE) - med) > 3 * mad
       END AS is_spike,
       CASE WHEN mad > 0 AND abs(CAST(token AS DOUBLE) - med) > 3 * mad
            THEN med ELSE CAST(token AS DOUBLE)
       END AS repaired
FROM d2
""",
        # five int64 frame sums on one window spec; per-row corr is 3
        # IEEE ops; partial windows (n_w < 48) emit NULL in both
        "ev_rolling_corr": """
WITH hourly AS (
  SELECT user_id % 4 AS grp, event_type,
         date_trunc('hour', ts) AS tick, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2, 3
),
axis AS (
  SELECT unnest(generate_series((SELECT MIN(tick) FROM hourly),
                                (SELECT MAX(tick) FROM hourly),
                                INTERVAL 1 HOUR)) AS tick
),
keys AS (SELECT DISTINCT grp, event_type FROM hourly),
dense AS (
  SELECT k.grp, k.event_type, CAST(a.tick AS TIMESTAMP) AS tick,
         CAST(COALESCE(h.n_events, 0) AS BIGINT) AS v
  FROM keys k CROSS JOIN axis a
  LEFT JOIN hourly h ON h.grp = k.grp AND h.event_type = k.event_type
                    AND h.tick = a.tick
),
x AS (SELECT grp, tick, v AS x FROM dense WHERE event_type = 'click'),
y AS (SELECT grp, tick, v AS y FROM dense WHERE event_type = 'error'),
j AS (SELECT x.grp, x.tick, x.x, y.y FROM x JOIN y USING (grp, tick)),
m AS (
  SELECT grp, tick, x, y,
         COUNT(*) OVER w AS n_w,
         SUM(x) OVER w AS sx, SUM(y) OVER w AS sy,
         SUM(x*y) OVER w AS sxy, SUM(x*x) OVER w AS sxx,
         SUM(y*y) OVER w AS syy
  FROM j
  WINDOW w AS (PARTITION BY grp ORDER BY tick
               ROWS BETWEEN 47 PRECEDING AND CURRENT ROW)
)
SELECT grp, tick, x, y, n_w,
       CASE WHEN n_w = 48 AND (n_w*sxx - sx*sx) > 0
                 AND (n_w*syy - sy*sy) > 0
            THEN CAST(n_w*sxy - sx*sy AS DOUBLE)
                 / (sqrt(CAST(n_w*sxx - sx*sx AS DOUBLE))
                    * sqrt(CAST(n_w*syy - sy*sy AS DOUBLE)))
       END AS rcorr
FROM m
""",
        # trend is a dyadic half → 2·(v − trend) is an exact int64;
        # int sums are shuffle-order-free; seasonal = one IEEE division,
        # resid = one subtraction of identical doubles
        "ev_seasonal_decompose": """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS tick, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
),
axis AS (
  SELECT unnest(generate_series((SELECT MIN(tick) FROM hourly),
                                (SELECT MAX(tick) FROM hourly),
                                INTERVAL 1 HOUR)) AS tick
),
keys AS (SELECT DISTINCT event_type FROM hourly),
dense AS (
  SELECT k.event_type, CAST(a.tick AS TIMESTAMP) AS tick,
         CAST(COALESCE(h.n_events, 0) AS BIGINT) AS n_events
  FROM keys k CROSS JOIN axis a
  LEFT JOIN hourly h ON h.event_type = k.event_type AND h.tick = a.tick
),
tr AS (
  SELECT event_type, tick, n_events,
         quantile_cont(n_events, 0.5) OVER (
           PARTITION BY event_type ORDER BY tick
           ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS trend
  FROM dense
),
g AS (
  SELECT event_type, tick, n_events, trend,
         CAST(2 * (CAST(n_events AS DOUBLE) - trend) AS BIGINT) AS d2,
         CAST(isodow(tick) - 1 AS INT) AS dow,
         CAST(hour(tick) AS INT) AS hod
  FROM tr
),
prof AS (
  SELECT event_type, dow, hod, SUM(d2) AS s2, COUNT(*) AS n
  FROM g GROUP BY 1, 2, 3
)
SELECT g.event_type, g.tick, g.n_events, g.trend,
       CAST(p.s2 AS DOUBLE) / (2 * p.n) AS seasonal,
       CAST(g.d2 AS DOUBLE) / 2
         - CAST(p.s2 AS DOUBLE) / (2 * p.n) AS resid
FROM g JOIN prof p USING (event_type, dow, hod)
""",
        # lift = (c_xy·N)/(c_x·c_y): PMI's exact rational core — one
        # IEEE division of double-exact int64 products; ln would be the
        # one libm step engines may round differently, so it stays with
        # the caller.  Top-k total order (lift, w1, w2) is deterministic
        "doc_bigram_lift": """
WITH d AS (
  SELECT list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     x -> x <> '') AS l
  FROM documents
),
uni AS (SELECT unnest(l) AS w FROM d),
cu AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY 1),
tot AS (SELECT SUM(c) AS n_tok FROM cu),
bg AS (
  SELECT unnest(list_zip(list_slice(l, 1, len(l) - 1),
                         list_slice(l, 2, len(l)))) AS p
  FROM d WHERE len(l) >= 2
),
cb AS (
  SELECT p[1] AS w1, p[2] AS w2, COUNT(*) AS c_xy
  FROM bg GROUP BY 1, 2 HAVING COUNT(*) >= 3
)
SELECT cb.w1, cb.w2, cb.c_xy, u1.c AS c_x, u2.c AS c_y,
       CAST(cb.c_xy * t.n_tok AS DOUBLE)
         / CAST(u1.c * u2.c AS DOUBLE) AS lift
FROM cb
JOIN cu u1 ON u1.w = cb.w1
JOIN cu u2 ON u2.w = cb.w2
CROSS JOIN tot t
ORDER BY lift DESC, cb.w1, cb.w2
LIMIT 40
""",
        "ev_gapfill_hourly": """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS tick, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
),
axis AS (
  SELECT unnest(generate_series((SELECT MIN(tick) FROM hourly),
                                (SELECT MAX(tick) FROM hourly),
                                INTERVAL 1 HOUR)) AS tick
),
keys AS (SELECT DISTINCT event_type FROM hourly)
SELECT k.event_type, a.tick, COALESCE(h.n_events, 0) AS n_events
FROM keys k CROSS JOIN axis a
LEFT JOIN hourly h ON h.event_type = k.event_type AND h.tick = a.tick
""",
        "ev_asof_6h": """
WITH obs AS (
  SELECT user_id, ts, MIN(value) AS v FROM events GROUP BY user_id, ts
),
bounds AS (
  SELECT date_trunc('day', MIN(ts)) AS lo, MAX(ts) AS hi FROM events
),
ticks AS (
  SELECT tick, lead(tick) OVER (ORDER BY tick) AS next_tick
  FROM (
    SELECT unnest(generate_series(lo, hi, INTERVAL 6 HOUR)) AS tick
    FROM bounds
  )
),
cand AS (
  SELECT o.user_id, t.tick, t.next_tick, MIN(o.ts) AS cand_ts
  FROM ticks t
  JOIN obs o ON o.ts >= t.tick AND o.ts <= t.tick + INTERVAL 6 HOUR
  GROUP BY o.user_id, t.tick, t.next_tick
)
SELECT c.user_id, c.tick,
       epoch_us(c.cand_ts) - epoch_us(c.tick) AS delta_us,
       CAST(CAST(o.v AS DECIMAL(18,2)) AS DOUBLE) AS v
FROM cand c JOIN obs o ON o.user_id = c.user_id AND o.ts = c.cand_ts
WHERE c.next_tick IS NULL OR c.cand_ts <= c.next_tick
""",
        "ev_max_gap": """
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) AS g
  FROM events
)
SELECT user_id, MAX(g) AS max_gap_us FROM g GROUP BY user_id
""",
        "ev_first_per_slot": """
WITH r AS (
  SELECT user_id, date_trunc('hour', ts) AS tick, event_id,
         CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS v,
         row_number() OVER (
           PARTITION BY user_id, date_trunc('hour', ts)
           ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT user_id, tick, event_id, v FROM r WHERE rn = 1
""",
        "ev_grouping_sets": """
SELECT event_type,
       CASE WHEN GROUPING(date_trunc('hour', ts)) = 0
            THEN 'hour' ELSE 'day' END AS tier,
       COALESCE(date_trunc('hour', ts), date_trunc('day', ts)) AS tick,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
FROM events
GROUP BY GROUPING SETS (
  (event_type, date_trunc('hour', ts)),
  (event_type, date_trunc('day', ts))
)
""",
        "ev_moving_avg": """
WITH h AS (
  SELECT event_type, date_trunc('hour', ts) AS tick, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
)
SELECT event_type, tick, n_events,
       CAST(CAST(avg(n_events) OVER (
         PARTITION BY event_type ORDER BY tick
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DECIMAL(18,4)) AS DOUBLE) AS ma3
FROM h
""",
        "ev_validity_filter": """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
FROM events
WHERE ts IS NOT NULL AND value IS NOT NULL
  AND NOT isnan(value) AND value != -9999.0
GROUP BY event_type
""",
        "tpch_q1": """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
        "revenue_by_nation": """
SELECT n_name,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
""",
        "semi_join_parts": """
SELECT l_suppkey, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size >= 25)
GROUP BY l_suppkey
""",
        "topk_orders_per_segment": """
WITH r AS (
  SELECT c_mktsegment, o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
         row_number() OVER (
           PARTITION BY c_mktsegment
           ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders JOIN customer ON o_custkey = c_custkey
)
SELECT c_mktsegment, rk, o_orderkey, price FROM r WHERE rk <= 3
""",
        "doc_token_counts": r"""
SELECT doc_id, n_chars,
       CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(string_split_regex(trim(text), '\s+')) END AS n_ws_tokens,
       CAST(len(list_filter(regexp_extract_all(text, '\w+'),
                            x -> length(x) > 0))
            + length(regexp_replace(text, '[\w\s]', '', 'g')) AS BIGINT)
         AS n_bpe
FROM documents
""",
        "doc_quality": r"""
SELECT doc_id,
       round((length(text) - length(regexp_replace(text, '[^\p{L}\p{N}\s]', '', 'g')))
             / greatest(length(text), 1)::DOUBLE, 4) AS punct_ratio,
       length(text) AS len
FROM documents
""",
        "doc_lang_stats": """
SELECT lang, source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY lang, source
""",
        "doc_exact_dup_groups": """
SELECT doc_id,
       MIN(doc_id) OVER (PARTITION BY regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS canonical_id,
       COUNT(*) OVER (PARTITION BY regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS group_size
FROM documents
""",
        "doc_minhash_sig": """
SELECT doc_id,
       list_min([md5('0' || text[i:i+7]) for i in generate_series(1, greatest(length(text)-7, 1))]) AS sig0,
       list_min([md5('1' || text[i:i+7]) for i in generate_series(1, greatest(length(text)-7, 1))]) AS sig1,
       list_min([md5('2' || text[i:i+7]) for i in generate_series(1, greatest(length(text)-7, 1))]) AS sig2,
       list_min([md5('3' || text[i:i+7]) for i in generate_series(1, greatest(length(text)-7, 1))]) AS sig3
FROM documents
""",
        "doc_minhash_pairs": """
WITH sh AS (
  SELECT doc_id,
         list_distinct([text[i:i+7]
                        for i in generate_series(1, greatest(length(text)-7, 1), 2)])
           AS s
  FROM documents
),
sig AS (
  SELECT doc_id,
         list_min(list_transform(s, x -> md5('0' || x))) AS sig0,
         list_min(list_transform(s, x -> md5('1' || x))) AS sig1,
         list_min(list_transform(s, x -> md5('2' || x))) AS sig2,
         list_min(list_transform(s, x -> md5('3' || x))) AS sig3
  FROM sh
),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sig a JOIN sig b
    ON a.doc_id < b.doc_id
   AND ((a.sig0 = b.sig0 AND a.sig1 = b.sig1)
        OR (a.sig2 = b.sig2 AND a.sig3 = b.sig3))
),
v AS (
  SELECT c.doc_a, c.doc_b,
         len(list_intersect(x.s, y.s))::DOUBLE /
         greatest(len(list_distinct(list_concat(x.s, y.s))), 1) AS j
  FROM cand c
  JOIN sh x ON x.doc_id = c.doc_a
  JOIN sh y ON y.doc_id = c.doc_b
)
SELECT doc_a, doc_b, round(j, 4) AS jaccard FROM v WHERE j >= 0.3
""",
        # the incremental probe: doc_minhash_pairs' construction with a
        # deterministic index/batch cut — candidates join batch sigs
        # against index sigs only (no a<b self-pairing)
        "doc_minhash_incremental": """
WITH sh AS (
  SELECT doc_id,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
           IN ('0','1','2','3') AS is_batch,
         list_distinct([text[i:i+7]
                        for i in generate_series(1, greatest(length(text)-7, 1), 2)])
           AS s
  FROM documents
),
sig AS (
  SELECT doc_id, is_batch,
         list_min(list_transform(s, x -> md5('0' || x))) AS sig0,
         list_min(list_transform(s, x -> md5('1' || x))) AS sig1,
         list_min(list_transform(s, x -> md5('2' || x))) AS sig2,
         list_min(list_transform(s, x -> md5('3' || x))) AS sig3
  FROM sh
),
cand AS (
  SELECT DISTINCT b.doc_id AS new_id, i.doc_id AS index_id
  FROM sig b JOIN sig i
    ON b.is_batch AND NOT i.is_batch
   AND ((b.sig0 = i.sig0 AND b.sig1 = i.sig1)
        OR (b.sig2 = i.sig2 AND b.sig3 = i.sig3))
),
v AS (
  SELECT c.new_id, c.index_id,
         len(list_intersect(x.s, y.s))::DOUBLE /
         greatest(len(list_distinct(list_concat(x.s, y.s))), 1) AS j
  FROM cand c
  JOIN sh x ON x.doc_id = c.new_id
  JOIN sh y ON y.doc_id = c.index_id
)
SELECT new_id, index_id, round(j, 4) AS jaccard FROM v WHERE j >= 0.3
""",
        "doc_ingest_accepted": """
WITH raw AS (
  SELECT doc_id, text,
         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                   IN ('0','1','2','3','4') THEN 1
              WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                   IN ('5','6','7','8','9') THEN 2
              ELSE 3 END AS b
  FROM documents
  UNION ALL
  SELECT doc_id + 10000000, text, 2 FROM documents
  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'
  UNION ALL
  SELECT doc_id + 20000000, text, 2 FROM documents
  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '5'
),
ex AS (
  SELECT b, doc_id, text FROM (
    SELECT b, doc_id, text,
           min(doc_id) OVER (PARTITION BY b, text) AS keep
    FROM raw)
  WHERE doc_id = keep
),
sh AS (
  SELECT b, doc_id,
         list_distinct([text[i:i+7]
                        for i in generate_series(1, greatest(length(text)-7, 1), 2)])
           AS s
  FROM ex
),
sig AS (
  SELECT b, doc_id,
         list_min(list_transform(s, x -> md5('0' || x))) AS sig0,
         list_min(list_transform(s, x -> md5('1' || x))) AS sig1,
         list_min(list_transform(s, x -> md5('2' || x))) AS sig2,
         list_min(list_transform(s, x -> md5('3' || x))) AS sig3
  FROM sh
),
cand AS (
  SELECT x.b AS ba, y.b AS bb, x.doc_id AS ida, y.doc_id AS idb
  FROM sig x JOIN sig y
    ON ((x.sig0 = y.sig0 AND x.sig1 = y.sig1)
        OR (x.sig2 = y.sig2 AND x.sig3 = y.sig3))
  WHERE x.doc_id <> y.doc_id
),
ver AS (
  SELECT c.ba, c.bb, c.ida, c.idb
  FROM cand c
  JOIN sh p ON p.doc_id = c.ida
  JOIN sh q ON q.doc_id = c.idb
  WHERE len(list_intersect(p.s, q.s))::DOUBLE /
        greatest(len(list_distinct(list_concat(p.s, q.s))), 1) >= 0.3
),
w AS (SELECT DISTINCT idb AS doc_id FROM ver WHERE ba = bb AND ida < idb),
s1 AS (SELECT doc_id FROM ex WHERE b = 1
       AND doc_id NOT IN (SELECT doc_id FROM w)),
s2 AS (SELECT doc_id FROM ex WHERE b = 2
       AND doc_id NOT IN (SELECT doc_id FROM w)),
s3 AS (SELECT doc_id FROM ex WHERE b = 3
       AND doc_id NOT IN (SELECT doc_id FROM w)),
a1 AS (SELECT doc_id FROM s1),
a2 AS (SELECT doc_id FROM s2 WHERE doc_id NOT IN (
         SELECT ida FROM ver WHERE idb IN (SELECT doc_id FROM a1))),
a3 AS (SELECT doc_id FROM s3 WHERE doc_id NOT IN (
         SELECT ida FROM ver
         WHERE idb IN (SELECT doc_id FROM a1
                       UNION ALL SELECT doc_id FROM a2)))
SELECT doc_id, 1 AS ingest_no FROM a1
UNION ALL SELECT doc_id, 2 AS ingest_no FROM a2
UNION ALL SELECT doc_id, 3 AS ingest_no FROM a3
""",
        "doc_quality_signals": r"""
WITH f AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(lower(trim(text)), '\s+'),
                     x -> length(x) > 0) AS toks,
         list_filter(string_split_regex(trim(text), '\s+'),
                     x -> length(x) > 0) AS words,
         (length(text) -
          length(regexp_replace(text, '[^\p{L}\p{N}\s]', '', 'g')))
           / greatest(length(text), 1)::DOUBLE AS punct
  FROM documents
),
s AS (
  SELECT doc_id, text, punct,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE len(list_filter(toks, x -> list_contains(
                     ['the','a','an','and','or','of','to','in','is','it',
                      'that','for','on','with','as','was','were','be','this'],
                     x))) / len(toks)::DOUBLE END AS sw,
         round((length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')))
               / greatest(length(text), 1)::DOUBLE, 6) AS upper_ratio,
         round(CASE WHEN len(words) = 0 THEN 0.0
               ELSE list_sum(list_transform(words, w -> length(w)))
                    / len(words)::DOUBLE END, 6) AS mean_word_len
  FROM f
)
SELECT doc_id,
       round(sw, 6) AS stopword_ratio,
       upper_ratio,
       mean_word_len,
       round(punct, 4) AS punct_ratio,
       length(text) AS len,
       floor((0.4 * least(length(text) / 200.0, 1.0)
              + 0.3 * (1 - least(punct * 4, 1.0))
              + 0.3 * least(sw * 3, 1.0)) * 10000 + 0.5 + 1e-9) / 10000 AS q
FROM s
""",
        "doc_rolling_fingerprint": """
WITH hs AS (
  SELECT doc_id,
         [list_reduce([CAST(ascii(text[i+j:i+j]) AS BIGINT)
                       for j in generate_series(0, 7)],
                      (a, b) -> (a * 257 + b) % 1000000007)
          for i in generate_series(1, greatest(length(text) - 7, 1))] AS h
  FROM documents
)
SELECT doc_id,
       len(h) AS n_windows,
       len(list_filter(h, x -> x % 32 = 0)) AS n_anchors,
       list_min(h) AS min_h,
       list_max(h) AS max_h
FROM hs
""",
        "doc_ngram_jaccard": """
WITH sh AS (
  SELECT doc_id,
         list_distinct([text[i:i+5]
                        for i in generate_series(1, greatest(length(text)-5, 1))])
           AS s
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(len(list_intersect(a.s, b.s))::DOUBLE /
             greatest(len(list_distinct(list_concat(a.s, b.s))), 1), 6)
         AS jaccard
FROM sh a JOIN sh b ON a.doc_id + 1 = b.doc_id AND a.doc_id % 2 = 0
""",
        "doc_lang_id": """
WITH h AS (
  SELECT doc_id,
         ' ' || lower(text) || ' ' AS t
  FROM documents
),
sc AS (
  SELECT doc_id,
         (CASE WHEN contains(t, ' the ') THEN 1 ELSE 0 END +
          CASE WHEN contains(t, ' and ') THEN 1 ELSE 0 END +
          CASE WHEN contains(t, ' is ') THEN 1 ELSE 0 END +
          CASE WHEN contains(t, ' of ') THEN 1 ELSE 0 END) AS h_en,
         (CASE WHEN contains(t, ' der ') THEN 1 ELSE 0 END +
          CASE WHEN contains(t, ' die ') THEN 1 ELSE 0 END +
          CASE WHEN contains(t, ' und ') THEN 1 ELSE 0 END +
          CASE WHEN contains(t, ' ist ') THEN 1 ELSE 0 END) AS h_de,
         (CASE WHEN contains(t, ' le ') THEN 1 ELSE 0 END +
          CASE WHEN contains(t, ' la ') THEN 1 ELSE 0 END +
          CASE WHEN contains(t, ' et ') THEN 1 ELSE 0 END +
          CASE WHEN contains(t, ' est ') THEN 1 ELSE 0 END) AS h_fr,
         (CASE WHEN contains(t, ' el ') THEN 1 ELSE 0 END +
          CASE WHEN contains(t, ' los ') THEN 1 ELSE 0 END +
          CASE WHEN contains(t, ' y ') THEN 1 ELSE 0 END +
          CASE WHEN contains(t, ' es ') THEN 1 ELSE 0 END) AS h_es
  FROM h
)
SELECT doc_id,
       CASE WHEN greatest(h_en, h_de, h_fr, h_es) = 0 THEN 'other'
            WHEN h_fr = greatest(h_en, h_de, h_fr, h_es) THEN 'fr'
            WHEN h_es = greatest(h_en, h_de, h_fr, h_es) THEN 'es'
            WHEN h_en = greatest(h_en, h_de, h_fr, h_es) THEN 'en'
            ELSE 'de' END AS lang_pred
FROM sc
""",
        "doc_quality_score": r"""
WITH f AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(lower(trim(text)), '\s+'),
                     x -> length(x) > 0) AS toks,
         (length(text) -
          length(regexp_replace(text, '[^\p{L}\p{N}\s]', '', 'g')))
           / greatest(length(text), 1)::DOUBLE AS punct
  FROM documents
),
s AS (
  SELECT doc_id,
         least(length(text) / 200.0, 1.0) AS length_ok,
         punct,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE len(list_filter(toks, x -> list_contains(
                     ['the','a','an','and','or','of','to','in','is','it',
                      'that','for','on','with','as','was','were','be','this'],
                     x))) / len(toks)::DOUBLE END AS sw
  FROM f
)
SELECT doc_id,
       floor((0.4 * length_ok
              + 0.3 * (1 - least(punct * 4, 1.0))
              + 0.3 * least(sw * 3, 1.0)) * 10000 + 0.5 + 1e-9) / 10000 AS q
FROM s
""",
        "doc_bpe_tokens": r"""
SELECT doc_id,
       CAST(len(list_filter(regexp_extract_all(text, '\w+'),
                            x -> length(x) > 0))
            + length(regexp_replace(text, '[\w\s]', '', 'g')) AS BIGINT)
         AS n_bpe
FROM documents
""",
        "doc_trigram_lm": """
WITH refd AS (SELECT text FROM documents WHERE doc_id % 50 = 0),
tri AS (
  SELECT unnest([text[i:i+2] for i in generate_series(1, greatest(length(text)-2, 1))])
           AS tri
  FROM refd
),
c3 AS (SELECT tri, COUNT(*) AS c3 FROM tri GROUP BY tri),
bi AS (
  SELECT unnest([text[i:i+1] for i in generate_series(1, greatest(length(text)-1, 1))])
           AS bi
  FROM refd
),
c2 AS (SELECT bi, COUNT(*) AS c2 FROM bi GROUP BY bi),
model AS (
  SELECT c3.tri, ln((c3.c3 + 1)::DOUBLE / (c2.c2 + 32768)) AS logp
  FROM c3 JOIN c2 ON c2.bi = c3.tri[1:2]
),
dg AS (
  SELECT doc_id,
         unnest([text[i:i+2] for i in generate_series(1, greatest(length(text)-2, 1))])
           AS tri
  FROM documents WHERE doc_id % 50 <> 0
),
s AS (
  SELECT doc_id, coalesce(m.logp, ln(1.0 / 32768)) AS logp
  FROM dg LEFT JOIN model m USING (tri)
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tri,
       round(AVG(logp), 4) AS avg_logp
FROM s GROUP BY doc_id
""",
        "doc_repetition": """
WITH g AS (
  SELECT doc_id, length(text) AS len,
         [text[i:i+9] for i in generate_series(1, greatest(length(text)-9, 1))]
           AS grams
  FROM documents
)
SELECT doc_id,
       CASE WHEN len < 10 THEN 0.0
            ELSE round(1.0 - len(list_distinct(grams))::DOUBLE / len(grams), 6)
       END AS rep_ratio
FROM g
""",
        "doc_pii": """
WITH a AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+')) AS BIGINT)
           AS n_email,
         regexp_replace(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+',
           '<EMAIL>', 'g') AS t1
  FROM documents
),
b AS (
  SELECT doc_id, n_email,
         CAST(len(regexp_extract_all(t1,
           '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}')) AS BIGINT)
           AS n_ipv4,
         regexp_replace(t1,
           '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}',
           '<IPV4>', 'g') AS t2
  FROM a
),
c AS (
  SELECT doc_id, n_email, n_ipv4,
         CAST(len(regexp_extract_all(t2,
           '\\+?[0-9][0-9 ()-]{7,}[0-9]')) AS BIGINT) AS n_phone,
         regexp_replace(t2, '\\+?[0-9][0-9 ()-]{7,}[0-9]', '<PHONE>', 'g')
           AS t3
  FROM b
)
SELECT doc_id, n_email, n_ipv4, n_phone,
       CAST(length(t3) AS BIGINT) AS len_scrubbed
FROM c
""",
        "doc_chunks": """
SELECT doc_id,
       CAST((u.i - 1) // 1000 AS BIGINT) AS chunk_idx,
       CAST(u.i - 1 AS BIGINT) AS chunk_start,
       CAST(length(text[u.i:u.i+1999]) AS BIGINT) AS chunk_len,
       text[u.i:u.i+1999] AS chunk
FROM documents,
     unnest(generate_series(1, greatest(length(text), 1), 1000)) AS u(i)
""",
        "doc_mixture": """
WITH r AS (
  SELECT doc_id, source,
         CASE source WHEN 'src0' THEN 0.4 WHEN 'src1' THEN 2.5
              ELSE 1.0 END AS rate
  FROM documents
),
ep AS (
  SELECT doc_id, source, rate, u.k AS epoch,
         CAST(concat('0x', substr(md5('mix' || CAST(doc_id AS VARCHAR)
                                        || '|' || CAST(u.k AS VARCHAR)), 1, 8))
              AS BIGINT) / 4294967296.0 AS u
  FROM r, unnest(generate_series(0, 2)) AS u(k)
)
SELECT doc_id, source, CAST(epoch AS BIGINT) AS epoch
FROM ep WHERE epoch + u < rate
""",
        "doc_contamination": """
WITH bg AS (
  SELECT DISTINCT unnest([text[i:i+7]
                          for i in generate_series(1, greatest(length(text)-7, 1))])
           AS gram
  FROM documents WHERE doc_id % 50 = 0
),
dg AS (
  SELECT doc_id,
         unnest([text[i:i+7]
                 for i in generate_series(1, greatest(length(text)-7, 1))])
           AS gram
  FROM documents WHERE doc_id % 50 <> 0
)
SELECT doc_id, CAST(COUNT(DISTINCT dg.gram) AS BIGINT) AS n_hit_grams
FROM dg JOIN bg USING (gram)
GROUP BY doc_id
HAVING COUNT(DISTINCT dg.gram) >= 1
""",
        # sequence packing: the two-phase distributed prefix sum equals a
        # plain per-source ordered window cumsum
        "doc_pack_assignments": """
WITH c AS (
  SELECT source, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
         SUM(CAST(n_chars AS BIGINT)) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS UNBOUNDED PRECEDING) AS cum
  FROM documents
)
SELECT source, doc_id, n_chars,
       CAST((cum - n_chars) // 4096 AS BIGINT) AS pack_id,
       CAST((cum - n_chars) % 4096 AS BIGINT) AS pack_offset,
       CAST(CASE WHEN n_chars = 0 THEN 0
            ELSE (cum - 1) // 4096 - (cum - n_chars) // 4096 + 1 END
            AS BIGINT) AS n_chunks
FROM c
""",
        "doc_split_counts": """
WITH u AS (
  SELECT source,
         CAST(concat('0x', substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) / 4294967296.0 AS u
  FROM documents
)
SELECT source,
       CASE WHEN u < 0.8 THEN 'train'
            WHEN u < 0.9000000000000001 THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs
FROM u GROUP BY 1, 2
""",
        # near-dup dedup groups: minhash pairs (same CTEs as
        # doc_minhash_pairs) then transitive closure via recursive CTE —
        # min reachable id == the Spark min-label-propagation fixpoint
        "doc_neardup_components": r"""
WITH RECURSIVE sh AS (
  SELECT doc_id,
         list_distinct([text[i:i+7]
                        for i in generate_series(1, greatest(length(text)-7, 1), 2)])
           AS s
  FROM documents
),
sig AS (
  SELECT doc_id,
         list_min(list_transform(s, x -> md5('0' || x))) AS sig0,
         list_min(list_transform(s, x -> md5('1' || x))) AS sig1,
         list_min(list_transform(s, x -> md5('2' || x))) AS sig2,
         list_min(list_transform(s, x -> md5('3' || x))) AS sig3
  FROM sh
),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sig a JOIN sig b
    ON a.doc_id < b.doc_id
   AND ((a.sig0 = b.sig0 AND a.sig1 = b.sig1)
        OR (a.sig2 = b.sig2 AND a.sig3 = b.sig3))
),
v AS (
  SELECT c.doc_a, c.doc_b
  FROM cand c
  JOIN sh x ON x.doc_id = c.doc_a
  JOIN sh y ON y.doc_id = c.doc_b
  WHERE len(list_intersect(x.s, y.s))::DOUBLE /
        greatest(len(list_distinct(list_concat(x.s, y.s))), 1) >= 0.3
),
e AS (
  SELECT doc_a AS a, doc_b AS b FROM v
  UNION
  SELECT doc_b, doc_a FROM v
),
reach(id, comp) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.a, r.comp FROM e JOIN reach r ON e.b = r.id
)
SELECT id AS doc_id, MIN(comp) AS component FROM reach GROUP BY id
""",
        # curation pipeline: every stage replayed in SQL — lang CTE from
        # doc_lang_id, quality CTE from doc_quality_score, exact dedup on
        # the normalized-text key, minhash CTEs from doc_minhash_pairs
        "doc_curation": r"""
WITH h AS (
  SELECT doc_id, text, ' ' || lower(text) || ' ' AS t FROM documents
),
sc AS (
  SELECT doc_id, text,
         (CASE WHEN contains(t, ' the ') THEN 1 ELSE 0 END +
          CASE WHEN contains(t, ' and ') THEN 1 ELSE 0 END +
          CASE WHEN contains(t, ' is ') THEN 1 ELSE 0 END +
          CASE WHEN contains(t, ' of ') THEN 1 ELSE 0 END) AS h_en,
         (CASE WHEN contains(t, ' der ') THEN 1 ELSE 0 END +
          CASE WHEN contains(t, ' die ') THEN 1 ELSE 0 END +
          CASE WHEN contains(t, ' und ') THEN 1 ELSE 0 END +
          CASE WHEN contains(t, ' ist ') THEN 1 ELSE 0 END) AS h_de,
         (CASE WHEN contains(t, ' le ') THEN 1 ELSE 0 END +
          CASE WHEN contains(t, ' la ') THEN 1 ELSE 0 END +
          CASE WHEN contains(t, ' et ') THEN 1 ELSE 0 END +
          CASE WHEN contains(t, ' est ') THEN 1 ELSE 0 END) AS h_fr,
         (CASE WHEN contains(t, ' el ') THEN 1 ELSE 0 END +
          CASE WHEN contains(t, ' los ') THEN 1 ELSE 0 END +
          CASE WHEN contains(t, ' y ') THEN 1 ELSE 0 END +
          CASE WHEN contains(t, ' es ') THEN 1 ELSE 0 END) AS h_es
  FROM h
),
lp AS (
  SELECT doc_id, text,
         CASE WHEN greatest(h_en, h_de, h_fr, h_es) = 0 THEN 'other'
              WHEN h_fr = greatest(h_en, h_de, h_fr, h_es) THEN 'fr'
              WHEN h_es = greatest(h_en, h_de, h_fr, h_es) THEN 'es'
              WHEN h_en = greatest(h_en, h_de, h_fr, h_es) THEN 'en'
              ELSE 'de' END AS lang_pred
  FROM sc
),
qf AS (
  SELECT doc_id, text, lang_pred,
         floor((0.4 * least(length(text) / 200.0, 1.0)
               + 0.3 * (1 - least(
                   ((length(text) -
                     length(regexp_replace(text, '[^\p{L}\p{N}\s]', '', 'g')))
                    / greatest(length(text), 1)::DOUBLE) * 4, 1.0))
               + 0.3 * least(
                   (CASE WHEN len(list_filter(
                            string_split_regex(lower(trim(text)), '\s+'),
                            x -> length(x) > 0)) = 0 THEN 0.0
                    ELSE len(list_filter(
                            list_filter(
                              string_split_regex(lower(trim(text)), '\s+'),
                              x -> length(x) > 0),
                            x -> list_contains(
                              ['the','a','an','and','or','of','to','in','is',
                               'it','that','for','on','with','as','was',
                               'were','be','this'], x)))
                         / len(list_filter(
                             string_split_regex(lower(trim(text)), '\s+'),
                             x -> length(x) > 0))::DOUBLE END) * 3, 1.0)) * 10000 + 0.5 + 1e-9) / 10000 AS q
  FROM lp
),
kept AS (
  SELECT * FROM qf WHERE lang_pred = 'en' AND q >= 0.5
),
fp AS (
  SELECT doc_id, text, lang_pred, q,
         regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS nrm
  FROM kept
),
exact AS (
  SELECT doc_id, text, lang_pred, q FROM (
    SELECT *, MIN(doc_id) OVER (PARTITION BY nrm) AS keep_id FROM fp
  ) WHERE doc_id = keep_id
),
sh AS (
  SELECT doc_id,
         list_distinct([text[i:i+7]
                        for i in generate_series(1, greatest(length(text)-7, 1), 2)])
           AS s
  FROM exact
),
sig AS (
  SELECT doc_id,
         list_min(list_transform(s, x -> md5('0' || x))) AS sig0,
         list_min(list_transform(s, x -> md5('1' || x))) AS sig1,
         list_min(list_transform(s, x -> md5('2' || x))) AS sig2,
         list_min(list_transform(s, x -> md5('3' || x))) AS sig3
  FROM sh
),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sig a JOIN sig b
    ON a.doc_id < b.doc_id
   AND ((a.sig0 = b.sig0 AND a.sig1 = b.sig1)
        OR (a.sig2 = b.sig2 AND a.sig3 = b.sig3))
),
losers AS (
  SELECT DISTINCT c.doc_b
  FROM cand c
  JOIN sh x ON x.doc_id = c.doc_a
  JOIN sh y ON y.doc_id = c.doc_b
  WHERE len(list_intersect(x.s, y.s))::DOUBLE /
        greatest(len(list_distinct(list_concat(x.s, y.s))), 1) >= 0.3
)
SELECT e.doc_id, e.lang_pred, e.q
FROM exact e LEFT JOIN losers l ON e.doc_id = l.doc_b
WHERE l.doc_b IS NULL
""",
        "doc_curation_report": r"""
WITH h AS (
  SELECT doc_id, text, ' ' || lower(text) || ' ' AS t FROM documents
),
sc AS (
  SELECT doc_id, text,
         (CASE WHEN contains(t, ' the ') THEN 1 ELSE 0 END +
          CASE WHEN contains(t, ' and ') THEN 1 ELSE 0 END +
          CASE WHEN contains(t, ' is ') THEN 1 ELSE 0 END +
          CASE WHEN contains(t, ' of ') THEN 1 ELSE 0 END) AS h_en,
         (CASE WHEN contains(t, ' der ') THEN 1 ELSE 0 END +
          CASE WHEN contains(t, ' die ') THEN 1 ELSE 0 END +
          CASE WHEN contains(t, ' und ') THEN 1 ELSE 0 END +
          CASE WHEN contains(t, ' ist ') THEN 1 ELSE 0 END) AS h_de,
         (CASE WHEN contains(t, ' le ') THEN 1 ELSE 0 END +
          CASE WHEN contains(t, ' la ') THEN 1 ELSE 0 END +
          CASE WHEN contains(t, ' et ') THEN 1 ELSE 0 END +
          CASE WHEN contains(t, ' est ') THEN 1 ELSE 0 END) AS h_fr,
         (CASE WHEN contains(t, ' el ') THEN 1 ELSE 0 END +
          CASE WHEN contains(t, ' los ') THEN 1 ELSE 0 END +
          CASE WHEN contains(t, ' y ') THEN 1 ELSE 0 END +
          CASE WHEN contains(t, ' es ') THEN 1 ELSE 0 END) AS h_es
  FROM h
),
ann AS (
  SELECT doc_id,
         CASE WHEN greatest(h_en, h_de, h_fr, h_es) = 0 THEN 'other'
              WHEN h_fr = greatest(h_en, h_de, h_fr, h_es) THEN 'fr'
              WHEN h_es = greatest(h_en, h_de, h_fr, h_es) THEN 'es'
              WHEN h_en = greatest(h_en, h_de, h_fr, h_es) THEN 'en'
              ELSE 'de' END AS lang_pred,
         floor((0.4 * least(length(text) / 200.0, 1.0)
               + 0.3 * (1 - least(
                   ((length(text) -
                     length(regexp_replace(text, '[^\p{L}\p{N}\s]', '', 'g')))
                    / greatest(length(text), 1)::DOUBLE) * 4, 1.0))
               + 0.3 * least(
                   (CASE WHEN len(list_filter(
                            string_split_regex(lower(trim(text)), '\s+'),
                            x -> length(x) > 0)) = 0 THEN 0.0
                    ELSE len(list_filter(
                            list_filter(
                              string_split_regex(lower(trim(text)), '\s+'),
                              x -> length(x) > 0),
                            x -> list_contains(
                              ['the','a','an','and','or','of','to','in','is',
                               'it','that','for','on','with','as','was',
                               'were','be','this'], x)))
                         / len(list_filter(
                             string_split_regex(lower(trim(text)), '\s+'),
                             x -> length(x) > 0))::DOUBLE END) * 3, 1.0)) * 10000 + 0.5 + 1e-9) / 10000 AS q,
         regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS nrm
  FROM sc
),
agg AS (
  SELECT COUNT(*) AS n_input,
         SUM(CASE WHEN lang_pred = 'en' THEN 1 ELSE 0 END) AS n_lang,
         SUM(CASE WHEN lang_pred = 'en' AND q >= 0.5 THEN 1 ELSE 0 END)
           AS n_q,
         COUNT(DISTINCT CASE WHEN lang_pred = 'en' AND q >= 0.5
                             THEN nrm END) AS n_exact
  FROM ann
)
SELECT '1_input' AS stage, CAST(n_input AS BIGINT) AS n_docs FROM agg
UNION ALL
SELECT '2_lang', CAST(n_lang AS BIGINT) FROM agg
UNION ALL
SELECT '3_quality', CAST(n_q AS BIGINT) FROM agg
UNION ALL
SELECT '4_exact_dedup', CAST(n_exact AS BIGINT) FROM agg
""",
        "mm_decode_stats": """
WITH d AS (
  SELECT i, 16 + i % 8 AS w, 16 + (i * 3) % 8 AS h
  FROM range(200) r(i)
)
SELECT printf('doc%08d', i) AS doc_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       3 AS channels,
       CAST(9 + w * h * 3 AS BIGINT) AS n_bytes,
       round((SELECT avg((i + 7 * j.x) % 251)
              FROM unnest(generate_series(0, w * h * 3 - 1)) j(x)), 6)
         AS mean_intensity
FROM d
""",
        "mm_frame_sample": """
WITH d AS (
  SELECT i, 16 + i % 8 AS w, 16 + (i * 3) % 8 AS h, 2 + i % 4 AS nf
  FROM range(200) r(i)
),
fr AS (
  SELECT d.*, f.x AS frame_idx
  FROM d, unnest(generate_series(0, nf - 1)) f(x)
  WHERE f.x % 2 = 0
)
SELECT printf('doc%08d', i) AS doc_id,
       CAST(frame_idx AS INT) AS frame_idx,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       round((SELECT avg(((i + frame_idx) + 7 * j.x) % 251)
              FROM unnest(generate_series(0, w * h * 3 - 1)) j(x)), 6)
         AS mean_intensity
FROM fr
""",
        "mm_png_stats": """
WITH d AS (
  SELECT i, 16 + i % 8 AS w, 16 + (i * 3) % 8 AS h
  FROM range(200) r(i)
)
SELECT printf('doc%08d', i) AS doc_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       3 AS channels,
       round((SELECT avg((i + 7 * j.x) % 251)
              FROM unnest(generate_series(0, w * h * 3 - 1)) j(x)), 6)
         AS mean_intensity
FROM d
""",
        "mm_audio_stats": """
WITH d AS (
  SELECT i, 400 + 100 * (i % 4) AS n FROM range(200) r(i)
),
s AS (
  SELECT i, n, ((i * 31 + j.x * 7) % 32003 - 16001) AS v
  FROM d, unnest(generate_series(0, n - 1)) j(x)
)
SELECT printf('doc%08d', i) AS doc_id,
       CAST(n AS BIGINT) AS n_samples,
       16000 AS sample_rate,
       1 AS channels,
       2 AS sample_width,
       CAST(44 + 2 * n AS BIGINT) AS n_bytes,
       round(sqrt(avg((v / 32768.0) * (v / 32768.0))), 6) AS rms
FROM s
GROUP BY i, n
""",
        "mm_flac_stats": """
WITH d AS (
  SELECT i, 400 + 100 * (i % 4) AS n FROM range(200) r(i)
),
s AS (
  SELECT i, n, ((i * 31 + j.x * 7) % 32003 - 16001) AS v
  FROM d, unnest(generate_series(0, n - 1)) j(x)
)
SELECT printf('doc%08d', i) AS doc_id,
       CAST(n AS BIGINT) AS n_samples,
       16000 AS sample_rate,
       1 AS channels,
       2 AS sample_width,
       round(sqrt(avg((v / 32768.0) * (v / 32768.0))), 6) AS rms
FROM s
GROUP BY i, n
""",
        "mm_gif_frames": """
WITH d AS (
  SELECT i, 16 + i % 8 AS w, 16 + (i * 3) % 8 AS h, 2 + i % 4 AS nf
  FROM range(200) r(i)
),
fr AS (
  SELECT d.*, f.x AS frame_idx
  FROM d, unnest(generate_series(0, nf - 1)) f(x)
  WHERE f.x % 2 = 0
)
SELECT printf('doc%08d', i) AS doc_id,
       CAST(frame_idx AS INT) AS frame_idx,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       round((SELECT avg(((i + frame_idx) + 7 * j.x) % 251)
              FROM unnest(generate_series(0, w * h - 1)) j(x)), 6)
         AS mean_intensity
FROM fr
""",
        "emb_cosine_scores": """
WITH q AS (
  SELECT embedding AS qv FROM embeddings ORDER BY vec_id LIMIT 1
)
SELECT vec_id,
       round(
         list_dot_product(CAST(embedding AS DOUBLE[]), CAST(qv AS DOUBLE[])) /
         (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) *
          sqrt(list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[])))), 4) AS cosine
FROM embeddings, q
""",
        "emb_topk": """
WITH q AS (
  SELECT embedding AS qv FROM embeddings ORDER BY vec_id LIMIT 1
),
s AS (
  SELECT vec_id,
         round(
           list_dot_product(CAST(embedding AS DOUBLE[]), CAST(qv AS DOUBLE[])) /
           (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) *
            sqrt(list_dot_product(CAST(qv AS DOUBLE[]), CAST(qv AS DOUBLE[])))), 4) AS cosine
  FROM embeddings, q
)
SELECT vec_id, cosine FROM s ORDER BY cosine DESC, vec_id LIMIT 10
""",
        "emb_near_dup_pairs": f"""
WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
g AS (SELECT vec_id, e, {_sig_sql('e', _EMB_DIM, 6)} AS sig FROM s),
c AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         list_dot_product(a.e, b.e) /
         (sqrt(list_dot_product(a.e, a.e)) *
          sqrt(list_dot_product(b.e, b.e))) AS cos
  FROM g a JOIN g b ON a.sig = b.sig AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, round(cos, 4) AS cosine FROM c WHERE cos >= 0.2
""",
        "emb_neardup_components": f"""
WITH RECURSIVE s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
g AS (SELECT vec_id, e, {_sig_sql('e', _EMB_DIM, 6)} AS sig FROM s),
c AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         list_dot_product(a.e, b.e) /
         (sqrt(list_dot_product(a.e, a.e)) *
          sqrt(list_dot_product(b.e, b.e))) AS cos
  FROM g a JOIN g b ON a.sig = b.sig AND a.vec_id < b.vec_id
),
p AS (SELECT vec_a, vec_b FROM c WHERE cos >= 0.2),
eg AS (SELECT vec_a AS a, vec_b AS b FROM p UNION SELECT vec_b, vec_a FROM p),
reach(id, comp) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT eg.a, r.comp FROM eg JOIN reach r ON eg.b = r.id
)
SELECT id AS vec_id, MIN(comp) AS component FROM reach GROUP BY id
""",
        "emb_knn_label_vote": f"""
WITH s AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
g AS (SELECT vec_id, label, e, {_sig_sql('e', _EMB_DIM, 6)} AS sig FROM s),
c AS (
  SELECT a.vec_id AS id, a.label AS lab, b.vec_id AS nid, b.label AS nlab,
         round(list_dot_product(a.e, b.e) /
               (sqrt(list_dot_product(a.e, a.e)) *
                sqrt(list_dot_product(b.e, b.e))), 6) AS cos
  FROM g a JOIN g b ON a.sig = b.sig AND a.vec_id <> b.vec_id
),
t AS (
  SELECT id, lab, nlab,
         row_number() OVER (PARTITION BY id ORDER BY cos DESC, nid) AS rn
  FROM c
),
v AS (
  SELECT id, lab, nlab, COUNT(*) AS cnt
  FROM t WHERE rn <= 5 GROUP BY 1, 2, 3
),
bv AS (
  SELECT id, lab, nlab AS pred_label,
         CAST(SUM(cnt) OVER (PARTITION BY id) AS BIGINT) AS n_votes,
         row_number() OVER (PARTITION BY id
                            ORDER BY cnt DESC, nlab DESC) AS rk
  FROM v
)
SELECT id AS vec_id, lab AS label, pred_label, n_votes,
       pred_label = lab AS is_correct
FROM bv WHERE rk = 1
""",
        "emb_lsh_topk": f"""
WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
g AS (SELECT vec_id, e, {_sig_sql('e', _EMB_DIM, 6)} AS sig FROM s),
q AS (SELECT e AS qe, sig AS qsig FROM g ORDER BY vec_id LIMIT 1),
f AS (
  SELECT vec_id,
         round(list_dot_product(e, qe) /
               (sqrt(list_dot_product(e, e)) *
                sqrt(list_dot_product(qe, qe))), 4) AS cosine
  FROM g, q WHERE sig = qsig
)
SELECT vec_id, cosine FROM f ORDER BY cosine DESC, vec_id LIMIT 10
""",
        # ev_sax: breakpoint literals are statistics.NormalDist().inv_cdf
        # (i/4) — the SAME doubles sax_breakpoints(4) feeds the engine;
        # the A > β·c_f·√V comparison mirrors the integer-moment algebra
        # of operators/downsample.py::sax op for op
        "ev_sax": """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS tick, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT event_type, CAST(n_events AS BIGINT) AS v,
         row_number() OVER (PARTITION BY event_type ORDER BY tick) - 1 AS r,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM hourly
),
f AS (
  SELECT event_type, CAST(floor(r * 24 / n) AS INT) AS frame,
         SUM(v) AS sf, COUNT(*) AS n_pts
  FROM r GROUP BY 1, 2
),
m AS (
  SELECT event_type, SUM(v) AS s, SUM(v * v) AS q, COUNT(*) AS n
  FROM r GROUP BY 1
),
j AS (
  SELECT f.event_type, f.frame, f.n_pts, f.sf, m.s, m.q, m.n,
         CAST(m.n * f.sf - f.n_pts * m.s AS DOUBLE) AS a,
         m.n * m.q - m.s * m.s AS var,
         sqrt(CAST(m.n * m.q - m.s * m.s AS DOUBLE)) AS d
  FROM f JOIN m USING (event_type)
)
SELECT event_type, frame, n_pts,
       CAST(sf AS DOUBLE) / CAST(n_pts AS DOUBLE) AS paa,
       CASE WHEN var > 0 THEN
         substring('abcdefghijklmnop',
           (CASE WHEN a > -0.6744897501960817 * CAST(n_pts AS DOUBLE) * d
                 THEN 1 ELSE 0 END)
           + (CASE WHEN a > 0.0 * CAST(n_pts AS DOUBLE) * d
                   THEN 1 ELSE 0 END)
           + (CASE WHEN a > 0.6744897501960817 * CAST(n_pts AS DOUBLE) * d
                   THEN 1 ELSE 0 END) + 1, 1)
       END AS symbol
FROM j
""",
        # ev_theil_sen: quantile_disc(…, 0.5) IS the lower median
        # (probed in tests/test_robust.py), matching numpy's
        # sorted[(m-1)//2] pick in operators/robust.py::theil_sen
        "ev_theil_sen": """
WITH daily AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '2024-01-01',
                        CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS t,
         SUM(CAST(round(value * 100) AS BIGINT)) AS v
  FROM events GROUP BY 1, 2
),
keys AS (SELECT event_type, COUNT(*) AS n_pts FROM daily GROUP BY 1),
sl AS (
  SELECT a.event_type,
         CAST(b.v - a.v AS DOUBLE) / CAST(b.t - a.t AS DOUBLE) AS s
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND b.t > a.t
),
m AS (
  SELECT event_type, quantile_disc(s, 0.5) AS slope, COUNT(*) AS n_pairs
  FROM sl GROUP BY 1
),
ic AS (
  SELECT d.event_type,
         quantile_disc(CAST(d.v AS DOUBLE) - m.slope * CAST(d.t AS DOUBLE),
                       0.5) AS icpt
  FROM daily d JOIN m USING (event_type) GROUP BY 1
)
SELECT k.event_type, m.slope, ic.icpt, k.n_pts,
       COALESCE(m.n_pairs, 0) AS n_pairs
FROM keys k LEFT JOIN m USING (event_type) LEFT JOIN ic USING (event_type)
""",
        # emb_semdedup / emb_cluster_profile: seed rank, lowest-sid-ties
        # argmax, and the keep-low drop join replayed verbatim; the
        # sequential list_dot_product fold matches Spark's F.aggregate
        # bitwise, so thresholds/argmax on UNROUNDED doubles agree
        "emb_semdedup": """
WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
sd AS (SELECT vec_id, e,
              md5(CAST(vec_id AS VARCHAR) || chr(31) || 'r5') AS rk FROM s),
seeds AS (
  SELECT row_number() OVER (ORDER BY rk, vec_id) - 1 AS sid, e AS c
  FROM sd ORDER BY rk, vec_id LIMIT 8
),
asg AS (
  SELECT vec_id, e, sid, cos,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cos DESC, sid) AS rn
  FROM (
    SELECT s.vec_id, s.e, seeds.sid,
           list_dot_product(s.e, seeds.c) /
           (sqrt(list_dot_product(s.e, s.e)) *
            sqrt(list_dot_product(seeds.c, seeds.c))) AS cos
    FROM s CROSS JOIN seeds)
),
a1 AS (SELECT vec_id, e, sid AS cluster_id, cos AS ccos
       FROM asg WHERE rn = 1),
drops AS (
  SELECT DISTINCT b.vec_id
  FROM a1 a JOIN a1 b ON a.cluster_id = b.cluster_id
   AND (a.ccos < b.ccos OR (a.ccos = b.ccos AND a.vec_id < b.vec_id))
   AND list_dot_product(a.e, b.e) /
       (sqrt(list_dot_product(a.e, a.e)) *
        sqrt(list_dot_product(b.e, b.e))) >= 0.3
)
SELECT a1.vec_id, CAST(cluster_id AS INT) AS cluster_id,
       round(ccos, 4) AS centroid_cos,
       d.vec_id IS NULL AS kept
FROM a1 LEFT JOIN drops d ON a1.vec_id = d.vec_id
""",
        "emb_cluster_profile": """
WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
sd AS (SELECT vec_id, e,
              md5(CAST(vec_id AS VARCHAR) || chr(31) || 'r5') AS rk FROM s),
seeds AS (
  SELECT row_number() OVER (ORDER BY rk, vec_id) - 1 AS sid, e AS c
  FROM sd ORDER BY rk, vec_id LIMIT 8
),
asg AS (
  SELECT vec_id, sid, cos,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY cos DESC, sid) AS rn
  FROM (
    SELECT s.vec_id, seeds.sid,
           list_dot_product(s.e, seeds.c) /
           (sqrt(list_dot_product(s.e, s.e)) *
            sqrt(list_dot_product(seeds.c, seeds.c))) AS cos
    FROM s CROSS JOIN seeds)
)
SELECT CAST(sid AS INT) AS cluster_id, COUNT(*) AS n,
       round(MIN(cos), 4) AS min_centroid_cos,
       round(MAX(cos), 4) AS max_centroid_cos
FROM asg WHERE rn = 1 GROUP BY sid
""",
        # doc_source_overlap: the doc_minhash_pairs pipeline + two source
        # joins + the exact int64-tick rollup per unordered source pair
        "doc_source_overlap": """
WITH sh AS (
  SELECT doc_id,
         list_distinct([text[i:i+7]
                        for i in generate_series(1, greatest(length(text)-7, 1), 2)])
           AS s
  FROM documents
),
sig AS (
  SELECT doc_id,
         list_min(list_transform(s, x -> md5('0' || x))) AS sig0,
         list_min(list_transform(s, x -> md5('1' || x))) AS sig1,
         list_min(list_transform(s, x -> md5('2' || x))) AS sig2,
         list_min(list_transform(s, x -> md5('3' || x))) AS sig3
  FROM sh
),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sig a JOIN sig b
    ON a.doc_id < b.doc_id
   AND ((a.sig0 = b.sig0 AND a.sig1 = b.sig1)
        OR (a.sig2 = b.sig2 AND a.sig3 = b.sig3))
),
v AS (
  SELECT c.doc_a, c.doc_b,
         len(list_intersect(x.s, y.s))::DOUBLE /
         greatest(len(list_distinct(list_concat(x.s, y.s))), 1) AS j
  FROM cand c
  JOIN sh x ON x.doc_id = c.doc_a
  JOIN sh y ON y.doc_id = c.doc_b
),
p AS (SELECT doc_a, doc_b, round(j, 4) AS jaccard FROM v WHERE j >= 0.3),
m AS (
  SELECT least(da.source, db.source) AS source_a,
         greatest(da.source, db.source) AS source_b,
         p.jaccard
  FROM p JOIN documents da ON p.doc_a = da.doc_id
         JOIN documents db ON p.doc_b = db.doc_id
)
SELECT source_a, source_b, COUNT(*) AS n_pairs,
       CAST(SUM(CAST(round(jaccard * 10000) AS BIGINT)) AS BIGINT)
         AS sum_sim_e4,
       MIN(jaccard) AS min_sim, MAX(jaccard) AS max_sim
FROM m GROUP BY 1, 2
""",
        # ev_burstiness: integer-second floor (epoch_us // 1e6 ≡ Spark's
        # unix_timestamp truncation), closed bucket range, exact integer
        # moments, ONE IEEE division
        "ev_burstiness": """
WITH per AS (
  SELECT event_type,
         (epoch_us(ts) // 1000000) // 86400 AS b,
         COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
a AS (
  SELECT event_type,
         MAX(b) - MIN(b) + 1 AS n_buckets,
         CAST(SUM(c) AS BIGINT) AS n_events,
         CAST(SUM(c * c) AS BIGINT) AS s2
  FROM per GROUP BY 1
)
SELECT event_type, n_buckets, n_events,
       CASE WHEN n_buckets > 1 THEN
         round(CAST(n_buckets * s2 - n_events * n_events AS DOUBLE) /
               CAST((n_buckets - 1) * n_events AS DOUBLE), 6)
       END AS fano
FROM a
""",
        # doc_edit_dup_pairs: minhash band candidates (the
        # doc_minhash_pairs CTEs) verified with classic levenshtein —
        # both engines' kernels agree exactly; the relative cut
        # dist ≤ (1−0.8)·max_len is one IEEE multiply + integer compare
        "doc_edit_dup_pairs": """
WITH sh AS (
  SELECT doc_id,
         list_distinct([text[i:i+7]
                        for i in generate_series(1, greatest(length(text)-7, 1), 2)])
           AS s
  FROM documents
),
sig AS (
  SELECT doc_id,
         list_min(list_transform(s, x -> md5('0' || x))) AS sig0,
         list_min(list_transform(s, x -> md5('1' || x))) AS sig1,
         list_min(list_transform(s, x -> md5('2' || x))) AS sig2,
         list_min(list_transform(s, x -> md5('3' || x))) AS sig3
  FROM sh
),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sig a JOIN sig b
    ON a.doc_id < b.doc_id
   AND ((a.sig0 = b.sig0 AND a.sig1 = b.sig1)
        OR (a.sig2 = b.sig2 AND a.sig3 = b.sig3))
),
v AS (
  SELECT c.doc_a, c.doc_b,
         levenshtein(x.text, y.text) AS edit_dist,
         greatest(length(x.text), length(y.text)) AS mx
  FROM cand c
  JOIN documents x ON x.doc_id = c.doc_a
  JOIN documents y ON y.doc_id = c.doc_b
)
SELECT doc_a, doc_b, edit_dist,
       round(1.0 - edit_dist / greatest(mx, 1), 4) AS edit_sim
FROM v
WHERE edit_dist <= (1.0 - 0.8) * mx
""",
        # ev_haar_energy: the unnormalized Haar pyramid as 3 chained
        # pair-mean CTEs; i//2 ≡ Spark's shiftright(i,1) on the
        # 0-based row_number; details quantized to int64 ticks before
        # squaring so detail_e8 is an exact integer sum
        "ev_haar_energy": """
WITH base AS (
  SELECT event_type,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY ts, event_id) - 1 AS i,
         value AS v
  FROM events
),
l1 AS (
  SELECT event_type, i // 2 AS i,
         (max(CASE WHEN i % 2 = 0 THEN v END)
          + max(CASE WHEN i % 2 = 1 THEN v END)) / 2 AS v,
         (max(CASE WHEN i % 2 = 0 THEN v END)
          - max(CASE WHEN i % 2 = 1 THEN v END)) / 2 AS d
  FROM base GROUP BY event_type, i // 2 HAVING count(*) = 2
),
l2 AS (
  SELECT event_type, i // 2 AS i,
         (max(CASE WHEN i % 2 = 0 THEN v END)
          + max(CASE WHEN i % 2 = 1 THEN v END)) / 2 AS v,
         (max(CASE WHEN i % 2 = 0 THEN v END)
          - max(CASE WHEN i % 2 = 1 THEN v END)) / 2 AS d
  FROM l1 GROUP BY event_type, i // 2 HAVING count(*) = 2
),
l3 AS (
  SELECT event_type, i // 2 AS i,
         (max(CASE WHEN i % 2 = 0 THEN v END)
          + max(CASE WHEN i % 2 = 1 THEN v END)) / 2 AS v,
         (max(CASE WHEN i % 2 = 0 THEN v END)
          - max(CASE WHEN i % 2 = 1 THEN v END)) / 2 AS d
  FROM l2 GROUP BY event_type, i // 2 HAVING count(*) = 2
)
SELECT event_type, CAST(1 AS INT) AS level, count(*) AS n_coef,
       CAST(SUM(CAST(round(d * 10000) AS BIGINT)
                * CAST(round(d * 10000) AS BIGINT)) AS BIGINT) AS detail_e8
FROM l1 GROUP BY event_type
UNION ALL
SELECT event_type, CAST(2 AS INT), count(*),
       CAST(SUM(CAST(round(d * 10000) AS BIGINT)
                * CAST(round(d * 10000) AS BIGINT)) AS BIGINT)
FROM l2 GROUP BY event_type
UNION ALL
SELECT event_type, CAST(3 AS INT), count(*),
       CAST(SUM(CAST(round(d * 10000) AS BIGINT)
                * CAST(round(d * 10000) AS BIGINT)) AS BIGINT)
FROM l3 GROUP BY event_type
""",
        # ev_dtw_template: DTW via an unrolled row-DP recursive CTE --
        # each cell |int-int| + min of exact values, integer-valued in
        # doubles, so any DP visit order (the Spark kernel iterates
        # anti-diagonals) yields byte-identical results; DuckDB lateral
        # column aliases express the within-row left dependency
        "ev_dtw_template": """
WITH RECURSIVE per AS (
  SELECT event_type, (epoch_us(ts) // 1000000) // 3600 AS h, COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT event_type, MIN(h) AS h0, MAX(h) AS h1 FROM per GROUP BY 1
),
grid AS (
  SELECT event_type, unnest(generate_series(h0, h1)) AS h FROM bounds
),
dense AS (
  SELECT g.event_type, g.h, COALESCE(p.c, 0) AS c
  FROM grid g
  LEFT JOIN per p ON p.event_type = g.event_type AND p.h = g.h
),
ser AS (
  SELECT event_type, list(CAST(c AS DOUBLE) ORDER BY h) AS xs,
         COUNT(*)::BIGINT AS n
  FROM dense GROUP BY 1
),
pat AS (SELECT [0.0, 10.0, 40.0, 80.0, 40.0, 10.0, 0.0, 0.0] AS p),
rec AS (
  SELECT event_type, n, 1 AS i,
         abs(xs[1] - p[1]) AS r1,
         abs(xs[1] - p[2]) + r1 AS r2,
         abs(xs[1] - p[3]) + r2 AS r3,
         abs(xs[1] - p[4]) + r3 AS r4,
         abs(xs[1] - p[5]) + r4 AS r5,
         abs(xs[1] - p[6]) + r5 AS r6,
         abs(xs[1] - p[7]) + r6 AS r7,
         abs(xs[1] - p[8]) + r7 AS r8
  FROM ser, pat
  UNION ALL
  SELECT rec.event_type, rec.n, rec.i + 1,
         abs(xs[rec.i + 1] - p[1]) + r1 AS s1,
         abs(xs[rec.i + 1] - p[2]) + least(r2, s1, r1) AS s2,
         abs(xs[rec.i + 1] - p[3]) + least(r3, s2, r2) AS s3,
         abs(xs[rec.i + 1] - p[4]) + least(r4, s3, r3) AS s4,
         abs(xs[rec.i + 1] - p[5]) + least(r5, s4, r4) AS s5,
         abs(xs[rec.i + 1] - p[6]) + least(r6, s5, r5) AS s6,
         abs(xs[rec.i + 1] - p[7]) + least(r7, s6, r6) AS s7,
         abs(xs[rec.i + 1] - p[8]) + least(r8, s7, r7) AS s8
  FROM rec JOIN ser USING (event_type), pat
  WHERE rec.i < rec.n
)
SELECT event_type, 'burst' AS ref_id, n AS n_points, r8 AS dtw_dist
FROM rec WHERE i = n
""",
        # ev_props_stats: JSON-bag field extraction; NULL-on-missing in
        # both engines, integer-exact aggregates after the cast
        "ev_props_stats": """
SELECT event_type,
       COUNT(CAST(props ->> '$.k' AS BIGINT)) AS n_with_k,
       SUM(CAST(props ->> '$.k' AS BIGINT)) AS sum_k,
       MIN(CAST(props ->> '$.k' AS BIGINT)) AS min_k,
       MAX(CAST(props ->> '$.k' AS BIGINT)) AS max_k
FROM events GROUP BY event_type
""",
        # ev_funnel: chained strict-after min-aggregates, one row per
        # user per stage; timestamps compare exactly
        "ev_funnel": """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t FROM events
  WHERE event_type = 'view' GROUP BY 1
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1
)
SELECT CAST(1 AS INT) AS step, 'view' AS step_name, COUNT(*) AS n_users FROM s1
UNION ALL SELECT CAST(2 AS INT), 'click', COUNT(*) FROM s2
UNION ALL SELECT CAST(3 AS INT), 'purchase', COUNT(*) FROM s3
""",
        # ev_retention: epoch-day floor ≡ Spark's unix_timestamp//86400;
        # (u, d) distinct first so counts are distinct active users
        "ev_retention": """
WITH acts AS (
  SELECT DISTINCT user_id AS u,
         (epoch_us(ts) // 1000000) // 86400 AS d
  FROM events
),
f AS (SELECT u, MIN(d) AS d0 FROM acts GROUP BY 1)
SELECT f.d0 AS cohort_day, a.d - f.d0 AS day_offset,
       COUNT(*) AS n_users
FROM acts a JOIN f USING (u)
WHERE a.d - f.d0 <= 7
GROUP BY 1, 2
""",
        # gaps-and-islands: identical lag→change→running-sum grouping
        "ev_state_runs": """
WITH s AS (
  SELECT user_id, ts, event_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events
),
r AS (
  SELECT user_id, ts, event_type,
         SUM(CASE WHEN prev IS NULL OR prev <> event_type
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS run_id
  FROM s
)
SELECT user_id, CAST(run_id AS BIGINT) AS run_id, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(ts) AS start_ts, MAX(ts) AS end_ts
FROM r GROUP BY 1, 2, 3
""",
        # transition counts exact; p one division of exact int64s
        "ev_markov": """
WITH p AS (
  SELECT LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS from_state,
         event_type AS to_state
  FROM events
),
c AS (
  SELECT from_state, to_state, CAST(COUNT(*) AS BIGINT) AS n
  FROM p WHERE from_state IS NOT NULL GROUP BY 1, 2
)
SELECT from_state, to_state, n,
       CAST(n AS DOUBLE) /
       CAST(CAST(SUM(n) OVER (PARTITION BY from_state) AS BIGINT)
            AS DOUBLE) AS p
FROM c
""",
        # denominator-cleared PH: every running quantity int64 — the
        # alarm tick compares identical integers in both engines
        "ev_page_hinkley": """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS tick, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
),
axis AS (
  SELECT unnest(generate_series((SELECT MIN(tick) FROM hourly),
                                (SELECT MAX(tick) FROM hourly),
                                INTERVAL 1 HOUR)) AS tick
),
keys AS (SELECT DISTINCT event_type FROM hourly),
dense AS (
  SELECT k.event_type, CAST(a.tick AS TIMESTAMP) AS tick,
         CAST(COALESCE(h.n_events, 0) AS BIGINT) AS n_events
  FROM keys k CROSS JOIN axis a
  LEFT JOIN hourly h ON h.event_type = k.event_type AND h.tick = a.tick
),
rn AS (
  SELECT event_type, tick, n_events,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY tick) AS rn
  FROM dense
),
cal AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN rn <= 24 THEN n_events END) AS BIGINT) AS sc,
         CAST(SUM(CASE WHEN rn <= 24 THEN 1 ELSE 0 END) AS BIGINT) AS d
  FROM rn GROUP BY 1
),
e AS (
  SELECT r.event_type, r.tick, c.d, c.sc,
         c.d * r.n_events - c.sc - c.d * 1 AS e
  FROM rn r JOIN cal c USING (event_type)
  WHERE r.rn > 24
),
p AS (
  SELECT event_type, tick, d, sc,
         CAST(SUM(e) OVER (PARTITION BY event_type ORDER BY tick
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS p
  FROM e
),
q AS (
  SELECT event_type, tick, d, sc, p,
         p - CAST(MIN(p) OVER (PARTITION BY event_type ORDER BY tick
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ph
  FROM p
)
SELECT event_type,
       MIN(d) AS calib_n,
       MIN(sc) AS calib_sum,
       CAST(COUNT(*) AS BIGINT) AS n_scored,
       CAST(MAX(ph) AS BIGINT) AS max_ph_scaled,
       CAST(MAX(ph) AS DOUBLE) / CAST(MIN(d) AS DOUBLE) AS max_ph,
       MIN(CASE WHEN ph > d * 50 THEN tick END) AS first_alarm_ts
FROM q GROUP BY 1
""",
        # both MAE numerators exact int64; mase one division of exact
        # cross-products
        "ev_seasonal_skill": """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS tick, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
),
axis AS (
  SELECT unnest(generate_series((SELECT MIN(tick) FROM hourly),
                                (SELECT MAX(tick) FROM hourly),
                                INTERVAL 1 HOUR)) AS tick
),
keys AS (SELECT DISTINCT event_type FROM hourly),
dense AS (
  SELECT k.event_type, CAST(a.tick AS TIMESTAMP) AS tick,
         CAST(COALESCE(h.n_events, 0) AS BIGINT) AS n_events
  FROM keys k CROSS JOIN axis a
  LEFT JOIN hourly h ON h.event_type = k.event_type AND h.tick = a.tick
),
d AS (
  SELECT event_type,
         abs(n_events - LAG(n_events, 1)
               OVER (PARTITION BY event_type ORDER BY tick)) AS a1,
         abs(n_events - LAG(n_events, 24)
               OVER (PARTITION BY event_type ORDER BY tick)) AS a24
  FROM dense
),
a AS (
  SELECT event_type,
         CAST(COUNT(a1) AS BIGINT) AS n1,
         CAST(COALESCE(SUM(a1), 0) AS BIGINT) AS s1,
         CAST(COUNT(a24) AS BIGINT) AS n24,
         CAST(COALESCE(SUM(a24), 0) AS BIGINT) AS s24
  FROM d GROUP BY 1
)
SELECT event_type, n1 AS n1, s1 AS sae_naive1,
       n24 AS n_seasonal, s24 AS sae_seasonal,
       CASE WHEN n1 > 0 THEN CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) END
         AS mae_naive1,
       CASE WHEN n24 > 0 THEN CAST(s24 AS DOUBLE) / CAST(n24 AS DOUBLE) END
         AS mae_seasonal,
       CASE WHEN n24 > 0 AND s1 > 0 THEN
         CAST(s24 * n1 AS DOUBLE) / CAST(s1 * n24 AS DOUBLE) END AS mase
FROM a
""",
        # identical md5 hex prefix → identical 20-bit u → identical
        # one-division rank key in both engines
        "doc_weighted_sample": """
WITH t AS (
  SELECT doc_id, source, n_chars,
         CAST(('0x' || substr(md5(doc_id || chr(31) || 'r5w'), 1, 5))
              AS BIGINT) + 1 AS u
  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
),
r AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (
           PARTITION BY source
           ORDER BY CAST(u AS DOUBLE) / CAST(n_chars AS DOUBLE), doc_id
         ) AS rn
  FROM t
)
SELECT doc_id, source, n_chars FROM r WHERE rn <= 10
""",
        # merged-support step CDFs: exact int64 cumulations, two IEEE
        # divisions per support point, max of identical doubles
        "ev_ks_drift": """
WITH c AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS slice,
         CAST(round(value * 100) AS BIGINT) AS cents,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2, 3
),
sl AS (
  SELECT event_type, slice,
         LAG(slice) OVER (PARTITION BY event_type ORDER BY slice) AS prev
  FROM (SELECT DISTINCT event_type, slice FROM c)
),
pr AS (SELECT * FROM sl WHERE prev IS NOT NULL),
u AS (
  SELECT c.event_type, p.slice AS pair, c.cents,
         CAST(0 AS BIGINT) AS cp, c.n AS cc
  FROM c JOIN pr p ON c.event_type = p.event_type AND c.slice = p.slice
  UNION ALL
  SELECT c.event_type, p.slice AS pair, c.cents, c.n AS cp,
         CAST(0 AS BIGINT) AS cc
  FROM c JOIN pr p ON c.event_type = p.event_type AND c.slice = p.prev
),
g AS (
  SELECT event_type, pair, cents,
         CAST(SUM(cp) AS BIGINT) AS cp, CAST(SUM(cc) AS BIGINT) AS cc
  FROM u GROUP BY 1, 2, 3
),
st AS (
  SELECT event_type, pair,
         CAST(SUM(cp) OVER wo AS BIGINT) AS cum_p,
         CAST(SUM(cc) OVER wo AS BIGINT) AS cum_c,
         CAST(SUM(cp) OVER wp AS BIGINT) AS np,
         CAST(SUM(cc) OVER wp AS BIGINT) AS nc
  FROM g
  WINDOW wo AS (PARTITION BY event_type, pair ORDER BY cents
                ROWS UNBOUNDED PRECEDING),
         wp AS (PARTITION BY event_type, pair)
)
SELECT event_type, pair AS slice,
       MIN(np) AS n_prev, MIN(nc) AS n_cur,
       MAX(abs(CAST(cum_p AS DOUBLE) / CAST(np AS DOUBLE)
               - CAST(cum_c AS DOUBLE) / CAST(nc AS DOUBLE))) AS ks
FROM st GROUP BY 1, 2
""",
        # running MAX of conditional timestamps over strictly-preceding
        # rows = latest prior touch; gap exact integer seconds
        "ev_last_touch": """
WITH s AS (
  SELECT user_id, ts, event_id, event_type,
         MAX(CASE WHEN event_type = 'click' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_touch_ts
  FROM events
)
SELECT user_id, ts, event_id, last_touch_ts,
       CAST(epoch_us(ts) // 1000000
            - epoch_us(last_touch_ts) // 1000000 AS BIGINT) AS gap_s,
       COALESCE(epoch_us(ts) // 1000000
                - epoch_us(last_touch_ts) // 1000000 <= 604800, FALSE)
         AS attributed
FROM s WHERE event_type = 'purchase'
""",
        # S and Var·18 exact int64 (tie-corrected); z replays the same
        # /18 → sqrt → divide op order — sqrt is correctly rounded IEEE
        "ev_mann_kendall": """
WITH daily AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '2024-01-01',
                        CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS t,
         SUM(CAST(round(value * 100) AS BIGINT)) AS v
  FROM events GROUP BY 1, 2
),
sgns AS (
  SELECT a.event_type,
         CASE WHEN b.v > a.v THEN 1 WHEN b.v < a.v THEN -1 ELSE 0 END AS sg
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND b.t > a.t
),
ss AS (
  SELECT event_type, CAST(COALESCE(SUM(sg), 0) AS BIGINT) AS s
  FROM sgns GROUP BY 1
),
tg AS (
  SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS tt
  FROM daily GROUP BY 1, 2
),
vv AS (
  SELECT event_type,
         CAST(SUM(tt * (tt - 1) * (2 * tt + 5)) AS BIGINT) AS tie18,
         CAST(COUNT(*) AS BIGINT) AS n_groups
  FROM tg GROUP BY 1
),
nn AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM daily GROUP BY 1)
SELECT nn.event_type, nn.n AS n_pts,
       COALESCE(ss.s, 0) AS s,
       CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5) - vv.tie18 AS BIGINT) AS var18,
       CASE
         WHEN nn.n * (nn.n - 1) * (2 * nn.n + 5) - vv.tie18 <= 0 THEN NULL
         WHEN ss.s = 0 THEN 0.0
         ELSE CAST(ss.s - CASE WHEN ss.s > 0 THEN 1 ELSE -1 END AS DOUBLE)
              / sqrt(CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5) - vv.tie18
                          AS DOUBLE) / 18.0)
       END AS z
FROM nn
JOIN vv ON vv.event_type = nn.event_type
LEFT JOIN ss ON ss.event_type = nn.event_type
""",
        # same word-window construction as dup_spans; MIN(doc_id) per
        # gram is the novelty arbiter; counts int64 + one division
        "doc_novelty": """
WITH wl AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'),
                     x -> x != '') AS wl
  FROM documents
),
g AS (
  SELECT DISTINCT doc_id,
         array_to_string(wl[u.j + 1 : u.j + 8], ' ') AS gram
  FROM wl, unnest(generate_series(0, len(wl) - 8)) u(j)
  WHERE len(wl) >= 8
),
f AS (SELECT gram, MIN(doc_id) AS first_doc FROM g GROUP BY 1)
SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       CAST(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
            AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS novelty
FROM g JOIN f USING (gram) GROUP BY 1
""",
        # gap-filled grid -> boolean islands -> SLA aggregate; worst
        # outage start = MIN start among max-length down runs
        "ev_availability": """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS tick, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
),
axis AS (
  SELECT unnest(generate_series((SELECT MIN(tick) FROM hourly),
                                (SELECT MAX(tick) FROM hourly),
                                INTERVAL 1 HOUR)) AS tick
),
keys AS (SELECT DISTINCT event_type FROM hourly),
dense AS (
  SELECT k.event_type, CAST(a.tick AS TIMESTAMP) AS tick,
         (COALESCE(h.n_events, 0) > 0) AS up
  FROM keys k CROSS JOIN axis a
  LEFT JOIN hourly h ON h.event_type = k.event_type AND h.tick = a.tick
),
st AS (
  SELECT event_type, tick, up,
         LAG(up) OVER (PARTITION BY event_type ORDER BY tick) AS prev
  FROM dense
),
r AS (
  SELECT event_type, tick, up,
         SUM(CASE WHEN prev IS NULL OR prev <> up THEN 1 ELSE 0 END)
           OVER (PARTITION BY event_type ORDER BY tick
                 ROWS UNBOUNDED PRECEDING) AS rid
  FROM st
),
runs AS (
  SELECT event_type, rid, up, CAST(COUNT(*) AS BIGINT) AS n,
         MIN(tick) AS start_ts
  FROM r GROUP BY 1, 2, 3
),
agg AS (
  SELECT event_type,
         CAST(SUM(n) AS BIGINT) AS n_ticks,
         CAST(COALESCE(SUM(CASE WHEN up THEN n END), 0) AS BIGINT) AS n_up,
         CAST(COALESCE(SUM(CASE WHEN NOT up THEN n END), 0) AS BIGINT)
           AS n_down,
         CAST(COALESCE(SUM(CASE WHEN NOT up THEN 1 END), 0) AS BIGINT)
           AS n_outages,
         CAST(MAX(CASE WHEN NOT up THEN n END) AS BIGINT) AS longest_down
  FROM runs GROUP BY 1
),
ws AS (
  SELECT event_type, n AS wn, MIN(start_ts) AS ws
  FROM runs WHERE NOT up GROUP BY 1, 2
)
SELECT a.event_type, a.n_ticks, a.n_up, a.n_down,
       CAST(a.n_up AS DOUBLE) / CAST(a.n_ticks AS DOUBLE) AS availability,
       a.n_outages, a.longest_down, w.ws AS longest_down_start
FROM agg a
LEFT JOIN ws w
  ON w.event_type = a.event_type AND w.wn = a.longest_down
""",
        # integer token-bucket recursion replayed exactly: LEAST-clamped
        # refill, conditional consumption, per-event admission bits
        "ev_rate_limit": """
WITH RECURSIVE g AS (
  SELECT user_id, ts, event_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         CAST(epoch_us(ts) // 1000000
              - LAG(epoch_us(ts) // 1000000)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id)
              AS BIGINT) AS gap
  FROM events
),
rec AS (
  SELECT user_id, ts, event_id, rn,
         CAST(0 AS BIGINT) AS gap_s,
         CAST(3600 AS BIGINT) AS bucket_before,
         TRUE AS admitted,
         CAST(0 AS BIGINT) AS bucket_after
  FROM g WHERE rn = 1
  UNION ALL
  SELECT g.user_id, g.ts, g.event_id, g.rn,
         g.gap,
         LEAST(3600, rec.bucket_after + 1 * g.gap),
         LEAST(3600, rec.bucket_after + 1 * g.gap) >= 3600,
         CASE WHEN LEAST(3600, rec.bucket_after + 1 * g.gap) >= 3600
              THEN LEAST(3600, rec.bucket_after + 1 * g.gap) - 3600
              ELSE LEAST(3600, rec.bucket_after + 1 * g.gap) END
  FROM rec JOIN g ON g.user_id = rec.user_id AND g.rn = rec.rn + 1
)
SELECT user_id, ts, event_id, gap_s, bucket_before, admitted, bucket_after
FROM rec
""",
        # minhash_pairs' md5 candidate construction, overlap-coefficient
        # verification kernel
        "doc_overlap_pairs": """
WITH sh AS (
  SELECT doc_id,
         list_distinct([text[i:i+7]
                        for i in generate_series(1, greatest(length(text)-7, 1), 2)])
           AS s
  FROM documents
),
sig AS (
  SELECT doc_id,
         list_min(list_transform(s, x -> md5('0' || x))) AS sig0,
         list_min(list_transform(s, x -> md5('1' || x))) AS sig1,
         list_min(list_transform(s, x -> md5('2' || x))) AS sig2,
         list_min(list_transform(s, x -> md5('3' || x))) AS sig3
  FROM sh
),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sig a JOIN sig b
    ON a.doc_id < b.doc_id
   AND ((a.sig0 = b.sig0 AND a.sig1 = b.sig1)
        OR (a.sig2 = b.sig2 AND a.sig3 = b.sig3))
),
v AS (
  SELECT c.doc_a, c.doc_b,
         len(list_intersect(x.s, y.s))::DOUBLE /
         greatest(least(len(x.s), len(y.s)), 1) AS oc
  FROM cand c
  JOIN sh x ON x.doc_id = c.doc_a
  JOIN sh y ON y.doc_id = c.doc_b
)
SELECT doc_a, doc_b, round(oc, 4) AS overlap FROM v WHERE oc >= 0.5
""",
        # components closure + quality replay + the same (q desc, id)
        # keep window
        "doc_canonical": r"""
WITH RECURSIVE sh AS (
  SELECT doc_id,
         list_distinct([text[i:i+7]
                        for i in generate_series(1, greatest(length(text)-7, 1), 2)])
           AS s
  FROM documents
),
sig AS (
  SELECT doc_id,
         list_min(list_transform(s, x -> md5('0' || x))) AS sig0,
         list_min(list_transform(s, x -> md5('1' || x))) AS sig1,
         list_min(list_transform(s, x -> md5('2' || x))) AS sig2,
         list_min(list_transform(s, x -> md5('3' || x))) AS sig3
  FROM sh
),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sig a JOIN sig b
    ON a.doc_id < b.doc_id
   AND ((a.sig0 = b.sig0 AND a.sig1 = b.sig1)
        OR (a.sig2 = b.sig2 AND a.sig3 = b.sig3))
),
v AS (
  SELECT c.doc_a, c.doc_b
  FROM cand c
  JOIN sh x ON x.doc_id = c.doc_a
  JOIN sh y ON y.doc_id = c.doc_b
  WHERE len(list_intersect(x.s, y.s))::DOUBLE /
        greatest(len(list_distinct(list_concat(x.s, y.s))), 1) >= 0.3
),
e AS (
  SELECT doc_a AS a, doc_b AS b FROM v
  UNION
  SELECT doc_b, doc_a FROM v
),
reach(id, comp) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.a, r.comp FROM e JOIN reach r ON e.b = r.id
),
lab AS (SELECT id AS doc_id, MIN(comp) AS component FROM reach GROUP BY id),
f AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(lower(trim(text)), '\s+'),
                     x -> length(x) > 0) AS toks,
         (length(text) -
          length(regexp_replace(text, '[^\p{L}\p{N}\s]', '', 'g')))
           / greatest(length(text), 1)::DOUBLE AS punct
  FROM documents
),
qs AS (
  SELECT doc_id,
         floor((0.4 * least(length(text) / 200.0, 1.0)
                + 0.3 * (1 - least(punct * 4, 1.0))
                + 0.3 * least((CASE WHEN len(toks) = 0 THEN 0.0
                    ELSE len(list_filter(toks, x -> list_contains(
                      ['the','a','an','and','or','of','to','in','is','it',
                       'that','for','on','with','as','was','were','be','this'],
                      x))) / len(toks)::DOUBLE END) * 3, 1.0))
               * 10000 + 0.5 + 1e-9) / 10000 AS q
  FROM f
),
j AS (
  SELECT l.component, l.doc_id, qs.q,
         row_number() OVER (PARTITION BY l.component
                            ORDER BY qs.q DESC, l.doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY l.component) AS n_members
  FROM lab l JOIN qs ON qs.doc_id = l.doc_id
)
SELECT component, doc_id AS keep_doc, q,
       CAST(n_members AS BIGINT) AS n_members
FROM j WHERE rn = 1
""",
    }
