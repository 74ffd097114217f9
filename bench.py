"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value" (total sec), "unit": "sec", "queries": {name:
sec}, "sf", plus engine-metric extras (tokens/sec through the full
raw→hourly→daily tier pipeline — the BASELINE.json headline)}.

The flagship pipeline benches the engine itself on the deterministic
synthetic sequences table (N docs via $SPARK_GRAFT_BENCH_DOCS, default
50k ≈ 8M token points): explode → cell shuffle → hourly → daily →
gorilla-pack, all counted end-to-end.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from repurpose_spark.config import EngineConfig  # noqa: E402
from repurpose_spark.operators.encode import encode_series  # noqa: E402
from repurpose_spark.operators.reorient import sequences_to_points  # noqa: E402
from repurpose_spark.operators.rollup import (  # noqa: E402
    rollup_from_partials,
    rollup_points,
)
from repurpose_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "200000"))

HEADLINE = [
    "ev_hourly_rollup",
    "ev_daily_from_hourly",
    "ev_gapfill_hourly",
    "ev_asof_6h",
    "ev_first_per_slot",
    "tpch_q1",
    "revenue_by_nation",
    "semi_join_parts",
    "doc_token_counts",
    "doc_minhash_pairs",
    "doc_quality_score",
    "doc_curation",
    "doc_pack_assignments",
    "doc_contamination",
    "knn_resample_weighted",
    "emb_topk",
    "emb_lsh_topk",
    "emb_near_dup_pairs",
    "doc_mixture",
    "mm_decode_stats",
]


def run_tier_pipeline(spark, n_docs: int) -> dict:
    """Flagship engine metric: rolled-up tokens/sec across tiers."""
    from repurpose_spark.sources.synthetic import synth_sequences

    cfg = EngineConfig(n_cells=max(CPUS * 4, 64))
    t0 = time.time()
    seqs = synth_sequences(spark, n_docs, skew=True)
    n_tokens = seqs.agg(F.sum("n_tok")).collect()[0][0]  # scan, no explode
    pts = sequences_to_points(seqs, cfg, with_ts=False)
    # hourly is the only tier computed from raw points; it is cached (it is
    # ~50x smaller) and daily/packed re-aggregate the partials — the
    # partial+final architecture, so the explode+shuffle happens once.
    # integer-bucket rollup: timestamps materialize post-agg, not per token
    hourly = rollup_points(
        pts, 3600, dt_seconds=cfg.dt_seconds, epoch=cfg.epoch
    ).cache()
    n_hourly = hourly.count()
    daily = rollup_from_partials(hourly, "day")
    packed = encode_series(
        hourly.withColumn("avg_v", F.col("sum_v") / F.col("n_points")),
        int_cols=["sum_v", "n_points"],
        float_cols=["avg_v"],
    )
    n_daily = daily.count()
    n_packed = packed.count()
    dt = time.time() - t0
    hourly.unpersist()
    return {
        "pipeline_sec": round(dt, 3),
        "n_tokens": n_tokens,
        "n_hourly": n_hourly,
        "n_daily": n_daily,
        "n_packed": n_packed,
        "tokens_per_sec": round(n_tokens / dt, 1),
    }


def run_durable_pipeline(spark, n_docs: int) -> dict:
    """The BASELINE.json headline in its durable form: TierPipeline.run
    end-to-end (batched parquet commits, ledger, daily+packed tiers)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F  # noqa: F811

    from repurpose_spark.plans.pipeline import TierPipeline
    from repurpose_spark.sources.synthetic import synth_sequences
    from repurpose_spark.sources.tables import Warehouse

    cfg = EngineConfig(n_cells=64)
    root = tempfile.mkdtemp(prefix="bench_wh_")
    # stage the synthetic table to parquet (untimed — at scale the input
    # IS a table on storage) so the timed run exercises the file-sliced
    # batch path: each batch scans only its own ~1/n_batches of the files
    in_path = tempfile.mkdtemp(prefix="bench_in_") + "/seqs"
    seqs = synth_sequences(spark, n_docs, skew=True, numPartitions=64)
    seqs.write.parquet(in_path)
    n_tokens = seqs.agg(F.sum("n_tok")).collect()[0][0]
    t0 = time.time()
    TierPipeline(spark, Warehouse(spark, root), cfg, job_id="bench").run(
        input_path=in_path, n_batches=2
    )
    dt = time.time() - t0
    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(os.path.dirname(in_path), ignore_errors=True)
    return {
        "durable_sec": round(dt, 3),
        "n_tokens": n_tokens,
        "durable_tokens_per_sec": round(n_tokens / dt, 1),
    }


def _hw_probe(workers: int = 8, total_ops: int = 6_400_000) -> dict:
    """Spark-free sha256 probe (same as scripts/bench_scaling.py): this
    VM shows minute-scale steal oscillations that can double a pass;
    bracketing probes ride in the output JSON so a reader can tell a
    regression from a bad host window."""
    import multiprocessing as mp

    t0 = time.time()
    with mp.Pool(workers) as p:
        p.map(_hw_burn, [total_ops // workers] * workers)
    dt = time.time() - t0
    return {"workers": workers, "ops_per_sec": round(total_ops / dt, 1)}


def _hw_burn(n):
    import hashlib

    h = b"x" * 64
    for _ in range(n):
        h = hashlib.sha256(h).digest()
    return h[0]


def main():
    probe_open = _hw_probe()
    spark = get_spark(
        app_name="repurpose_spark_bench", master=f"local[{CPUS}]"
    )
    spark.sparkContext.setLogLevel("ERROR")

    # headline names may live in either registry (queries() is capped at
    # the driver's 50-entry certification window; overflow in extras)
    qs = {**entry.queries(), **entry.extra_queries()}
    times = {}
    total = 0.0

    # JIT/codegen warm-up on a miniature pipeline (untimed): local-mode
    # cold-start compilation otherwise dominates the first measurement.
    # The durable path additionally spawns the Arrow codec's python
    # workers and the commit machinery, so it gets its own miniature
    # warm-up (same methodology as scripts/run_tiers.py)
    run_tier_pipeline(spark, 1000)
    run_durable_pipeline(spark, 2000)

    # this VM shows transient multi-second host-steal bursts (the
    # Spark-free sha256 probe stays healthy between them) that can double
    # a single sustained run.  VERDICT r2 bench hygiene: record ALL
    # passes and headline the MEDIAN, same pass count every round, so
    # round-over-round comparisons are like-for-like.
    import statistics

    trials_f = [
        run_tier_pipeline(spark, N_DOCS)["pipeline_sec"] for _ in range(4)
    ]
    flag = run_tier_pipeline(spark, N_DOCS)  # row counts from a 5th pass
    trials_f.append(flag["pipeline_sec"])
    t_flag = statistics.median(trials_f)
    times["tier_pipeline"] = round(t_flag, 3)
    total += t_flag

    runs_d = [run_durable_pipeline(spark, N_DOCS) for _ in range(3)]
    trials_d = [r["durable_sec"] for r in runs_d]
    t_dur = statistics.median(trials_d)
    times["tier_pipeline_durable"] = round(t_dur, 3)
    total += t_dur

    all_passes = {"tier_pipeline": trials_f, "tier_pipeline_durable": trials_d}
    for name in HEADLINE:
        per = []
        for _ in range(3):
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            per.append(round(time.time() - t0, 3))
        dt = statistics.median(per)
        all_passes[name] = per
        times[name] = round(dt, 3)
        total += dt

    out = {
        "metric": "total_sec_headline",
        "value": round(total, 3),
        "unit": "sec",
        "queries": times,
        "passes": all_passes,
        "estimator": "median (pipelines n=5/3, queries n=3)",
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "cpus": CPUS,
        "bench_docs": N_DOCS,
        "tokens_per_sec": round(flag["n_tokens"] / t_flag, 1),
        # the durable runs' OWN token count — not the compute pipeline's
        # (ADVICE r3 low #5: a drift between the two synth_sequences
        # calls would silently skew the headline metric)
        "durable_tokens_per_sec": round(runs_d[0]["n_tokens"] / t_dur, 1),
        "tier_rows": {
            "tokens": flag["n_tokens"],
            "hourly": flag["n_hourly"],
            "daily": flag["n_daily"],
            "packed": flag["n_packed"],
        },
    }
    spark.stop()
    out["hw_probe_open"] = probe_open
    out["hw_probe_close"] = _hw_probe()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
