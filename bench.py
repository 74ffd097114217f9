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
    "ev_value_quantiles",
    "doc_bpe_roundtrip",
    "ev_interval_join",
    "ev_m4",
    "ev_rolling_median",
    "doc_bigram_lift",
    "ev_rollup_routed_6h",
    "doc_bm25",
    "doc_sample_bottomk",
    "doc_line_dedup",
    "doc_edit_dup_pairs",
    "ev_haar_energy",
    "ev_dtw_template",
    "doc_zipf_slope",
    "ev_props_stats",
    "ev_funnel",
    "ev_retention",
    "ev_interval_coverage",
    "ev_trimmed_daily",
    "doc_heaps_beta",
    "ev_spearman_hourly",
    "ev_max_drawdown",
    "doc_token_gini",
    "doc_systematic_sample",
    "doc_source_kl",
    "ev_allan_variance",
    "ev_interarrival_cv",
    "ev_equidepth_profile",
    "ev_benford",
    "doc_oov_rate",
    "ev_state_runs",
    "ev_markov",
    "ev_page_hinkley",
    "ev_seasonal_skill",
    "doc_weighted_sample",
    "ev_ks_drift",
    "ev_last_touch",
    "ev_mann_kendall",
    "doc_novelty",
    "ev_availability",
    "ev_rate_limit",
    "emb_int8_roundtrip",
    "doc_overlap_pairs",
    "doc_canonical",
]

# ev_stream_page_hinkley is certified in the extras gate but kept out of
# the bench headline: its wall is dominated by the drain harness's two
# mtime-ordering sleeps, not engine work


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


def _mem_probe(n: int = 1 << 22) -> dict:
    """Cold-page random-gather probe — the failure mode sha256 CANNOT
    see.  Round-5 finding: this Firecracker host demand-pages guest
    memory at the hypervisor; in a bad window every cold page touch
    costs ~10µs, collapsing random access to ~1-3M elem/s (healthy:
    50M+) and JVM-heavy Spark work by 10-40×, while the register-bound
    sha probe still reads a mild 60-70%.  Fresh allocations each call
    keep the measurement cold on purpose (Spark allocates fresh pages
    constantly, so cold-fault cost IS its steady state in that window).
    Measured 2026-08-18: same 100k-doc tier run, same code, 61s in a
    gather-collapsed window vs ~4s expected from the r04d window."""
    import numpy as np

    # Median of 3 independent cold rounds (fresh arrays each round).  A
    # single round is noisy near the gate: a healthy window still pays
    # one burst of first-touch zeroing on a fresh process's first big
    # allocation (measured 9-62 M elem/s round-to-round on a clean
    # host), while the pathological window reads <5 on EVERY round.
    # The median keeps the probe cold-by-construction but lets one
    # outlier round get outvoted instead of vetoing a clean window.
    rates = []
    for r in range(3):
        rng = np.random.default_rng((int(time.time()) & 0xFFFF) + r)
        perm = rng.permutation(n).astype(np.int64)  # fresh pages
        src = np.arange(n, dtype=np.int64)          # fresh pages
        t0 = time.time()
        src[perm].sum()                             # random gather, cold dst
        dt = time.time() - t0
        rates.append(round(n / dt / 1e6, 1))
    return {"elems": n, "rounds": rates,
            "gather_melems_per_sec": sorted(rates)[1]}


# probe-gated measurement windows (VERDICT r4 #5): a window is healthy
# when its bracketing probes agree within PROBE_AGREE and neither sits
# below PROBE_BAND of the best probe seen this run (the band is
# run-relative — absolute floors are brittle across host generations;
# the absolute M ops/s still rides in the JSON for cross-round reads).
# Unhealthy windows re-run up to PROBE_RETRIES extra times; a final
# sweep re-checks every window against the END-of-run reference, so an
# early window measured before the host recovered gets re-run too.
# thresholds sized to catch what actually corrupted past rounds' cites
# (multi-second steal bursts ~2x and 60%-speed host windows), NOT this
# VM's chronic minute-scale ±10-20% wobble — at 0.15/0.85 nearly every
# window on a wobbly-but-fine host flags and the gate stops meaning
# anything (measured while building: probes 9.0-11.9 M ops/s within one
# sf0.01 run)
PROBE_AGREE = float(os.environ.get("SPARK_GRAFT_PROBE_AGREE", "0.25"))
PROBE_BAND = float(os.environ.get("SPARK_GRAFT_PROBE_BAND", "0.75"))
PROBE_RETRIES = int(os.environ.get("SPARK_GRAFT_BENCH_RETRIES", "2"))
# Mid-pass steal bursts can straddle two agreeing, in-band INSTANTANEOUS
# probes (observed in a round-5 rerun: tier passes 5.9→92 s inside a
# bracket the sha probes certified).  Repeated passes of the same
# deterministic job in one window must also agree with EACH OTHER: a
# window whose passes spread beyond DISP_MAX× is unhealthy regardless of
# its probes.  The absolute floor keeps sub-second queries' normal
# jitter (±0.1–0.3 s swings on 0.2 s walls) from flagging every window.
DISP_MAX = float(os.environ.get("SPARK_GRAFT_BENCH_DISP_MAX", "2.0"))
DISP_ABS_S = float(os.environ.get("SPARK_GRAFT_BENCH_DISP_ABS_S", "1.0"))


class _ProbeGate:
    def __init__(self):
        self.all = []  # every probe seen this run (ops/s)
        self.records = {}

    @property
    def ref(self):
        """Run reference = MEDIAN of all probes — a single steal-free
        spike must not poison the band for an otherwise self-consistent
        run (observed while building: one 14.5 M ops/s probe in a run
        whose typical probe was ~9 flagged every window under a
        max-based reference)."""
        import statistics

        return statistics.median(self.all) if self.all else 0.0

    def _window(self, p0, p1):
        self.all += [p0, p1]
        lo, hi = min(p0, p1), max(p0, p1)
        return {
            "open_mops": round(p0 / 1e6, 2),
            "close_mops": round(p1 / 1e6, 2),
            "agree": (hi - lo) <= PROBE_AGREE * hi,
            "min_mops": round(lo / 1e6, 2),
        }

    def healthy(self, rec):
        return (
            rec["agree"]
            and rec["min_mops"] * 1e6 >= PROBE_BAND * self.ref
            and rec.get("disp_ok", True)
        )

    def _better(self, a, b):
        """Candidate preference when no attempt is healthy: a
        self-consistent window (passes agree) beats a faster-probed one
        whose passes disagree — the probes already missed the burst."""
        ka = (a.get("disp_ok", True), a["min_mops"])
        kb = (b.get("disp_ok", True), b["min_mops"])
        return ka > kb

    def measure(self, label, fn, n_passes, max_attempts=PROBE_RETRIES + 1):
        """Run ``fn`` n_passes times inside bracketing probes; re-run the
        whole set while the window is unhealthy (bounded).  Cites the
        attempt with the healthiest window (highest min probe) — never a
        mix of passes from different windows."""
        best = None
        for attempt in range(max_attempts):
            p0 = _hw_probe()["ops_per_sec"]
            vals = [fn() for _ in range(n_passes)]
            rec = self._window(p0, _hw_probe()["ops_per_sec"])
            rec["attempts"] = attempt + 1
            lo, hi = min(vals), max(vals)
            rec["disp"] = round(hi / lo, 2) if lo > 0 else float("inf")
            rec["disp_ok"] = (hi - lo) <= DISP_ABS_S or rec["disp"] <= DISP_MAX
            cand = {"passes": vals, "probe": rec}
            if best is None or self._better(rec, best["probe"]):
                best = cand
            if self.healthy(rec):
                best = cand
                break
        best["probe"]["healthy"] = self.healthy(best["probe"])
        best["probe"]["attempts"] = rec["attempts"]
        self.records[label] = best
        return best


def main():
    import statistics

    probe_open = _hw_probe()
    mem_open = _mem_probe()
    spark = get_spark(
        app_name="repurpose_spark_bench", master=f"local[{CPUS}]"
    )
    spark.sparkContext.setLogLevel("ERROR")

    # headline names may live in either registry (queries() is capped at
    # the driver's 50-entry certification window; overflow in extras)
    qs = {**entry.queries(), **entry.extra_queries()}
    times = {}

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
    # round-over-round comparisons are like-for-like; VERDICT r4 #5:
    # every cited median carries an in-band bracketing probe.
    gate = _ProbeGate()

    flag_holder = {}

    def one_flag():
        r = run_tier_pipeline(spark, N_DOCS)
        flag_holder.update(r)
        return r["pipeline_sec"]

    dur_holder = {}

    def one_durable():
        r = run_durable_pipeline(spark, N_DOCS)
        dur_holder.update(r)
        return r["durable_sec"]

    def one_query(name):
        def fn():
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            return round(time.time() - t0, 3)

        return fn

    gate.measure("tier_pipeline", one_flag, 5)
    gate.measure("tier_pipeline_durable", one_durable, 3)
    for name in HEADLINE:
        gate.measure(name, one_query(name), 3)

    # final sweep: the reference may have risen after a label was
    # measured — anything now out of band gets ONE more bracketed set
    for label in list(gate.records):
        if not gate.healthy(gate.records[label]["probe"]):
            fn = {
                "tier_pipeline": one_flag,
                "tier_pipeline_durable": one_durable,
            }.get(label) or one_query(label)
            n = {"tier_pipeline": 5, "tier_pipeline_durable": 3}.get(label, 3)
            gate.measure(label, fn, n, max_attempts=1)

    total = 0.0
    all_passes, probes = {}, {}
    for label, rec in gate.records.items():
        t = statistics.median(rec["passes"])
        times[label] = round(t, 3)
        total += t
        all_passes[label] = rec["passes"]
        probes[label] = rec["probe"]
    t_flag, t_dur = times["tier_pipeline"], times["tier_pipeline_durable"]
    flag, runs_d = flag_holder, [dur_holder]

    out = {
        "metric": "total_sec_headline",
        "value": round(total, 3),
        "unit": "sec",
        "queries": times,
        "passes": all_passes,
        "probes": probes,
        "probe_reference_mops": round(gate.ref / 1e6, 2),
        "probes_all_healthy": all(
            p.get("healthy") for p in probes.values()
        ),
        "estimator": (
            "median (pipelines n=5/3, queries n=3), probe-gated windows"
        ),
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
    # memory-subsystem health (cold-page gather): the sha probes above
    # miss hypervisor demand-paging windows entirely — see _mem_probe
    out["mem_probe_open"] = mem_open
    out["mem_probe_close"] = _mem_probe()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
