"""Per-stage profile of the tier-compute scaling job (VERDICT r3 next #1).

Decomposes each compute-pipeline trial into its three actions and
MEASURES (not fits) the JVM-serial components around each:

* ``hourly``  — scan/explode → integer-bucket partial agg → shuffle →
  final agg → cache (the only pass over raw points)
* ``daily``   — re-agg of the cached hourly partials, noop sink
* ``packed``  — with_avg + Gorilla encode (Arrow pandas UDF), noop sink

Around every action we read (a) the JVM management beans of the
(shared, local-mode) JVM — total GC time and JIT compilation time — and
(b) the REST status API's per-stage task metrics: executorRunTime
(task-thread wall), executorCpuTime (actual on-CPU time), shuffle fetch
wait, task count, and derived core utilization.  In local mode driver ==
executors, so these deltas capture ALL JVM-side work.  A parallel-worker
memory-bandwidth probe (256 MB stream copies) brackets each pass.

Round-4 findings (PROFILE_COMPUTE_r04.json; see BASELINE.md): the r3
Amdahl fit blamed "shared-JVM GC + straggler tail" — DIRECT MEASUREMENT
REFUTES the GC half (GC < 1% of wall at both levels; fetch wait 0) and
decomposes the residue into (1) per-thread CPU inflation at 8 threads
(+11–13% total executorCpuTime for identical work — hardware
concurrency, the same effect the sha256 probe shows on Spark-free code)
and (2) last-wave idling on short 16–42-task stages (core_util 0.69–0.77
at local[8] vs 0.93–0.99 at local[2]).  Both are artifacts of measuring
on one oversubscribed VM at tiny task counts; on a real N-vs-4N cluster
per-core environments are identical and stages have 10^4+ tasks.

``--pin-jvm-threads`` pins ParallelGCThreads to the level (GC threads
otherwise default to the 32-core host); with GC at <1% of wall it is a
no-op knob, kept for completeness.

Usage:
  python scripts/profile_compute.py [--docs 500000] [--levels 2,8]
      [--trials 2] [--pin-jvm-threads] [--out PROFILE.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = """
import sys, time, json; sys.path.insert(0, {repo!r})
from repurpose_spark.session import get_spark
from pyspark.sql import functions as F

extra = {{}}
if {pin}:
    extra["spark.driver.extraJavaOptions"] = (
        "-XX:ParallelGCThreads={cpus} -XX:ConcGCThreads=1"
    )
spark = get_spark(master="local[{cpus}]",
                  shuffle_partitions={shuffle_mult}*{cpus},
                  extra_conf=extra)
spark.sparkContext.setLogLevel("ERROR")
from repurpose_spark.config import EngineConfig
from repurpose_spark.sources.synthetic import synth_sequences
from repurpose_spark.operators.reorient import sequences_to_points
from repurpose_spark.operators.rollup import rollup_points, rollup_from_partials, with_avg
from repurpose_spark.operators.encode import encode_series

mf = spark._jvm.java.lang.management.ManagementFactory

def gc_ms():
    return sum(b.getCollectionTime()
               for b in mf.getGarbageCollectorMXBeans())

def jit_ms():
    return mf.getCompilationMXBean().getTotalCompilationTime()

import urllib.request

def stage_totals():
    '''Cumulative task-metric totals over all completed stages (REST
    status API of the local UI) — diffing around an action yields the
    action's distributed-CPU decomposition: executorRunTime (task wall
    x tasks), executorCpuTime (actual on-CPU ns), shuffle fetch wait,
    and the max single-task time (straggler witness).'''
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{{base}}/api/v1/applications/{{app}}/stages?status=complete", timeout=10) as r:
        stages = json.load(r)
    t = {{"run_ms": 0, "cpu_ms": 0, "fetch_wait_ms": 0, "tasks": 0}}
    for s in stages:
        t["run_ms"] += s.get("executorRunTime", 0)
        t["cpu_ms"] += s.get("executorCpuTime", 0) // 1_000_000
        t["fetch_wait_ms"] += s.get("shuffleFetchWaitTime", 0)
        t["tasks"] += s.get("numCompleteTasks", 0)
    return t

cfg = EngineConfig(n_cells=64)
# warm-up (JIT + python workers), untimed
w = rollup_points(sequences_to_points(synth_sequences(spark, 2000), cfg, with_ts=False), 3600)
encode_series(with_avg(w), int_cols=["sum_v","n_points"], float_cols=["avg_v"]).write.format("noop").mode("overwrite").save()
seqs = synth_sequences(spark, {docs}, skew=True, numPartitions=64)
n_tokens = seqs.agg(F.sum("n_tok")).collect()[0][0]

trials = []
for trial in range({trials}):
    rec = {{}}
    t_all = time.time()
    pts = sequences_to_points(seqs, cfg, with_ts=False)
    hourly = rollup_points(pts, 3600, dt_seconds=cfg.dt_seconds, epoch=cfg.epoch).cache()
    for name, act in (
        ("hourly", lambda: hourly.count()),
        ("daily", lambda: rollup_from_partials(hourly, "day").write.format("noop").mode("overwrite").save()),
        ("packed", lambda: encode_series(with_avg(hourly), int_cols=["sum_v","n_points"], float_cols=["avg_v"]).write.format("noop").mode("overwrite").save()),
    ):
        s0, g0, j0, t0 = stage_totals(), gc_ms(), jit_ms(), time.time()
        act()
        wall = time.time() - t0
        s1 = stage_totals()
        rec[name] = {{
            "wall": round(wall, 3),
            "gc_ms": gc_ms() - g0,
            "jit_ms": jit_ms() - j0,
            "task_run_ms": s1["run_ms"] - s0["run_ms"],
            "task_cpu_ms": s1["cpu_ms"] - s0["cpu_ms"],
            "fetch_wait_ms": s1["fetch_wait_ms"] - s0["fetch_wait_ms"],
            "tasks": s1["tasks"] - s0["tasks"],
            "core_util": round(
                (s1["run_ms"] - s0["run_ms"]) / (wall * 1000 * {cpus}), 3),
        }}
    rec["total_wall"] = round(time.time() - t_all, 3)
    hourly.unpersist()
    trials.append(rec)

best = min(trials, key=lambda r: r["total_wall"])
print(json.dumps({{
    "n_tokens": int(n_tokens),
    "tokens_per_sec": round(n_tokens / best["total_wall"], 1),
    "best": best,
    "trials": trials,
}}))
"""


DURABLE_JOB = """
import sys, time, json, tempfile, shutil; sys.path.insert(0, {repo!r})
from repurpose_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark(master="local[{cpus}]", shuffle_partitions=2*{cpus})
spark.sparkContext.setLogLevel("ERROR")
from repurpose_spark.config import EngineConfig
from repurpose_spark.plans.pipeline import TierPipeline
from repurpose_spark.sources.synthetic import synth_sequences
from repurpose_spark.sources.tables import Warehouse

mf = spark._jvm.java.lang.management.ManagementFactory

def gc_ms():
    return sum(b.getCollectionTime()
               for b in mf.getGarbageCollectorMXBeans())

import urllib.request

def stage_totals():
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{{base}}/api/v1/applications/{{app}}/stages?status=complete", timeout=10) as r:
        stages = json.load(r)
    t = {{"run_ms": 0, "cpu_ms": 0, "tasks": 0}}
    for s in stages:
        t["run_ms"] += s.get("executorRunTime", 0)
        t["cpu_ms"] += s.get("executorCpuTime", 0) // 1_000_000
        t["tasks"] += s.get("numCompleteTasks", 0)
    return t

cfg = EngineConfig(n_cells=64)
in_path = tempfile.mkdtemp(prefix="prof_in_") + "/seqs"
seqs = synth_sequences(spark, {docs}, skew=True, numPartitions=64)
seqs.write.parquet(in_path)
n_tokens = seqs.agg(F.sum("n_tok")).collect()[0][0]
# warm-up (untimed): miniature durable run
wroot = tempfile.mkdtemp(prefix="prof_w_")
TierPipeline(spark, Warehouse(spark, wroot), cfg, job_id="w").run(
    synth_sequences(spark, 2000), n_batches=1)
shutil.rmtree(wroot, ignore_errors=True)

trials = []
for trial in range({trials}):
    root = tempfile.mkdtemp(prefix="prof_wh_")
    pipe = TierPipeline(spark, Warehouse(spark, root), cfg, job_id="bench")
    rec = {{}}
    t_all = time.time()
    for name, act in (
        ("batches", lambda: pipe.run(input_path=in_path, n_batches=2,
                                     _finalize=False)),
        ("finalize", lambda: pipe.finalize(pack=True)),
    ):
        s0, g0, t0 = stage_totals(), gc_ms(), time.time()
        act()
        wall = time.time() - t0
        s1 = stage_totals()
        rec[name] = {{
            "wall": round(wall, 3),
            "gc_ms": gc_ms() - g0,
            "task_run_ms": s1["run_ms"] - s0["run_ms"],
            "task_cpu_ms": s1["cpu_ms"] - s0["cpu_ms"],
            "tasks": s1["tasks"] - s0["tasks"],
            "core_util": round(
                (s1["run_ms"] - s0["run_ms"]) / (wall * 1000 * {cpus}), 3),
        }}
    rec["total_wall"] = round(time.time() - t_all, 3)
    shutil.rmtree(root, ignore_errors=True)
    trials.append(rec)
shutil.rmtree(in_path.rsplit("/", 1)[0], ignore_errors=True)

best = min(trials, key=lambda r: r["total_wall"])
print(json.dumps({{
    "n_tokens": int(n_tokens),
    "tokens_per_sec": round(n_tokens / best["total_wall"], 1),
    "best": best,
    "trials": trials,
}}))
"""


def _memburn(args) -> float:
    """Stream-copy 256 MB ten times — pure memory-bandwidth load."""
    import numpy as np

    n_bytes, = args
    a = np.zeros(n_bytes // 8, dtype=np.float64)
    b = np.empty_like(a)
    for _ in range(10):
        b[:] = a
    return float(b[0])


def run_bandwidth(workers: int, mb_each: int = 256) -> dict:
    """Aggregate copy bandwidth at N parallel workers.  The sha256 probe
    measures the CPU ceiling; THIS measures the memory-bandwidth ceiling
    — the binding resource for shuffle/cache/Arrow-heavy stages.  On an
    oversubscribed VM the 8-worker aggregate is typically far below 4×
    the 2-worker figure: that gap is the measured hardware ceiling for
    the packed/cache stages, not an engine-serial component."""
    import multiprocessing as mp
    import time

    n = mb_each * 1024 * 1024
    t0 = time.time()
    with mp.Pool(workers) as p:
        p.map(_memburn, [(n,)] * workers)
    dt = time.time() - t0
    gb = workers * 10 * n / 1e9
    return {"wall_sec": round(dt, 3), "agg_gb_per_sec": round(gb / dt, 2)}


def run_level(cpus: int, docs: int, trials: int, pin: bool,
              shuffle_mult: int = 2, durable: bool = False) -> dict:
    code = (
        DURABLE_JOB.format(repo=REPO, cpus=cpus, docs=docs, trials=trials)
        if durable
        else JOB.format(
            repo=REPO, cpus=cpus, docs=docs, trials=trials,
            pin="True" if pin else "False", shuffle_mult=shuffle_mult,
        )
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=1800,
    )
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(lines[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=500000)
    ap.add_argument("--levels", default="2,8")
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--pin-jvm-threads", action="store_true")
    ap.add_argument("--shuffle-mult", type=int, default=2,
                    help="shuffle partitions = mult * cores; 4 packs "
                         "short stages into finer waves (less tail)")
    ap.add_argument("--durable", action="store_true",
                    help="profile the DURABLE pipeline (TierPipeline.run "
                         "batches + finalize) instead of the compute job")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    levels = [int(x) for x in args.levels.split(",")]
    res: dict = {
        "docs": args.docs,
        "levels": levels,
        "pin_jvm_threads": args.pin_jvm_threads,
        "shuffle_mult": args.shuffle_mult,
    }
    for c in levels:
        res[f"bandwidth_{c}"] = run_bandwidth(c)
        print(f"bandwidth {c} workers: {res[f'bandwidth_{c}']}", flush=True)
    for c in levels:
        res[f"compute_{c}"] = run_level(
            c, args.docs, args.trials, args.pin_jvm_threads,
            args.shuffle_mult, args.durable,
        )
        print(f"local[{c}]: {json.dumps(res[f'compute_{c}']['best'])}",
              flush=True)
    if len(levels) == 2:
        lo, hi = levels
        f = hi // lo
        res["efficiency_raw"] = round(
            res[f"compute_{hi}"]["tokens_per_sec"]
            / (f * res[f"compute_{lo}"]["tokens_per_sec"]), 3)
        res["bandwidth_ceiling"] = round(
            res[f"bandwidth_{hi}"]["agg_gb_per_sec"]
            / (f * res[f"bandwidth_{lo}"]["agg_gb_per_sec"]), 3)
        # per-stage efficiency: fixed work → eff = t_lo / (f * t_hi)
        stages = (
            ("batches", "finalize")
            if args.durable
            else ("hourly", "daily", "packed")
        )
        res["per_stage_efficiency"] = {
            s: round(
                res[f"compute_{lo}"]["best"][s]["wall"]
                / (f * res[f"compute_{hi}"]["best"][s]["wall"]), 3)
            for s in stages
        }
        print(json.dumps({k: res[k] for k in
                          ("efficiency_raw", "per_stage_efficiency")}))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(res, fh, indent=2)


if __name__ == "__main__":
    main()
