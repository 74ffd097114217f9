"""Per-stage 2→8 profile of the doc_curation pipeline (VERDICT r4 #6).

Applies the finalize-fix method (per-stage profile → targeted fix) to
the one headline query still under 0.78 scaling (0.720 at scale_k=16,
BENCH_SCALING_r04_queries.json).  The perturbed-replica fixture is
staged ONCE and shared by both levels (identical bytes, identical
layout), then each level decomposes the pipeline into its legs:

* ``annotate_exact`` — scan → lang/quality JVM exprs → fingerprint
  window dedup (one shuffle), noop sink
* ``cache_survivors`` — persist + count of the exact-dedup survivors
  (the frame both LSH join sides consume)
* ``lsh_pairs``      — banded MinHash self-join + Jaccard verification
  over the cached survivors, noop sink
* ``anti_join``      — survivors anti-join losers (the final leg)
* ``full``           — the undecomposed driver query, for the headline

Each leg is bracketed with the REST status API's task metrics
(executorRunTime/CpuTime, fetch wait, task count) and JVM GC beans, so
the 2→8 loss decomposes into measured terms.

Usage: python scripts/profile_curation.py [--scale-k 16] [--trials 2]
       [--levels 2,8] [--out PROFILE_CURATION.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STAGE_FIXTURE = """
import sys; sys.path.insert(0, {repo!r})
from repurpose_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark(master="local[8]")
spark.sparkContext.setLogLevel("ERROR")
d = spark.read.parquet({sf_dir!r} + "/documents.parquet")
n = d.agg(F.max("doc_id")).first()[0] + 1
big = (
    d.crossJoin(spark.range({scale_k}).withColumnRenamed("id", "__k"))
    .withColumn("doc_id", F.col("doc_id") + F.col("__k") * n)
    .withColumn("text", F.concat(F.col("text"), F.lit(" v"),
                                 F.col("__k").cast("string")))
    .drop("__k")
)
big.repartition(64).write.parquet({fix!r} + "/documents.parquet")
print("STAGED")
"""

JOB = """
import sys, time, json; sys.path.insert(0, {repo!r})
from repurpose_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark(master="local[{cpus}]", shuffle_partitions=2*{cpus})
spark.sparkContext.setLogLevel("ERROR")
import urllib.request
import __spark_entry__ as entry
from repurpose_spark.operators.curation import curate_documents
from repurpose_spark.operators.dedup import dedup_minhash_lsh

mf = spark._jvm.java.lang.management.ManagementFactory

def gc_ms():
    return sum(b.getCollectionTime() for b in mf.getGarbageCollectorMXBeans())

def stage_totals():
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{{base}}/api/v1/applications/{{app}}/stages?status=complete",
        timeout=10,
    ) as r:
        stages = json.load(r)
    t = {{"run_ms": 0, "cpu_ms": 0, "fetch_wait_ms": 0, "tasks": 0}}
    for s in stages:
        t["run_ms"] += s.get("executorRunTime", 0)
        t["cpu_ms"] += s.get("executorCpuTime", 0) // 1_000_000
        t["fetch_wait_ms"] += s.get("shuffleFetchWaitTime", 0)
        t["tasks"] += s.get("numCompleteTasks", 0)
    return t

MH = dict(k=4, bands=2, shingle_n=8, threshold=0.3, step=2, use_md5=True)
fix = {fix!r}

# warm-up (JIT + python workers), untimed, on the raw sf fixture
curate_documents(
    spark.read.parquet({sf_dir!r} + "/documents.parquet"),
    langs=("en",), min_quality=0.5, minhash_kwargs=MH,
).write.format("noop").mode("overwrite").save()

trials = []
for trial in range({trials}):
    rec = {{}}
    docs = spark.read.parquet(fix + "/documents.parquet")

    def bracket(name, act):
        s0, g0, t0 = stage_totals(), gc_ms(), time.time()
        act()
        wall = time.time() - t0
        s1 = stage_totals()
        rec[name] = {{
            "wall": round(wall, 3),
            "gc_ms": gc_ms() - g0,
            "task_run_ms": s1["run_ms"] - s0["run_ms"],
            "task_cpu_ms": s1["cpu_ms"] - s0["cpu_ms"],
            "fetch_wait_ms": s1["fetch_wait_ms"] - s0["fetch_wait_ms"],
            "tasks": s1["tasks"] - s0["tasks"],
            "core_util": round(
                (s1["run_ms"] - s0["run_ms"]) / (wall * 1000 * {cpus}), 3),
        }}

    # decomposed legs (mirrors curate_documents' internals)
    exact = curate_documents(
        docs, langs=("en",), min_quality=0.5, near_dup=False,
    )
    bracket("annotate_exact", lambda: exact.write.format("noop")
            .mode("overwrite").save())
    # the survivor frame both LSH sides consume — persisted like the
    # real pipeline does
    surv = docs.join(
        exact.select("doc_id"), "doc_id", "left_semi"
    ).persist()
    bracket("cache_survivors", lambda: surv.count())
    pairs = dedup_minhash_lsh(surv, **MH)
    bracket("lsh_pairs", lambda: pairs.write.format("noop")
            .mode("overwrite").save())
    losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    bracket("anti_join", lambda: surv.join(losers, "doc_id", "left_anti")
            .select("doc_id").write.format("noop").mode("overwrite").save())
    surv.unpersist()
    # undecomposed headline
    bracket("full", lambda: curate_documents(
        docs, langs=("en",), min_quality=0.5, minhash_kwargs=MH,
    ).write.format("noop").mode("overwrite").save())
    rec["total_wall"] = sum(rec[k]["wall"] for k in rec)
    trials.append(rec)

best = min(trials, key=lambda r: r["full"]["wall"])
print(json.dumps({{"best": best, "trials": trials}}))
"""


def run_level(cpus, fix, sf_dir, trials):
    code = JOB.format(
        repo=REPO, cpus=cpus, fix=fix, sf_dir=sf_dir, trials=trials
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=5400, cwd=REPO,
    )
    lines = [
        ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")
    ]
    if not lines:
        raise RuntimeError(out.stderr[-3000:])
    return json.loads(lines[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale-k", type=int, default=16)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--levels", default="2,8")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]

    fix = tempfile.mkdtemp(prefix="curprof_")
    code = STAGE_FIXTURE.format(
        repo=REPO, sf_dir=args.sf_dir, scale_k=args.scale_k, fix=fix
    )
    st = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=1800,
    )
    if "STAGED" not in st.stdout:
        raise RuntimeError(st.stderr[-3000:])

    res = {"scale_k": args.scale_k, "levels": levels, "sf_dir": args.sf_dir}
    try:
        for c in levels:
            res[f"level_{c}"] = run_level(c, fix, args.sf_dir, args.trials)
            print(f"local[{c}]: "
                  f"{json.dumps(res[f'level_{c}']['best'])}", flush=True)
    finally:
        import shutil

        shutil.rmtree(fix, ignore_errors=True)
    if len(levels) == 2:
        lo, hi = levels
        f = hi // lo
        blo, bhi = res[f"level_{lo}"]["best"], res[f"level_{hi}"]["best"]
        res["per_stage_efficiency"] = {
            s: round(blo[s]["wall"] / (f * bhi[s]["wall"]), 3)
            for s in blo
            if s != "total_wall"
        }
        print(json.dumps(res["per_stage_efficiency"]))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(res, fh, indent=2)


if __name__ == "__main__":
    main()
