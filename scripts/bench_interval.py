"""Interval-join evidence: bucketed equi-join vs the naive theta-join,
plus standalone 2->8 scaling of the bucketed operator.

Two measurements, each in a fresh JVM subprocess:

1. compare (local[8], 1M points x 50k intervals, 64 groups over 30
   days): the naive formulation ``points.join(ivs, grp_eq & ts_range)``
   — Catalyst's best plan for it is a hash/sort-merge join on the
   64-value group key with the range as a post-match filter, i.e. a
   per-group cartesian of ~15.6k x ~0.8k = ~8e8 predicate evaluations —
   versus ``interval_join``'s (grp, hour-bucket) equi-join.  Row counts
   are asserted identical; the ratio is the operator's reason to exist
   (it grows linearly with points x intervals per group).
2. scale (2 vs 8 cores, 10M points x 500k intervals): bucketed join
   wall per level, fresh JVM each, big leg first, min-of-N trials,
   bracketing sha256 probes labelling the host window.

Usage: python scripts/bench_interval.py [--out BENCH_INTERVAL_r05.json]
       [--skip-naive] [--trials 2]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import multiprocessing as mp
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FIXTURE = """
import sys, time, json; sys.path.insert(0, {repo!r})
from repurpose_spark.session import get_spark
from pyspark.sql import functions as F
from repurpose_spark.operators.intervals import interval_join
spark = get_spark(master="local[{cpus}]", shuffle_partitions=2*{cpus})
spark.sparkContext.setLogLevel("ERROR")
BASE = 1704067200  # 2024-01-01, span 30 days
SPAN = 30 * 86400
pts = (
    spark.range(0, {n_pts}, 1, 64)
    .select(
        (F.col("id") % 64).alias("grp"),
        F.timestamp_seconds(
            F.lit(BASE) + F.pmod(F.col("id") * 2654435761, F.lit(SPAN))
        ).alias("ts"),
        (F.col("id") % 1000).alias("v"),
    )
)
ivs = (
    spark.range(0, {n_ivs}, 1, 16)
    .select(
        F.col("id").alias("iid"),
        (F.col("id") % 64).alias("grp"),
        F.timestamp_seconds(
            F.lit(BASE) + F.pmod(F.col("id") * 40503, F.lit(SPAN - 7260))
        ).alias("start"),
    )
    .withColumn(
        "end",
        F.col("start")
        + F.make_interval(secs=(F.pmod(F.col("iid") * 97, F.lit(7200)) + 60)),
    )
)
"""

JOB_COMPARE = FIXTURE + """
def naive():
    t0 = time.time()
    n = pts.join(
        ivs,
        (pts["grp"] == ivs["grp"])
        & (pts["ts"] >= ivs["start"]) & (pts["ts"] < ivs["end"]),
    ).count()
    return n, round(time.time() - t0, 3)

def bucketed():
    t0 = time.time()
    n = interval_join(pts, ivs, on=["grp"], bucket_seconds=3600).count()
    return n, round(time.time() - t0, 3)

nb, tb0 = bucketed()          # warm (JIT, python workers)
nb2, tb = bucketed()
assert nb == nb2
out = {{"bucketed_rows": nb, "bucketed_sec": min(tb0, tb)}}
if not {skip_naive}:
    nn, tn = naive()
    assert nn == nb, (nn, nb)
    out["naive_rows"] = nn
    out["naive_sec"] = tn
    out["speedup"] = round(tn / out["bucketed_sec"], 1)
print(json.dumps(out))
"""

JOB_SCALE = FIXTURE + """
def run():
    t0 = time.time()
    interval_join(pts, ivs, on=["grp"], bucket_seconds=3600) \\
        .write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)

run()  # warm-up, untimed
per = [run() for _ in range({trials})]
print(json.dumps({{"wall_sec": min(per), "trials": per}}))
"""


def _burn(n: int) -> int:
    h = b"x" * 64
    for _ in range(n):
        h = hashlib.sha256(h).digest()
    return h[0]


def probe(workers: int = 8, total_ops: int = 6_400_000) -> float:
    t0 = time.time()
    with mp.Pool(workers) as p:
        p.map(_burn, [total_ops // workers] * workers)
    return round(total_ops / (time.time() - t0), 1)


def run_job(code: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=3600,
    )
    lines = [ln for ln in out.stdout.strip().splitlines()
             if ln.startswith("{")]
    if not lines:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(lines[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--skip-naive", action="store_true")
    ap.add_argument(
        "--out", default=os.path.join(REPO, "BENCH_INTERVAL_r05.json")
    )
    args = ap.parse_args()

    res: dict = {"hw_probe_open": probe()}
    # two sizes: naive work grows ~quadratically (points x intervals per
    # group), bucketed ~linearly — the speedup ratio should ~double
    for tag, (np_, ni) in {
        "compare_1m": (1_000_000, 50_000),
        "compare_2m": (2_000_000, 100_000),
    }.items():
        res[tag] = run_job(
            JOB_COMPARE.format(
                repo=REPO, cpus=8, n_pts=np_, n_ivs=ni,
                skip_naive=args.skip_naive,
            )
        )
        print(f"{tag}:", res[tag], flush=True)
    res["scale_docs"] = {"n_pts": 10_000_000, "n_ivs": 500_000}
    for c in (8, 2):  # big leg first (drift penalizes, not flatters)
        res[f"scale_{c}"] = run_job(
            JOB_SCALE.format(
                repo=REPO, cpus=c, n_pts=10_000_000, n_ivs=500_000,
                trials=args.trials,
            )
        )
        print(f"scale local[{c}]:", res[f"scale_{c}"], flush=True)
    res["hw_probe_close"] = probe()
    res["efficiency_2_to_8"] = round(
        res["scale_2"]["wall_sec"] / (4 * res["scale_8"]["wall_sec"]), 3
    )
    with open(args.out, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps({k: res[k] for k in
                      ("efficiency_2_to_8", "hw_probe_open",
                       "hw_probe_close")}))


if __name__ == "__main__":
    main()
