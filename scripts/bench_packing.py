"""Standalone 2->8 scaling for pack_sequences at honest size.

VERDICT r4 #4 done-criterion: after moving the prefix-sum offsets
in-plan (window over the partials frame instead of a driver collect),
re-measure doc_pack_assignments' core standalone at 20M docs and report
2->8 efficiency.  The r4 reading (pre-fix) was 0.601 with two flat
terms identified: the driver collect (now gone) and the eager
``localCheckpoint`` pid-freeze (still required for correctness —
repartitionByRange's sample seed is execution-dependent, ADVICE r2).

Fixture: 20M synthetic (source, doc_id, n_tok) rows — lengths are all
pack needs — generated in-Spark via ``spark.range`` (deterministic,
identical layout at both levels: fixed 64 input partitions).  Each
level runs in a fresh JVM subprocess; min-of-N trials; bracketing
sha256 hardware probes label the host window.

Usage: python scripts/bench_packing.py [--docs 20000000] [--trials 2]
       [--levels 2,8] [--out BENCH_PACKING.json]
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

JOB = """
import sys, time, json; sys.path.insert(0, {repo!r})
from repurpose_spark.session import get_spark
from pyspark.sql import functions as F
from repurpose_spark.operators.packing import pack_sequences
spark = get_spark(master="local[{cpus}]", shuffle_partitions=2*{cpus})
spark.sparkContext.setLogLevel("ERROR")
# deterministic fixture: identical content and input layout at every level
docs = (
    spark.range(0, {docs}, 1, 64)
    .select(
        F.concat(F.lit("src"), (F.col("id") % 16).cast("string")).alias("source"),
        F.concat(F.lit("d"), F.format_string("%09d", F.col("id"))).alias("doc_id"),
        (F.pmod(F.col("id") * 2654435761, F.lit(4000)) + 16).alias("n_tok"),
    )
)
def run():
    t0 = time.time()
    pack_sequences(docs, budget=8192).write.format("noop").mode("overwrite").save()
    return time.time() - t0
run()  # warm-up (JIT + python workers), untimed
per = [round(run(), 3) for _ in range({trials})]
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


def run_level(cpus: int, docs: int, trials: int) -> dict:
    code = JOB.format(repo=REPO, cpus=cpus, docs=docs, trials=trials)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=3600,
    )
    line = [ln for ln in out.stdout.strip().splitlines()
            if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=20_000_000)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--levels", default="2,8")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_PACKING.json"))
    args = ap.parse_args()

    levels = [int(x) for x in args.levels.split(",")]
    res: dict = {"docs": args.docs, "levels": levels,
                 "hw_probe_open": probe()}
    # big leg FIRST: host drift decays monotonically through a run, so
    # this ordering penalizes rather than flatters the ratio
    for c in sorted(levels, reverse=True):
        res[f"pack_{c}"] = run_level(c, args.docs, args.trials)
        print(f"local[{c}]: {res[f'pack_{c}']}", flush=True)
    res["hw_probe_close"] = probe()
    lo, hi = min(levels), max(levels)
    factor = hi // lo
    res[f"efficiency_{lo}_to_{hi}"] = round(
        res[f"pack_{lo}"]["wall_sec"]
        / (factor * res[f"pack_{hi}"]["wall_sec"]), 3)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps({k: v for k, v in res.items()
                      if k.startswith(("efficiency", "hw_"))}))


if __name__ == "__main__":
    main()
