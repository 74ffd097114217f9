"""Semantic-dedup evidence: standalone 2->8 scaling of
operators/semdedup.py::semantic_dedup at an honest size.

Fixture (in-plan, deterministic, no data files, zero Python in the data
path): n_vecs hash-derived dim-32 vectors.  k is sized to the paper's
regime (cluster size ~ corpus/k bounds the prune join's quadratic
term): n/k ≈ 780 members/cluster at the defaults, so the self-join
evaluates ~k·(n/k)²/2 ≈ 2·10⁷ pair cosines — the operator's real hot
path (in-row assignment is the cheap leg, test-asserted shuffle-free).

Each measurement runs in a fresh JVM subprocess; the big leg runs first
(turbo bias works against us) with bracketing sha256 probes labelling
the window.

Usage: python scripts/bench_semdedup.py [--vecs 50000] [--k 64]
       [--trials 2] [--out BENCH_SEMDEDUP_r05.json]
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
from repurpose_spark.operators.semdedup import semantic_dedup
spark = get_spark(master="local[{cpus}]", shuffle_partitions=2*{cpus})
spark.sparkContext.setLogLevel("ERROR")
DIM = 32
vecs = spark.range(0, {n_vecs}, 1, 64).select(
    F.col("id").alias("vec_id"),
    F.array(*[
        (F.pmod(F.xxhash64(F.col("id"), F.lit(j)), 2001).cast("double")
         / 1000.0 - 1.0)
        for j in range(DIM)
    ]).alias("embedding"),
)

def run():
    t0 = time.time()
    semantic_dedup(vecs, k={k}, threshold=0.62) \\
        .write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)

run()  # warm-up, untimed
per = [run() for _ in range({trials})]
res = semantic_dedup(vecs, k={k}, threshold=0.62).agg(
    F.count("*").alias("n"),
    F.sum(F.col("kept").cast("long")).alias("n_kept"),
).collect()[0]
assert res["n"] == {n_vecs}, res
print(json.dumps({{"wall_sec": min(per), "trials": per,
                   "n": res["n"], "n_kept": res["n_kept"]}}))
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
    ap.add_argument("--vecs", type=int, default=50_000)
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument(
        "--out", default=os.path.join(REPO, "BENCH_SEMDEDUP_r05.json")
    )
    args = ap.parse_args()

    res: dict = {
        "vecs": args.vecs, "k": args.k, "dim": 32,
        "hw_probe_open": probe(),
    }
    walls = {}
    for cpus in (8, 2):  # big leg first
        r = run_job(
            JOB.format(
                repo=REPO, cpus=cpus, n_vecs=args.vecs, k=args.k,
                trials=args.trials,
            )
        )
        walls[cpus] = r["wall_sec"]
        res[f"local[{cpus}]"] = r
        res[f"vecs_per_sec_{cpus}"] = round(r["n"] / r["wall_sec"], 1)
        print(f"local[{cpus}]:", r, flush=True)
    res["hw_probe_close"] = probe()
    res["efficiency_2_to_8"] = round(walls[2] / walls[8] / 4.0, 3)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps({"efficiency_2_to_8": res["efficiency_2_to_8"],
                      "out": args.out}))


if __name__ == "__main__":
    main()
