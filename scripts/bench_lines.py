"""Duplicate-line removal evidence: throughput at the web shape, plus
standalone 2->8 scaling of the operator.

Fixture (in-plan, deterministic, no data files): n_docs pages of 10
lines each — 2 boilerplate lines drawn from a 50-template pool (every
template lands in ~n_docs/50 docs, far above min_docs) + 8 unique body
lines.  ~20 % of the exploded line stream is hot, the documented C4
regime.  Each measurement runs in a fresh JVM subprocess; scaling runs
the big leg first with bracketing sha256 probes labelling the window.

Usage: python scripts/bench_lines.py [--docs 1000000] [--trials 2]
       [--out BENCH_LINES_r05.json]
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
from repurpose_spark.operators.lines import remove_boilerplate_lines
spark = get_spark(master="local[{cpus}]", shuffle_partitions=2*{cpus})
spark.sparkContext.setLogLevel("ERROR")
def uline(j):
    return F.concat(
        F.lit("body "), F.lit(j), F.lit(" of doc "),
        (F.col("id") * 31 + j).cast("string"),
        F.lit(" lorem ipsum dolor sit amet consetetur"),
    )
docs = spark.range(0, {n_docs}, 1, 64).select(
    F.col("id").alias("doc_id"),
    F.concat_ws(
        "\\n",
        F.concat(F.lit("*** banner "), (F.col("id") % 50).cast("string"),
                 F.lit(" | home | about | contact ***")),
        *[uline(j) for j in range(8)],
        F.concat(F.lit("copyright acme "),
                 ((F.col("id") * 7) % 50).cast("string"),
                 F.lit(" all rights reserved")),
    ).alias("text"),
)
"""

JOB = FIXTURE + """
def run():
    t0 = time.time()
    remove_boilerplate_lines(docs, min_docs=2) \\
        .write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)

run()  # warm-up, untimed
per = [run() for _ in range({trials})]
res = remove_boilerplate_lines(docs, min_docs=2).agg(
    F.count("*").alias("docs"),
    F.sum("n_removed").alias("removed"),
    F.sum("n_lines").alias("lines"),
).collect()[0]
assert res["docs"] == {n_docs} and res["removed"] == 2 * {n_docs}, res
print(json.dumps({{"wall_sec": min(per), "trials": per,
                   "lines": res["lines"], "removed": res["removed"]}}))
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
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument(
        "--out", default=os.path.join(REPO, "BENCH_LINES_r05.json")
    )
    args = ap.parse_args()
    if args.docs < 100:
        # 50 banner + 50 footer templates: below 100 docs some template
        # lands in <2 docs and the fixture's removal assert is invalid
        ap.error("--docs must be >= 100 (one doc per template minimum)")

    res: dict = {"docs": args.docs, "hw_probe_open": probe()}
    walls = {}
    for cpus in (8, 2):  # big leg first (turbo bias works against us)
        r = run_job(
            JOB.format(
                repo=REPO, cpus=cpus, n_docs=args.docs,
                trials=args.trials,
            )
        )
        walls[cpus] = r["wall_sec"]
        res[f"local[{cpus}]"] = r
        res[f"lines_per_sec_{cpus}"] = round(r["lines"] / r["wall_sec"], 1)
        print(f"local[{cpus}]:", r, flush=True)
    res["hw_probe_close"] = probe()
    res["efficiency_2_to_8"] = round(walls[2] / walls[8] / 4.0, 3)
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps({"efficiency_2_to_8": res["efficiency_2_to_8"],
                      "out": args.out}))


if __name__ == "__main__":
    main()
