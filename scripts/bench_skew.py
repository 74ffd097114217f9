"""Skew-salting benefit measurement (VERDICT r3 next #7).

Adversarial fixture: ~20% of all docs (hence ~20% of all token points)
forced into ONE cell.  Two workloads, salted vs unsalted, identical
results asserted, walls compared at one parallelism level:

1. ``rollup``  — the tier rollup (groupBy(cell, tick) sums) via
   ``rollup_points`` vs ``rollup_points_salted``.  Expected: ~no delta.
   The aggregation is associative, so Spark's map-side partial agg
   collapses each map task's rows to one row per (cell, tick) BEFORE
   the shuffle — the hot cell never reaches a reducer as raw rows.
   Salting is pure overhead here; measuring it keeps us honest about
   when NOT to salt (skew.py's docstring makes exactly this claim).

2. ``distinct`` — per-cell exact distinct (doc, token) count.
   Measured outcome (r4): ~no delta EITHER — Catalyst rewrites distinct
   aggregates to dedup on the FINE tuple (cell, doc, token) before the
   per-cell count, so the hot cell never lands on one reducer.  Another
   honest negative: Spark's planner already two-phases this shape.

3. ``ordered_write`` — the shape where skew genuinely bites: per-cell
   clustered output (the pipeline's ``repartition("cell_id")`` +
   sort-within-partition before cell-partitioned writes; also O4
   ordered export).  Partitioning is BY CELL ALONE, so the hot cell's
   ~20% of all rows is ONE task's sort+write.  The salted twin
   repartitions on (cell, salt(pos)) — the hot cell fans out over
   ``buckets`` sorted slices; each output slice is still internally
   tick-clustered, so parquet row-group min/max pruning is preserved
   (files-per-hot-cell grows from 1 to ≤buckets — the standard trade).

4. ``--pipeline`` — the ENGINE path (VERDICT r4 #1 done-criterion): a
   durable TierPipeline run on a corpus whose doc_ids are remapped so
   ~25% of points hash into ONE cell (the pipeline derives cells from
   doc_id itself — the fixture speaks its language instead of patching
   internals).  finalize() is timed with ledger-driven auto-salting on
   (engine default) vs salt_buckets=0, identical tier contents asserted
   via full-column checksums.

Usage: python scripts/bench_skew.py [--docs 400000] [--cpus 8]
       [--buckets 16] [--trials 2] [--pipeline] [--out BENCH_SKEW.json]
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
spark = get_spark(master="local[{cpus}]", shuffle_partitions=2*{cpus})
spark.sparkContext.setLogLevel("ERROR")
from repurpose_spark.config import EngineConfig
from repurpose_spark.sources.synthetic import synth_sequences
from repurpose_spark.operators.reorient import sequences_to_points
from repurpose_spark.operators.rollup import rollup_points
from repurpose_spark.operators.skew import rollup_points_salted, salt_for

cfg = EngineConfig(n_cells=64)
seqs = synth_sequences(spark, {docs}, numPartitions=64)
pts = sequences_to_points(seqs, cfg, with_ts=False)
# adversarial skew: every 5th doc (~20% of points) lands in cell 0
pts = pts.withColumn(
    "cell_id",
    F.when(F.pmod(F.xxhash64("doc_id", F.lit("hot")), F.lit(5)) == 0,
           F.lit(0)).otherwise(F.col("cell_id")),
)
share = (
    pts.groupBy("cell_id").count()
    .orderBy(F.desc("count")).limit(1)
    .crossJoin(pts.select(F.count("*").alias("total")))
    .select((F.col("count") / F.col("total")).alias("s")).first()["s"]
)

hot = [{{"cell_id": 0}}]

def rollup_unsalted():
    return rollup_points(pts, 3600, key_cols=["cell_id"],
                         dt_seconds=cfg.dt_seconds, epoch=cfg.epoch)

def rollup_salted():
    return rollup_points_salted(
        pts, 3600, key_cols=["cell_id"], fine_col="pos",
        buckets={buckets}, hot_keys=hot,
        dt_seconds=cfg.dt_seconds, epoch=cfg.epoch)

def distinct_unsalted():
    return pts.groupBy("cell_id").agg(
        F.count_distinct("doc_id", "token").alias("n_pairs"))

def distinct_salted():
    salt = F.pmod(F.xxhash64("doc_id", "token", F.lit("salt")),
                  F.lit({buckets})).cast("int")
    per = (
        pts.withColumn("__salt", salt)
        .groupBy("cell_id", "__salt")
        .agg(F.count_distinct("doc_id", "token").alias("n"))
    )
    return per.groupBy("cell_id").agg(F.sum("n").alias("n_pairs"))

def ordered_unsalted():
    return (
        pts.repartition(64, "cell_id")
        .sortWithinPartitions("cell_id", "doc_id", "pos")
    )

def ordered_salted():
    return (
        pts.repartition(64, "cell_id", salt_for("pos", {buckets}, hot))
        .sortWithinPartitions("cell_id", "doc_id", "pos")
    )

pairs = {{"rollup": (rollup_unsalted, rollup_salted),
          "distinct": (distinct_unsalted, distinct_salted)}}
ordered = {{"ordered_write": (ordered_unsalted, ordered_salted)}}

out = {{"hot_share": round(float(share), 4)}}
for name, (plain, salted) in pairs.items():
    # equality first (exact, order-insensitive)
    a = sorted(map(tuple, plain().collect()))
    b = sorted(map(tuple, salted().collect()))
    assert a == b, f"{{name}}: salted != unsalted"
    rec = {{}}
    for variant, fn in (("unsalted", plain), ("salted", salted)):
        fn().write.format("noop").mode("overwrite").save()  # warm-up
        per = []
        for _ in range({trials}):
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            per.append(round(time.time() - t0, 3))
        rec[variant] = min(per)
    rec["speedup"] = round(rec["unsalted"] / rec["salted"], 3)
    out[name] = rec
# ordered-export contract: same multiset of rows, every output slice
# internally sorted (the pruning property) — checked once, untimed
from pyspark.sql import Window
def assert_sliced_sorted(df):
    # every output slice internally sorted on the cluster key (the
    # row-group pruning property) and row multiset size preserved
    w = Window.partitionBy("__pid").orderBy(F.monotonically_increasing_id())
    key = F.struct("cell_id", "doc_id", "pos")
    d = (
        df.withColumn("__pid", F.spark_partition_id())
        .select((key < F.lag(key).over(w)).cast("int").alias("bad"))
        .agg(F.sum("bad")).first()[0]
    )
    assert not d, f"unsorted slices: {{d}} inversions"

for name, (plain, salted) in ordered.items():
    n_plain = plain().count()
    assert salted().count() == n_plain
    assert_sliced_sorted(salted())
    rec = {{}}
    for variant, fn in (("unsalted", plain), ("salted", salted)):
        fn().write.format("noop").mode("overwrite").save()  # warm-up
        per = []
        for _ in range({trials}):
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            per.append(round(time.time() - t0, 3))
        rec[variant] = min(per)
    rec["speedup"] = round(rec["unsalted"] / rec["salted"], 3)
    rec["n_rows"] = n_plain
    out[name] = rec
print(json.dumps(out))
"""


PIPELINE_JOB = """
import sys, time, json, tempfile, shutil; sys.path.insert(0, {repo!r})
from repurpose_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark(master="local[{cpus}]", shuffle_partitions=2*{cpus})
spark.sparkContext.setLogLevel("ERROR")
from repurpose_spark.config import EngineConfig
from repurpose_spark.plans.pipeline import TierPipeline
from repurpose_spark.sources.synthetic import synth_sequences
from repurpose_spark.sources.tables import Warehouse

cfg = EngineConfig(n_cells=64)
seqs = synth_sequences(spark, {docs}, numPartitions=64)
# remap ~25% of doc_ids onto suffixed ids that hash into cell 0 under
# the engine's own cell derivation (pmod(xxhash64(doc_id), n_cells) —
# functions/cells.py), so TierPipeline sees one genuinely hot cell
# without any internal patching.  256 candidate suffixes leave a
# (63/64)^256 ~ 1.8% remap miss rate (those docs just stay cold).
cand = F.transform(
    F.sequence(F.lit(0), F.lit(255)),
    lambda k: F.concat(F.col("doc_id"), F.lit("#"), k.cast("string")),
)
# try_element_at, NOT element_at: under ANSI mode (Spark 4 default)
# element_at on the empty array — the ~1.8% of docs where no candidate
# suffix hashes to cell 0 — raises instead of returning null
hot_id = F.try_element_at(
    F.filter(cand, lambda c: F.pmod(F.xxhash64(c), F.lit(64)) == 0), F.lit(1)
)
want = F.pmod(F.xxhash64("doc_id", F.lit("hot")), F.lit(4)) == 0
seqs = seqs.withColumn(
    "doc_id",
    F.when(want & hot_id.isNotNull(), hot_id).otherwise(F.col("doc_id")),
)
in_path = tempfile.mkdtemp(prefix="skewpipe_in_") + "/seqs"
seqs.write.parquet(in_path)

# warm-up (untimed): miniature durable run spins up Arrow workers + JIT
wroot = tempfile.mkdtemp(prefix="skewpipe_w_")
TierPipeline(spark, Warehouse(spark, wroot), cfg, job_id="w").run(
    synth_sequences(spark, 2000), n_batches=1)
shutil.rmtree(wroot, ignore_errors=True)

def checksum(df, cols):
    # bit_xor, not sum: summing 2^63-scale hashes overflows long under
    # ANSI mode (Spark 4 default); xor is overflow-free and order-free
    return df.select(
        F.bit_xor(F.xxhash64(*cols)).alias("h"), F.count("*").alias("n")
    ).first()

out = {{}}
sums = {{}}
for variant, buckets in (("unsalted", 0), ("salted", {buckets})):
    walls = []
    for trial in range({trials}):
        root = tempfile.mkdtemp(prefix="skewpipe_wh_")
        pipe = TierPipeline(
            spark, Warehouse(spark, root), cfg, job_id="sk",
            hot_cell_threshold=0.2, salt_buckets=buckets,
        )
        pipe.run(input_path=in_path, n_batches=2, _finalize=False)
        t0 = time.time()
        pipe.finalize(pack=True)
        walls.append(round(time.time() - t0, 3))
        if trial == 0:
            wh = Warehouse(spark, root)
            tier_cols = ["cell_id", "doc_id", "tick", "n_points",
                         "sum_v", "min_v", "max_v"]
            sums[variant] = {{
                "hot_cells": [r["cell_id"] for r in pipe._hot_cells()],
                "daily": tuple(checksum(wh.read("sk_daily"), tier_cols)),
                "packed_n": wh.read("sk_packed").count(),
            }}
            if variant == "unsalted":
                rows = [r for r in pipe.ledger_rows()
                        if r.get("status") == "cell"]
                tot = sum(r["n_points"] for r in rows)
                hot_pts = sum(r["n_points"] for r in rows
                              if r["cell_id"] == 0)
                out["hot_share"] = round(hot_pts / tot, 4)
        shutil.rmtree(root, ignore_errors=True)
    out[variant] = min(walls)
assert sums["salted"]["daily"] == sums["unsalted"]["daily"], sums
assert sums["salted"]["packed_n"] == sums["unsalted"]["packed_n"]
assert sums["salted"]["hot_cells"] == [0], sums["salted"]["hot_cells"]
out["speedup"] = round(out["unsalted"] / out["salted"], 3)
out["hot_cells_detected"] = sums["salted"]["hot_cells"]
shutil.rmtree(in_path.rsplit("/", 1)[0], ignore_errors=True)
print(json.dumps({{"pipeline_finalize": out}}))
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=400000)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--pipeline", action="store_true",
                    help="measure the TierPipeline.finalize auto-salt "
                         "path instead of the operator-level shapes")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_SKEW.json"))
    args = ap.parse_args()
    tmpl = PIPELINE_JOB if args.pipeline else JOB
    code = tmpl.format(repo=REPO, cpus=args.cpus, docs=args.docs,
                       buckets=args.buckets, trials=args.trials)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=3600)
    lines = [ln for ln in out.stdout.strip().splitlines()
             if ln.startswith("{")]
    if not lines:
        raise RuntimeError(out.stderr[-3000:])
    res = json.loads(lines[-1])
    res.update({"docs": args.docs, "cpus": args.cpus,
                "buckets": args.buckets, "trials": args.trials})
    with open(args.out, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
