"""Per-query isolation bench (guide §1.4) — NOT the driver contract.

Times individual declared queries with the noop sink at
$SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS], and optionally dumps
.explain("formatted") for each to a directory (the plans/r06 artifacts).

Usage:
    python bench_extra.py q1 q2 ... [--passes 3] [--explain DIR]
        [--suffix before] [--json OUT.json]

bench.py is the frozen measurement harness; this file exists so
optimization work can cite isolated numbers without touching it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry  # noqa: E402
from repurpose_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--explain", default=None, help="dir for plan dumps")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    spark = get_spark(
        app_name="repurpose_spark_bench_extra", master=f"local[{CPUS}]"
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = {**entry.queries(), **entry.extra_queries()}

    # small warm-up so JIT/codegen cold start doesn't pollute pass 1
    qs[args.queries[0]](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    out = {"sf_dir": SF_DIR, "cpus": CPUS, "queries": {}}
    for name in args.queries:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        passes = []
        for _ in range(args.passes):
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            passes.append(round(time.time() - t0, 3))
        out["queries"][name] = {
            "passes": passes,
            "median": sorted(passes)[len(passes) // 2],
        }
        print(name, passes, flush=True)
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            plan = fn(spark, SF_DIR)._sc._jvm.PythonSQLUtils.explainString(
                fn(spark, SF_DIR)._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(
                    args.explain, f"{name}_{args.suffix}.txt"
                ),
                "w",
            ) as fh:
                fh.write(plan)
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(out, fh, indent=1)
    print(json.dumps({k: v["median"] for k, v in out["queries"].items()}))


if __name__ == "__main__":
    main()
