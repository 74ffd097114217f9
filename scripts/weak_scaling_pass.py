"""Weak-scaling pass: the SAME job at the SAME parallelism (local[8])
over 1x vs 4x input, probe-bracketed.  Complements the strong-scaling
(local[2] vs local[8]) passes: on this single-VM sandbox the core-count
ratio is confounded by idle-core turbo and shared-memory-bandwidth
asymmetry (BASELINE.md round-5 narrative), while this axis holds the
hardware configuration CONSTANT — both legs see identical per-core
turbo and bandwidth — and asks the question that actually breaks
engines at 100 TB: does tokens/sec hold as the input quadruples, or is
there a super-linear term (shuffle spill, driver collect, O(n^2)
planning) hiding under the small leg?  Ideal = 1.0; a real cluster's
N->4N executors-with-4x-data run is the product of this number and the
strong-scaling one.

Usage: python scripts/weak_scaling_pass.py [--docs 1000000] [--factor 4]
       [--cpus 8] [--trials 2] [--pipeline] [--out FILE] [--note "..."]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from pipeline_pass import bw_probe, mem_probe, probe, run_leg  # noqa: E402
from bench_scaling import run_compute  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--factor", type=int, default=4)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--pipeline", action="store_true",
                    help="also run the durable TierPipeline legs")
    ap.add_argument("--note", default="recorded weak-scaling pass")
    ap.add_argument("--out",
                    default=os.path.join(REPO, "BENCH_WEAK_SCALING_r05.json"))
    args = ap.parse_args()

    big = args.docs * args.factor
    res: dict = {"cpus": args.cpus, "docs_small": args.docs,
                 "docs_big": big, "note": args.note}
    res["probe_open"] = {"8": probe(8)}
    res["mem_probe_open"] = mem_probe()
    res["bw_probe_open"] = bw_probe()
    print("probe_open:", json.dumps(res["probe_open"]),
          json.dumps(res["bw_probe_open"]), flush=True)

    # SMALL leg first: the reported ratio is tps_big / tps_small, so
    # with monotone host decay the later (big) leg is the one slowed —
    # this ordering penalizes, not flatters, the number (the mirror of
    # pipeline_pass's big-leg-first rule for its t2/(4*t8) ratio; the
    # first recorded attempt ran big-first and had to be flagged
    # suspect for exactly this reason)
    res["compute_small"] = run_compute(args.cpus, args.docs, args.trials)
    print("compute_small:", json.dumps(res["compute_small"]), flush=True)
    res["compute_big"] = run_compute(args.cpus, big, args.trials)
    print("compute_big:", json.dumps(res["compute_big"]), flush=True)
    if args.pipeline:
        res["pipeline_small"] = run_leg(args.cpus, args.docs,
                                        max(1, args.trials - 1))
        print("pipeline_small:", json.dumps(res["pipeline_small"]),
              flush=True)
        res["pipeline_big"] = run_leg(args.cpus, big, max(1, args.trials - 1))
        print("pipeline_big:", json.dumps(res["pipeline_big"]), flush=True)

    res["probe_close"] = {"8": probe(8)}
    res["mem_probe_close"] = mem_probe()
    res["bw_probe_close"] = bw_probe()
    print("probe_close:", json.dumps(res["probe_close"]),
          json.dumps(res["bw_probe_close"]), flush=True)

    res["efficiency"] = {
        # throughput retention as input quadruples at fixed hardware
        "compute_weak_1_to_%d" % args.factor: round(
            res["compute_big"]["tokens_per_sec"]
            / res["compute_small"]["tokens_per_sec"], 3),
    }
    if args.pipeline:
        res["efficiency"]["pipeline_weak_1_to_%d" % args.factor] = round(
            res["pipeline_big"]["tokens_per_sec"]
            / res["pipeline_small"]["tokens_per_sec"], 3)
    suspect = []
    drift8 = (res["probe_close"]["8"]["ops_per_sec"]
              / res["probe_open"]["8"]["ops_per_sec"])
    if not (0.7 <= drift8 <= 1.45):
        suspect.append(f"8w probe drift {drift8:.2f} across the run")
    if res["mem_probe_close"]["gather_melems_per_sec"] < 10:
        suspect.append("close gather under paging threshold")
    if suspect:
        res["suspect"] = suspect
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res["efficiency"]),
          ("SUSPECT: " + "; ".join(suspect)) if suspect else "clean",
          flush=True)
    sys.exit(4 if suspect else 0)


if __name__ == "__main__":
    main()
