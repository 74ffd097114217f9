"""One recorded COMPUTE-scaling pass: the in-memory tier compute
(explode -> hourly -> daily rollups, no durable writes) at local[2] vs
local[8] on identical input, bracketed by the same probe suite as
pipeline_pass.py (sha CPU probe, cold-gather paging probe, warm-gather
aggregate-bandwidth probe), BIG LEG FIRST.  Companion to
pipeline_pass.py so the compute diagnostic can be re-measured in a
gated window without re-running the full bench_scaling matrix.

Usage: python scripts/compute_pass.py [--docs 1000000] [--trials 2]
       [--out FILE] [--note "..."]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from pipeline_pass import bw_probe, mem_probe, probe  # noqa: E402
from bench_scaling import run_compute  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--note", default="recorded compute pass")
    ap.add_argument("--out",
                    default=os.path.join(REPO, "BENCH_SCALING_r05_compute2.json"))
    ap.add_argument("--min-ops8", type=float, default=8e6)
    ap.add_argument("--min-probe-eff", type=float, default=0.75)
    ap.add_argument("--min-bw-scaling", type=float, default=0.7)
    ap.add_argument("--min-bw-agg", type=float, default=500.0,
                    help="bw gate also passes on ABSOLUTE 8-way aggregate "
                    "(M elem/s) — see pipeline_pass.py --min-bw-agg")
    args = ap.parse_args()

    res: dict = {"docs": args.docs, "note": args.note}
    res["probe_open"] = {"2": probe(2), "8": probe(8)}
    res["mem_probe_open"] = mem_probe()
    res["bw_probe_open"] = bw_probe()
    open_eff = res["probe_open"]["8"]["ops_per_sec"] / (
        4 * res["probe_open"]["2"]["ops_per_sec"])
    gates_ok = (
        res["mem_probe_open"]["gather_melems_per_sec"] >= 10
        and res["probe_open"]["8"]["ops_per_sec"] >= args.min_ops8
        and open_eff >= args.min_probe_eff
        # the ratio comparable to the measured local[2]->local[8] legs
        # is the 2->8 one; the 1->8 ratio whipsaws on 1-worker turbo
        and (res["bw_probe_open"].get("bw_scaling_2_to_8",
                                      res["bw_probe_open"]["bw_scaling_8w"])
             >= args.min_bw_scaling
             or res["bw_probe_open"]["w8_agg_melems"] >= args.min_bw_agg)
    )
    if not gates_ok:
        print("ABORT: open probes under gate:",
              json.dumps(res["probe_open"]),
              json.dumps(res["mem_probe_open"]),
              json.dumps(res["bw_probe_open"]), flush=True)
        res["aborted"] = "open probes under gate"
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)
        sys.exit(3)
    print("probe_open:", json.dumps(res["probe_open"]),
          json.dumps(res["bw_probe_open"]), flush=True)

    res["compute_8"] = run_compute(8, args.docs, args.trials)
    print("compute_8:", json.dumps(res["compute_8"]), flush=True)
    res["compute_2"] = run_compute(2, args.docs, args.trials)
    print("compute_2:", json.dumps(res["compute_2"]), flush=True)

    res["probe_close"] = {"2": probe(2), "8": probe(8)}
    res["mem_probe_close"] = mem_probe()
    res["bw_probe_close"] = bw_probe()
    print("probe_close:", json.dumps(res["probe_close"]),
          json.dumps(res["mem_probe_close"]),
          json.dumps(res["bw_probe_close"]), flush=True)

    hw_open = round(open_eff, 3)
    hw_close = round(res["probe_close"]["8"]["ops_per_sec"]
                     / (4 * res["probe_close"]["2"]["ops_per_sec"]), 3)
    raw = round(res["compute_8"]["tokens_per_sec"]
                / (4 * res["compute_2"]["tokens_per_sec"]), 3)
    res["efficiency"] = {
        "compute_2_to_8": raw,
        "probe_open_2_to_8": hw_open,
        "probe_close_2_to_8": hw_close,
        "compute_vs_hw_open_ceiling": round(raw / hw_open, 3),
    }
    suspect = []
    drift8 = (res["probe_close"]["8"]["ops_per_sec"]
              / res["probe_open"]["8"]["ops_per_sec"])
    if not (0.7 <= drift8 <= 1.45):
        suspect.append(f"8w probe drift {drift8:.2f} across the run")
    if res["mem_probe_close"]["gather_melems_per_sec"] < 10:
        suspect.append("close gather under paging threshold")
    if hw_close < args.min_probe_eff:
        suspect.append("close probe scaling under hardware gate")
    if (res["bw_probe_close"].get("bw_scaling_2_to_8",
                                  res["bw_probe_close"]["bw_scaling_8w"])
            < args.min_bw_scaling
            and res["bw_probe_close"]["w8_agg_melems"] < args.min_bw_agg):
        suspect.append("close bandwidth scaling under gate")
    if res["probe_close"]["8"]["ops_per_sec"] < args.min_ops8:
        suspect.append("close sha probe under gate")
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
