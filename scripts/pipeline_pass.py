"""One recorded north-rule pipeline pass: durable TierPipeline at
local[2] vs local[8] on identical input, bracketed by per-level
hardware probes, BIG LEG FIRST (host drift decays monotonically through
a run, so this ordering penalizes rather than flatters the ratio —
BASELINE.md protocol).  Produces the BENCH_SCALING_r{N}{x}.json shape
the round-4 headline pass (r04d) established.

Usage: python scripts/pipeline_pass.py [--docs 1000000] [--out FILE]
       [--note "..."] [--trials 1]
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


def _burn(n: int) -> int:
    h = b"x" * 64
    for _ in range(n):
        h = hashlib.sha256(h).digest()
    return h[0]


def probe(workers: int, total_ops: int = 12_800_000) -> dict:
    per = total_ops // workers
    t0 = time.time()
    with mp.Pool(workers) as p:
        p.map(_burn, [per] * workers)
    dt = time.time() - t0
    return {"wall_sec": round(dt, 3), "ops_per_sec": round(total_ops / dt, 1)}


def mem_probe(n: int = 1 << 22) -> dict:
    """Cold-page random-gather probe (see bench.py::_mem_probe): detects
    hypervisor demand-paging windows — the pathology that collapses JVM
    work 10-40× while the sha probe still reads a mild 60-70%.  A pass
    fired while this reads <10 M elem/s is garbage by construction."""
    import numpy as np

    # Median of 3 independent cold rounds — same rationale as
    # bench.py::_mem_probe: a healthy window's fresh-process first
    # allocation can read 9-10 M elem/s (first-touch zeroing burst)
    # while the real pathology reads <5 on every round; the median
    # stays cold-by-construction but outvotes a single outlier.
    rates = []
    for r in range(3):
        rng = np.random.default_rng((int(time.time()) & 0xFFFF) + r)
        perm = rng.permutation(n).astype(np.int64)
        src = np.arange(n, dtype=np.int64)
        t0 = time.time()
        src[perm].sum()
        dt = time.time() - t0
        rates.append(round(n / dt / 1e6, 1))
    return {"elems": n, "rounds": rates,
            "gather_melems_per_sec": sorted(rates)[1]}


def _gather_worker(q, n: int) -> None:
    import numpy as np

    rng = np.random.default_rng(12345)
    perm = rng.permutation(n).astype(np.int64)
    src = np.arange(n, dtype=np.int64)
    src[perm].sum()  # warm: pages resident — this probe isolates BANDWIDTH
    t0 = time.time()
    src[perm].sum()
    dt = time.time() - t0
    q.put(n / dt / 1e6)


def bw_probe(n: int = 1 << 22) -> dict:
    """Parallel warm-gather probe: aggregate memory throughput at 1 vs 8
    concurrent workers.  Round-5 finding: a window can pass BOTH the sha
    probe (register-bound) and the single-thread cold-gather probe
    (latency/paging-bound) while the host throttles AGGREGATE bandwidth
    — 8-way warm gather scaled 0.58 in exactly the window where the
    8-core pipeline leg ran 4.5× its round-4 time but the 2-core leg
    only 1.4×.  Parallel Spark executors are bandwidth-bound; this is
    the probe that sees what they see."""
    def run(workers: int) -> float:
        q = mp.Queue()
        ps = [mp.Process(target=_gather_worker, args=(q, n))
              for _ in range(workers)]
        for p in ps:
            p.start()
        for p in ps:
            p.join()
        return sum(q.get() for _ in ps)

    # median of 3 per level: a single 1-worker rep rides turbo/idle
    # boost with ±30% swing, whipsawing the ratio while the 8-way
    # aggregate (the quantity executors actually share) moves far less
    w1 = sorted(run(1) for _ in range(3))[1]
    w2 = sorted(run(2) for _ in range(3))[1]
    w8 = sorted(run(8) for _ in range(3))[1]
    return {"w1_melems": round(w1, 1), "w2_agg_melems": round(w2, 1),
            "w8_agg_melems": round(w8, 1),
            "bw_scaling_8w": round(w8 / (8 * w1), 3),
            # the ceiling comparable to the measured local[2]->local[8]
            # legs: how much MORE aggregate memory bandwidth 4x the
            # workers actually get on this VM
            "bw_scaling_2_to_8": round(w8 / (4 * w2), 3)}


def run_leg(cpus: int, docs: int, trials: int) -> dict:
    best = None
    for _ in range(trials):
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "run_tiers.py"),
             "--docs", str(docs), "--cpus", str(cpus), "--batches", "2",
             "--cells", "64", "--parts", "64", "--json"],
            capture_output=True, text=True, timeout=2400,
        )
        line = [ln for ln in out.stdout.strip().splitlines()
                if ln.startswith("{")][-1]
        rec = json.loads(line)
        if best is None or rec["wall_sec"] < best["wall_sec"]:
            best = rec
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--trials", type=int, default=1)
    ap.add_argument("--note", default="recorded pipeline pass")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_SCALING_r05.json"))
    ap.add_argument("--min-ops8", type=float, default=9e6,
                    help="abort unless the 8-worker sha probe reaches this "
                    "(ops/sec) — r04d's healthy host read 14.2M; CPU-steal "
                    "windows on this box read 5-7M and crush the legs")
    ap.add_argument("--min-probe-eff", type=float, default=0.75,
                    help="abort unless the sha probe itself scales 2→8 at "
                    "this efficiency — the pipeline cannot evidence "
                    "scaling above the hardware's own ceiling")
    ap.add_argument("--min-bw-scaling", type=float, default=0.7,
                    help="abort unless 8-way warm-gather aggregate reaches "
                    "this fraction of 8× the 1-way rate — bandwidth-throttle "
                    "windows read ~0.58 and crush only the wide leg, which "
                    "no CPU- or latency-probe can see")
    ap.add_argument("--min-bw-agg", type=float, default=500.0,
                    help="the bw gate also passes when the 8-way AGGREGATE "
                    "warm-gather rate reaches this many M elem/s, whatever "
                    "the ratio reads.  Rationale: executors share AGGREGATE "
                    "bandwidth; the ratio was a proxy adopted when absolutes "
                    "sat at 340-380 M elem/s.  In fast windows the idle "
                    "1-worker leg turbo-boosts (w1 90-120 vs 58-96 in the "
                    "throttled windows), depressing the ratio below 0.7 "
                    "while the 8 workers have ~1.7x MORE bandwidth than the "
                    "recorded clean pass — exactly the window to measure in. "
                    "Every genuinely-throttled window this round read "
                    "w8_agg 340-377; 500 separates the populations cleanly.")
    args = ap.parse_args()

    res: dict = {"docs": args.docs, "note": args.note}
    res["probe_open"] = {"2": probe(2), "8": probe(8)}
    res["mem_probe_open"] = mem_probe()
    if res["mem_probe_open"]["gather_melems_per_sec"] < 10:
        print("ABORT: cold-page gather probe reads",
              res["mem_probe_open"], "— hypervisor paging window; a pass "
              "now is garbage by construction", flush=True)
        res["aborted"] = "mem_probe below 10 M elem/s"
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)
        sys.exit(3)
    open_eff = res["probe_open"]["8"]["ops_per_sec"] / (
        4 * res["probe_open"]["2"]["ops_per_sec"])
    if (res["probe_open"]["8"]["ops_per_sec"] < args.min_ops8
            or open_eff < args.min_probe_eff):
        print(f"ABORT: sha probe open 8w="
              f"{res['probe_open']['8']['ops_per_sec']:.0f} ops/s, "
              f"2→8 eff {open_eff:.3f} — CPU-steal window (gates: "
              f"≥{args.min_ops8:.0f} and ≥{args.min_probe_eff})",
              flush=True)
        res["aborted"] = "cpu probe below gates"
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)
        sys.exit(3)
    res["bw_probe_open"] = bw_probe()
    # gate on the 2->8 bandwidth ratio (comparable to the measured
    # local[2]->local[8] legs); the 1->8 ratio whipsaws on 1-worker turbo
    if (res["bw_probe_open"]["bw_scaling_2_to_8"] < args.min_bw_scaling
            and res["bw_probe_open"]["w8_agg_melems"] < args.min_bw_agg):
        print("ABORT: parallel-bandwidth probe", res["bw_probe_open"],
              f"under gate {args.min_bw_scaling} (and aggregate under "
              f"{args.min_bw_agg} M elem/s) — aggregate-bandwidth "
              "throttle window; the wide leg would be crushed asymmetrically",
              flush=True)
        res["aborted"] = "bw probe below gate"
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)
        sys.exit(3)
    print("probe_open:", json.dumps(res["probe_open"]),
          json.dumps(res["bw_probe_open"]), flush=True)
    res["pipeline_8"] = run_leg(8, args.docs, args.trials)
    print("pipeline_8:", json.dumps(res["pipeline_8"]), flush=True)
    res["pipeline_2"] = run_leg(2, args.docs, args.trials)
    print("pipeline_2:", json.dumps(res["pipeline_2"]), flush=True)
    res["probe_close"] = {"2": probe(2), "8": probe(8)}
    res["mem_probe_close"] = mem_probe()
    res["bw_probe_close"] = bw_probe()
    print("probe_close:", json.dumps(res["probe_close"]),
          json.dumps(res["mem_probe_close"]),
          json.dumps(res["bw_probe_close"]), flush=True)

    res["efficiency"] = {
        "pipeline_2_to_8": round(
            res["pipeline_8"]["tokens_per_sec"]
            / (4 * res["pipeline_2"]["tokens_per_sec"]), 3),
        "probe_open_2_to_8": round(
            res["probe_open"]["8"]["ops_per_sec"]
            / (4 * res["probe_open"]["2"]["ops_per_sec"]), 3),
        "probe_close_2_to_8": round(
            res["probe_close"]["8"]["ops_per_sec"]
            / (4 * res["probe_close"]["2"]["ops_per_sec"]), 3),
    }
    # a window that DEGRADED mid-run flatters neither leg equally —
    # the big-leg-first protocol makes degradation penalize the ratio,
    # but a collapse (close probes far below open, or the close gather
    # back under the paging threshold) means the legs measured two
    # different machines: mark the record suspect so a watcher retries
    drift8 = (res["probe_close"]["8"]["ops_per_sec"]
              / res["probe_open"]["8"]["ops_per_sec"])
    suspect = []
    if not (0.7 <= drift8 <= 1.45):
        suspect.append(f"8w probe drift {drift8:.2f} across the run")
    if res["mem_probe_close"]["gather_melems_per_sec"] < 10:
        suspect.append("close gather under paging threshold")
    if res["efficiency"]["probe_close_2_to_8"] < args.min_probe_eff:
        suspect.append("close probe scaling under hardware gate")
    if (res["bw_probe_close"]["bw_scaling_2_to_8"] < args.min_bw_scaling
            and res["bw_probe_close"]["w8_agg_melems"] < args.min_bw_agg):
        suspect.append("close bandwidth scaling under gate")
    if suspect:
        res["suspect"] = suspect
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res["efficiency"]),
          ("SUSPECT: " + "; ".join(suspect)) if suspect else "clean")
    if suspect:
        sys.exit(4)


if __name__ == "__main__":
    main()
