#!/bin/bash
# Retry the recorded scaling pass until one completes in a clean window.
#
# This Firecracker host oscillates between healthy windows and two
# distinct pathologies (BASELINE.md round-4/5 measurements): hypervisor
# demand-paging (gather probe collapses 10-40x) and CPU steal (sha
# probe halves, probe 2->8 scaling drops to ~0.5).  pipeline_pass.py
# gates on both at open (exit 3), and marks records whose bracketing
# probes disagree as suspect (exit 4).  This watcher simply retries on
# a timer, keeping every attempt's artifact, and promotes the first
# clean record to BENCH_SCALING_r05.json.
#
# Coordination: skips an attempt while /tmp/spark_busy exists (the
# session holds that lock during its own Spark-heavy correctness runs,
# which would otherwise contend with the measured legs).
#
# Usage: scripts/pass_watcher.sh [max_attempts] [sleep_sec]
set -u
cd "$(dirname "$0")/.."
MAX=${1:-30}
SLEEP=${2:-360}
for i in $(seq 1 "$MAX"); do
  if [ -e /tmp/spark_busy ]; then
    echo "[watcher] $(date +%T) spark_busy lock present; skipping attempt $i"
    sleep "$SLEEP"
    continue
  fi
  out="BENCH_SCALING_r05_w${i}.json"
  echo "[watcher] $(date +%T) attempt $i -> $out"
  # min-ops8 8M: this host has not shown r04d's 14.2M all round; its
  # best windows this session read 8.4-9.7M and scale ≥0.95 — gate on
  # that reality, let the suspect checks catch mid-run collapse.
  # min-bw-scaling 0.7: the round-5 discovery — windows whose sha and
  # cold-gather probes both pass can still throttle AGGREGATE bandwidth
  # (8-way warm gather 0.58), which crushes only the wide leg.
  python scripts/pipeline_pass.py --docs 1000000 --min-ops8 8000000 \
    --min-bw-scaling 0.7 \
    --note "round-5 watcher attempt $i" --out "$out"
  rc=$?
  if [ "$rc" -eq 0 ]; then
    cp "$out" BENCH_SCALING_r05.json
    echo "[watcher] clean pass recorded on attempt $i"
    exit 0
  fi
  echo "[watcher] attempt $i rc=$rc; sleeping $SLEEP"
  sleep "$SLEEP"
done
echo "[watcher] exhausted $MAX attempts without a clean window"
exit 1
