#!/usr/bin/env bash
# Remainder of the round-4 chip queue (experiments 2-5 of
# scripts/chip_queue_r4.sh — experiment 1 completed before a session
# restart killed the queue). Appends to the same results file.
set -u
cd "$(dirname "$0")/.."
RESULTS="${1:-/tmp/chip_queue_r4_results.jsonl}"

run() { # run <tag> <timeout_s> <cmd...>
  local tag="$1" t="$2"; shift 2
  echo "=== $tag ===" | tee -a "$RESULTS.log"
  local out rc
  out=$(mktemp)
  timeout "$t" "$@" >"$out" 2>>"$RESULTS.log"
  rc=$?
  cat "$out"
  grep '^{' "$out" | while IFS= read -r line; do
    echo "{\"experiment\": \"$tag\", \"result\": $line}" >>"$RESULTS"
  done
  rm -f "$out"
  echo "--- $tag exit=$rc ---" | tee -a "$RESULTS.log"
}

run profile_pretrain 3600 python scripts/profile_step.py pretrain /tmp/prof_r4
run charades32_timecol 7200 env EGOVLP_TIME_COL=1 python scripts/bench_eval.py ft_charades_32f
run egomcq16_timecol 5400 env EGOVLP_TIME_COL=1 python scripts/bench_eval.py egomcq_16f
run egomcq16_base 3600 python scripts/bench_eval.py egomcq_16f
run pretrain_realdata 5400 python scripts/bench_eval.py pretrain_realdata

echo "all done -> $RESULTS"
