#!/usr/bin/env bash
# Fourth round-4 chip batch, after the MXU frame-pair default landed
# (298.9 ms / 53.5 clips/s/chip):
#  1. pretrain_realdata — feed-inclusive pretrain bench from real chunked
#     mp4s through the production loader (VERDICT r3 task 5).
#  2. fresh per-category step profile of the NEW default, to pick the next
#     device-side lever now that timeattn shrank.
set -u
cd "$(dirname "$0")/.."
RESULTS="${1:-/tmp/chip_queue_r4d_results.jsonl}"

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

run pretrain_realdata 5400 python scripts/bench_eval.py pretrain_realdata
run profile_default_r4 3600 python scripts/profile_step.py pretrain /tmp/prof_r4d

echo "all done -> $RESULTS"
