#!/usr/bin/env bash
# Seventh round-4 chip batch: profile the egomcq_16f eval step (base path,
# compile cached from the r4e base run). The r4f measurement showed the
# frame-major col kernel LOSES 64% at 16f eval (971 vs 590.8 ms) — before
# any further long-S kernel work, find out where the base eval's 590 ms
# actually goes (space windowed kernels? GEMMs? the dense time tiles?).
set -u
cd "$(dirname "$0")/.."
RESULTS="${1:-/tmp/chip_queue_r4g_results.jsonl}"

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

run profile_egomcq16 3600 python scripts/profile_step.py egomcq16 /tmp/trace_mcq16

echo "all done -> $RESULTS"
