#!/usr/bin/env bash
# Round-4 chip experiment queue (docs/ROUND4_NOTES.md). Serializes TPU jobs
# (one process owns the chip) and appends JSON result lines to RESULTS.
#
# Usage: bash scripts/chip_queue_r4.sh [RESULTS]
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

# 1. default-path re-confirmation AFTER the FusedLayerNorm module swap
#    (auto->XLA path should be HLO-equivalent to flax nn.LayerNorm; verify)
run bench_default_post_ln 3600 python bench.py

# 2. fresh per-category step profile on the current default path (the
#    round-3 profile predates the LN module swap)
run profile_pretrain 3600 python scripts/profile_step.py pretrain /tmp/prof_r4

# 3. column-chunked long-S time kernel on the 32f fine-tune step
#    (fresh 32f compiles can take ~50 min server-side)
run charades32_timecol 7200 env EGOVLP_TIME_COL=1 python scripts/bench_eval.py ft_charades_32f

# 4. same kernel on the 16f MCQ eval step
run egomcq16_timecol 5400 env EGOVLP_TIME_COL=1 python scripts/bench_eval.py egomcq_16f

# 16f baseline for comparison (cached compile from round 3)
run egomcq16_base 3600 python scripts/bench_eval.py egomcq_16f

# 5. feed-inclusive pretrain bench from real chunked mp4s (VERDICT r3 #5)
run pretrain_realdata 5400 python scripts/bench_eval.py pretrain_realdata

echo "all done -> $RESULTS"
