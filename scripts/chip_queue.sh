#!/usr/bin/env bash
# Queued chip experiments (docs/ROUND3_NOTES.md "Pending chip experiments"),
# written while the axon TPU tunnel was down so the backlog runs with one
# command once it returns. Serializes TPU jobs (one process owns the chip)
# and appends every JSON result line to RESULTS (default
# /tmp/chip_queue_results.jsonl) with an experiment tag.
#
# Usage: bash scripts/chip_queue.sh [RESULTS]
set -u
cd "$(dirname "$0")/.."
RESULTS="${1:-/tmp/chip_queue_results.jsonl}"

run() { # run <tag> <timeout_s> <cmd...>
  local tag="$1" t="$2"; shift 2
  echo "=== $tag ===" | tee -a "$RESULTS.log"
  local out rc
  out=$(mktemp)
  timeout "$t" "$@" >"$out" 2>>"$RESULTS.log"
  rc=$?
  cat "$out"
  # tag stdout JSON lines into the results file
  grep '^{' "$out" | while IFS= read -r line; do
    echo "{\"experiment\": \"$tag\", \"result\": $line}" >>"$RESULTS"
  done
  rm -f "$out"
  echo "--- $tag exit=$rc ---" | tee -a "$RESULTS.log"
}

# 4. bench.py re-confirmation (config-D kernels + pipelined fetch; fresh
#    compiles land in .jax_cache so later runs are fast)
run bench_reconfirm 3600 python bench.py

# 1. batch-32 pretrain (round-2 rejection predates pipelined fetch + config D)
run bench_batch32 3600 env BENCH_BATCH=32 python bench.py

# 2. larger backward budget: hp_bwd 2 -> 6 on the packed backward
#    (interpret-mode parity already green at hp_bwd=12)
run bench_bwd_budget 3600 env EGOVLP_BWD_BUDGET=2500000 python bench.py

# 3. transfer-inclusive MCQ feed bench, f32 vs uint8 device-norm
run feed 2400 python scripts/bench_eval.py feed

# 5. long-S TIME backward through the transpose-free flat layout on the
#    32f charades step (targets the ~250 ms copy share; fresh 32f compiles
#    can take ~50 min server-side — generous timeout)
run charades32_flat 7200 env EGOVLP_TIME_LONG_FLAT=1 python scripts/bench_eval.py ft_charades_32f

# reference numbers for the same step without the flag (cached compile)
run charades32_base 3600 python scripts/bench_eval.py ft_charades_32f

echo "all done -> $RESULTS"
