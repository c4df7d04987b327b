#!/usr/bin/env bash
# Eighth round-4 chip batch: the PATCH-MAJOR long-S TIME kernels
# (EGOVLP_TIME_PM): one XLA row permute turns time groups contiguous, then
# the proven space frame-block window kernels run with a static
# block-diagonal bias — dense-MXU tiles with win/F (8x at F=16) wasted
# FLOPs instead of ~S/(F+1) (~180x), and a pallas window BACKWARD instead
# of the transpose-heavy XLA einsum vjp (~250 ms of copies in the 32f
# profile). Targets (VERDICT r3 task 3): egomcq_16f <= 520 ms (base
# 590.8), ft_charades_32f <= 850 ms (base 942.4/962.7).
set -u
cd "$(dirname "$0")/.."
RESULTS="${1:-/tmp/chip_queue_r4h_results.jsonl}"

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

run timepm_egomcq_16f 5400 env EGOVLP_TIME_PM=1 python scripts/bench_eval.py egomcq_16f
run timepm_ft32 7200 env EGOVLP_TIME_PM=1 python scripts/bench_eval.py ft_charades_32f

run bench_default_postpm 3600 python bench.py

echo "all done -> $RESULTS"
