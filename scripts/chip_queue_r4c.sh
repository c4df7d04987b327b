#!/usr/bin/env bash
# Third round-4 chip batch: time-kernel levers surfaced by the fresh step
# profile (timeattn = 51.5 ms of the 322 ms device step at F=4).
#
#  1. col kernel at the pretrain frame count (F=4): parity-tested in
#     tests/test_divided_kernel.py (F=4 case); routes F=4 away from the
#     VPU-bound frame-pair kernels.
#  2. step-level profile of the MXU frame-pair variant: its standalone
#     microbench wins 1.7x yet round-3 measured +51 ms end-to-end — the
#     per-category profile says whether the kernel itself slows in context
#     or a neighbor does.
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

run bench_timecol_4f 3600 env EGOVLP_TIME_FP_MAX_F=0 EGOVLP_TIME_COL=1 python bench.py
run profile_mxu_fp 3600 env EGOVLP_TIME_FP_MXU=1 python scripts/profile_step.py pretrain /tmp/prof_mxu

echo "all done -> $RESULTS"
