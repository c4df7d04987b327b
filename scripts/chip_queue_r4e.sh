#!/usr/bin/env bash
# Fifth round-4 chip batch: the loop-structured column-chunked TIME kernel
# (commit d9c627a fixed the F=16/32 Mosaic compile blow-up) measured on the
# two long-S workloads VERDICT r3 task 3 targets:
#   egomcq_16f eval <= 520 ms (base 590.8), ft_charades_32f step <= 850 ms
#   (base 942.4 / 962.7).
# Bases re-measured in the same batch (rule of two on this tunnel).
# NOTE: fresh 32f compiles take ~25-50 min server-side; timeouts sized so.
set -u
cd "$(dirname "$0")/.."
RESULTS="${1:-/tmp/chip_queue_r4e_results.jsonl}"

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

run timecol_egomcq_16f 5400 env EGOVLP_TIME_COL=1 python scripts/bench_eval.py egomcq_16f
run base_egomcq_16f 5400 python scripts/bench_eval.py egomcq_16f
run timecol_ft32 7200 env EGOVLP_TIME_COL=1 python scripts/bench_eval.py ft_charades_32f
run base_ft32 7200 python scripts/bench_eval.py ft_charades_32f

echo "all done -> $RESULTS"
