#!/usr/bin/env bash
# Sixth round-4 chip batch: the FRAME-MAJOR column-chunked TIME kernels
# (commit 1115bda — the loop-structured flat-layout kernels crashed the
# Mosaic compiler at F>=16 on pl.ds dynamic sublane starts; frame-major
# moves all frame indexing to an untiled leading dim) measured on the two
# long-S workloads VERDICT r3 task 3 targets:
#   egomcq_16f eval <= 520 ms (base 590.8), ft_charades_32f step <= 850 ms
#   (base re-measured in r4e).
# Item 1 is a cheap compile repro of just the attention op (fwd then bwd)
# so a compiler crash surfaces in minutes with a full traceback instead of
# after a ~25 min model compile. Item 4 re-confirms the default bench after
# the divided.py dispatch edits (EGOVLP_TIME_COL defaults off — expect no
# change from 53.5 clips/s/chip).
set -u
cd "$(dirname "$0")/.."
RESULTS="${1:-/tmp/chip_queue_r4f_results.jsonl}"

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

run fm_repro_16f 3600 env EGOVLP_TIME_COL=1 python scripts/repro_timecol.py 16 both
run timecol_egomcq_16f 5400 env EGOVLP_TIME_COL=1 python scripts/bench_eval.py egomcq_16f
run timecol_ft32 7200 env EGOVLP_TIME_COL=1 python scripts/bench_eval.py ft_charades_32f
run bench_default 3600 python bench.py

echo "all done -> $RESULTS"
