#!/usr/bin/env bash
# First round-5 chip batch: land the patch-major long-S TIME kernel.
# The r4h SIGABRT is root-caused (partial last window crashes Mosaic;
# fixed with exact-divisor windows: win=112 at F=16, 128 at F=32) and
# fwd+bwd compile clean at both shapes. Measure the step benches twice
# each (rule of two), then the eval-step LN re-measure (VERDICT r4
# task 3) on top of PM, then a default bench re-confirmation.
# Targets: egomcq_16f <= 520 ms (base 590.8), ft_charades_32f <= 850 ms
# (base 942.4/962.7).
set -u
cd "$(dirname "$0")/.."
RESULTS="${1:-/tmp/chip_queue_r5a_results.jsonl}"

run() { # run <tag> <timeout_s> <cmd...>
  local tag="$1" t="$2"; shift 2
  echo "=== $tag ===" | tee -a "$RESULTS.log"
  local out rc
  out=$(mktemp)
  timeout "$t" "$@" >"$out" 2>>"$RESULTS.log"
  rc=$?
  cat "$out"
  python scripts/queue_log.py "$RESULTS" "$tag" "$out"
  rm -f "$out"
  echo "--- $tag exit=$rc ---" | tee -a "$RESULTS.log"
}

python scripts/chip_preflight.py "$RESULTS" || echo "PREFLIGHT FAILURES (see $RESULTS)"

run timepm_egomcq_16f 5400 env EGOVLP_TIME_PM=1 python scripts/bench_eval.py egomcq_16f
run timepm_egomcq_16f 1800 env EGOVLP_TIME_PM=1 python scripts/bench_eval.py egomcq_16f
run timepm_ft32 7200 env EGOVLP_TIME_PM=1 python scripts/bench_eval.py ft_charades_32f
run timepm_ft32 3600 env EGOVLP_TIME_PM=1 python scripts/bench_eval.py ft_charades_32f

# eval-step LN convert tax (134 ms, 24% of the 16f eval step): one
# re-measure of the Pallas LN on the EVAL step, stacked on PM (the
# candidate default); the fusion-barrier dead end was TRAIN-step only.
run timepm_ln_egomcq_16f 5400 env EGOVLP_TIME_PM=1 EGOVLP_LN_IMPL=pallas python scripts/bench_eval.py egomcq_16f

run bench_default_r5a 3600 python bench.py

# feed double-buffering A/B (VERDICT r4 task 4): depth=0 reproduces the
# round-4 inline-put behavior (0.696x synthetic); depth=2 ships batch N+1
# from a feeder thread while step N computes. Target >= 0.9x synthetic.
run feed_depth0 3600 env EGOVLP_FEED_DEPTH=0 python scripts/bench_eval.py pretrain_realdata
run feed_depth2 3600 env EGOVLP_FEED_DEPTH=2 python scripts/bench_eval.py pretrain_realdata

echo "all done -> $RESULTS"
