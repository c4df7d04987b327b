#!/usr/bin/env bash
# Fourth round-5 chip batch: the MXU-stats LN attempt on the eval convert
# bucket (lnstats_probes measured the ones-dot LN at noise level vs
# 0.046 ms/call for the lane-reduce reference at the eval LN shape), plus
# a train-step reading to catch regressions before any default flip.
set -u
cd "$(dirname "$0")/.."
RESULTS="${1:-docs/CHIP_QUEUE_r05.jsonl}"

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

python scripts/chip_preflight.py "$RESULTS" ln_mxu \
  || echo "PREFLIGHT FAILURES (see $RESULTS)"
python scripts/chip_preflight.py "$RESULTS" timepm_f32w \
  || echo "PREFLIGHT FAILURES (see $RESULTS)"

# window-width follow-ups: w224 measured 485.2 ms at 16f (vs win-112
# default 511.4/512.7; w448 488.6/487.0) — confirm w224 (rule of two),
# then probe the widths at F=32 where the default picks win=128
run timepm_w224_16f 1800 env EGOVLP_TIME_PM_WIN=224 python scripts/bench_eval.py egomcq_16f
run timepm_w224_ft32 7200 env EGOVLP_TIME_PM_WIN=224 python scripts/bench_eval.py ft_charades_32f
run timepm_w448_ft32 7200 env EGOVLP_TIME_PM_WIN=448 python scripts/bench_eval.py ft_charades_32f

run lnmxu_egomcq_16f 5400 env EGOVLP_LN_STATS_MXU=1 python scripts/bench_eval.py egomcq_16f
run lnmxu_egomcq_16f 1800 env EGOVLP_LN_STATS_MXU=1 python scripts/bench_eval.py egomcq_16f
run lnmxu_bench 3600 env EGOVLP_LN_STATS_MXU=1 python bench.py
run lnmxu_bench 3600 env EGOVLP_LN_STATS_MXU=1 python bench.py

echo "all done -> $RESULTS"
