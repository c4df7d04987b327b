#!/usr/bin/env bash
# Second round-5 chip batch: the space-attention backward lever (VERDICT r4
# task 5). Decomposition probes confirm/refute the MXU tile-fill analysis,
# then the all-heads CLS pass (EGOVLP_SPACE_CLS_ALLH) is measured in
# isolation (microbench) and end-to-end (bench.py, rule of two).
# Targets: space bwd <= 0.6 ms/call, bench >= 56 clips/s/chip — or a
# measured negative with the fill analysis confirmed.
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

# no filter: the w224/w448 window variants + allh checks are all new
python scripts/chip_preflight.py "$RESULTS" || echo "PREFLIGHT FAILURES (see $RESULTS)"

# where did the PM win's remainder go? dense TIME was 247 ms of the 590.8
# eval step; a 7x-waste window kernel should cut ~200 ms but r5a measured
# 511.4 (-79). Per-category profile of the PM 16f eval step localizes it,
# and larger exact-divisor windows (fewer/bigger MXU tiles at 14x/28x key
# waste) probe the per-op-overhead hypothesis.
run timepm_profile_16f 3600 env EGOVLP_TIME_PM=1 python scripts/profile_step.py egomcq16 /tmp/prof_pm16
run timepm_w224_16f 1800 env EGOVLP_TIME_PM=1 EGOVLP_TIME_PM_WIN=224 python scripts/bench_eval.py egomcq_16f
run timepm_w448_16f 1800 env EGOVLP_TIME_PM=1 EGOVLP_TIME_PM_WIN=448 python scripts/bench_eval.py egomcq_16f

run spacebwd_probes 3600 python scripts/microbench_spacebwd.py

run allh_microbench 3600 env EGOVLP_SPACE_CLS_ALLH=1 python scripts/microbench_attn.py space_pretrain
run base_microbench 3600 python scripts/microbench_attn.py space_pretrain

run allh_bench 3600 env EGOVLP_SPACE_CLS_ALLH=1 python bench.py
run allh_bench 3600 env EGOVLP_SPACE_CLS_ALLH=1 python bench.py

echo "all done -> $RESULTS"
