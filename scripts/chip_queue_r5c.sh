#!/usr/bin/env bash
# Third round-5 chip batch: feed-pipeline depth/worker sweep (the r5a A/B
# reached 0.807x synthetic at depth 2; target 0.9x) + any defaults flipped
# by r5b results get their confirming second reading here.
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

# LN-stat reduction probes: is the 134 ms convert bucket VPU lane-reduce
# cost that an MXU ones-matmul removes?
run lnstats_probes 3600 python scripts/microbench_lnstats.py

# window-size re-measures: the r5b 1800s timeouts cut the fresh eval-step
# compiles; the persistent cache makes these re-runs fast
run timepm_w224_16f 5400 env EGOVLP_TIME_PM_WIN=224 python scripts/bench_eval.py egomcq_16f
run timepm_w448_16f 5400 env EGOVLP_TIME_PM_WIN=448 python scripts/bench_eval.py egomcq_16f

# hoisted patch-major permutes (EGOVLP_PM_HOIST): the r5b PM profile shows
# ~50 ms/step of copy/slice/reshape growth vs dense at 16f; permuting the
# 768-wide x instead of the 2304-wide qkv halves the permuted bytes.
python scripts/chip_preflight.py "$RESULTS" pm_hoist || echo "PREFLIGHT FAILURES (see $RESULTS)"
run hoist_egomcq_16f 3600 env EGOVLP_PM_HOIST=1 python scripts/bench_eval.py egomcq_16f
run hoist_egomcq_16f 1800 env EGOVLP_PM_HOIST=1 python scripts/bench_eval.py egomcq_16f
run hoist_ft32 7200 env EGOVLP_PM_HOIST=1 python scripts/bench_eval.py ft_charades_32f
run hoist_ft32 3600 env EGOVLP_PM_HOIST=1 python scripts/bench_eval.py ft_charades_32f

run feed_depth4 3600 env EGOVLP_FEED_DEPTH=4 python scripts/bench_eval.py pretrain_realdata
run feed_d2_w10 3600 env EGOVLP_FEED_DEPTH=2 EGOVLP_FEED_WORKERS=10 python scripts/bench_eval.py pretrain_realdata

echo "all done -> $RESULTS"
