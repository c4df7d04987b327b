#!/usr/bin/env bash
# Final round-5 chip batch: confirm the DEFAULT configuration (all flags at
# their shipped values after the r5c/r5d flips) with rule-of-two readings
# on each headline workload, take a fresh default profile, and settle the
# feed question with the H2D-overlap primitive probe.
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

# can the tunnel overlap H2D with device compute at all? (decides whether
# the 0.807x feed ratio is a structural cap or a pipeline bug)
run h2d_overlap 1800 python scripts/probe_h2d_overlap.py
run h2d_overlap 900 python scripts/probe_h2d_overlap.py

# default-config rule-of-two on each headline workload
run default_bench 3600 python bench.py
run default_bench 3600 python bench.py
run default_egomcq_16f 5400 python scripts/bench_eval.py egomcq_16f
run default_egomcq_16f 1800 python scripts/bench_eval.py egomcq_16f
run default_ft32 7200 python scripts/bench_eval.py ft_charades_32f
run default_ft32 3600 python scripts/bench_eval.py ft_charades_32f

# fresh default profiles for the round-5 record
run default_profile_pretrain 3600 python scripts/profile_step.py pretrain /tmp/prof_r5e
run default_profile_16f 3600 python scripts/profile_step.py egomcq16 /tmp/prof_r5e16

echo "all done -> $RESULTS"
