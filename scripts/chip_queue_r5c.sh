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

run feed_depth4 3600 env EGOVLP_FEED_DEPTH=4 python scripts/bench_eval.py pretrain_realdata
run feed_d2_w10 3600 env EGOVLP_FEED_DEPTH=2 EGOVLP_FEED_WORKERS=10 python scripts/bench_eval.py pretrain_realdata

echo "all done -> $RESULTS"
