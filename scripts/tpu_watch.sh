#!/usr/bin/env bash
# Watch for the axon TPU tunnel to return, then drain the queued chip
# experiments (scripts/chip_queue.sh) once.
#
# The outage mode is a HANG inside jax.devices() (C-level, uninterruptible
# in-process), so the probe runs in a killable child under `timeout -k`.
# Probe cadence defaults to 5 min; overall deadline ~11 h.
#
# Usage: bash scripts/tpu_watch.sh [RESULTS]
set -u
cd "$(dirname "$0")/.."
RESULTS="${1:-/tmp/chip_queue_results.jsonl}"
PERIOD="${PERIOD:-300}"
DEADLINE="${DEADLINE:-39600}"

start=$SECONDS
attempt=0
while (( SECONDS - start < DEADLINE )); do
  attempt=$((attempt + 1))
  if timeout -k 10 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "tunnel up at $(date -u +%FT%TZ) (attempt $attempt); draining queue"
    bash scripts/chip_queue.sh "$RESULTS"
    exit 0
  fi
  echo "probe $attempt failed at $(date -u +%FT%TZ); sleeping ${PERIOD}s"
  sleep "$PERIOD"
done
echo "tunnel never returned within ${DEADLINE}s"
exit 1
