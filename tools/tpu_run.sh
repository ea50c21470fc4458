#!/bin/bash
# Run a TPU job with a wall-clock deadline backstop.
#
# The axon pool claim (sitecustomize -> axon.register at interpreter boot)
# PARKS when a process launches before the previous TPU session is lazily
# released — measured up to ~25 min (CLAUDE.md). Two consequences shape this
# script:
#   * killing a parked claimant can RESET the stale session's clock, so
#     kill-and-relaunch loops livelock the claim. Default is therefore ONE
#     attempt with a deadline far above both the normal runtime and the
#     worst measured park (waiting IS the fast path).
#   * the only trustworthy liveness signal is wall-clock — neither output
#     (the "Platform 'axon'" warning prints pre-claim) nor CPU% works.
# Prefer tools/tpu_worker.py (claim once, run a job spool) for anything
# beyond a single one-off command.
#
# Usage: tools/tpu_run.sh [--deadline SEC] [--tries N] -- cmd args...
set -u
TRIES=1
DEADLINE=2400
while [[ "$1" != "--" ]]; do
  case "$1" in
    --tries) TRIES=$2; shift 2 ;;
    --deadline) DEADLINE=$2; shift 2 ;;
    *) echo "unknown arg $1" >&2; exit 2 ;;
  esac
done
shift

for attempt in $(seq 1 $TRIES); do
  timeout --kill-after=10 "$DEADLINE" "$@"
  rc=$?
  if (( rc != 124 && rc != 137 )); then
    exit $rc
  fi
  echo "[tpu_run] attempt $attempt hit the ${DEADLINE}s deadline" >&2
  if (( attempt < TRIES )); then
    echo "[tpu_run] relaunching — NOTE: each kill can reset the stale session clock" >&2
    sleep 20
  fi
done
echo "[tpu_run] giving up after $TRIES timed-out attempts" >&2
exit 17
