#!/bin/bash
# Run a TPU job with axon-claim-deadlock retry.
#
# The axon pool claim (sitecustomize -> axon.register at interpreter boot)
# can deadlock when a process launches back-to-back with a previous TPU
# process whose pool session is not yet released: the client parks on a
# futex forever (sometimes after jax's "Platform 'axon'" warning has already
# printed), so neither CPU- nor output-based liveness checks are reliable.
# The only trustworthy signal is wall-clock: the caller states a deadline
# comfortably above the job's normal runtime, and a timeout means "parked —
# relaunch".
#
# Usage: tools/tpu_run.sh [--deadline SEC] [--tries N] -- cmd args...
set -u
TRIES=4
DEADLINE=600
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
  echo "[tpu_run] attempt $attempt hit the ${DEADLINE}s deadline (claim deadlock?), retrying" >&2
  sleep 20
done
echo "[tpu_run] giving up after $TRIES timed-out attempts" >&2
exit 17
