#!/bin/bash
# Run a TPU python script with a stuck-at-init watchdog + retry.
#
# Rationale (see CLAUDE.md / docs/DESIGN_NOTES.md): a fresh TPU process on
# this tunneled chip occasionally wedges on a futex before jax even
# initializes. jax's init banner appears within seconds when healthy, so
# "no output at all for WINDOW seconds" reliably means stuck -> retry.
# NOTE: the script itself must not swallow stdout/stderr (don't wrap
# everything in subprocess captures), or the watchdog will false-trigger.
#
# Usage: tpurun.sh <output-file> <script.py> [total_timeout_s] [window_s]
OUT=$1; SCRIPT=$2; TOTAL=${3:-1800}; WINDOW=${4:-240}
for attempt in 1 2 3; do
  : > "$OUT"
  stdbuf -oL -eL timeout "$TOTAL" python "$SCRIPT" >> "$OUT" 2>&1 &
  PID=$!
  for i in $(seq 1 $((WINDOW / 10))); do
    sleep 10
    if [ -s "$OUT" ]; then break; fi
    if ! kill -0 $PID 2>/dev/null; then break; fi
  done
  if [ ! -s "$OUT" ] && kill -0 $PID 2>/dev/null; then
    echo "[tpurun] attempt $attempt stuck at init; retrying"
    kill $PID 2>/dev/null; sleep 3
    continue
  fi
  wait $PID
  exit $?
done
echo "[tpurun] all attempts stuck"
exit 1
