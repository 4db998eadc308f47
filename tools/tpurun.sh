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
# Usage: tpurun.sh <output-file> <script.py> [total_timeout_s] [window_s] [stall_s]
#
# stall_s (optional): ALSO retry if the output file stops growing for
# stall_s seconds mid-run (the tunnel can wedge after init — observed:
# a 4 MB upload hung >13 min). Pick stall_s well above the longest
# legitimate quiet period (cold Mosaic compiles can sit silent 5-15
# min), or leave it 0 (off, the default).
OUT=$1; SCRIPT=$2; TOTAL=${3:-1800}; WINDOW=${4:-240}; STALL=${5:-0}
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
  if [ "$STALL" -gt 0 ]; then
    STUCK=0
    while kill -0 $PID 2>/dev/null; do
      SIZE1=$(stat -c %s "$OUT" 2>/dev/null || echo 0)
      ELAPSED=0
      while kill -0 $PID 2>/dev/null && [ $ELAPSED -lt "$STALL" ]; do
        sleep 15; ELAPSED=$((ELAPSED + 15))
        SIZE2=$(stat -c %s "$OUT" 2>/dev/null || echo 0)
        if [ "$SIZE2" != "$SIZE1" ]; then break; fi
      done
      SIZE2=$(stat -c %s "$OUT" 2>/dev/null || echo 0)
      if kill -0 $PID 2>/dev/null && [ "$SIZE2" = "$SIZE1" ] \
          && [ $ELAPSED -ge "$STALL" ]; then
        echo "[tpurun] attempt $attempt stalled ${STALL}s mid-run; retrying"
        kill $PID 2>/dev/null; sleep 3
        STUCK=1
        break
      fi
    done
    if [ $STUCK -eq 1 ]; then continue; fi
  fi
  wait $PID
  exit $?
done
echo "[tpurun] all attempts stuck"
exit 1
