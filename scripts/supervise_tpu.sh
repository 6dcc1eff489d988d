#!/bin/bash
# supervise_tpu.sh <logfile> <stall_secs> <max_restarts> -- cmd args...
#
# Stall-watchdog for TPU jobs on the axon relay: the relay intermittently
# wedges a client at an arbitrary compile/step with ~zero CPU (observed
# outages of 80-130 min), while a FRESH client often works once the relay
# recovers. This wrapper kills the job when its log goes stale, cools down
# so the relay-side session can be reaped, and relaunches. Pair it with
# resumable runs (stable run_dir + training.checkpoint_every) so each
# relaunch continues from the last checkpoint; a fully-finished run that
# gets relaunched serves its saved best weights (train/loop.py falls back
# to ckpt.load_best).
#
# HRN_SUPERVISE_POLL (default 30 s) and HRN_SUPERVISE_COOL (default 180 s)
# override the staleness poll and post-failure cool-down — production
# defaults are relay-sized; tests shrink them to run in seconds.
LOG=$1; STALL=$2; MAXR=$3; shift 4
POLL=${HRN_SUPERVISE_POLL:-30}
COOL=${HRN_SUPERVISE_COOL:-180}
for attempt in $(seq 0 "$MAXR"); do
  echo "=== supervisor attempt $attempt: $* ===" >> "$LOG"
  "$@" >> "$LOG" 2>&1 &
  PID=$!
  while kill -0 $PID 2>/dev/null; do
    sleep "$POLL"
    AGE=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
    if [ "$AGE" -gt "$STALL" ]; then
      echo "=== supervisor: log stale ${AGE}s, killing $PID ===" >> "$LOG"
      kill -9 $PID 2>/dev/null
      sleep 3
      break
    fi
  done
  wait $PID
  RC=$?
  if [ $RC -eq 0 ]; then echo "=== supervisor: success ===" >> "$LOG"; exit 0; fi
  echo "=== supervisor: exit $RC, cooling down ${COOL}s then restarting ===" >> "$LOG"
  sleep "$COOL"
done
echo "=== supervisor: giving up ===" >> "$LOG"
exit 1
