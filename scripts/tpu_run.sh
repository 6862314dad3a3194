#!/bin/bash
# Wedge-aware TPU launcher. The axon tunnel occasionally wedges a NEW
# process at connect time: single thread, futex wait, zero CPU time,
# nothing logged. Legitimate runs burn host CPU within a couple of
# minutes (imports + dispatch). This wrapper watches the cumulative CPU
# time of the child PROCESS TREE (the direct child is the `timeout`
# shim — its own CPU time is always ~0) during a warmup window and
# relaunches on a wedge signature; once real CPU activity shows up the
# run is left alone (remote compiles can be log-silent for 5+ minutes —
# do NOT kill on log staleness, see docs/STATUS.md round-5 notes).
#
# Usage: tpu_run.sh <logfile> <timeout_s> <cmd...>
LOG=$1; TMO=$2; shift 2
WARMUP=${WARMUP:-240}   # seconds to reach nonzero tree CPU before relaunch
TRIES=${TRIES:-3}

tree_cpu_ticks() {  # $1 = root pid; sums utime+stime over pid + descendants
  local total=0 p t
  local pids="$1"
  local frontier="$1"
  while [ -n "$frontier" ]; do
    local next=""
    for p in $frontier; do
      local kids
      kids=$(ps -o pid= --ppid "$p" 2>/dev/null)
      next="$next $kids"
    done
    frontier=$(echo "$next" | tr -s ' \n' '  ' | sed 's/^ //;s/ $//')
    pids="$pids $frontier"
  done
  for p in $pids; do
    t=$(awk '{print $14+$15}' "/proc/$p/stat" 2>/dev/null)
    total=$((total + ${t:-0}))
  done
  echo "$total"
}

for attempt in $(seq 1 "$TRIES"); do
  : > "$LOG"
  timeout "$TMO" "$@" >> "$LOG" 2>&1 &
  PID=$!
  SECONDS=0
  wedged=0
  while kill -0 "$PID" 2>/dev/null; do
    sleep 20
    if [ "$SECONDS" -ge "$WARMUP" ]; then
      CPU=$(tree_cpu_ticks "$PID")
      if [ "${CPU:-0}" -lt 100 ]; then   # <1s of CPU after warmup = wedge
        echo "# tpu_run: attempt $attempt wedged (${CPU:-0} CPU ticks after ${SECONDS}s), relaunching" >> "$LOG"
        kill -9 "$PID" 2>/dev/null
        # also reap the tree under the timeout shim
        for p in $(ps -o pid= --ppid "$PID" 2>/dev/null); do
          kill -9 "$p" 2>/dev/null
        done
        wedged=1
        break
      fi
      # Active child: stop polling, just wait for exit.
      wait "$PID"
      break
    fi
  done
  [ "$wedged" = 1 ] && continue
  exit 0
done
echo "# tpu_run: FAILED after $TRIES wedged attempts" >> "$LOG"
exit 1
