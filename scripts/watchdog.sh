#!/bin/bash
# Auto-restart the trainer if its log goes stale — the axon tunnel
# occasionally wedges a dispatch (futex wait, no log writes); recovery is
# kill -9 + --resume (interrupt-safe checkpoints every 2 epochs bound the
# loss). Does nothing while the trainer is deliberately stopped (eval
# windows): a dead PID is left alone.
#
# Parameterized (round 4): LOG/PIDFILE/CMDFILE env vars select the run;
# defaults keep the original batch-512 wiring. The restart command comes
# from $CMDFILE (written at launch) so flag changes between training
# phases survive a watchdog restart.
cd "$(dirname "$0")/.."
THRESH=${THRESH:-900}  # resume-compile + an epoch can exceed 420s when
                       # host CPU is contended (pytest); 900s is safely
                       # above both while still catching real tunnel wedges
LOG=${LOG:-train512.log}
PIDFILE=${PIDFILE:-/tmp/train512.pid}
CMDFILE=${CMDFILE:-/tmp/train512.cmd}
DEFAULT_CMD="python -m deep_active_inference_mc_tpu.apps.train --resume --batch 512 --rounds 1000 --epochs 3000 --viz_every 25 --archive_every 50"
# Checkpoint durability (VERDICT r4 ask #2): snapshot the newest immutable
# checkpoint archive into git-tracked artifacts/ on a cadence, so a round
# never again strands its headline weights in the gitignored runs/ dir.
SNAP_EVERY=${SNAP_EVERY:-3600}
LAST_SNAP=$(date +%s)
while true; do
  sleep 60
  [ -f "$PIDFILE" ] || continue
  PID=$(cat "$PIDFILE")
  if ps -p "$PID" >/dev/null 2>&1; then
    NOW=$(date +%s)
    if [ $(( NOW - LAST_SNAP )) -ge "$SNAP_EVERY" ]; then
      bash scripts/snapshot_ckpt.sh >> watchdog.log 2>&1 || true
      LAST_SNAP=$NOW
    fi
  fi
  ps -p "$PID" >/dev/null 2>&1 || continue
  AGE=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
  if [ "$AGE" -gt "$THRESH" ]; then
    CMD=$(cat "$CMDFILE" 2>/dev/null)
    [ -n "$CMD" ] || CMD="$DEFAULT_CMD"
    echo "$(date -u) watchdog: log stale ${AGE}s, restarting trainer (pid $PID): $CMD" >> watchdog.log
    kill -9 "$PID"
    sleep 5
    nohup $CMD >> "$LOG" 2>&1 &
    echo $! > "$PIDFILE"
    sleep 600  # allow the resume compile before watching again
  fi
done
