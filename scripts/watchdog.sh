#!/bin/bash
# Auto-restart the batch-512 trainer if its log goes stale — the axon
# tunnel occasionally wedges a dispatch (futex wait, no log writes);
# recovery is kill -9 + --resume (interrupt-safe checkpoints every 2
# epochs bound the loss). Does nothing while the trainer is deliberately
# stopped (eval windows): a dead PID is left alone.
#
# The restart command comes from /tmp/train512.cmd (written at launch) so
# flag changes between training phases survive a watchdog restart.
cd "$(dirname "$0")/.."
THRESH=${THRESH:-900}  # resume-compile + an epoch can exceed 420s when
                       # host CPU is contended (pytest); 900s is safely
                       # above both while still catching real tunnel wedges
DEFAULT_CMD="python -m deep_active_inference_mc_tpu.apps.train --resume --batch 512 --rounds 1000 --epochs 3000 --viz_every 25 --archive_every 50"
while true; do
  sleep 60
  [ -f /tmp/train512.pid ] || continue
  PID=$(cat /tmp/train512.pid)
  ps -p "$PID" >/dev/null 2>&1 || continue
  AGE=$(( $(date +%s) - $(stat -c %Y train512.log) ))
  if [ "$AGE" -gt "$THRESH" ]; then
    CMD=$(cat /tmp/train512.cmd 2>/dev/null)
    [ -n "$CMD" ] || CMD="$DEFAULT_CMD"
    echo "$(date -u) watchdog: log stale ${AGE}s, restarting trainer (pid $PID): $CMD" >> watchdog.log
    kill -9 "$PID"
    sleep 5
    nohup $CMD >> train512.log 2>&1 &
    echo $! > /tmp/train512.pid
    sleep 600  # allow the resume compile before watching again
  fi
done
