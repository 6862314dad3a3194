#!/bin/bash
# Auto-restart the batch-512 trainer if its log goes stale — the axon
# tunnel occasionally wedges a dispatch (futex wait, no log writes);
# recovery is kill -9 + --resume (interrupt-safe checkpoints every 2
# epochs bound the loss). Does nothing while the trainer is deliberately
# stopped (eval windows): a dead PID is left alone.
cd "$(dirname "$0")/.."
THRESH=${THRESH:-420}
while true; do
  sleep 60
  [ -f /tmp/train512.pid ] || continue
  PID=$(cat /tmp/train512.pid)
  ps -p "$PID" >/dev/null 2>&1 || continue
  AGE=$(( $(date +%s) - $(stat -c %Y train512.log) ))
  if [ "$AGE" -gt "$THRESH" ]; then
    echo "$(date -u) watchdog: log stale ${AGE}s, restarting trainer (pid $PID)" >> watchdog.log
    kill -9 "$PID"
    sleep 5
    nohup python -m deep_active_inference_mc_tpu.apps.train --resume --batch 512 --rounds 1000 --epochs 3000 --viz_every 25 --archive_every 50 >> train512.log 2>&1 &
    echo $! > /tmp/train512.pid
    sleep 300  # allow the resume compile before watching again
  fi
done
