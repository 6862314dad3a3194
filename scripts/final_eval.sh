#!/bin/bash
# End-of-round evaluation: behavioral sweeps with the trained checkpoint,
# benchmark numbers. Run with the TPU free.
#
# Each sweep runs in a fresh process; the axon tunnel occasionally wedges a
# new process at connect time (futex wait, no output) — especially right
# after a worker crash/restart. Each command therefore gets 2 attempts with
# a bounded timeout; an attempt that produced no output line is retried.
CKPT=${1:-runs/figs_final_model_0.01_30_1.0_512_10_5/checkpoints}
ENVS=${ENVS:-1024}
MACRO=${MACRO:-200}

run_with_retry() {
  local desc="$1"; shift
  for attempt in 1 2; do
    OUT=$(timeout 540 "$@" 2>&1 | grep -v WARNING | tail -1)
    if [ -n "$OUT" ]; then
      echo "$OUT"
      return 0
    fi
    echo "# $desc: attempt $attempt produced no output (tunnel wedge?) — retrying" >&2
  done
  echo "# $desc: FAILED after 2 attempts" >&2
  return 1
}

for METHOD in random expert habit ai mcts; do
  EXTRA=""
  N=$ENVS
  if [ "$METHOD" = "ai" ]; then EXTRA="--steps 2"; fi
  if [ "$METHOD" = "mcts" ]; then EXTRA="--mcts_repeats 30"; N=256; fi
  run_with_retry "sweep:$METHOD" \
    python -m deep_active_inference_mc_tpu.apps.sweep \
    -n "$CKPT" --method $METHOD --envs $N --macro $MACRO --jumps 5 $EXTRA
done

run_with_retry "bench" python bench.py
