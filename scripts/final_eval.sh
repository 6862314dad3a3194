#!/bin/bash
# End-of-round evaluation: behavioral sweeps with the trained checkpoint,
# benchmark numbers, and the demo smoke. Run with the TPU free.
set -x
CKPT=${1:-runs/figs_final_model_0.01_30_1.0_512_10_5/checkpoints}

for METHOD in random expert habit ai mcts; do
  EXTRA=""
  if [ "$METHOD" = "ai" ]; then EXTRA="--steps 2"; fi
  if [ "$METHOD" = "mcts" ]; then EXTRA="--mcts_repeats 30 --envs 256"; fi
  timeout 580 python -m deep_active_inference_mc_tpu.apps.sweep \
    -n "$CKPT" --method $METHOD --envs 512 --macro 200 --jumps 5 $EXTRA \
    2>&1 | grep -v WARNING | tail -1
done

timeout 580 python bench.py 2>&1 | grep -v WARNING | tail -2
