#!/bin/bash
# End-of-round evaluation: behavioral sweeps with the trained checkpoint,
# benchmark numbers. Run with the TPU free.
#
# Round-3 power upgrade: enough envs that habit/ai-vs-random separation at
# effect sizes ~0.05-0.15 resolves at >=3 sigma (sem ~ 1/sqrt(envs)), and
# the MCTS sweep runs at the REFERENCE budget (repeats=300, mcts.py:141)
# with the fused+bf16 evaluator. All sweeps share --seed 0 so initial env
# states are paired across methods.
#
# Each sweep runs in a fresh process; the axon tunnel occasionally wedges a
# new process at connect time (futex wait, no output) — especially right
# after a worker crash/restart. Each command therefore gets 2 attempts with
# a bounded timeout; an attempt that produced no output line is retried.
CKPT=${1:-runs/figs_final_model_0.01_30_1.0_512_10_5/checkpoints}
ENVS=${ENVS:-4096}
MACRO=${MACRO:-200}
MCTS_ENVS=${MCTS_ENVS:-256}
MCTS_REPEATS=${MCTS_REPEATS:-300}

run_with_retry() {
  # Connect-wedge detection is delegated to tpu_run.sh (kills a child
  # that accumulates no CPU during warmup instead of waiting out the
  # full timeout); on top of that, an attempt that timed out without a
  # result line gets one full retry.
  local desc="$1"; local tmo="$2"; shift 2
  local tmplog
  tmplog=$(mktemp /tmp/final_eval.XXXXXX.log)
  for attempt in 1 2; do
    bash "$(dirname "$0")/tpu_run.sh" "$tmplog" "$tmo" "$@"
    OUT=$(grep -v -e WARNING -e '^#' -e '^Loaded' -e '^Untrained' "$tmplog" | tail -1)
    if [ -n "$OUT" ]; then
      echo "$OUT"
      rm -f "$tmplog"
      return 0
    fi
    echo "# $desc: attempt $attempt produced no result line — retrying" >&2
  done
  rm -f "$tmplog"
  echo "# $desc: FAILED after 2 attempts" >&2
  return 1
}

AI_ENVS=${AI_ENVS:-4096}          # 4 actions x 4096 envs through the
                                  # decoder over-commits one v5e's HBM —
                                  # --env_chunk 1024 runs 4 exact
                                  # sequential groups instead
AI_CHUNK=${AI_CHUNK:-1024}
MCTSB_ENVS=${MCTSB_ENVS:-512}     # bucketed planner affords 2x the envs
                                  # at ~16min (1024 would be ~32min)

# METHODS override lets a time-bounded session run priority rows first
# (results are order-independent: every row is a fresh process at --seed 0).
METHODS=${METHODS:-random expert habit ai ai_crn t1 t12 ai_ref mcts mcts_c2 mcts_queue mcts_c2_queue mcts_bucketed mcts_bucketed_queue}

for METHOD in $METHODS; do
  EXTRA=""
  N=$ENVS
  M=$METHOD
  TMO=${BASE_TMO:-1500}
  case $METHOD in
    ai)     EXTRA="--steps 2 --env_chunk $AI_CHUNK"; N=$AI_ENVS; TMO=2400 ;;
    ai_crn) M=ai; EXTRA="--steps 2 --crn --env_chunk $AI_CHUNK"; N=$AI_ENVS; TMO=2400 ;;
    # Term-ablated controllers (reference demo methods '5'/'6',
    # test_demo.py:70-77) at the same settings as the ai row so the
    # controller comparison is complete (VERDICT r3 weak #5).
    t1)     EXTRA="--steps 2 --env_chunk $AI_CHUNK"; N=$AI_ENVS; TMO=2400 ;;
    t12)    EXTRA="--steps 2 --env_chunk $AI_CHUNK"; N=$AI_ENVS; TMO=2400 ;;
    # The reference demo's DEFAULT eval mode for ai agents: sampled
    # estimator, samples=10, steps=10 (test_demo.py:70-77). ~100x the
    # per-decision FLOPs of the 1-step mean row, so a narrower fleet.
    ai_ref) M=ai; EXTRA="--steps 10 --samples 10 --sample_G"
            N=${AIREF_ENVS:-128}; TMO=3600 ;;
    mcts)   EXTRA="--mcts_repeats $MCTS_REPEATS --mcts_fused --bf16 --chunk 8"
            N=$MCTS_ENVS; TMO=2400 ;;
    # Tuned exploration constant at the same budget (round-4 probe:
    # C=2 +1.511 vs C=1 +1.294 at 128 envs; prior-weighted selection
    # adds nothing over plain C=2). Reference default stays C=1.
    mcts_c2)
            M=mcts
            EXTRA="--mcts_repeats $MCTS_REPEATS --mcts_fused --bf16 --chunk 8 --mcts_c 2.0"
            N=$MCTS_ENVS; TMO=2400 ;;
    mcts_bucketed)
            # Batch-compaction planner (plan/mcts.py:make_bucketed_planner):
            # same estimators, decided envs retire mid-search — 4x the env
            # count at similar wall time. Host-level macro loop subsumes
            # --chunk.
            M=mcts
            EXTRA="--mcts_repeats $MCTS_REPEATS --mcts_fused --bf16 --mcts_bucketed"
            N=$MCTSB_ENVS; TMO=3600 ;;
    # Reference full-plan protocol rows (round 5): the demo enqueues the
    # WHOLE trimmed MCTS path x jumps and flushes it on scoring
    # (test_demo.py:161-204) — the protocol the reference recording used.
    # The plain mcts rows above re-plan every macro (round<=4 protocol,
    # kept for cross-round comparability).
    mcts_queue)
            M=mcts
            EXTRA="--mcts_repeats $MCTS_REPEATS --mcts_fused --bf16 --chunk 8 --plan_queue"
            N=$MCTS_ENVS; TMO=2400 ;;
    mcts_c2_queue)
            M=mcts
            EXTRA="--mcts_repeats $MCTS_REPEATS --mcts_fused --bf16 --chunk 8 --plan_queue --mcts_c 2.0"
            N=$MCTS_ENVS; TMO=2400 ;;
    mcts_bucketed_queue)
            M=mcts
            EXTRA="--mcts_repeats $MCTS_REPEATS --mcts_fused --bf16 --mcts_bucketed --plan_queue"
            N=$MCTSB_ENVS; TMO=3600 ;;
  esac
  echo "# sweep method=$METHOD"
  run_with_retry "sweep:$METHOD" $TMO \
    python -m deep_active_inference_mc_tpu.apps.sweep \
    -n "$CKPT" --method $M --envs $N --macro $MACRO --jumps 5 --seed 0 $EXTRA
done

if [ "${RUN_BENCH:-1}" = 1 ]; then
  run_with_retry "bench" 1200 python bench.py
fi
