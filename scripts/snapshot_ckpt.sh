#!/bin/bash
# Snapshot the latest training checkpoint + stats/plots into the git-tracked
# artifacts/ dir and commit. The workspace resets to git state between build
# rounds, so anything not committed (runs/ is gitignored) is lost.
set -e
cd "$(dirname "$0")/.."
RUN=${1:-runs/figs_final_model_0.01_30_1.0_512_10_5}
DST=artifacts/run512
mkdir -p "$DST"
# While the trainer is live, checkpoints/ is rmtree'd+rewritten by the async
# saver every save_every epochs — copying it races. Prefer the newest
# immutable checkpoints_epoch_N archive; fall back to the live dir only when
# no trainer is running (round-end snapshot after SIGINT).
SRC="$RUN/checkpoints"
if [ -f /tmp/train512.pid ] && kill -0 "$(cat /tmp/train512.pid)" 2>/dev/null; then
  NEWEST=$(ls -d "$RUN"/checkpoints_epoch_* 2>/dev/null \
    | awk -F'_epoch_' '{print $NF, $0}' | sort -n | tail -1 | cut -d' ' -f2)
  [ -n "$NEWEST" ] && SRC="$NEWEST"
fi
rm -rf "$DST/checkpoints"
cp -r "$SRC" "$DST/checkpoints"
cp "$RUN"/1_result_*.png "$DST/" 2>/dev/null || true
cp "$RUN"/config.json "$DST/" 2>/dev/null || true
# latest viz artifacts only (keep the snapshot bounded)
ls "$RUN"/traversals_at_epoch_*.png 2>/dev/null | tail -1 | xargs -r -I{} cp {} "$DST/"
ls "$RUN"/imagination_*.png 2>/dev/null | tail -1 | xargs -r -I{} cp {} "$DST/"
ls "$RUN"/reward_imagination_*.png 2>/dev/null | tail -1 | xargs -r -I{} cp {} "$DST/"
EPOCH=$(grep -c . train512.log 2>/dev/null || echo "?")
git add -A "$DST"
# Pathspec commit: never sweep unrelated staged files into the snapshot
# (the watchdog now runs this on a cadence, concurrent with other work).
git commit -q -m "training snapshot: $(grep -P '^\d+, F:' train512.log | tail -1 | cut -c1-120)" -- "$DST" || echo "nothing to commit"
