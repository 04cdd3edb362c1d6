#!/bin/bash
# Full-schedule reference-recipe training run (VERDICT item 3):
# 15k iterations, sh-degree 3 (+1 per 1000 steps), full densify/cull/reset
# schedule (warmup 500, refine every 100, reset every 30 refines, stop
# split at 10k), 800x800, 64-view raytraced scene with a 160k-point seed
# cloud. Single chip; trainer grows isect capacity / bands adaptively.
#
# Self-healing: the tunneled TPU runtime occasionally hangs a device call
# indefinitely (observed once at step ~6k). A watchdog monitors
# metrics.jsonl; if it goes stale for STALL_S the trainer is killed (exact
# PID) and relaunched with --load-dir to resume from the latest checkpoint
# (deterministic resume is tested; checkpoints every 2000 steps).
#
# Usage: bash tools/run_15k.sh [DATA_DIR] [OUT_DIR]
set -u
DATA=${1:-/root/data/raytraced64}
OUT=${2:-/root/runs/r2_15k}
STALL_S=${STALL_S:-420}
RUN_DIR="$OUT/raytraced64/gaussian-splatting"
cd "$(dirname "$0")/.."

launch() {
  local extra=()
  if ls "$RUN_DIR"/ckpts/step-*.ckpt.npz >/dev/null 2>&1; then
    extra=(--load-dir "$RUN_DIR/ckpts")
    echo "run_15k: resuming from $(ls -t "$RUN_DIR"/ckpts/step-*.ckpt.npz | head -1)"
  fi
  python -m gstk_tpu.scripts.train gaussian-splatting \
    ${extra[@]+"${extra[@]}"} \
    --data "$DATA" --output-dir "$OUT" --experiment-name raytraced64 \
    --max-num-iterations 15000 \
    --steps-per-save 2000 \
    --steps-per-eval-image 1000 \
    --steps-per-eval-all-images 7500 \
    --initial-capacity-headroom 1.6 \
    --max-capacity 1048576 \
    --isect-capacity 524288 \
    --dataparser.eval-mode interval --dataparser.eval-interval 8 \
    --data-parallel off &
  TRAIN_PID=$!
}

for attempt in 1 2 3 4 5 6; do
  launch
  LAUNCH_TS=$(date +%s)
  while true; do
    sleep 60
    if ! kill -0 "$TRAIN_PID" 2>/dev/null; then
      wait "$TRAIN_PID"
      rc=$?
      echo "run_15k: trainer exited rc=$rc (attempt $attempt)"
      if [ $rc -eq 0 ]; then exit 0; fi
      break  # crashed: relaunch from checkpoint
    fi
    m="$RUN_DIR/metrics.jsonl"
    # staleness relative to the most recent of (metrics write, THIS
    # launch): a resume starts with an old metrics file and must get its
    # startup/compile window before the stall clock runs
    ref=$LAUNCH_TS
    if [ -f "$m" ]; then
      mt=$(stat -c %Y "$m")
      [ "$mt" -gt "$ref" ] && ref=$mt
    fi
    age=$(( $(date +%s) - ref ))
    if [ "$age" -gt "$STALL_S" ]; then
      echo "run_15k: progress stale ${age}s — killing hung trainer $TRAIN_PID"
      kill -9 "$TRAIN_PID" 2>/dev/null
      wait "$TRAIN_PID" 2>/dev/null
      sleep 20  # let the device tunnel settle before reacquiring
      break
    fi
  done
done
echo "run_15k: giving up after 6 attempts"
exit 1
