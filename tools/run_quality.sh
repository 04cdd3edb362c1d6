#!/bin/bash
# Non-overfit quality run (VERDICT round-2 item 4): dense-view raytraced
# capture (240 views -> 210 train / 30 eval at interval 8), reference 15k
# recipe, full densify/cull/reset schedule. The eval split is dense enough
# that eval PSNR within ~1-2 dB of train PSNR demonstrates generalization
# rather than overfit (the round-2 run used 56 train views and showed a
# 9 dB train/eval gap — a view-sparsity diagnosis, not a quality result).
#
# Self-healing watchdog copied from run_15k.sh (tunneled runtime hangs).
#
# Usage: bash tools/run_quality.sh [DATA_DIR] [OUT_DIR] [METHOD] [ITERS]
set -u
DATA=${1:-/root/data/raytraced240}
OUT=${2:-/root/runs/r3_quality}
METHOD=${3:-gaussian-splatting}
ITERS=${4:-15000}
STALL_S=${STALL_S:-420}
EXP=$(basename "$DATA")
RUN_DIR="$OUT/$EXP/$METHOD"
cd "$(dirname "$0")/.."

EXTRA_FLAGS=${EXTRA_FLAGS:-}

# Hardware-parity preflight gate (VERDICT r4 item 6): refuse to produce
# quality numbers on kernels that have not passed a hardware parity run
# since their last edit. `bash tools/preflight.sh` (or a passing bench.py
# parity phase) refreshes the stamp.
if [ "${GSTK_SKIP_PREFLIGHT:-0}" != "1" ]; then
  if ! python tools/preflight.py check; then
    echo "run_quality: REFUSING to run on unstamped kernels (see above)." >&2
    exit 3
  fi
fi

launch() {
  local extra=()
  if ls "$RUN_DIR"/ckpts/step-*.ckpt.npz >/dev/null 2>&1; then
    extra=(--load-dir "$RUN_DIR/ckpts")
    echo "run_quality: resuming from $(ls -t "$RUN_DIR"/ckpts/step-*.ckpt.npz | head -1)"
  fi
  python -m gstk_tpu.scripts.train "$METHOD" \
    ${extra[@]+"${extra[@]}"} \
    --data "$DATA" --output-dir "$OUT" --experiment-name "$EXP" \
    --max-num-iterations "$ITERS" \
    --steps-per-save 2000 \
    --steps-per-eval-image 1000 \
    --steps-per-eval-all-images 7500 \
    --initial-capacity-headroom 1.6 \
    --max-capacity 1048576 \
    --isect-capacity 524288 \
    --dataparser.eval-mode interval --dataparser.eval-interval 8 \
    --data-parallel off $EXTRA_FLAGS &
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
      echo "run_quality: trainer exited rc=$rc (attempt $attempt)"
      if [ $rc -eq 0 ]; then exit 0; fi
      break
    fi
    m="$RUN_DIR/metrics.jsonl"
    ref=$LAUNCH_TS
    if [ -f "$m" ]; then
      mt=$(stat -c %Y "$m")
      [ "$mt" -gt "$ref" ] && ref=$mt
    fi
    age=$(( $(date +%s) - ref ))
    if [ "$age" -gt "$STALL_S" ]; then
      echo "run_quality: progress stale ${age}s — killing hung trainer $TRAIN_PID"
      kill -9 "$TRAIN_PID" 2>/dev/null
      wait "$TRAIN_PID" 2>/dev/null
      sleep 20
      break
    fi
  done
done
echo "run_quality: giving up after 6 attempts"
exit 1
