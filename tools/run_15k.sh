#!/bin/bash
# Full-schedule reference-recipe training run (VERDICT item 3):
# 15k iterations, sh-degree 3 (+1 per 1000 steps), full densify/cull/reset
# schedule (warmup 500, refine every 100, reset every 30 refines, stop
# split at 10k), 800x800, 64-view raytraced scene with a 160k-point seed
# cloud. Single chip; trainer grows isect capacity / bands adaptively.
#
# Usage: bash tools/run_15k.sh [DATA_DIR] [OUT_DIR]
set -u
DATA=${1:-/root/data/raytraced64}
OUT=${2:-/root/runs/r2_15k}
cd "$(dirname "$0")/.."
python -m gstk_tpu.scripts.train gaussian-splatting \
  --data "$DATA" --output-dir "$OUT" --experiment-name raytraced64 \
  --max-num-iterations 15000 \
  --steps-per-save 5000 \
  --steps-per-eval-image 1000 \
  --steps-per-eval-all-images 7500 \
  --initial-capacity-headroom 1.6 \
  --max-capacity 1048576 \
  --isect-capacity 524288 \
  --dataparser.eval-mode interval --dataparser.eval-interval 8 \
  --data-parallel off
