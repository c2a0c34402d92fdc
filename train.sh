#!/usr/bin/env bash
# Headless launch of the best BUP20 configuration (equivalent of the reference
# train.sh: best.yaml, centre frame, Mask2Former detections, outlier rejection,
# max label depth 1.2 m).
set -euo pipefail

DATASET_PATH="${DATASET_PATH:-$HOME/datasets/BUP_20}"
CENTER_IDX="${CENTER_IDX:-10}"

python main_interactive.py \
    --config configs/bup20/best.yaml \
    --dataset-path "$DATASET_PATH" \
    --dataset-center-idx "$CENTER_IDX" \
    --load-modes imgs semantics instance preds_mask2former \
    --inst-outlier-rejection \
    --max-depth 1.2 \
    --save-preds \
    "$@"
