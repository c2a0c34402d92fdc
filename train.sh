#!/usr/bin/env bash
# Headless launch of the best BUP20 configuration — flag-for-flag equivalent of
# the reference train.sh (best.yaml, centre frame 10, Mask2Former detections +
# confidence weighting, outlier rejection, max label depth 1.2 m, class labels,
# segment-consistency reg from epoch 101). GL/WISP env vars have no TPU
# counterpart; dataset-num-workers rides best.yaml.
set -euo pipefail

DATASET_PATH="${DATASET_PATH:-$HOME/datasets/BUP_20}"
CENTER_IDX="${CENTER_IDX:-10}"
LOG_DIR="${LOG_DIR:-_results/logs/runs/bup20}"

python main_interactive.py \
    --config configs/bup20/best.yaml \
    --dataset-path "$DATASET_PATH" \
    --dataset-num-workers 6 \
    --log-dir "$LOG_DIR" \
    --dataset-center-idx "$CENTER_IDX" \
    --exp-name "seq_${CENTER_IDX}" \
    --save-preds \
    --inst-outlier-rejection \
    --inst-num-dilations 1 \
    --inst-conf-enable \
    --sem-conf-enable \
    --max-depth 1.2 \
    --inst-segment-reg-weight 0.1 \
    --inst-segment-reg-epoch-start 101 \
    --load-modes imgs semantics instance preds_mask2former inst_conf sem_conf \
    --class-labels bg red yellow green mixed_red mixed_yellow \
    --valid-every 200 \
    "$@"
