#!/bin/bash
# Round-5 single-chip work queue: the flagship convergence run owns the chip;
# everything else lines up behind its done marker.
#   1. post-regime profile refresh (VERDICT r4 ask #3 evidence)
#   2. packed-vs-compact quality A/B (ask #4)
# Usage: scripts/r5_chip_queue.sh <results_root>
set -u
ROOT="$1"
cd "$(dirname "$0")/.."

while [ ! -f "$ROOT/flagship_r5.done" ]; do sleep 120; done

PROF_ITERS=4 timeout -k 30 3600 python scripts/profile_step.py \
  > "$ROOT/profile_post_r5.json" 2> "$ROOT/profile_post_r5.log"
echo "profile rc=$?" >> "$ROOT/queue.log"

scripts/run_packed_ab.sh "$ROOT" >> "$ROOT/queue.log" 2>&1
echo "ab rc=$?" >> "$ROOT/queue.log"
touch "$ROOT/chip_queue.done"
