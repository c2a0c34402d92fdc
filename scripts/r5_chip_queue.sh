#!/bin/bash
# Round-5 single-chip work queue: the flagship convergence run owns the chip;
# everything else lines up behind its done marker. Each stage commits its own
# evidence so progress survives builder-session restarts.
#   1. flagship evidence collection (VERDICT r4 ask #1/#2) -> commit
#   2. post-regime profile refresh (ask #3 evidence) -> commit
#   3. packed-vs-compact quality A/B (ask #4) -> commit
# Usage: scripts/r5_chip_queue.sh <results_root>
set -u
ROOT="$1"
cd "$(dirname "$0")/.."

while [ ! -f "$ROOT/flagship_r5.done" ]; do sleep 120; done
echo "$(date '+%F %T') flagship done; collecting evidence" >> "$ROOT/queue.log"

python scripts/collect_flagship_evidence.py "$ROOT/flagship_r5" \
  >> "$ROOT/queue.log" 2>&1
if [ -s docs/convergence_flagship/metrics.csv ]; then
  git add docs/convergence_flagship
  git commit -q -m "Commit the flagship-capacity 120-view convergence evidence (single-provenance r5 run)" \
    >> "$ROOT/queue.log" 2>&1
fi

PROF_ITERS=4 timeout -k 30 3600 python scripts/profile_step.py \
  > "$ROOT/profile_post_r5.json" 2> "$ROOT/profile_post_r5.log"
echo "profile rc=$?" >> "$ROOT/queue.log"
if [ -s "$ROOT/profile_post_r5.json" ]; then
  cp "$ROOT/profile_post_r5.json" docs/profile_post_r5.json
  git add docs/profile_post_r5.json
  git commit -q -m "Refresh the post-regime step profile at r5 HEAD" >> "$ROOT/queue.log" 2>&1
fi

scripts/run_packed_ab.sh "$ROOT" >> "$ROOT/queue.log" 2>&1
echo "ab rc=$?" >> "$ROOT/queue.log"
if [ -s docs/PACKED_AB_r05.json ]; then
  git add docs/PACKED_AB_r05.json
  git commit -q -m "Packed-vs-compact schedule A/B: committed final quality deltas" \
    >> "$ROOT/queue.log" 2>&1
fi
touch "$ROOT/chip_queue.done"
