#!/bin/bash
# Round-5 single-chip work queue, v2 (supersedes r5_chip_queue.sh): adds the
# finest-scale-calibrated flagship rerun between the profile and the A/B —
# the 0.004-finest flagship runs (60v control + r5 120v) both converged with
# negative gains because their ~10 finest lattice levels sit below the
# scene's sampling density; the tuned config changes ONLY finest_scale
# (configs/synthetic/schedule_preds_flagship_tuned.yaml).
# Each stage commits its own evidence so progress survives session restarts.
# Usage: scripts/r5_chip_queue2.sh <results_root>
set -u
ROOT="$1"
cd "$(dirname "$0")/.."

while [ ! -f "$ROOT/flagship_r5.done" ]; do sleep 120; done
echo "$(date '+%F %T') flagship done; collecting evidence" >> "$ROOT/queue.log"

python scripts/collect_flagship_evidence.py "$ROOT/flagship_r5" \
  docs/convergence_flagship >> "$ROOT/queue.log" 2>&1
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

# finest-calibrated flagship rerun (bounded: must release the chip for the A/B)
echo "$(date '+%F %T') launching tuned flagship rerun" >> "$ROOT/queue.log"
WATCHDOG_LOG="$ROOT/watchdog_flagship_r5_tuned.log" \
  timeout -k 30 9000 scripts/tpu_watchdog.sh "$ROOT" flagship_r5_tuned \
  "$ROOT/flagship_r5_tuned.done" \
  --config configs/synthetic/schedule_preds_flagship_tuned.yaml
echo "tuned rerun watchdog rc=$?" >> "$ROOT/queue.log"
python scripts/collect_flagship_evidence.py "$ROOT/flagship_r5_tuned" \
  docs/convergence_flagship_tuned >> "$ROOT/queue.log" 2>&1
if [ -s docs/convergence_flagship_tuned/metrics.csv ]; then
  git add docs/convergence_flagship_tuned
  git commit -q -m "Collect the finest-calibrated flagship rerun evidence" \
    >> "$ROOT/queue.log" 2>&1
fi

scripts/run_packed_ab.sh "$ROOT" >> "$ROOT/queue.log" 2>&1
echo "ab rc=$?" >> "$ROOT/queue.log"
if [ -s docs/PACKED_AB_r05.json ]; then
  git add docs/PACKED_AB_r05.json
  git commit -q -m "Packed-vs-compact schedule A/B: committed final quality deltas" \
    >> "$ROOT/queue.log" 2>&1
fi
touch "$ROOT/chip_queue.done"
