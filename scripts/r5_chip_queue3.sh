#!/bin/bash
# Round-5 single-chip work queue, v3 (supersedes r5_chip_queue2.sh after the
# 09:53-10:15+ axon outage ate the tuned-rerun stage's RELATIVE timeout
# before a single epoch ran): the tuned flagship stage now runs to an
# ABSOLUTE deadline passed as $2 (epoch seconds), so device-down wait time is
# not charged against training time. The profile stage is skipped when its
# artifact already exists (it ran 09:44-09:53). Each stage commits its own
# evidence so progress survives session restarts.
# Usage: scripts/r5_chip_queue3.sh <results_root> <tuned_deadline_epoch>
set -u
ROOT="$1"; TUNED_BY="$2"
cd "$(dirname "$0")/.."

if [ ! -s docs/profile_post_r5.json ]; then
  PROF_ITERS=4 timeout -k 30 3600 python scripts/profile_step.py \
    > "$ROOT/profile_post_r5.json" 2> "$ROOT/profile_post_r5.log"
  echo "profile rc=$?" >> "$ROOT/queue.log"
  if [ -s "$ROOT/profile_post_r5.json" ]; then
    cp "$ROOT/profile_post_r5.json" docs/profile_post_r5.json
    git add docs/profile_post_r5.json
    git commit -q -m "Refresh the post-regime step profile at r5 HEAD" >> "$ROOT/queue.log" 2>&1
  fi
fi

# finest-calibrated flagship rerun, bounded by the ABSOLUTE stage deadline
LEFT=$(( TUNED_BY - $(date +%s) ))
if [ "$LEFT" -gt 300 ]; then
  echo "$(date '+%F %T') launching tuned flagship rerun (${LEFT}s to stage deadline)" >> "$ROOT/queue.log"
  WATCHDOG_LOG="$ROOT/watchdog_flagship_r5_tuned.log" \
    timeout -k 30 "$LEFT" scripts/tpu_watchdog.sh "$ROOT" flagship_r5_tuned \
    "$ROOT/flagship_r5_tuned.done" \
    --config configs/synthetic/schedule_preds_flagship_tuned.yaml
  echo "tuned rerun watchdog rc=$?" >> "$ROOT/queue.log"
fi
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
