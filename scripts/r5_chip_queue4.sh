#!/bin/bash
# Round-5 single-chip work queue, v4 (supersedes v3 for the tuned-rerun
# restart): attempt 1 of the finest-calibrated flagship rerun diverged at the
# epoch-20 seed prune (see the note in
# configs/synthetic/schedule_preds_flagship_tuned.yaml); this queue runs the
# prune-after-annealing restart with an ABSOLUTE stage deadline and, unlike
# the `timeout`-wrapped v2/v3 stages, kills the WHOLE watchdog tree plus the
# training PID (strict argv match, never pattern-kill) when the deadline
# hits — a plain timeout on the watchdog shell orphans the inner
# timeout+main.py, which would contend with the A/B for the chip.
# Usage: scripts/r5_chip_queue4.sh <results_root> <tuned_deadline_epoch>
set -u
ROOT="$1"; TUNED_BY="$2"
cd "$(dirname "$0")/.."

kill_tree() {
  local pid="$1" kids
  kids=$(awk -v p="$pid" '$4 == p {print $1}' /proc/[0-9]*/stat 2>/dev/null)
  for k in $kids; do kill_tree "$k"; done
  kill "$pid" 2>/dev/null
}

kill_train() {  # kill_train <exp_name>
  for p in /proc/[0-9]*; do
    local c="$p/cmdline"
    [ -r "$c" ] || continue
    mapfile -t -d '' argv < "$c" 2>/dev/null || continue
    [ "${#argv[@]}" -ge 2 ] || continue
    case "${argv[0]}" in *python|*python3) ;; *) continue ;; esac
    [ "${argv[1]}" = "main.py" ] || continue
    local hit=0 prev=""
    for a in "${argv[@]}"; do
      [ "$prev" = "--exp-name" ] && [ "$a" = "$1" ] && hit=1
      prev="$a"
    done
    if [ "$hit" = 1 ]; then
      echo "$(date '+%F %T') stage deadline: killing $1 pid ${p#/proc/}" >> "$ROOT/queue.log"
      kill "${p#/proc/}" 2>/dev/null
      sleep 15
      kill -0 "${p#/proc/}" 2>/dev/null && kill -9 "${p#/proc/}" 2>/dev/null
    fi
  done
}

echo "$(date '+%F %T') queue4: tuned restart (deadline $TUNED_BY)" >> "$ROOT/queue.log"
WATCHDOG_LOG="$ROOT/watchdog_flagship_r5_tuned.log" \
  scripts/tpu_watchdog.sh "$ROOT" flagship_r5_tuned \
  "$ROOT/flagship_r5_tuned.done" \
  --config configs/synthetic/schedule_preds_flagship_tuned.yaml &
WD=$!
while kill -0 "$WD" 2>/dev/null; do
  if [ -f "$ROOT/flagship_r5_tuned.done" ]; then break; fi
  if [ "$(date +%s)" -ge "$TUNED_BY" ]; then
    echo "$(date '+%F %T') tuned stage deadline reached" >> "$ROOT/queue.log"
    touch "$ROOT/flagship_r5_tuned.done"   # stops watchdog relaunches
    kill_tree "$WD"
    kill_train flagship_r5_tuned
    break
  fi
  sleep 60
done
wait "$WD" 2>/dev/null
echo "$(date '+%F %T') tuned stage over" >> "$ROOT/queue.log"

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
