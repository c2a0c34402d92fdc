#!/bin/bash
# Round-5 tuned-stage supervisor, v5 (replaces the r5_chip_queue4.sh SHELL
# only — the probing watchdog it spawned stays alive across the swap, so no
# training restart or compile is wasted). Difference vs v4: the stage
# deadline is computed from when training ACTUALLY STARTS (first main.py
# sighting), so axon outage time is not charged against the 240-epoch
# schedule; an absolute hard cap still releases the chip for the A/B.
# Usage: scripts/r5_stage_supervisor.sh <results_root> <watchdog_pid> \
#          <run_seconds> <hard_cap_epoch>
set -u
ROOT="$1"; WD="$2"; RUN_S="$3"; HARD_CAP="$4"
cd "$(dirname "$0")/.."

kill_tree() {
  local pid="$1" kids
  kids=$(awk -v p="$pid" '$4 == p {print $1}' /proc/[0-9]*/stat 2>/dev/null)
  for k in $kids; do kill_tree "$k"; done
  kill "$pid" 2>/dev/null
}

find_train_pid() {
  for p in /proc/[0-9]*; do
    local c="$p/cmdline"
    [ -r "$c" ] || continue
    mapfile -t -d '' argv < "$c" 2>/dev/null || continue
    [ "${#argv[@]}" -ge 2 ] || continue
    case "${argv[0]}" in *python|*python3) ;; *) continue ;; esac
    [ "${argv[1]}" = "main.py" ] || continue
    local hit=0 prev=""
    for a in "${argv[@]}"; do
      [ "$prev" = "--exp-name" ] && [ "$a" = "flagship_r5_tuned" ] && hit=1
      prev="$a"
    done
    if [ "$hit" = 1 ]; then echo "${p#/proc/}"; return 0; fi
  done
  return 1
}

echo "$(date '+%F %T') supervisor: watching wd=$WD run_s=$RUN_S cap=$HARD_CAP" >> "$ROOT/queue.log"
T0=""
while true; do
  [ -f "$ROOT/flagship_r5_tuned.done" ] && break
  NOW=$(date +%s)
  if [ -z "$T0" ]; then
    if TP=$(find_train_pid); then
      T0=$NOW
      END=$(( T0 + RUN_S )); [ "$END" -gt "$HARD_CAP" ] && END=$HARD_CAP
      echo "$(date '+%F %T') supervisor: training started (pid $TP), stage ends $(date -d @$END '+%H:%M')" >> "$ROOT/queue.log"
    elif [ "$NOW" -ge "$HARD_CAP" ]; then
      echo "$(date '+%F %T') supervisor: hard cap with no training start" >> "$ROOT/queue.log"
      touch "$ROOT/flagship_r5_tuned.done"
      kill_tree "$WD"
      break
    fi
  elif [ "$NOW" -ge "$END" ]; then
    echo "$(date '+%F %T') supervisor: stage deadline" >> "$ROOT/queue.log"
    touch "$ROOT/flagship_r5_tuned.done"
    kill_tree "$WD"
    TP=$(find_train_pid) && { kill "$TP" 2>/dev/null; sleep 15; kill -9 "$TP" 2>/dev/null; }
    break
  fi
  sleep 45
done
# wait for the (orphaned) watchdog to disappear before the A/B takes the chip
for _ in $(seq 1 40); do kill -0 "$WD" 2>/dev/null || break; sleep 5; done
echo "$(date '+%F %T') tuned stage over (supervisor)" >> "$ROOT/queue.log"

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
