#!/bin/bash
# Round-5 session finalizer for the compressed tuned flagship rerun.
# Waits for the run's done marker or the absolute deadline, stops the
# watchdog tree + training (strict argv match on --exp-name, never
# pattern-kill), then collects + commits whatever evidence exists.
# Usage: scripts/r5_finalize_tuned_c.sh <results_root> <exp_name> \
#          <watchdog_pid> <deadline_epoch>
set -u
ROOT="$1"; EXP="$2"; WD="$3"; DEADLINE="$4"
cd "$(dirname "$0")/.."
LOG="$ROOT/finalize_$EXP.log"

kill_tree() {
  local pid="$1" kids
  kids=$(awk -v p="$pid" '$4 == p {print $1}' /proc/[0-9]*/stat 2>/dev/null)
  for k in $kids; do kill_tree "$k"; done
  kill "$pid" 2>/dev/null
}

kill_train() {
  for p in /proc/[0-9]*; do
    local c="$p/cmdline"
    [ -r "$c" ] || continue
    mapfile -t -d '' argv < "$c" 2>/dev/null || continue
    [ "${#argv[@]}" -ge 2 ] || continue
    case "${argv[0]}" in *python|*python3) ;; *) continue ;; esac
    [ "${argv[1]}" = "main.py" ] || continue
    local hit=0 prev=""
    for a in "${argv[@]}"; do
      [ "$prev" = "--exp-name" ] && [ "$a" = "$EXP" ] && hit=1
      prev="$a"
    done
    if [ "$hit" = 1 ]; then
      echo "$(date '+%F %T') killing training pid ${p#/proc/}" >> "$LOG"
      kill "${p#/proc/}" 2>/dev/null; sleep 15
      kill -0 "${p#/proc/}" 2>/dev/null && kill -9 "${p#/proc/}" 2>/dev/null
    fi
  done
}

echo "$(date '+%F %T') finalizer: exp=$EXP deadline=$(date -d @$DEADLINE '+%H:%M')" >> "$LOG"
while true; do
  [ -f "$ROOT/$EXP.done" ] && { echo "$(date '+%F %T') done marker" >> "$LOG"; break; }
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "$(date '+%F %T') deadline" >> "$LOG"
    touch "$ROOT/$EXP.done"      # stops watchdog relaunches
    kill_tree "$WD"
    kill_train
    break
  fi
  sleep 30
done
for _ in $(seq 1 40); do kill -0 "$WD" 2>/dev/null || break; sleep 5; done

# Collect whatever the run produced (the collector derives milestones from
# the run's own config snapshot; it exits non-zero when no segment has a
# validated epoch yet — then nothing is committed).
python scripts/collect_flagship_evidence.py "$ROOT/$EXP" \
  docs/convergence_flagship_tuned >> "$LOG" 2>&1
if [ -s docs/convergence_flagship_tuned/metrics.csv ]; then
  git add docs/convergence_flagship_tuned
  git commit -q -m "Collect the finest-calibrated flagship rerun evidence (compressed schedule)" >> "$LOG" 2>&1
  echo "$(date '+%F %T') evidence committed" >> "$LOG"
else
  echo "$(date '+%F %T') no metrics.csv — nothing committed" >> "$LOG"
fi
touch "$ROOT/finalize_$EXP.done"
