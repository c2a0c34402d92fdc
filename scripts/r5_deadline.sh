#!/bin/bash
# Hard chip-release deadline for round 5: the driver runs bench.py on the real
# chip at end of round — nothing of ours may still hold it. At the given epoch
# time this touches every done marker (so watchdogs/queues exit instead of
# relaunching) and kills the live training PIDs by STRICT argv match
# (argv[1] == main.py + --exp-name value; never pattern-kill, CLAUDE.md).
# Usage: scripts/r5_deadline.sh <results_root> <epoch_seconds>
set -u
ROOT="$1"; WHEN="$2"

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
      echo "deadline: killing $1 pid ${p#/proc/}" >> "$ROOT/deadline.log"
      kill "${p#/proc/}" 2>/dev/null
      sleep 20
      kill -0 "${p#/proc/}" 2>/dev/null && kill -9 "${p#/proc/}" 2>/dev/null
    fi
  done
}

while [ "$(date +%s)" -lt "$WHEN" ]; do
  # all chip work already done? exit early
  [ -f "$ROOT/chip_queue.done" ] && exit 0
  sleep 60
done

echo "$(date '+%F %T') deadline reached, releasing the chip" >> "$ROOT/deadline.log"
touch "$ROOT/flagship_r5.done" "$ROOT/packed_ab_packed.done" \
      "$ROOT/packed_ab_compact.done" "$ROOT/chip_queue.done"
for exp in flagship_r5 packed_ab_packed packed_ab_compact; do kill_train "$exp"; done
