#!/bin/bash
# Stall monitor for watchdog-managed trainings (companion to tpu_watchdog.sh).
#
# Failure mode this catches (observed 2026-08-20 ~00:17): an axon PARTIAL
# outage leaves the training process alive but futex-waiting forever — the
# watchdog's `timeout -k 30 14400` only reclaims the chip after 4 h. This
# monitor watches the run's newest log file; if nothing has been written for
# STALL_S seconds it kills the exact training PID (found by strict argv
# match, never by pattern-kill), so the watchdog's loop resumes from the
# newest checkpoint as soon as the device answers again.
#
# Usage: scripts/stall_monitor.sh <ckpt_root> <exp_name> [stall_seconds]
#   e.g. scripts/stall_monitor.sh /tmp/flagship_runs flagship_v2 900
# Exits when the watchdog's done marker convention (/tmp/<exp>.done) or a
# DONE file passed via $STALL_DONE appears.
set -u
ROOT="$1"; EXP="$2"; STALL_S="${3:-900}"
DONE="${STALL_DONE:-/tmp/$EXP.done}"
LOG="/tmp/stall_monitor_$EXP.log"

echo "$(date '+%F %T') stall monitor start: $ROOT/$EXP stall_s=$STALL_S" >> "$LOG"

# PID of the live training for this experiment: argv[0] endswith python,
# argv[1] == main.py, argv contains --exp-name <EXP>. Strict positional
# match (not substring-of-commandline) so this can never match the monitor
# itself, a shell, or an editor session.
find_train_pid() {
  for p in /proc/[0-9]*; do
    local c="$p/cmdline"
    [ -r "$c" ] || continue
    # cmdline is NUL-separated; make it newline-separated for positional reads
    mapfile -t -d '' argv < "$c" 2>/dev/null || continue
    [ "${#argv[@]}" -ge 2 ] || continue
    case "${argv[0]}" in *python|*python3) ;; *) continue ;; esac
    [ "${argv[1]}" = "main.py" ] || continue
    local hit=0 prev=""
    for a in "${argv[@]}"; do
      if [ "$prev" = "--exp-name" ] && [ "$a" = "$EXP" ]; then hit=1; fi
      prev="$a"
    done
    if [ "$hit" = 1 ]; then echo "${p#/proc/}"; return 0; fi
  done
  return 1
}

while true; do
  [ -f "$DONE" ] && { echo "$(date '+%F %T') done marker, exiting" >> "$LOG"; break; }
  sleep 60
  PID="$(find_train_pid)" || continue
  # newest log written by any attempt of this experiment
  NEWEST="$(ls -t "$ROOT/$EXP"/*/log.txt 2>/dev/null | head -1)"
  [ -n "$NEWEST" ] || continue
  AGE=$(( $(date +%s) - $(stat -c %Y "$NEWEST") ))
  if [ "$AGE" -ge "$STALL_S" ]; then
    echo "$(date '+%F %T') log $NEWEST stale ${AGE}s >= ${STALL_S}s; killing training pid $PID" >> "$LOG"
    kill "$PID" 2>/dev/null
    sleep 45
    kill -0 "$PID" 2>/dev/null && { echo "$(date '+%F %T') pid $PID survived SIGTERM; SIGKILL" >> "$LOG"; kill -9 "$PID" 2>/dev/null; }
    sleep 120   # let the watchdog cycle before re-arming
  fi
done
