#!/bin/bash
# Auto-resume watchdog for long TPU trainings on the flaky axon service.
#
# The axon tunnel stalls for minutes and sometimes kills the per-process
# connection while fresh processes still reach the chip (PERFORMANCE.md,
# CLAUDE.md rule 11). This loop probes the device with a hard-timeout
# (SIGKILL fallback -- a hung probe ignores SIGTERM) and (re)launches the
# training, resuming from the newest checkpoint each time, until a run
# exits cleanly (rc=0).
#
# Usage: scripts/tpu_watchdog.sh <log_dir> <exp_name> <done_marker> [extra args...]
set -u
LOG_DIR="$1"; EXP="$2"; DONE="$3"; shift 3
CKPT_ROOT="$LOG_DIR/$EXP"
LOG="${WATCHDOG_LOG:-/tmp/watchdog_$EXP.log}"
cd "$(dirname "$0")/.."

echo "$(date '+%F %T') watchdog start: $* (ckpt root $CKPT_ROOT)" >> "$LOG"
while true; do
  if [ -f "$DONE" ]; then echo "$(date '+%F %T') done marker present, exiting" >> "$LOG"; break; fi
  # probe with a REAL device computation: during partial axon outages
  # jax.devices() still answers while any compile/execute hangs forever
  # (observed 2026-08-19 ~23:15), so a devices()-only probe launches runs
  # that futex-wait indefinitely
  if timeout -k 10 120 python -c "import jax, jax.numpy as jnp; assert float((jnp.ones((8,8)) @ jnp.ones((8,8))).sum()) == 512.0" >/dev/null 2>&1; then
    # newest LOADABLE checkpoint: a run killed mid-save used to leave a
    # truncated newest file (save is atomic now, but stay robust to old runs)
    CKPT=""
    for c in $(ls -t "$CKPT_ROOT"/*/model.ckpt 2>/dev/null); do
      if python - "$c" >/dev/null 2>&1 <<'PYEOF'
import sys
import flax.serialization as s
s.msgpack_restore(open(sys.argv[1], "rb").read())
PYEOF
      then CKPT="$c"; break
      else echo "$(date '+%F %T') skipping unloadable checkpoint $c" >> "$LOG"; fi
    done
    echo "$(date '+%F %T') device up; launching (resume: ${CKPT:-none})" >> "$LOG"
    timeout -k 30 14400 python main.py --log-dir "$LOG_DIR" --exp-name "$EXP" "$@" \
      ${CKPT:+--pretrained "$CKPT"} >> "$LOG" 2>&1
    rc=$?
    echo "$(date '+%F %T') run exited rc=$rc" >> "$LOG"
    if [ "$rc" -eq 0 ]; then echo ok > "$DONE"; break; fi
    sleep 30
  else
    echo "$(date '+%F %T') device down" >> "$LOG"
    sleep 90
  fi
done
