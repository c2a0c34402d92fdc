#!/bin/bash
# Companion to r5_deadline.sh: at the deadline, kill the round-5 chip-queue
# process TREES (queue shells + whatever python they spawned) so no queued
# stage can grab the chip after the release point. PIDs are given explicitly —
# no pattern matching. Skips if the whole chain already finished.
# Usage: scripts/r5_deadline_queues.sh <results_root> <epoch_seconds> <pid...>
set -u
ROOT="$1"; WHEN="$2"; shift 2

kill_tree() {  # depth-first: children before the parent
  local pid="$1"
  local kids
  kids=$(awk -v p="$pid" '$4 == p {print $1}' /proc/[0-9]*/stat 2>/dev/null)
  for k in $kids; do kill_tree "$k"; done
  kill "$pid" 2>/dev/null
}

while [ "$(date +%s)" -lt "$WHEN" ]; do
  [ -f "$ROOT/probe_queue.done" ] && exit 0
  sleep 60
done

echo "$(date '+%F %T') queue deadline: killing queue trees $*" >> "$ROOT/deadline.log"
for pid in "$@"; do kill_tree "$pid"; done
