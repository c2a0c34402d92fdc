#!/bin/bash
# Final chip-queue stage (reordered after the bench — optional evidence,
# first to lose at the deadline): waits for the local bench capture,
# then probes the converged field's occupancy vs BLAS level on the flagship
# checkpoint and commits the result.
# Usage: scripts/r5_probe_queue.sh <results_root>
set -u
ROOT="$1"
cd "$(dirname "$0")/.."

while [ ! -f "$ROOT/bench_queue.done" ]; do sleep 120; done

RUN=$(ls -td "$ROOT"/flagship_r5/2026* 2>/dev/null | head -1)
[ -n "$RUN" ] || exit 0
timeout -k 30 2400 python scripts/probe_blas_level.py "$RUN" 7 8 \
  > "$ROOT/blas_probe.json" 2> "$ROOT/blas_probe.log"
echo "blas probe rc=$?" >> "$ROOT/queue.log"
if [ -s "$ROOT/blas_probe.json" ]; then
  cp "$ROOT/blas_probe.json" docs/blas_level_probe_r5.json
  git add docs/blas_level_probe_r5.json
  git commit -q -m "Probe: converged-field occupancy vs BLAS level (128^3 vs 256^3)" \
    >> "$ROOT/queue.log" 2>&1
fi
touch "$ROOT/probe_queue.done"
