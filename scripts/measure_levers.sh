#!/bin/bash
# Measure the round-3 landed-but-unmeasured levers on the real TPU:
#   A. baseline bench capture (includes the fused dual-grid forward gather and
#      the scan-local lattice, which are default-on) -> $OUT/bench_base.json
#   B. single-dispatch fused train step (PAGNERF_FUSED_STEP=1) A/B
#      -> $OUT/bench_fused.json
#   C. sample-cap re-probe: the scan-local lattice shrank the [L, V, 3, N]
#      intermediate ~24x; if a larger per-microbatch sample cap now compiles,
#      pre/seeded segments need fewer microbatches -> $OUT/bench_cap<N>.json
#
# Waits for an optional "predecessor done" marker (a long training run owning
# the chip) and for the device to answer a hard-timeout probe. Each bench arm
# is budgeted; results land in $OUT for PERFORMANCE.md.
#
# Usage: scripts/measure_levers.sh [wait_marker]
set -u
WAIT_MARKER="${1:-}"
OUT="${MEASURE_OUT:-/tmp/levers_r3}"
LOG="$OUT/measure.log"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

say() { echo "$(date '+%F %T') $*" >> "$LOG"; }

# -- wait for the predecessor run (if any) and for a live device -------------
say "measure_levers start (marker: ${WAIT_MARKER:-none})"
while true; do
  if [ -n "$WAIT_MARKER" ] && [ ! -f "$WAIT_MARKER" ]; then
    sleep 120; continue
  fi
  if timeout -k 10 45 python -c "import jax; assert jax.devices()" >/dev/null 2>&1; then
    break
  fi
  say "device down"; sleep 90
done
say "device up; starting arms"

run_arm() { # name, budget_s, env pairs...
  local name="$1" budget="$2"; shift 2
  if [ -s "$OUT/bench_$name.json" ]; then say "arm $name already done"; return; fi
  say "arm $name: $* (budget ${budget}s)"
  env "$@" BENCH_BUDGET_S="$budget" BENCH_PRE_ITERS=3 BENCH_ITERS=5 \
      BENCH_CONV_OCC=0 timeout -k 30 $((budget + 2400)) python bench.py \
      > "$OUT/bench_$name.tmp" 2> "$OUT/bench_$name.err"
  local rc=$?
  if [ $rc -eq 0 ] && [ -s "$OUT/bench_$name.tmp" ]; then
    mv "$OUT/bench_$name.tmp" "$OUT/bench_$name.json"
    say "arm $name ok: $(cat "$OUT/bench_$name.json")"
  else
    say "arm $name FAILED rc=$rc (stderr tail):"
    tail -5 "$OUT/bench_$name.err" >> "$LOG"
  fi
}

# A: baseline capture (fused dual gather + scan-local lattice are default-on)
run_arm base 2400 PAGNERF_FUSED_STEP=0
# B: fused single-dispatch step
run_arm fused 2400 PAGNERF_FUSED_STEP=1
# C: sample-cap probe at 2x the old envelope (scan-local lattice headroom);
#    micro_for() then picks bigger microbatches automatically
run_arm cap4m 2400 PAGNERF_FUSED_STEP=0 BENCH_SAMPLE_CAP=4.5e6
say "all arms done"
touch "$OUT/done"
