#!/bin/bash
# Packed-vs-compact quality A/B (VERDICT round-4 next-step #4).
#
# Waits for the flagship run's done marker (one chip — no contention), then
# runs both arms of configs/synthetic/packed_ab.yaml sequentially under the
# watchdog (auto-resume across axon stalls), and finally writes the committed
# comparison JSON (scripts/compare_packed_ab.py -> docs/PACKED_AB_r05.json).
#
# Usage: scripts/run_packed_ab.sh <results_root> [flagship_done_marker]
set -u
ROOT="$1"; GATE="${2:-}"
cd "$(dirname "$0")/.."

if [ -n "$GATE" ]; then
  while [ ! -f "$GATE" ]; do sleep 120; done
fi

# Bounded fixed-cost A/B first (pack-map + march-probe variants, ~6 min):
# its result decides the PAGNERF_PACK_GATHER_MAP / PAGNERF_WINDOWED_PROBE
# defaults before the bench capture (docs/profile_post_r5.json ranks these
# as the two largest non-encode post-step costs).
if [ ! -s "$ROOT/post_fixed_probe.json" ]; then
  timeout -k 30 1500 python scripts/probe_post_fixed_costs.py \
    > "$ROOT/post_fixed_probe.json" 2> "$ROOT/post_fixed_probe.log"
  echo "post-fixed probe rc=$?" >> "$ROOT/queue.log"
  if [ -s "$ROOT/post_fixed_probe.json" ]; then
    cp "$ROOT/post_fixed_probe.json" docs/post_fixed_probe_r5.json
    git add docs/post_fixed_probe_r5.json
    git commit -q -m "Measure pack-map and march-probe variants at post scale" \
      >> "$ROOT/queue.log" 2>&1
  fi
fi

for ARM in packed compact; do
  EXTRA=""
  [ "$ARM" = compact ] && EXTRA="--packed-compaction false"
  WATCHDOG_LOG="$ROOT/watchdog_packed_ab_$ARM.log" \
    scripts/tpu_watchdog.sh "$ROOT" "packed_ab_$ARM" "$ROOT/packed_ab_$ARM.done" \
    --config configs/synthetic/packed_ab.yaml --exp-name "packed_ab_$ARM" $EXTRA
done

python scripts/compare_packed_ab.py \
  "$ROOT/packed_ab_packed" "$ROOT/packed_ab_compact" docs/PACKED_AB_r05.json
