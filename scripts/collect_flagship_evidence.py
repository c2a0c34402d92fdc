"""One-shot collection of the flagship-capacity 120-view evidence chain.

The flagship run (configs/synthetic/schedule_preds_flagship.yaml) executes as
a watchdog-resumed chain of segments (CLAUDE.md rule 11). The round-5 rerun
(`flagship_r5`) is SINGLE-PROVENANCE: every segment is the same config resumed
from the newest checkpoint, starting at epoch 0 — no cross-attempt stitching
(the round-4 chain needed scripts/rewind_panoptic_phase.py; this one does not).
This script:

  1. discovers the run's segments and builds half-open merge specs
     (a later resume supersedes the epochs a killed segment re-trains);
  2. merges the chain into one run dir (scripts/merge_run_segments.py);
  3. extracts the measured occupancy trajectory for the occupancy-honest
     bench headline (scripts/extract_occupancy_trajectory.py -> bench.py
     BENCH_TRAJ input);
  4. collects metrics.csv / convergence.png / renders / README results table
     into docs/convergence_flagship (scripts/collect_convergence.py).

Usage: python scripts/collect_flagship_evidence.py [run_root]
  run_root defaults to the round-5 watchdog chain's checkpoint root.
"""
from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

DEFAULT_ROOT = "/root/repo/_results/r5/flagship_r5"
SEM_EPOCH = 160
TOTAL_EPOCHS = 240


def segment_specs(root: Path) -> list[str]:
    segs = []
    for d in sorted(root.glob("2026*")):
        log = d / "log.txt"
        if not log.exists():
            continue
        eps = [int(m) for m in re.findall(r"EPOCH (\d+)/", log.read_text())]
        if eps:
            segs.append([d, eps[0], eps[-1] + 1])
    # A resume restarts from the newest checkpoint, which can predate several
    # killed segments (save_every 40): clip every segment's hi to the minimum
    # lo of all LATER segments so re-trained epochs come from the survivor.
    min_lo = 10 ** 9
    for seg in reversed(segs):
        seg[2] = min(seg[2], min_lo)
        min_lo = min(min_lo, seg[1])
    return [f"{d}:{lo}-{hi}" for d, lo, hi in segs if lo < hi]


def main(run_root: str = DEFAULT_ROOT,
         docs_dir: str = "docs/convergence_flagship") -> None:
    root = Path(run_root)
    specs = segment_specs(root)
    if not specs:
        sys.exit(f"no run segments with epochs under {run_root}")
    print("segment specs:")
    for s in specs:
        print(f"  {s}")

    merged = str(root.parent / f"merged_{root.name}")
    from merge_run_segments import main as merge
    merge(merged, *specs)

    import subprocess
    out = f"{docs_dir}/occupancy_trajectory.json"
    subprocess.run(
        [sys.executable, "scripts/extract_occupancy_trajectory.py",
         "--seed-epoch", "20", "--prune-epoch", "100",
         "--sem-epoch", str(SEM_EPOCH), "--epochs", str(TOTAL_EPOCHS),
         "--out", out, *specs], check=True)

    from collect_convergence import main as collect
    collect(merged, docs_dir)


if __name__ == "__main__":
    main(*sys.argv[1:3])
