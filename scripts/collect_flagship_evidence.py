"""One-shot collection of the flagship-capacity 120-view evidence chain.

The flagship run (configs/synthetic/schedule_preds_flagship.yaml) executes as
a watchdog-resumed chain of segments (CLAUDE.md rule 11): the rgb phase
(epochs 0-160) is common to all attempts — panoptic params receive zero
gradients there — and the panoptic phase (160-240) is the `flagship_v2`
rerun (single-provenance, intra-phase LR decay). This script:

  1. discovers the `flagship_v2` segments and builds half-open merge specs
     (a later resume supersedes the epochs a killed segment re-trains);
  2. merges the chain into one run dir (scripts/merge_run_segments.py);
  3. extracts the measured occupancy trajectory for the occupancy-honest
     bench headline (scripts/extract_occupancy_trajectory.py -> bench.py
     BENCH_TRAJ input);
  4. collects metrics.csv / convergence.png / renders / README results table
     into docs/convergence_flagship (scripts/collect_convergence.py).

Usage: python scripts/collect_flagship_evidence.py [v2_root]
"""
from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

# rgb phase 0-160: attempt-2 chain segment (the run that produced the epoch-160
# boundary checkpoint flagship_v2 resumed from; see
# docs/convergence_flagship/README.md "Provenance")
RGB_SPEC = ("/tmp/flagship_runs/synthetic_schedule_preds_flagship_120v/"
            "20260819-083255:0-160")
SEM_EPOCH = 160
TOTAL_EPOCHS = 240
MERGED = "/tmp/flagship_runs/merged_v2"


def v2_specs(root: Path) -> list[str]:
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


def main(v2_root: str = "/tmp/flagship_runs/flagship_v2") -> None:
    specs = [RGB_SPEC] + v2_specs(Path(v2_root))
    if len(specs) < 2:
        sys.exit(f"no flagship_v2 segments with epochs under {v2_root}")
    print("segment specs:")
    for s in specs:
        print(f"  {s}")

    from merge_run_segments import main as merge
    merge(MERGED, *specs)

    import subprocess
    out = "docs/convergence_flagship/occupancy_trajectory.json"
    subprocess.run(
        [sys.executable, "scripts/extract_occupancy_trajectory.py",
         "--seed-epoch", "20", "--prune-epoch", "100",
         "--sem-epoch", str(SEM_EPOCH), "--epochs", str(TOTAL_EPOCHS),
         "--out", out, *specs], check=True)

    from collect_convergence import main as collect
    collect(MERGED, "docs/convergence_flagship")


if __name__ == "__main__":
    main(*sys.argv[1:2])
