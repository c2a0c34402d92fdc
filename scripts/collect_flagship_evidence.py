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

    # Schedule milestones from the run's OWN saved config snapshot (so the
    # trajectory's regime boundaries follow the executed schedule — the
    # compressed contingency protocol halves every milestone), falling back
    # to the flagship defaults for old runs without a snapshot.
    seed_ep, prune_ep, sem_ep, total_ep = 20, 100, SEM_EPOCH, TOTAL_EPOCHS
    cfg_path = Path(specs[-1].rsplit(":", 1)[0]) / "config.yaml"
    if cfg_path.exists():
        import yaml
        cfg = yaml.safe_load(cfg_path.read_text()) or {}
        flat = {}
        for v in cfg.values():
            if isinstance(v, dict):
                flat.update(v)
        seed_ep = int(flat.get("seed_prune_epoch", seed_ep))
        prune_ep = int(flat.get("voxel_raymarch_epoch_start", prune_ep))
        sem_ep = int(flat.get("sem_epoch_start", sem_ep))
        total_ep = int(flat.get("epochs", total_ep))

    import subprocess
    out = f"{docs_dir}/occupancy_trajectory.json"
    subprocess.run(
        [sys.executable, "scripts/extract_occupancy_trajectory.py",
         "--seed-epoch", str(seed_ep), "--prune-epoch", str(prune_ep),
         "--sem-epoch", str(sem_ep), "--epochs", str(total_ep),
         "--out", out, *specs], check=True)

    from collect_convergence import main as collect
    collect(merged, docs_dir)


if __name__ == "__main__":
    main(*sys.argv[1:3])
