"""Extract the measured occupancy trajectory of a training-run chain and map
it onto the reference's 801-epoch schedule for occupancy-honest benchmarking.

The round-4 verdict's core perf criticism: the bench headline weighted the
post-prune segments at the bench scene's near-empty 1.46% occupancy, while
real converged runs sit far denser — the honest headline must weight the
schedule by a MEASURED occupancy trajectory. This script parses the
"(seed-)pruned occupancy: X% cells occupied" lines the trainer logs at every
seed/refresh/real prune out of a watchdog-resumed run chain (same
``<run_dir>:<lo>-<hi>`` segment specs as scripts/merge_run_segments.py),
builds the piecewise-constant occupancy-vs-epoch trajectory, and maps each
phase onto the reference schedule proportionally:

  run [0, seed)          -> reference pre    [0, 20)     dense
  run [seed, real prune) -> reference seeded [20, 201)   per-refresh plateaus
  run [real prune, sem)  -> reference post-rgb [201, 601)
  run [sem, end]         -> reference post-panoptic [601, 801)

Output JSON (``--out``, default docs/convergence_flagship/
occupancy_trajectory.json) is consumed by bench.py (BENCH_TRAJ) to produce
the trajectory-weighted headline.

Usage:
  python scripts/extract_occupancy_trajectory.py --seed-epoch 20 \
      --prune-epoch 100 --sem-epoch 160 --epochs 240 \
      --out docs/convergence_flagship/occupancy_trajectory.json \
      <run_dir>:<lo>-<hi> [...]
"""
from __future__ import annotations

import argparse
import json
import re
from pathlib import Path

# reference best.yaml schedule boundaries (SURVEY.md §6)
REF_PRE = 20          # framework's seed epoch maps here
REF_PRUNE = 201
REF_SEM = 601
REF_TOTAL = 801


def parse_segments(specs):
    """[(path, lo, hi)] from merge_run_segments-style specs."""
    out = []
    for spec in specs:
        path, _, rng = spec.rpartition(":")
        lo, _, hi = rng.partition("-")
        out.append((Path(path), int(lo), int(hi)))
    return out


def occupancy_events(segments):
    """[(epoch_after, occ_frac, kind)] from the chain's log.txt files,
    honouring the half-open epoch ranges (later segments supersede)."""
    events = []
    for run, lo, hi in segments:
        epoch = lo
        for line in open(run / "log.txt", errors="replace"):
            m = re.search(r"EPOCH (\d+)/", line)
            if m:
                epoch = int(m.group(1))
            m = re.search(r"(seed-)?pruned occupancy: ([\d.]+)% cells", line)
            if m and lo <= epoch < hi:
                events.append((epoch, float(m.group(2)) / 100.0,
                               "seed" if m.group(1) else "prune"))
    # stable sort on epoch ONLY: same-epoch events (a seed refresh followed by
    # the real prune at the same boundary) must keep their log order
    events.sort(key=lambda e: e[0])
    return events


def build_trajectory(events, seed_epoch, prune_epoch, sem_epoch, epochs):
    """Piecewise-constant occ(epoch) for the run, then reference mapping."""
    # run-domain plateaus: occupancy changes AFTER the event's epoch
    plateaus = []          # (lo, hi, occ) in run epochs, half-open
    cur_occ = 1.0
    cur_lo = 0
    for epoch, occ, _ in events:
        boundary = epoch + 1          # the new mask applies from the next epoch
        if boundary > cur_lo:
            plateaus.append((cur_lo, boundary, cur_occ))
            cur_lo = boundary
        cur_occ = occ
    plateaus.append((cur_lo, epochs + 1, cur_occ))

    def window(lo, hi):
        """plateaus clipped to [lo, hi), as (fraction_of_window, occ)."""
        out = []
        span = hi - lo
        for p_lo, p_hi, occ in plateaus:
            o_lo, o_hi = max(lo, p_lo), min(hi, p_hi)
            if o_hi > o_lo:
                out.append(((o_hi - o_lo) / span, occ))
        return out

    segments = []

    def emit(regime, ref_epochs, parts):
        for frac, occ in parts:
            segments.append({"regime": regime,
                             "ref_epochs": round(frac * ref_epochs, 2),
                             "occ": round(occ, 4)})

    emit("pre_rgb", REF_PRE, window(0, seed_epoch))
    emit("seeded_rgb", REF_PRUNE - REF_PRE, window(seed_epoch, prune_epoch))
    emit("post_rgb", REF_SEM - REF_PRUNE, window(prune_epoch, sem_epoch))
    emit("post_panoptic", REF_TOTAL - REF_SEM, window(sem_epoch, epochs + 1))
    return segments


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("specs", nargs="+", help="<run_dir>:<lo>-<hi> segments")
    ap.add_argument("--seed-epoch", type=int, default=20)
    ap.add_argument("--prune-epoch", type=int, default=100,
                    help="first REAL prune epoch of the run")
    ap.add_argument("--sem-epoch", type=int, default=160)
    ap.add_argument("--epochs", type=int, default=240)
    ap.add_argument("--out", default="docs/convergence_flagship/"
                                     "occupancy_trajectory.json")
    args = ap.parse_args()

    segments = parse_segments(args.specs)
    events = occupancy_events(segments)
    if not events:
        raise SystemExit("no '(seed-)pruned occupancy' lines found in the "
                         "given segments")
    traj = build_trajectory(events, args.seed_epoch, args.prune_epoch,
                            args.sem_epoch, args.epochs)
    out = {
        "source": [f"{p}:{lo}-{hi}" for p, lo, hi in segments],
        "run_epochs": args.epochs,
        "run_events": [{"after_epoch": e, "occ": round(o, 4), "kind": k}
                       for e, o, k in events],
        "segments": traj,
    }
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    total = sum(s["ref_epochs"] for s in traj)
    print(f"wrote {args.out}: {len(traj)} segments covering {total:.0f} "
          f"reference epochs")
    for s in traj:
        print(f"  {s['regime']:15s} {s['ref_epochs']:7.2f} ep @ "
              f"{100 * s['occ']:.1f}% occ")


if __name__ == "__main__":
    main()
