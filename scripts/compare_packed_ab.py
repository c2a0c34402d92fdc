"""Compare the packed-vs-compact A/B arms' final metrics (VERDICT r4 ask #4).

Reads the LAST validation row (highest epoch across all watchdog segments) of
each arm's metrics.csv and writes the committed comparison JSON. The question
being answered: does the packed layout's water-fill truncation
(ops/packed.py — it drops deepest valid samples when a batch exceeds the CLT
budget; the reference's ragged layout never drops occupied samples,
tracers/panoptic_packed_rf_tracer.py:114-138) cost measurable final quality
over a full schedule at converged occupancy?

Usage: python scripts/compare_packed_ab.py <packed_root> <compact_root> <out.json>
"""
from __future__ import annotations

import csv
import json
import sys
from pathlib import Path

KEYS = ["val/psnr", "val/iou", "val/iou_gain", "val/pq_things",
        "val/pq_things_gain", "val/pq_all", "val/map", "val/map_75"]


def final_row(root: str) -> dict:
    best: dict = {}
    best_ep = -1
    # sorted: at equal epochs the LATER watchdog segment's row wins
    for p in sorted(Path(root).glob("*/metrics.csv")):
        with open(p, newline="") as f:
            for row in csv.DictReader(f):
                ep = int(float(row["epoch"]))
                if ep >= best_ep and row.get("val/pq_things"):
                    best_ep, best = ep, dict(row)
    if not best:
        sys.exit(f"no panoptic validation rows under {root}")
    best["epoch"] = best_ep
    return best


def main(packed_root: str, compact_root: str, out: str,
         config: str = "configs/synthetic/packed_ab.yaml") -> None:
    packed, compact = final_row(packed_root), final_row(compact_root)
    rep = {"config": config,
           "epoch": {"packed": packed["epoch"], "compact": compact["epoch"]},
           "packed": {}, "compact": {}, "delta_packed_minus_compact": {}}
    for k in KEYS:
        try:
            pv, cv = float(packed[k]), float(compact[k])
        except (KeyError, ValueError):
            continue
        name = k.split("/")[1]
        rep["packed"][name] = round(pv, 4)
        rep["compact"][name] = round(cv, 4)
        rep["delta_packed_minus_compact"][name] = round(pv - cv, 4)
    with open(out, "w") as f:
        json.dump(rep, f, indent=1)
    print(json.dumps(rep, indent=1))


if __name__ == "__main__":
    main(*sys.argv[1:5])
