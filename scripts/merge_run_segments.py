"""Merge training-run segments (watchdog resumes) into one run dir for collection.

Long axon runs are executed by scripts/tpu_watchdog.sh as a chain of resumed
segments (CLAUDE.md rule 11: the tunnel dies mid-run; every resume opens a new
timestamped log dir). This stitches the chain back into ONE run dir so
scripts/collect_convergence.py and plot_convergence.py see a single event
stream / metrics table:

  * each input is ``<run_dir>:<lo>-<hi>`` — take events/metrics rows with
    lo <= epoch < hi from that segment (half-open, so a later segment's
    re-trained overlap epochs supersede a killed segment's);
  * config.yaml and the val/ render dump are taken from the LAST segment.

Usage:
  python scripts/merge_run_segments.py <out_dir> <run_dir>:<lo>-<hi> [...]
"""
from __future__ import annotations

import csv
import json
import shutil
import sys
from pathlib import Path


def parse_spec(spec: str):
    path, _, rng = spec.rpartition(":")
    lo, _, hi = rng.partition("-")
    return Path(path), int(lo), int(hi)


def main(out_dir: str, *specs: str) -> None:
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    segments = [parse_spec(s) for s in specs]

    events = []
    for run, lo, hi in segments:
        with open(run / "events.jsonl") as f:
            for line in f:
                try:
                    e = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if lo <= e["step"] < hi:
                    events.append(e)
    events.sort(key=lambda e: (e["step"], e.get("wall", 0.0)))
    with open(out / "events.jsonl", "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")

    rows, fields = [], []
    for run, lo, hi in segments:
        p = run / "metrics.csv"
        if not p.exists():
            continue
        with open(p) as f:
            for row in csv.DictReader(f):
                row = {k: v for k, v in row.items() if k is not None}
                if lo <= float(row["epoch"]) < hi:
                    rows.append(row)
                    for k in row:
                        if k not in fields:
                            fields.append(k)
    if rows:
        rows.sort(key=lambda r: float(r["epoch"]))
        with open(out / "metrics.csv", "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=fields)
            w.writeheader()
            w.writerows(rows)

    last = segments[-1][0]
    if (last / "config.yaml").exists():
        shutil.copy(last / "config.yaml", out / "config.yaml")
    if (last / "val").is_dir():
        shutil.copytree(last / "val", out / "val", dirs_exist_ok=True)
    print(f"merged {len(segments)} segments -> {out} "
          f"({len(events)} events, {len(rows)} metric rows)")


if __name__ == "__main__":
    main(*sys.argv[1:])
