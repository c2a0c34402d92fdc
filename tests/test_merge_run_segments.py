"""Tests for scripts/merge_run_segments.py — stitching watchdog-resumed run
segments (CLAUDE.md rule 11 chains) into one run dir for collection.

Contracts under test:
  * half-open epoch ranges: row/event with step == hi comes from the NEXT
    segment, so a later segment's re-trained overlap supersedes a killed one;
  * events are merged in step order across segments;
  * config.yaml and val/ renders come from the LAST segment.
"""
from __future__ import annotations

import csv
import json
import sys
from pathlib import Path

import pytest

SCRIPTS = Path(__file__).resolve().parents[1] / "scripts"
sys.path.insert(0, str(SCRIPTS))

from merge_run_segments import main as merge  # noqa: E402


def _segment(root: Path, name: str, epochs, rgb_val: float) -> Path:
    run = root / name
    (run / "val").mkdir(parents=True)
    with open(run / "events.jsonl", "w") as f:
        for e in epochs:
            f.write(json.dumps({"tag": "Loss/rgb_loss", "value": rgb_val,
                                "step": e, "wall": float(e)}) + "\n")
    with open(run / "metrics.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["epoch", "psnr"])
        w.writeheader()
        for e in epochs:
            if e % 2 == 0:       # validation rows on a subset of epochs
                w.writerow({"epoch": e, "psnr": rgb_val})
    (run / "config.yaml").write_text(f"exp_name: {name}\n")
    (run / "val" / "frame.png").write_bytes(name.encode())
    return run


def test_merge_half_open_ranges_and_last_segment_artifacts(tmp_path):
    # segment A trained 0..9 then died; segment B resumed from epoch 6
    a = _segment(tmp_path, "segA", range(0, 10), rgb_val=1.0)
    b = _segment(tmp_path, "segB", range(6, 13), rgb_val=2.0)
    out = tmp_path / "merged"
    merge(str(out), f"{a}:0-6", f"{b}:6-13")

    events = [json.loads(l) for l in open(out / "events.jsonl")]
    steps = [e["step"] for e in events]
    assert steps == sorted(steps) == list(range(0, 13)), "no epoch twice, none lost"
    by_step = {e["step"]: e["value"] for e in events}
    assert by_step[5] == 1.0 and by_step[6] == 2.0, \
        "epoch 6 (the half-open boundary) must come from the RESUMED segment"

    rows = list(csv.DictReader(open(out / "metrics.csv")))
    assert [int(float(r["epoch"])) for r in rows] == [0, 2, 4, 6, 8, 10, 12]
    assert float(next(r["psnr"] for r in rows
                      if float(r["epoch"]) == 6.0)) == 2.0

    assert "segB" in (out / "config.yaml").read_text()
    assert (out / "val" / "frame.png").read_bytes() == b"segB"


def test_merge_skips_segments_without_metrics(tmp_path):
    a = _segment(tmp_path, "segA", range(0, 4), rgb_val=1.0)
    (a / "metrics.csv").unlink()
    b = _segment(tmp_path, "segB", range(4, 8), rgb_val=2.0)
    out = tmp_path / "merged"
    merge(str(out), f"{a}:0-4", f"{b}:4-8")
    rows = list(csv.DictReader(open(out / "metrics.csv")))
    assert [int(float(r["epoch"])) for r in rows] == [4, 6]
