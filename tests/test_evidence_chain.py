"""Tests for the round-5 evidence chain scripts: the occupancy-trajectory
extractor feeding bench.py's occupancy-honest headline, the packed-vs-compact
A/B comparator, and the watchdog-chain segment discovery in the flagship
evidence collector.

These scripts gate the committed perf/quality evidence (VERDICT r4 asks #1/#2/
#4), so their parsing/merging contracts are pinned here:
  * occupancy events are parsed from trainer log lines, honour half-open
    segment ranges, and map onto the reference's 801-epoch schedule
    proportionally with per-plateau splits;
  * the A/B comparator picks each arm's LAST panoptic validation row across
    watchdog segments;
  * segment discovery clips a killed segment's re-trained epochs to the
    surviving resume (same half-open rule as merge_run_segments).
"""
from __future__ import annotations

import csv
import json
import sys
from pathlib import Path

import pytest

SCRIPTS = Path(__file__).resolve().parents[1] / "scripts"
sys.path.insert(0, str(SCRIPTS))

from collect_flagship_evidence import segment_specs  # noqa: E402
from compare_packed_ab import final_row, main as compare_main  # noqa: E402
from extract_occupancy_trajectory import (build_trajectory,  # noqa: E402
                                          occupancy_events, parse_segments)


def _run_dir(root: Path, name: str, lines) -> Path:
    d = root / name
    d.mkdir(parents=True)
    (d / "log.txt").write_text("\n".join(lines) + "\n")
    return d


def test_trajectory_extraction_and_mapping(tmp_path):
    # one chain: seg A trains 0..59 (seed at 20, refresh at 40), killed; the
    # resume restarts from the epoch-40 checkpoint so seg B re-trains 40+ —
    # its refresh at 40 supersedes seg A's, then the real prune lands at 100.
    a = _run_dir(tmp_path, "20260820-0001", [
        "INFO| EPOCH 19/240 | rgb_loss: 1e-1",
        "INFO| seed-pruned occupancy: 33.1% cells occupied",
        "INFO| EPOCH 20/240 | rgb_loss: 1e-1",
        "INFO| EPOCH 40/240 | rgb_loss: 1e-1",
        "INFO| seed-pruned occupancy: 26.0% cells occupied",
        "INFO| EPOCH 59/240 | rgb_loss: 1e-1",
    ])
    b = _run_dir(tmp_path, "20260820-0002", [
        "INFO| EPOCH 40/240 | rgb_loss: 1e-1",
        "INFO| seed-pruned occupancy: 21.3% cells occupied",
        "INFO| EPOCH 100/240 | rgb_loss: 1e-1",
        "INFO| pruned occupancy: 5.0% cells occupied",
        "INFO| EPOCH 239/240 | rgb_loss: 1e-1",
    ])
    segs = parse_segments([f"{a}:0-40", f"{b}:40-240"])
    events = occupancy_events(segs)
    # seg A's epoch-40 refresh (26%) is outside its half-open [0, 40) range
    assert [(e, o) for e, o, _ in events] == [
        (19, pytest.approx(0.331)), (40, pytest.approx(0.213)),
        (100, pytest.approx(0.05))]

    traj = build_trajectory(events, seed_epoch=20, prune_epoch=100,
                            sem_epoch=160, epochs=240)
    total = sum(s["ref_epochs"] for s in traj)
    assert total == pytest.approx(801, abs=0.1)
    by_regime = {}
    for s in traj:
        by_regime.setdefault(s["regime"], []).append(s)
    # pre covers the dense field only; seeded is split at the epoch-40 refresh
    assert [s["occ"] for s in by_regime["pre_rgb"]] == [1.0]
    assert [s["occ"] for s in by_regime["seeded_rgb"]] == [0.331, 0.213]
    seeded_ep = [s["ref_epochs"] for s in by_regime["seeded_rgb"]]
    # refresh applies FROM epoch 41: 21/80 and 59/80 of the 181 ref epochs
    assert seeded_ep[0] == pytest.approx(181 * 21 / 80, abs=0.1)
    assert seeded_ep[1] == pytest.approx(181 * 59 / 80, abs=0.1)
    # the epoch-100 prune's mask applies FROM epoch 101, so post_rgb opens
    # with a one-epoch sliver at the pre-prune occupancy, then the pruned
    # plateau; post_panoptic is entirely post-prune
    post = by_regime["post_rgb"]
    assert [s["occ"] for s in post] == [pytest.approx(0.213),
                                        pytest.approx(0.05)]
    assert post[0]["ref_epochs"] == pytest.approx(400 / 60, abs=0.1)
    assert all(s["occ"] == pytest.approx(0.05)
               for s in by_regime["post_panoptic"])


def test_segment_specs_clip_to_survivor(tmp_path):
    # killed segment trained to 90; the resume restarted from the epoch-40
    # checkpoint — discovery must clip the killed segment's hi to 40.
    _run_dir(tmp_path, "20260820-0001", [
        "INFO| EPOCH 0/240 |", "INFO| EPOCH 90/240 |"])
    _run_dir(tmp_path, "20260820-0002", [
        "INFO| EPOCH 40/240 |", "INFO| EPOCH 239/240 |"])
    specs = segment_specs(tmp_path)
    assert [s.rpartition(":")[2] for s in specs] == ["0-40", "40-240"]


def _arm(root: Path, name: str, rows) -> Path:
    d = root / name / "20260820-0001"
    d.mkdir(parents=True)
    fields = ["epoch", "val/psnr", "val/iou", "val/iou_gain", "val/pq_things",
              "val/pq_things_gain", "val/pq_all", "val/map", "val/map_75"]
    with open(d / "metrics.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields)
        w.writeheader()
        for r in rows:
            w.writerow(r)
    return root / name


def test_compare_packed_ab_picks_last_panoptic_row(tmp_path):
    packed = _arm(tmp_path, "packed_ab_packed", [
        {"epoch": 40, "val/psnr": 20.0},                      # rgb-only row
        {"epoch": 120, "val/psnr": 24.5, "val/iou": 0.80,
         "val/iou_gain": 0.04, "val/pq_things": 0.57,
         "val/pq_things_gain": 0.03, "val/pq_all": 0.70,
         "val/map": 0.36, "val/map_75": 0.39}])
    compact = _arm(tmp_path, "packed_ab_compact", [
        {"epoch": 120, "val/psnr": 24.4, "val/iou": 0.79,
         "val/iou_gain": 0.03, "val/pq_things": 0.56,
         "val/pq_things_gain": 0.02, "val/pq_all": 0.69,
         "val/map": 0.35, "val/map_75": 0.38}])
    row = final_row(str(packed))
    assert row["epoch"] == 120           # rgb-only row has no pq_things
    out = tmp_path / "ab.json"
    compare_main(str(packed), str(compact), str(out))
    rep = json.loads(out.read_text())
    assert rep["delta_packed_minus_compact"]["psnr"] == pytest.approx(0.1)
    assert rep["delta_packed_minus_compact"]["pq_things"] == pytest.approx(0.01)
    assert rep["epoch"] == {"packed": 120, "compact": 120}
