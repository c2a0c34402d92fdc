"""Plot convergence evidence from a training run's log dir.

Reads ``events.jsonl`` (per-step losses) and ``metrics.csv`` (per-validation
metrics) as written by main.py, and renders small-multiple line panels (losses /
PSNR / panoptic quality) to one PNG. Stage-transition epochs are marked so the
full-schedule evidence run (configs/synthetic/schedule.yaml) shows every regime
change against the curves.

Usage: python scripts/plot_convergence.py <run_dir> [out.png]
       (run_dir = the timestamped dir holding events.jsonl + metrics.csv)
"""
from __future__ import annotations

import csv
import json
import sys
from collections import defaultdict
from pathlib import Path

# dataviz reference palette (pre-validated categorical order, light mode)
SERIES = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100", "#e87ba4"]
SURFACE, INK, INK2 = "#fcfcfb", "#0b0b0b", "#52514e"


def load_events(path: Path):
    scalars = defaultdict(list)
    with open(path) as f:
        for line in f:
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            scalars[e["tag"]].append((e["step"], e["value"]))
    return scalars


def load_metrics(path: Path):
    rows = []
    with open(path) as f:
        for row in csv.DictReader(f):
            # tolerate ragged legacy files (per-row headers): DictReader stuffs
            # overflow cells under the None key — drop them
            rows.append({k: float(v) for k, v in row.items()
                         if k is not None and isinstance(v, str) and v != ""})
    return rows


def metrics_from_events(scalars) -> list:
    """Validation metrics rows from the event stream (primary source — old
    ragged metrics.csv files scramble columns)."""
    by_epoch = defaultdict(dict)
    for tag, pts in scalars.items():
        if tag.startswith("val/"):
            for step, value in pts:
                by_epoch[step][tag] = value
    return [{"epoch": ep, **vals} for ep, vals in sorted(by_epoch.items())]


def main(run_dir: str, out: str = None,
         transitions: dict | None = None) -> str:
    run = Path(run_dir)
    out = out or str(run / "convergence.png")
    scalars = load_events(run / "events.jsonl")
    metrics = metrics_from_events(scalars)
    if not metrics and (run / "metrics.csv").exists():
        metrics = load_metrics(run / "metrics.csv")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(3, 1, figsize=(8, 9), sharex=True,
                             facecolor=SURFACE)
    for ax in axes:
        ax.set_facecolor(SURFACE)
        ax.grid(True, color="#e8e7e3", linewidth=0.6)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
        for s in ("left", "bottom"):
            ax.spines[s].set_color(INK2)
        ax.tick_params(colors=INK2, labelsize=9)

    # panel 1: training losses (log scale, per epoch)
    ax = axes[0]
    loss_tags = [t for t in ("Loss/rgb_loss", "Loss/sem_loss", "Loss/inst_loss")
                 if t in scalars]
    for i, tag in enumerate(loss_tags):
        xs, ys = zip(*scalars[tag])
        ax.plot(xs, ys, color=SERIES[i], linewidth=2,
                label=tag.split("/")[-1])
    ax.set_yscale("log")
    ax.set_ylabel("training loss", color=INK)
    ax.legend(frameon=False, fontsize=9, labelcolor=INK)

    # panel 2: validation PSNR
    ax = axes[1]
    eps = [m["epoch"] for m in metrics if "val/psnr" in m]
    psnr = [m["val/psnr"] for m in metrics if "val/psnr" in m]
    ax.plot(eps, psnr, color=SERIES[0], linewidth=2, marker="o", markersize=5)
    if psnr:
        ax.annotate(f"{psnr[-1]:.1f} dB", (eps[-1], psnr[-1]),
                    textcoords="offset points", xytext=(6, 4),
                    fontsize=9, color=INK)
    ax.set_ylabel("val PSNR (dB)", color=INK)

    # panel 3: panoptic metrics
    ax = axes[2]
    for i, key in enumerate(("val/pq_all", "val/pq_things", "val/pq_stuff",
                             "val/iou")):
        pts = [(m["epoch"], m[key]) for m in metrics if key in m]
        if pts:
            xs, ys = zip(*pts)
            ax.plot(xs, ys, color=SERIES[i], linewidth=2, marker="o",
                    markersize=4, label=key.split("/")[-1])
    # 2-D prediction baselines (pred-supervised runs): dashed lines the NeRF
    # must clear — the reference's gain criterion (pc_nerf/trainer.py:906-914)
    for i, key in enumerate(("val/pq_things_pred", "val/iou_pred")):
        pts = [(m["epoch"], m[key]) for m in metrics if m.get(key, 0) > 0]
        if pts:
            xs, ys = zip(*pts)
            ax.plot(xs, ys, color=SERIES[1 if i == 0 else 3], linewidth=1.4,
                    linestyle="--", label=key.split("/")[-1] + " (2-D input)")
    ax.set_ylim(0, 1)
    ax.set_ylabel("panoptic quality", color=INK)
    ax.set_xlabel("epoch", color=INK)
    ax.legend(frameon=False, fontsize=8, labelcolor=INK, ncols=3)

    # stage-transition markers on every panel
    for name, ep in (transitions or {}).items():
        for ax in axes:
            ax.axvline(ep, color=INK2, linewidth=0.8, linestyle=":")
        axes[0].annotate(name, (ep, axes[0].get_ylim()[1]), fontsize=8,
                         color=INK2, rotation=90, va="top",
                         textcoords="offset points", xytext=(3, -2))

    fig.suptitle("pagnerf_tpu full-schedule convergence", color=INK)
    fig.tight_layout()
    fig.savefig(out, dpi=150, facecolor=SURFACE)
    return out


if __name__ == "__main__":
    transitions = {"anneal end": 60, "prune + voxel": 75, "heads on": 100,
                   "2nd prune": 150}
    print(main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else None,
               transitions))
