"""Collect full-schedule convergence evidence from a finished run into docs/.

Copies the config snapshot + metrics.csv, renders the convergence plot, picks
representative final-epoch render/GT/semantic/instance frames, and rewrites the
results table in docs/convergence/README.md from the final metrics row.

Usage: python scripts/collect_convergence.py <run_dir> [docs_dir]
"""
from __future__ import annotations

import json
import shutil
import sys
from pathlib import Path


def main(run_dir: str, docs_dir: str = "docs/convergence") -> None:
    run = Path(run_dir)
    docs = Path(docs_dir)
    (docs / "renders").mkdir(parents=True, exist_ok=True)

    shutil.copy(run / "config.yaml", docs / "config.yaml")
    if (run / "metrics.csv").exists():
        shutil.copy(run / "metrics.csv", docs / "metrics.csv")

    sys.path.insert(0, str(Path(__file__).parent))
    from plot_convergence import load_events, main as plot, metrics_from_events
    transitions = {"anneal end": 80, "prune + voxel": 100, "heads on": 160,
                   "2nd prune": 200}
    plot(str(run), str(docs / "convergence.png"), transitions)

    # representative final-epoch frames (best / median / worst PSNR view)
    import numpy as np
    from PIL import Image
    val_dirs = sorted(run.glob("val/epoch_*"),
                      key=lambda p: int(p.name.split("_")[1]))
    final = val_dirs[-1]
    ps = {}
    for gt in final.glob("[0-9]*_gt.png"):
        i = int(gt.stem.split("_")[0])
        a = np.asarray(Image.open(final / f"{i}.png").convert("RGB"), float) / 255
        g = np.asarray(Image.open(gt).convert("RGB"), float) / 255
        ps[i] = -10 * np.log10(((a - g) ** 2).mean())
    order = sorted(ps, key=ps.get)
    picks = {"worst": order[0], "median": order[len(order) // 2],
             "best": order[-1]}
    for tag, i in picks.items():
        row = []
        for suffix in ("", "_gt", "_sem", "_inst"):
            f = final / f"{i}{suffix}.png"
            if f.exists():
                row.append(np.asarray(Image.open(f).convert("RGB")))
        img = np.concatenate(row, axis=1)
        Image.fromarray(img).save(docs / "renders" /
                                  f"{tag}_view{i}_{ps[i]:.1f}dB.png")

    # final metrics row -> README table
    metrics = metrics_from_events(load_events(run / "events.jsonl"))
    last = metrics[-1] if metrics else {}
    mean_psnr = float(np.mean(list(ps.values()))) if ps else 0.0
    lines = ["| metric | value |", "|---|---|",
             f"| val PSNR (pooled, reference aggregation) | {last.get('val/psnr', 0):.2f} dB |",
             f"| val PSNR (mean over {len(ps)} images, final epoch) | {mean_psnr:.2f} dB |",
             f"| IoU | {last.get('val/iou', 0):.3f} |",
             f"| PQ all / things / stuff | {last.get('val/pq_all', 0):.3f} / "
             f"{last.get('val/pq_things', 0):.3f} / {last.get('val/pq_stuff', 0):.3f} |",
             f"| SQ all / RQ all | {last.get('val/sq_all', 0):.3f} / "
             f"{last.get('val/rq_all', 0):.3f} |",
             f"| mAP / mAP50 | {last.get('val/map', 0):.3f} / "
             f"{last.get('val/map_50', 0):.3f} |"]
    if last.get("val/iou_pred", 0) > 0:
        # prediction-supervised run: report the 2-D baseline and the gains —
        # the reference's own success criterion (pc_nerf/trainer.py:906-914)
        lines += [
            f"| 2-D baseline IoU (input predictions) | {last.get('val/iou_pred', 0):.3f} |",
            f"| **IoU gain over 2-D input** | **{last.get('val/iou_gain', 0):+.3f}** |",
            f"| 2-D baseline PQ-things | {last.get('val/pq_things_pred', 0):.3f} |",
            f"| **PQ-things gain over 2-D input** | **{last.get('val/pq_things_gain', 0):+.3f}** |",
            f"| 2-D baseline mAP / mAP50 | {last.get('val/map_pred', 0):.3f} / "
            f"{last.get('val/map_50_pred', 0):.3f} |"]
    readme = docs / "README.md"
    if not readme.exists():
        shutil.copy(Path("docs/convergence/README.md"), readme)
    text = readme.read_text()
    marker = "## Results (run on one TPU v5e chip via axon)"
    head, _, tail = text.partition(marker)
    rest = tail.split("\n## ", 1)
    trailer = ("\n## " + rest[1]) if len(rest) > 1 else ""
    table = "\n\n" + "\n".join(lines) + "\n"
    readme.write_text(head + marker + table + trailer)
    print(json.dumps({"docs": str(docs), **{k: round(v, 3) if isinstance(v, float)
                                            else v for k, v in last.items()}}))


if __name__ == "__main__":
    main(sys.argv[1], *(sys.argv[2:3]))
