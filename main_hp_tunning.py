"""Hyper-parameter sweep driver with successive-halving early stopping.

Equivalent of /root/reference/main_hp_tunning.py (Ray Tune ASHA grid search over
lr / loss weights / layer sizes, reference lines 74-88, with trial checkpointing and
early stopping, lines 189-243) — rebuilt without Ray: a sweep that trains each
trial in rungs and halves the population by the monitored metric after every rung
(ASHA's synchronous variant).

Concurrency model: ``--num-workers N`` runs N trials at a time as subprocesses
(the reference runs concurrent Ray trials with 1 GPU each,
main_hp_tunning.py:29-37); each worker slot maps to a local accelerator via
``jax_default_device`` when the host exposes several (one chip per trial on a
pod host), and trial state chains between rungs through on-disk checkpoints, so
serial and concurrent sweeps are equivalent. The default (1) trains in-process.
"""
from __future__ import annotations

import argparse
import itertools
import json
import logging
import os
import sys
import time
from typing import Dict, List

log = logging.getLogger(__name__)

# Default search space — mirrors the reference's tune config (main_hp_tunning.py:74-88)
DEFAULT_SPACE = {
    "lr": [1e-3, 5e-3],
    "grid_lr_weight": [10.0, 100.0],
    "sem_weight": [0.1, 1.0],
    "inst_weight": [100.0, 1000.0],
    "hidden_dim": [32, 64],
}


def grid_points(space: Dict[str, List]) -> List[Dict]:
    keys = sorted(space.keys())
    return [dict(zip(keys, vals)) for vals in itertools.product(*(space[k] for k in keys))]


def run_trial(base_args: List[str], overrides: Dict, epochs: int, out_dir: str,
              trial_id: str, resume_from=None) -> Dict:
    """Train one trial for ``epochs`` epochs; returns final metrics. Uses the
    in-process trainer so checkpoints can be chained between rungs (reference
    restores Ray checkpoints, main_hp_tunning.py:192-198)."""
    from pagnerf_tpu.config.config import parse_options
    from pagnerf_tpu.config.factory import get_modules_from_config
    from pagnerf_tpu.train import checkpoint
    from pagnerf_tpu.train.validation import validate

    argv = list(base_args)
    for k, v in overrides.items():
        argv += [f"--{k.replace('_', '-')}", str(v)]
    argv += ["--epochs", str(epochs)]
    args = parse_options(argv)
    _, _, trainer = get_modules_from_config(args)
    if resume_from and os.path.exists(resume_from):
        checkpoint.load_checkpoint(resume_from, trainer, "full")
    trainer.train()
    metrics = validate(trainer, trainer.epoch)
    ckpt = os.path.join(out_dir, f"{trial_id}.ckpt")
    checkpoint.save_checkpoint(ckpt, trainer)
    metrics["_ckpt"] = ckpt
    return metrics


def run_trial_subprocess(base_args: List[str], overrides: Dict, epochs: int,
                         out_dir: str, trial_id: str, resume_from, slot: int,
                         platform: str | None) -> Dict:
    """Train one trial in a fresh worker process (``--run-trial`` mode below).

    The spec/result travel as JSON files; ``slot`` picks the worker's local
    accelerator, ``platform`` optionally forces a JAX backend (e.g. "cpu" so
    concurrent trials don't contend for the one training chip)."""
    import subprocess
    # Absolute paths throughout: the worker runs with cwd at the repo root
    # (imports/configs), which may differ from the parent's cwd — relative
    # out_dir/checkpoint paths would silently resolve to different places.
    out_dir = os.path.abspath(out_dir)
    if resume_from:
        resume_from = os.path.abspath(resume_from)
    spec_path = os.path.join(out_dir, f"{trial_id}.spec.json")
    result_path = os.path.join(out_dir, f"{trial_id}.result.json")
    with open(spec_path, "w") as f:
        json.dump({"base_args": base_args, "overrides": overrides,
                   "epochs": epochs, "out_dir": out_dir, "trial_id": trial_id,
                   "resume_from": resume_from, "result_path": result_path,
                   "slot": slot, "platform": platform}, f)
    proc = subprocess.run([sys.executable, os.path.abspath(__file__),
                           "--run-trial", spec_path],
                          capture_output=True, text=True, cwd=os.path.dirname(
                              os.path.abspath(__file__)))
    if proc.returncode != 0 or not os.path.exists(result_path):
        raise RuntimeError(f"{trial_id} worker failed "
                           f"(rc={proc.returncode}):\n{proc.stderr[-2000:]}")
    with open(result_path) as f:
        return json.load(f)


def _run_trial_worker(spec_path: str) -> None:
    """``--run-trial`` entry: executed inside the worker subprocess."""
    with open(spec_path) as f:
        spec = json.load(f)
    import jax
    if spec.get("platform"):
        jax.config.update("jax_platforms", spec["platform"])
    devs = jax.local_devices()
    if len(devs) > 1:   # one accelerator per worker slot (Ray's 1-GPU model)
        jax.config.update("jax_default_device", devs[spec["slot"] % len(devs)])
    metrics = run_trial(spec["base_args"], spec["overrides"], spec["epochs"],
                        spec["out_dir"], spec["trial_id"],
                        resume_from=spec["resume_from"])
    with open(spec["result_path"], "w") as f:
        json.dump({k: (float(v) if hasattr(v, "item") or isinstance(v, (int, float))
                       else v) for k, v in metrics.items()}, f)


def asha_sweep(base_args: List[str], space: Dict[str, List], out_dir: str,
               metric: str = "val/psnr", mode: str = "max",
               rung_epochs: int = 2, num_rungs: int = 3,
               reduction_factor: int = 2, num_workers: int = 1,
               worker_platform: str | None = None) -> List[Dict]:
    os.makedirs(out_dir, exist_ok=True)
    trials = [{"id": f"trial_{i:03d}", "config": cfg, "ckpt": None}
              for i, cfg in enumerate(grid_points(space))]
    results = []
    for rung in range(num_rungs):
        log.info("rung %d: %d trials x %d epochs", rung, len(trials), rung_epochs)
        scored = []
        # Cumulative epoch target: the restored "full" checkpoint carries
        # trainer.epoch from the previous rung, and trainer.train() iterates
        # range(self.epoch, cfg.epochs) — passing the per-rung count would make
        # every rung >= 1 a no-op that re-validates the rung-0 model.
        cum_epochs = rung_epochs * (rung + 1)

        def score_one(t):
            # one dead trial must not kill the sweep (Ray marks the trial
            # failed and continues) — contain BOTH execution paths
            t0 = time.time()
            try:
                if num_workers > 1:
                    slot = slots.get()   # distinct accelerator per live worker
                    try:
                        m = run_trial_subprocess(base_args, t["config"],
                                                 cum_epochs, out_dir, t["id"],
                                                 t["ckpt"], slot,
                                                 worker_platform)
                    finally:
                        slots.put(slot)
                else:
                    m = run_trial(base_args, t["config"], cum_epochs, out_dir,
                                  t["id"], resume_from=t["ckpt"])
            except Exception as e:
                log.warning("%s failed: %s", t["id"], e)
                return t, {"_failed": str(e)}, time.time() - t0
            t["ckpt"] = m.pop("_ckpt")
            return t, m, time.time() - t0

        if num_workers > 1:
            import queue
            from concurrent.futures import ThreadPoolExecutor
            slots = queue.Queue()
            for s in range(num_workers):
                slots.put(s)
            with ThreadPoolExecutor(max_workers=num_workers) as ex:
                done = list(ex.map(score_one, trials))
        else:
            done = [score_one(t) for t in trials]
        worst = float("-inf") if mode == "max" else float("inf")
        for t, m, wall in done:
            failed = "_failed" in m
            score = worst if failed else m.get(metric, 0.0)
            scored.append((score, t, m))
            # serialized metric: None for failures (json.dump would emit the
            # non-standard -Infinity token otherwise)
            results.append({"trial": t["id"], "rung": rung, "config": t["config"],
                            "metric": None if failed else score, "metrics": m,
                            "wall": wall})
            log.info("%s rung %d: %s=%.4f (%.1fs)", t["id"], rung, metric,
                     score, wall)
        scored.sort(key=lambda x: x[0], reverse=(mode == "max"))
        keep = max(1, len(scored) // reduction_factor)
        trials = [t for _, t, _ in scored[:keep]]
        with open(os.path.join(out_dir, "sweep_results.json"), "w") as f:
            json.dump(results, f, indent=2)
    log.info("best trial: %s %s", trials[0]["id"], trials[0]["config"])
    return results


def main(argv=None):
    from pagnerf_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--out-dir", default="_results/hp_sweep")
    parser.add_argument("--metric", default="val/psnr")
    parser.add_argument("--mode", default="max", choices=["max", "min"])
    parser.add_argument("--rung-epochs", type=int, default=2)
    parser.add_argument("--num-rungs", type=int, default=3)
    parser.add_argument("--space", type=str, default=None,
                        help="JSON dict overriding the default search space")
    parser.add_argument("--num-workers", type=int, default=1,
                        help="concurrent trial subprocesses (1 = in-process)")
    parser.add_argument("--worker-platform", type=str, default=None,
                        help="force a JAX backend inside trial workers "
                             "(e.g. cpu to keep the training chip free)")
    ns = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    space = json.loads(ns.space) if ns.space else DEFAULT_SPACE
    # absolute paths: trial workers run with a different cwd (see
    # run_trial_subprocess)
    ns.config = os.path.abspath(ns.config)
    ns.out_dir = os.path.abspath(ns.out_dir)
    base = ["--config", ns.config, "--log-dir", ns.out_dir, "--valid-every", "-1"]
    return asha_sweep(base, space, ns.out_dir, ns.metric, ns.mode,
                      ns.rung_epochs, ns.num_rungs,
                      num_workers=ns.num_workers,
                      worker_platform=ns.worker_platform)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--run-trial":
        _run_trial_worker(sys.argv[2])
    else:
        main(sys.argv[1:])
