"""Rewind a trained run to the panoptic phase boundary with a clean panoptic branch.

Recovery procedure from the round-4 numerics incident (PERFORMANCE.md "Numerics
incidents"): a run whose panoptic branch was corrupted mid-phase can be salvaged
without re-running the rgb phase, because the panoptic parameters
(delta_grid / decoder_inst / decoder_semantics) receive ZERO gradients before
sem/inst_epoch_start (need_panop channel gating, models/nefs.py) — fresh init is
bit-equivalent to their state at the phase boundary, and the rgb branch is
isolated by the stop-gradient contracts. Optimizer state is re-initialised
(a phase-boundary optimizer reset, as the reference does at prune epochs).

Usage:
    python scripts/rewind_panoptic_phase.py <config.yaml> <model.ckpt> <out_dir>

Writes <out_dir>/model.ckpt with epoch = trainer.sem_epoch_start and the
panoptic leaves re-initialised; resume with --pretrained (or let
scripts/tpu_watchdog.sh pick it up as the newest checkpoint).
"""
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

PANOPTIC_LEAVES = ("delta_grid", "decoder_inst", "decoder_semantics")


def main(config: str, ckpt: str, out_dir: str) -> str:
    import copy

    import numpy as np

    from pagnerf_tpu.config.config import parse_options
    from pagnerf_tpu.config.factory import get_modules_from_config
    from pagnerf_tpu.train import checkpoint

    args = parse_options(["--config", config])
    _, _, trainer = get_modules_from_config(args)

    fresh = {k: copy.deepcopy(trainer.params["nef"][k])
             for k in PANOPTIC_LEAVES if k in trainer.params["nef"]}

    checkpoint.load_checkpoint(ckpt, trainer, "full")

    params = jax.tree.map(lambda x: x, trainer.params)
    for k, v in fresh.items():
        params["nef"][k] = v
    trainer.params = params
    trainer.opt_state = trainer.tx.init(trainer.params)

    boundary = min(args.sem_epoch_start, args.inst_epoch_start)
    steps_per_epoch = max(trainer.global_step, 1) // max(trainer.epoch, 1)
    trainer.epoch = boundary
    trainer.global_step = boundary * steps_per_epoch

    os.makedirs(out_dir, exist_ok=True)
    path = checkpoint.save_checkpoint(os.path.join(out_dir, "model.ckpt"), trainer)

    # sanity: reload, confirm epoch + finiteness + untouched rgb branch
    _, _, t2 = get_modules_from_config(args)
    checkpoint.load_checkpoint(path, t2, "full")
    assert t2.epoch == boundary
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(t2.params))
    np.testing.assert_array_equal(np.asarray(t2.params["nef"]["grid"]["tables"]),
                                  np.asarray(trainer.params["nef"]["grid"]["tables"]))
    print("rewound checkpoint:", path, "epoch:", boundary)
    return path


if __name__ == "__main__":
    main(*sys.argv[1:4])
