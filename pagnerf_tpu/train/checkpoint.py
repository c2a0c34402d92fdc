"""Checkpoint save/load.

Equivalent of the reference's save/load surface: wisp BaseTrainer ``save_every`` /
``save_as_new`` / ``model_format`` (config flags, /root/reference/config_parser.py:366-372)
and the 4 ``--pretrained`` load formats including shape-mismatch-tolerant partial
loading (config_parser.py:753-776). State is a flax msgpack-serialised pytree of
{params, opt_state, occupancy, lod_weights, epoch, global_step} — everything needed
for exact resume (SURVEY.md §5 checkpoint/resume). msgpack carries no executable
payload, so loading an untrusted checkpoint is data-only (unlike pickle; legacy
pickle checkpoints from older runs are still readable but must be trusted)."""
from __future__ import annotations

import logging
import os
import pickle
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization as flax_ser

log = logging.getLogger(__name__)

FORMATS = ("full", "params_only", "state_dict", "params_only_ignore_missmatch")


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, trainer, save_as_new: bool = False) -> str:
    """Write a checkpoint; ``save_as_new`` appends the epoch to the filename
    (reference save_as_new, best.yaml:193)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if save_as_new:
        base, ext = os.path.splitext(path)
        path = f"{base}_epoch{trainer.epoch}{ext}"
    state = {
        "params": _to_numpy(trainer.params),
        "opt_state": flax_ser.to_state_dict(_to_numpy(trainer.opt_state)),
        "occupancy": np.asarray(trainer.occ.occupancy),
        "occ_mask": np.asarray(trainer.occ.mask),
        "occ_level": trainer.occ.level,
        "lod_weights": np.asarray(trainer.lod_w),
        "epoch": trainer.epoch,
        "global_step": trainer.global_step,
        # prune-regime flags: stage_for_epoch keys post-prune sample compaction
        # off these; without them a resumed post-prune run silently trains the
        # (slower, differently-shaped) pre-prune stage
        "pruned": int(bool(getattr(trainer, "_pruned", False))),
        "real_pruned": int(bool(getattr(trainer, "_real_pruned", False))),
        "occ_frac": float(getattr(trainer, "_occ_frac",
                                  float(np.asarray(trainer.occ.mask).mean()))),
    }
    # atomic write: a watchdog/timeout SIGKILL mid-save must never leave a
    # truncated model.ckpt as the newest file — an auto-resume loop would pick
    # it up and crash-retry forever (os.replace is atomic on POSIX)
    tmp = f"{path}.tmp"
    with open(tmp, "wb") as f:
        f.write(flax_ser.msgpack_serialize(state))
    os.replace(tmp, path)
    log.info("saved checkpoint to %s", path)
    return path


def _first_real_prune_epoch(cfg) -> Optional[int]:
    """Epoch whose END runs the first REAL (non-seed) prune under ``cfg``
    (trainer.should_prune ∘ run_epoch ordering), or None if none scheduled."""
    cands = []
    if getattr(cfg, "prune_at_start", False):
        cands.append(0)
    if getattr(cfg, "prune_at_epoch", -1) >= 0:
        cands.append(cfg.prune_at_epoch)
    if getattr(cfg, "prune_every", 0) > 0:
        cands.append(cfg.prune_every)
    return min(cands) if cands else None


def derive_real_pruned(cfg, epoch: int, pruned: bool) -> bool:
    """Whether the real prune must already have run by a checkpoint at ``epoch``.

    For checkpoints without the round-4 ``real_pruned`` field. The real prune
    fires at the END of epoch P (trainer.run_epoch), and a checkpoint's epoch
    is the next epoch to run, so epoch > P implies it ran. Getting this wrong
    is not benign: a resumed run that re-enters seed refreshes
    (seed_refresh_every) AFTER the real prune shrink-only-mutates the
    post-prune occupancy mask (keep floor 0.02, no dilation) — observed to
    degrade a flagship run's post-prune field. (ADVICE r4 #3.)"""
    if not pruned:
        return False
    p = _first_real_prune_epoch(cfg)
    return p is not None and epoch > p


def _partial_merge(current, loaded, ignore_mismatch: bool):
    """Merge loaded leaves into the current tree; on shape mismatch either raise or
    keep the current leaf (reference partial load, config_parser.py:753-776)."""
    flat_cur = jax.tree_util.tree_flatten_with_path(current)
    flat_load = dict(jax.tree_util.tree_flatten_with_path(loaded)[0])
    merged = []
    for kp, leaf in flat_cur[0]:
        if kp in flat_load:
            cand = flat_load[kp]
            if np.shape(cand) == np.shape(leaf):
                merged.append(jnp.asarray(cand))
            elif ignore_mismatch:
                log.warning("shape mismatch at %s: %s vs %s — keeping current",
                            kp, np.shape(cand), np.shape(leaf))
                merged.append(leaf)
            else:
                raise ValueError(f"shape mismatch at {kp}: "
                                 f"{np.shape(cand)} vs {np.shape(leaf)}")
        else:
            if not ignore_mismatch:
                raise KeyError(f"missing parameter {kp} in checkpoint")
            merged.append(leaf)
    return jax.tree_util.tree_unflatten(flat_cur[1], merged)


def load_checkpoint(path: str, trainer, model_format: str = "full") -> None:
    """Restore trainer state in one of the reference's formats."""
    assert model_format in FORMATS, model_format
    with open(path, "rb") as f:
        raw = f.read()
    try:
        state: Dict = flax_ser.msgpack_restore(raw)
    except Exception:
        # Legacy pickle checkpoint (pre round-2). pickle can execute code on
        # load — only use with checkpoints you produced yourself.
        log.warning("legacy pickle checkpoint %s — loading via pickle "
                    "(trusted sources only)", path)
        state = pickle.loads(raw)
    ignore = model_format == "params_only_ignore_missmatch"
    trainer.params = _partial_merge(trainer.params, state["params"], ignore)
    if model_format in ("full", "state_dict"):
        from ..ops.occupancy import OccupancyGrid
        trainer.occ = OccupancyGrid(occupancy=jnp.asarray(state["occupancy"]),
                                    mask=jnp.asarray(state["occ_mask"]),
                                    level=int(state["occ_level"]))
        trainer.lod_w = jnp.asarray(state["lod_weights"])
        trainer.epoch = int(state["epoch"])
        trainer.global_step = int(state["global_step"])
        occ_frac = float(np.asarray(trainer.occ.mask).mean())
        if "pruned" in state:
            trainer._pruned = bool(state["pruned"])
            trainer._occ_frac = float(state["occ_frac"])
        else:
            # legacy (round-2) checkpoint: derive from the restored mask — any
            # prune leaves occupancy below fully-dense
            trainer._pruned = occ_frac < 1.0
            trainer._occ_frac = occ_frac
        if "real_pruned" in state:
            trainer._real_pruned = bool(state["real_pruned"])
        else:
            # field absent (pre-round-4 / early-round-4 checkpoints): derive
            # from the prune schedule — defaulting to False re-enables seed
            # refreshes AFTER the real prune on resume, which shrink-only
            # mutates the post-prune mask (ADVICE r4 #3; observed on the
            # flagship 120v run)
            trainer._real_pruned = derive_real_pruned(
                trainer.cfg, trainer.epoch, trainer._pruned)
        try:
            # restore through the live opt_state's structure (msgpack stores a
            # plain nested dict; optax states are namedtuple pytrees)
            trainer.opt_state = jax.tree.map(jnp.asarray, flax_ser.from_state_dict(
                trainer.opt_state, state["opt_state"]))
        except Exception:
            log.warning("optimizer state incompatible; reinitialised")
            trainer.opt_state = trainer.tx.init(trainer.params)
    log.info("loaded checkpoint %s (format=%s)", path, model_format)
