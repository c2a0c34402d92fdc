"""bf16 mixed-precision training (--compute-dtype bfloat16): the TPU equivalent
of the reference's AMP autocast path (reference pc_nerf/trainer.py:429,582-584).
Grid gathers and decoder MLPs compute in bf16; master params, channel outputs and
losses stay fp32."""
import jax.numpy as jnp
import numpy as np

from pagnerf_tpu.config.config import parse_options
from pagnerf_tpu.config.factory import get_modules_from_config

SHRINK = [
    "--capacity-log-2", "10", "--delta-capacity-log-2", "10",
    "--num-lods", "4", "--hidden-dim", "16",
    "--num-rays-sampled-per-img", "32", "--render-batch", "64",
    "--synthetic-res", "24", "18", "--synthetic-num-views", "4",
    "--num-steps", "16", "--epochs", "4", "--batch-size", "2",
    "--sem-epoch-start", "0", "--inst-epoch-start", "0",
]


def build(dtype):
    args = parse_options(["--config", "configs/synthetic/tiny.yaml",
                          "--compute-dtype", dtype] + SHRINK)
    return get_modules_from_config(args)


def test_bf16_step_trains_and_params_stay_fp32():
    _, ds, trainer = build("bfloat16")
    assert trainer.pipeline.nef.compute_dtype == jnp.bfloat16
    rng = np.random.default_rng(0)
    stage = trainer.stage_for_epoch(1)
    losses = []
    for _ in range(8):
        batch = ds.sample_batch(rng, 2, 32)
        out = trainer.train_step(stage, batch)
        losses.append(float(out["rgb_loss"]))
        assert all(np.isfinite(float(v)) for v in out.values())
    assert losses[-1] < losses[0], f"bf16 rgb loss did not decrease: {losses}"
    # master params remain fp32 (loss-scaling-free bf16 regime)
    import jax
    for leaf in jax.tree.leaves(trainer.params):
        assert leaf.dtype == jnp.float32


def test_bf16_matches_fp32_trajectory_coarsely():
    """Same seed, same batches: the bf16 loss trajectory tracks fp32 within the
    bf16 precision envelope over a few steps (parity check, not bit-exactness)."""
    losses = {}
    for dtype in ("float32", "bfloat16"):
        _, ds, trainer = build(dtype)
        rng = np.random.default_rng(1)
        stage = trainer.stage_for_epoch(1)
        traj = []
        for _ in range(6):
            batch = ds.sample_batch(rng, 2, 32)
            traj.append(float(trainer.train_step(stage, batch)["rgb_loss"]))
        losses[dtype] = np.asarray(traj)
    rel = np.abs(losses["bfloat16"] - losses["float32"]) / losses["float32"]
    assert rel.max() < 0.15, (losses, rel)
