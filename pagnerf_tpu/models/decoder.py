"""Shallow MLP decoder.

Equivalent of wisp ``BasicDecoder`` as configured by the reference NeFs
(/root/reference/pc_nerf/panoptic_nef.py:108-164): ``num_layers`` hidden layers with a
configurable activation, followed by a linear output layer (``lout``). Hidden widths of
64 keep every matmul MXU-friendly once sample batches are large; computation runs in
``compute_dtype`` (bfloat16 on TPU mirrors the reference's AMP autocast,
pc_nerf/trainer.py:429).
"""
from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp


def get_activation(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Activation registry (wisp ``get_activation_class`` equivalent)."""
    acts = {
        "relu": nn.relu,
        "sin": jnp.sin,
        "selu": nn.selu,
        "gelu": nn.gelu,
        "none": lambda x: x,
        None: lambda x: x,
    }
    return acts[name]


class BasicDecoder(nn.Module):
    """num_layers hidden layers + linear output head.

    output_bias_init: optional per-unit bias initialisation for the output layer —
    the reference sets ``decoder_density.lout.bias.data[0] = 1.0``
    (panoptic_nef.py:123) so density starts positive.
    """

    output_dim: int
    hidden_dim: int = 64
    num_layers: int = 1
    activation: str = "relu"
    output_bias_init: Sequence[float] | None = None
    skip: Sequence[int] = ()
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = get_activation(self.activation)
        x = x.astype(self.compute_dtype)
        h = x
        for i in range(self.num_layers):
            if i in tuple(self.skip):
                h = jnp.concatenate([h, x], axis=-1)
            h = nn.Dense(self.hidden_dim, name=f"hidden_{i}", dtype=self.compute_dtype)(h)
            h = act(h)

        def bias_init(key, shape, dtype=jnp.float32):
            b = jnp.zeros(shape, dtype)
            if self.output_bias_init is not None:
                for i, v in enumerate(self.output_bias_init):
                    b = b.at[i].set(v)
            return b

        out = nn.Dense(self.output_dim, name="lout", bias_init=bias_init,
                       dtype=self.compute_dtype)(h)
        return out.astype(jnp.float32)
