"""Shallow MLP decoder (feature-major).

Equivalent of wisp ``BasicDecoder`` as configured by the reference NeFs
(/root/reference/pc_nerf/panoptic_nef.py:108-164): ``num_layers`` hidden layers with a
configurable activation, followed by a linear output layer (``lout``).

TPU layout: activations are feature-major [C, N] — the huge sample axis stays on the
128-lane minor dim, so a [N, 16] activation never becomes a lane-padded [N, 128]
monster (see ops/permuto_encoding.py for the tiling rationale). ``DenseT`` keeps
nn.Dense-compatible parameter names/shapes (kernel [Cin, Cout], bias [Cout]) so
checkpoints are interchangeable; the matmul is kernel^T @ x on the MXU. Computation
runs in ``compute_dtype`` (bfloat16 on TPU mirrors the reference's AMP autocast,
pc_nerf/trainer.py:429).
"""
from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax
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


class DenseT(nn.Module):
    """Feature-major linear layer: x [Cin, N] -> [Cout, N].

    Parameter layout matches nn.Dense (kernel [Cin, Cout], bias [Cout]).
    """

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    bias_init: Callable = nn.initializers.zeros
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[0]
        kernel = self.param("kernel", self.kernel_init,
                            (cin, self.features))
        y = jax.lax.dot_general(kernel.astype(self.dtype), x.astype(self.dtype),
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=self.dtype)  # [Cout, N]
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,))
            y = y + bias.astype(self.dtype)[:, None]
        return y


class BasicDecoder(nn.Module):
    """num_layers hidden layers + linear output head, on [Cin, N] activations.

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
    # Zero-init the output layer's kernel: the head starts at exactly its bias
    # (uniform softmax for probability heads). Hidden layers receive zero
    # gradient only until the first lout update — standard zero-head init.
    zero_init_output: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        act = get_activation(self.activation)
        x = x.astype(self.compute_dtype)
        h = x
        for i in range(self.num_layers):
            if i in tuple(self.skip):
                h = jnp.concatenate([h, x], axis=0)
            h = DenseT(self.hidden_dim, name=f"hidden_{i}",
                       dtype=self.compute_dtype)(h)
            h = act(h)

        def bias_init(key, shape, dtype=jnp.float32):
            b = jnp.zeros(shape, dtype)
            if self.output_bias_init is not None:
                for i, v in enumerate(self.output_bias_init):
                    b = b.at[i].set(v)
            return b

        kinit = (nn.initializers.zeros if self.zero_init_output
                 else nn.initializers.lecun_normal())
        out = DenseT(self.output_dim, name="lout", bias_init=bias_init,
                     kernel_init=kinit, dtype=self.compute_dtype)(h)
        return out.astype(jnp.float32)
