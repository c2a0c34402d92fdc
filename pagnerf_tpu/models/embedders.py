"""Positional (Fourier-feature) embedder.

Equivalent of wisp ``get_positional_embedder`` consumed by the reference NeFs for view
directions and panoptic positional features (/root/reference/pc_nerf/panoptic_nef.py:72-77,
panoptic_delta_nef.py:46-53; configs: embedder.view_multires=4, embedder.pos_multires=10).
"""
from __future__ import annotations

import jax.numpy as jnp


def positional_embed_dim(multires: int, input_dim: int = 3,
                         include_input: bool = True, active: bool = True) -> int:
    if not active:
        return input_dim
    return input_dim * (2 * multires + (1 if include_input else 0))


def positional_embed(x: jnp.ndarray, multires: int,
                     include_input: bool = True, active: bool = True) -> jnp.ndarray:
    """[..., D] -> [..., D * (2*multires + include_input)]: x, sin(2^i x), cos(2^i x)."""
    if not active:
        return x
    freqs = 2.0 ** jnp.arange(multires, dtype=x.dtype)           # [M]
    xf = x[..., None, :] * freqs[:, None]                        # [..., M, D]
    enc = jnp.concatenate([jnp.sin(xf), jnp.cos(xf)], axis=-1)   # [..., M, 2D]
    enc = enc.reshape(*x.shape[:-1], -1)
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc


def positional_embed_T(xT: jnp.ndarray, multires: int,
                       include_input: bool = True,
                       active: bool = True) -> jnp.ndarray:
    """Feature-major variant: [D, N] -> [D * (2*multires + include_input), N]
    (sample axis stays on lanes — see ops/permuto_encoding.py layout note)."""
    if not active:
        return xT
    freqs = 2.0 ** jnp.arange(multires, dtype=xT.dtype)          # [M]
    xf = xT[None, :, :] * freqs[:, None, None]                   # [M, D, N]
    d, n = xT.shape
    enc = jnp.concatenate([jnp.sin(xf), jnp.cos(xf)], axis=1)    # [M, 2D, N]
    enc = enc.reshape(multires * 2 * d, n)
    if include_input:
        enc = jnp.concatenate([xT, enc], axis=0)
    return enc
