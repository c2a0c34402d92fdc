"""RenderBuffer pytree.

TPU-native equivalent of ``wisp.core.RenderBuffer`` (returned by the reference tracer at
/root/reference/tracers/panoptic_packed_rf_tracer.py:195). Channels are optional fields;
absent channels are ``None`` so XLA never materialises them. The buffer is a pytree, so
it passes through ``jit`` and collectives unchanged.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import struct

# Channel names the panoptic tracer may produce
# (reference: tracers/panoptic_packed_rf_tracer.py:27-41).
RENDER_CHANNELS = ("rgb", "depth", "alpha", "hit", "semantics", "inst_embedding",
                   "panoptic_alpha", "ray_sparsity_loss")


@struct.dataclass
class RenderBuffer:
    rgb: Optional[jnp.ndarray] = None
    depth: Optional[jnp.ndarray] = None
    alpha: Optional[jnp.ndarray] = None
    hit: Optional[jnp.ndarray] = None
    semantics: Optional[jnp.ndarray] = None
    inst_embedding: Optional[jnp.ndarray] = None
    panoptic_alpha: Optional[jnp.ndarray] = None
    ray_sparsity_loss: Optional[jnp.ndarray] = None

    def channels(self) -> Dict[str, jnp.ndarray]:
        return {k: getattr(self, k) for k in RENDER_CHANNELS if getattr(self, k) is not None}

    def reshape(self, *shape) -> "RenderBuffer":
        """Reshape the ray axes of every present channel, keeping feature dims."""
        def _r(x):
            if x is None:
                return None
            feat = x.shape[-1:] if x.ndim > 1 else ()
            return x.reshape(*shape, *feat)
        return RenderBuffer(**{k: _r(getattr(self, k)) for k in RENDER_CHANNELS})

    @staticmethod
    def concatenate(buffers) -> "RenderBuffer":
        """Concatenate chunked renders along the ray axis (reference chunks renders at
        trainer.py:637-649 with ``rb += render(ray_pack)``)."""
        out: Dict[str, Any] = {}
        for k in RENDER_CHANNELS:
            vals = [getattr(b, k) for b in buffers]
            if vals[0] is not None:
                if vals[0].ndim == 0:  # scalar losses: sum
                    out[k] = sum(vals)
                else:
                    out[k] = jnp.concatenate(vals, axis=0)
        return RenderBuffer(**out)
