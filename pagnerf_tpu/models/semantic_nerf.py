"""Semantic-NeRF baseline NeF.

TPU-native equivalent of /root/reference/pc_nerf/semantic_nerf.py: a vanilla-NeRF MLP
(positional encoding, 8 layers with a skip connection at layer 5, semantic_nerf.py:48-55)
with a linear density head (bias init 1.0), a view-conditioned colour MLP and a
semantic head off the trunk features. Uses the dense occupancy grid as its only
acceleration structure (reference uses the featureless ``Occtree``,
semantic_nerf.py:90)."""
from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .decoder import BasicDecoder, DenseT
from .embedders import positional_embed_T
from .nefs import Channels, GridConfig


class SemanticNeF(nn.Module):
    """reference pc_nerf/semantic_nerf.py (semantic_nerf_app.yaml config)."""

    num_classes: int = 20
    num_instances: int = 2  # unused; kept for factory compatibility
    hidden_dim: int = 128
    activation_type: str = "relu"
    pos_multires: int = 10
    view_multires: int = 10
    sem_softmax: bool = True
    sem_sigmoid: bool = False
    sem_normalize: bool = False
    # grid protocol fields (featureless; only for lod_weights shape compatibility)
    grid: GridConfig = GridConfig(grid_type="HashGrid", num_lods=1, feature_dim=1)

    def setup(self):
        self.decoder_features = BasicDecoder(
            output_dim=self.hidden_dim, hidden_dim=self.hidden_dim, num_layers=8,
            skip=(5,), activation=self.activation_type, name="decoder_features")
        self.decoder_density = DenseT(
            1, bias_init=lambda k, s, d=jnp.float32: jnp.ones(s, d),
            name="decoder_density")
        self.decoder_color = BasicDecoder(
            output_dim=3, hidden_dim=self.hidden_dim // 2, num_layers=1,
            activation=self.activation_type, name="decoder_color")
        self.decoder_semantics = BasicDecoder(
            output_dim=self.num_classes, hidden_dim=self.hidden_dim // 2,
            num_layers=1, activation=self.activation_type, name="decoder_semantics")

    def __call__(self, coordsT: jnp.ndarray, ray_dT: Optional[jnp.ndarray],
                 channels: Channels,
                 lod_weights=None) -> Dict[str, jnp.ndarray]:
        """coordsT/ray_dT [3, N] -> {channel: [C, N]} (feature-major, see
        models/nefs.py layout note)."""
        out: Dict[str, jnp.ndarray] = {}
        if not channels:
            return out
        feats = self.decoder_features(positional_embed_T(coordsT, self.pos_multires))
        if channels & {"density", "rgb", "semantics"}:
            density = jax.nn.relu(self.decoder_density(feats))
            if "density" in channels:
                out["density"] = density
        if "rgb" in channels:
            vdir = positional_embed_T(-ray_dT, self.view_multires)
            fdir = jnp.concatenate([feats, vdir], axis=0)
            out["rgb"] = jax.nn.sigmoid(self.decoder_color(fdir))
        if "semantics" in channels:
            s = self.decoder_semantics(feats)
            if self.sem_sigmoid:
                s = jax.nn.sigmoid(s)
            if self.sem_normalize:
                s = s / (jnp.linalg.norm(s, axis=0, keepdims=True) + 1e-12)
            if self.sem_softmax:
                s = jax.nn.softmax(s, axis=0)
            out["semantics"] = s
        return out

    def supported_channels(self) -> Channels:
        return frozenset({"density", "rgb", "semantics"})
