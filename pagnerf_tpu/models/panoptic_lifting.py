"""Panoptic-Lifting baseline NeF (TensoRF grid).

TPU-native equivalent of /root/reference/pc_nerf/panoptic_lifting.py: TensoRF VM grid
for density + appearance, an ``MLPRenderFeature`` colour decoder (pe_view=2, pe_feat=2,
width 128; panoptic_lifting.py:265-300), and semantic/instance heads decoded directly
from raw coordinates (panoptic_lifting.py:242-260) — the Panoptic Lifting paper's
architecture."""
from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .decoder import BasicDecoder
from .nefs import Channels, GridConfig
from .tensorf import TensoRFGrid


def _pe_T(xT: jnp.ndarray, freqs: int) -> jnp.ndarray:
    """Feature-major MLPRenderFeature.positional_encoding
    (panoptic_lifting.py:295-300): [D, N] -> [2*freqs*D, N]."""
    bands = 2.0 ** jnp.arange(freqs, dtype=xT.dtype)
    pts = (xT[None] * bands[:, None, None]).reshape(-1, xT.shape[1])
    return jnp.concatenate([jnp.sin(pts), jnp.cos(pts)], axis=0)


class MLPRenderFeature(nn.Module):
    """reference panoptic_lifting.py:265-293 (feature-major [C, N] activations)."""

    out_channels: int = 3
    pe_view: int = 2
    pe_feat: int = 2
    dim_mlp_color: int = 128

    @nn.compact
    def __call__(self, viewdirsT: jnp.ndarray, featuresT: jnp.ndarray) -> jnp.ndarray:
        from .decoder import DenseT
        indata = [featuresT]
        if self.pe_view > 0 or self.pe_feat > 0:
            indata.append(viewdirsT)
        if self.pe_feat > 0:
            indata.append(_pe_T(featuresT, self.pe_feat))
        if self.pe_view > 0:
            indata.append(_pe_T(viewdirsT, self.pe_view))
        h = jnp.concatenate(indata, axis=0)
        h = nn.relu(DenseT(self.dim_mlp_color)(h))
        h = nn.relu(DenseT(self.dim_mlp_color)(h))
        out = DenseT(self.out_channels)(h)
        return jax.nn.sigmoid(out)


class PanopticLiftingNeF(nn.Module):
    """reference pc_nerf/panoptic_lifting.py (panoptic_lifting_app.yaml)."""

    grid: GridConfig = GridConfig(grid_type="TensoRF")
    num_classes: int = 20
    num_instances: int = 200
    hidden_dim: int = 128
    sem_softmax: bool = True
    sem_sigmoid: bool = False
    sem_normalize: bool = False
    inst_softmax: bool = True
    inst_sigmoid: bool = False
    inst_normalize: bool = False

    def setup(self):
        self.grid_module = TensoRFGrid(
            density_n_comp=self.grid.density_n_comp,
            app_n_comp=self.grid.app_n_comp,
            resolution=self.grid.resolution, name="grid")
        self.decoder_color = MLPRenderFeature(name="decoder_color")
        self.decoder_semantics = BasicDecoder(
            output_dim=self.num_classes, hidden_dim=self.hidden_dim, num_layers=2,
            activation="relu", name="decoder_semantics")
        self.decoder_inst = BasicDecoder(
            output_dim=self.num_instances, hidden_dim=self.hidden_dim, num_layers=2,
            activation="relu", name="decoder_inst")

    def __call__(self, coordsT: jnp.ndarray, ray_dT: Optional[jnp.ndarray],
                 channels: Channels,
                 lod_weights=None) -> Dict[str, jnp.ndarray]:
        """coordsT/ray_dT [3, N] -> {channel: [C, N]} (feature-major)."""
        out: Dict[str, jnp.ndarray] = {}
        if not channels:
            return out
        if channels & {"density", "rgb"}:
            density_feats, color_feats = self.grid_module(coordsT)
            density = jax.nn.relu(density_feats)[None, :]        # [1, N]
            if "density" in channels:
                out["density"] = density
        if "rgb" in channels:
            out["rgb"] = self.decoder_color(-ray_dT, color_feats)
        if "semantics" in channels:
            s = self.decoder_semantics(coordsT)
            if self.sem_sigmoid:
                s = jax.nn.sigmoid(s)
            if self.sem_normalize:
                s = s / (jnp.linalg.norm(s, axis=0, keepdims=True) + 1e-12)
            if self.sem_softmax:
                s = jax.nn.softmax(s, axis=0)
            out["semantics"] = s
        if "inst_embedding" in channels:
            e = self.decoder_inst(coordsT)
            if self.inst_sigmoid:
                e = jax.nn.sigmoid(e)
            if self.inst_normalize:
                e = e / (jnp.linalg.norm(e, axis=0, keepdims=True) + 1e-12)
            if self.inst_softmax:
                e = jax.nn.softmax(e, axis=0)
            out["inst_embedding"] = e
        return out

    def supported_channels(self) -> Channels:
        return frozenset({"density", "rgb", "semantics", "inst_embedding"})
