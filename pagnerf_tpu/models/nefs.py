"""Panoptic neural fields.

TPU-native equivalents of the reference NeF family:
  * ``PanopticNeF``          — /root/reference/pc_nerf/panoptic_nef.py
  * ``PanopticDeltaNeF``     — pc_nerf/panoptic_delta_nef.py (the flagship PAg-NeRF
                               model: best.yaml:78)
  * ``PanopticDDensityNeF``  — pc_nerf/panoptic_dd_nef.py

Design notes (TPU-first):
  * The wisp "forward-function registry" becomes a single ``__call__`` with a static
    ``channels`` frozenset: requested channels gate which branches are traced, so XLA
    compiles exactly the compute needed (mirrors the ``compute_channels`` gating at
    panoptic_delta_nef.py:182-257, but resolved at trace time).
  * Stop-gradient contracts are reproduced exactly:
      - semantic/instance heads see detached colour features when ``sem_detach`` /
        ``inst_detach`` (panoptic_nef.py:338,353);
      - delta fusion: panop_feats = stop_grad(colour feats) + delta_grid(stop_grad(coords))
        (panoptic_delta_nef.py:214-226);
      - DD: panoptic_density = relu(stop_grad(raw density logit) + delta_density)
        (panoptic_dd_nef.py:248-252).
  * ``lod_weights`` is a traced input (not a parameter): the LoD annealer updates it
    per step on the host without retracing (consumed as panoptic_nef.py:300).
  * TPU layout: all sample-scale tensors are FEATURE-MAJOR — coords enter as
    ``coordsT`` [3, N], ray dirs as ``ray_dT`` [3, N], channels come out as
    [C, N]. TPU tiles the minor dim to 128 lanes, so keeping the huge sample axis
    minor avoids 8-42x lane-padding on every activation (see
    ops/permuto_encoding.py). Head MLPs are kernel^T @ x matmuls on the MXU.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, FrozenSet, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .decoder import BasicDecoder
from .embedders import positional_embed_T, positional_embed_dim
from .grids import build_grid

Channels = FrozenSet[str]


@dataclasses.dataclass(frozen=True)
class GridConfig:
    """Hashable grid settings (subset of the reference 'grid' config group,
    config_parser.py grid args; defaults = best.yaml:44-64)."""

    grid_type: str = "PermutoGrid"
    num_lods: int = 24
    feature_dim: int = 2
    capacity_log2: int = 18
    coarsest_scale: float = 1.0
    finest_scale: float = 0.0001
    log2_table_size: int = 19
    base_resolution: int = 16
    finest_resolution: int = 512
    base_lod: int = 5
    density_n_comp: int = 16
    app_n_comp: int = 48
    resolution: int = 128
    max_resolution: int = 192
    num_resolutions: int = 5
    compute_dtype: str = "float32"

    def build(self, name: str):
        kw = dataclasses.asdict(self)
        kw["compute_dtype"] = jnp.bfloat16 if kw["compute_dtype"] == "bfloat16" else jnp.float32
        return build_grid(kw.pop("grid_type"), name=name, **kw)

    @property
    def output_dim(self) -> int:
        if self.grid_type == "TensoRF":
            return 28
        return self.num_lods * self.feature_dim


def _multiscale(featsT: jnp.ndarray, num_lods: int, multiscale_type: str) -> jnp.ndarray:
    """'cat' keeps concatenated level features; 'sum' folds levels
    (panoptic_nef.py:301-302). Applied after LoD weighting, as in the reference.
    featsT is [L*F, N]."""
    if multiscale_type == "sum":
        n = featsT.shape[1]
        return featsT.reshape(num_lods, -1, n).sum(axis=0)
    return featsT


class PanopticNeF(nn.Module):
    """Base panoptic NeF: grid -> density/colour MLPs + semantic & instance heads
    (reference pc_nerf/panoptic_nef.py)."""

    grid: GridConfig = GridConfig()
    num_classes: int = 20
    num_instances: int = 200

    # net group (best.yaml:70-106)
    hidden_dim: int = 64
    num_layers: int = 1
    activation_type: str = "relu"
    sem_activation_type: Optional[str] = None
    sem_num_layers: Optional[int] = None
    sem_hidden_dim: Optional[int] = None
    sem_normalize: bool = False
    sem_softmax: bool = True
    sem_sigmoid: bool = False
    sem_detach: bool = True
    inst_num_layers: Optional[int] = None
    inst_hidden_dim: Optional[int] = None
    inst_normalize: bool = False
    inst_softmax: bool = True
    inst_sigmoid: bool = False
    inst_detach: bool = True
    inst_direct_pos: bool = False
    inst_soft_temperature: float = 0.0
    panoptic_features_type: Optional[str] = None
    multiscale_type: str = "cat"
    # Zero-init the semantic head's lout kernel so rendered class probabilities
    # start uniform (config.py sem-zero-init defaults this ON for config-driven
    # runs; see the flag comment there). Module default is OFF: zero-init also
    # zeroes the init-time gradient INTO the features (dlogits/dh = W = 0), so
    # library callers keep standard init unless they opt in.
    sem_zero_init: bool = False

    # embedder group
    view_multires: int = 4
    pos_multires: int = 10
    embedder_type: str = "positional"

    compute_dtype_name: str = "float32"

    # ------------------------------------------------------------------ setup
    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.compute_dtype_name == "bfloat16" else jnp.float32

    @property
    def effective_feature_dim(self) -> int:
        if self.multiscale_type == "sum":
            return self.grid.feature_dim
        return self.grid.output_dim

    @property
    def view_embed_dim(self) -> int:
        return positional_embed_dim(self.view_multires, 3, True,
                                    self.embedder_type == "positional")

    def _make_decoders(self):
        """Heads, mirroring reference init_decoder (panoptic_nef.py:108-164)."""
        cd = self.compute_dtype
        decoder_density = BasicDecoder(
            output_dim=16, hidden_dim=self.hidden_dim, num_layers=self.num_layers,
            activation=self.activation_type, output_bias_init=(1.0,),
            compute_dtype=cd, name="decoder_density")
        decoder_color = BasicDecoder(
            output_dim=3, hidden_dim=self.hidden_dim, num_layers=self.num_layers + 1,
            activation=self.activation_type, compute_dtype=cd, name="decoder_color")
        sem_act = self.sem_activation_type or self.activation_type
        # TRUTHY fallbacks, like the reference (panoptic_nef.py:135): an
        # explicit 0 in a ported config means "use num_layers", not 0 layers
        decoder_semantics = BasicDecoder(
            output_dim=self.num_classes, hidden_dim=self.sem_hidden_dim or self.hidden_dim,
            num_layers=self.sem_num_layers or self.num_layers,
            activation=sem_act, compute_dtype=cd,
            zero_init_output=self.sem_zero_init, name="decoder_semantics")
        decoder_inst = BasicDecoder(
            output_dim=self.num_instances, hidden_dim=self.inst_hidden_dim or self.hidden_dim,
            num_layers=self.inst_num_layers or self.num_layers,
            activation=sem_act, compute_dtype=cd, name="decoder_inst")
        return decoder_density, decoder_color, decoder_semantics, decoder_inst

    def setup(self):
        if self.grid.grid_type == "TensoRF":
            # the reference's panoptic NeF registry rejects TensoRF up front
            # (panoptic_nef.py:180-181); its (sigma, app) tuple output does not
            # fit the shared feature pipeline — use models/tensorf.py's NeF
            raise NotImplementedError(
                "TensoRF grids are not supported by the panoptic NeFs "
                "(reference parity); use the TensoRF NeF (models/tensorf.py)")
        self.grid_module = self.grid.build("grid")
        (self.decoder_density, self.decoder_color,
         self.decoder_semantics, self.decoder_inst) = self._make_decoders()

    # --------------------------------------------------------------- helpers
    def _post_grid(self, featsT: jnp.ndarray,
                   lod_weights: Optional[jnp.ndarray]) -> jnp.ndarray:
        if lod_weights is not None:
            featsT = featsT * lod_weights.astype(featsT.dtype)[:, None]
        return _multiscale(featsT, self.grid.num_lods, self.multiscale_type)

    def _grid_feats(self, grid_module, coordsT: jnp.ndarray,
                    lod_weights: Optional[jnp.ndarray]) -> jnp.ndarray:
        return self._post_grid(grid_module(coordsT), lod_weights)  # [L*F, N]

    def _density(self, featsT: jnp.ndarray):
        density_feats = self.decoder_density(featsT)               # [16, N]
        density = jax.nn.relu(density_feats[0:1, :])               # [1, N]
        return density_feats, density

    def _rgb(self, density_featsT: jnp.ndarray, ray_dT: jnp.ndarray) -> jnp.ndarray:
        vdir = positional_embed_T(-ray_dT, self.view_multires, True,
                                  self.embedder_type == "positional")
        fdir = jnp.concatenate([density_featsT, vdir], axis=0)
        return jax.nn.sigmoid(self.decoder_color(fdir))            # [3, N]

    def _semantics(self, sem_inputT: jnp.ndarray) -> jnp.ndarray:
        s = self.decoder_semantics(sem_inputT)                     # [C, N]
        if self.sem_sigmoid:
            s = jax.nn.sigmoid(s)
        if self.sem_normalize:
            s = s / (jnp.linalg.norm(s, axis=0, keepdims=True) + 1e-12)
        if self.sem_softmax:
            s = jax.nn.softmax(s, axis=0)
        return s

    def _inst(self, inst_inputT: jnp.ndarray) -> jnp.ndarray:
        """Delta-NeF instance decode chain (panoptic_delta_nef.py:251-255):
        sigmoid -> normalize -> /temperature -> softmax, all composable."""
        e = self.decoder_inst(inst_inputT)                         # [M, N]
        if self.inst_sigmoid:
            e = jax.nn.sigmoid(e)
        if self.inst_normalize:
            e = e / (jnp.linalg.norm(e, axis=0, keepdims=True) + 1e-12)
        if self.inst_soft_temperature > 0.0:
            e = e / self.inst_soft_temperature
        if self.inst_softmax:
            e = jax.nn.softmax(e, axis=0)
        return e

    def _inst_base(self, inst_inputT: jnp.ndarray) -> jnp.ndarray:
        """BASE-NeF instance decode (panoptic_nef.py:358-361): the softmax
        branch re-decodes the RAW logits — sigmoid/normalize are discarded —
        and there is no temperature (that belongs to the delta chain above)."""
        e = self.decoder_inst(inst_inputT)                         # [M, N]
        if self.inst_softmax:
            return jax.nn.softmax(e, axis=0)
        if self.inst_sigmoid:
            e = jax.nn.sigmoid(e)
        if self.inst_normalize:
            e = e / (jnp.linalg.norm(e, axis=0, keepdims=True) + 1e-12)
        return e

    # --------------------------------------------------------------- forward
    def __call__(self, coordsT: jnp.ndarray, ray_dT: Optional[jnp.ndarray],
                 channels: Channels,
                 lod_weights: Optional[jnp.ndarray] = None) -> Dict[str, jnp.ndarray]:
        """coordsT [3, N], ray_dT [3, N] -> dict of requested channels, each [C, N]
        (reference rgb_semantics, panoptic_nef.py:253-363)."""
        out: Dict[str, jnp.ndarray] = {}
        if not channels:
            return out
        feats = self._grid_feats(self.grid_module, coordsT, lod_weights)

        if channels & {"density", "rgb", "semantics", "inst_embedding"}:
            density_feats, density = self._density(feats)
            if "density" in channels:
                out["density"] = density
        if "rgb" in channels:
            out["rgb"] = self._rgb(density_feats, ray_dT)
        if "semantics" in channels:
            sem_input = jax.lax.stop_gradient(feats) if self.sem_detach else feats
            out["semantics"] = self._semantics(sem_input)
        if "inst_embedding" in channels:
            if self.inst_direct_pos:
                inst_input = coordsT
            else:
                inst_input = jax.lax.stop_gradient(feats) if self.inst_detach else feats
            out["inst_embedding"] = self._inst_base(inst_input)
        return out

    def supported_channels(self) -> Channels:
        return frozenset({"density", "rgb", "semantics", "inst_embedding"})


# Grid types whose modules expose .spec/.tables for the shared-lattice dual encode.
_DUAL_FUSABLE = frozenset({"PermutoGrid", "HashGrid", "HashGridTorch",
                           "HashGridTinyCudaNN", "CodebookOctreeGrid"})


class PanopticDeltaNeF(PanopticNeF):
    """Delta-grid panoptic NeF — THE PAg-NeRF model (reference
    pc_nerf/panoptic_delta_nef.py; best.yaml nef_type). Panoptic features are additive
    corrections over stop-gradient colour features."""

    delta_grid: Optional[GridConfig] = None
    delta_num_layers: int = 1
    delta_hidden_dim: int = 64
    # Fused dual-grid encode: when the delta grid has the same spec as the main
    # grid, both tables are gathered at ONE shared lattice (the delta grid queries
    # stop-gradient copies of the same coords, panoptic_delta_nef.py:215, so
    # indices/barycentrics are numerically identical) and both table gradients
    # scatter through one one-hot build (ops/table_gather.dual_multilevel_table_gather).
    fuse_dual_grid: bool = True

    def setup(self):
        super().setup()
        if self.panoptic_features_type in ("delta", "separate", None):
            cfg = self.delta_grid or self.grid
            self.delta_grid_module = cfg.build("delta_grid")

    def _can_fuse_dual(self, check_pft: bool = True) -> bool:
        """check_pft=False is the DD variant's predicate: its delta grid always
        exists and fuses regardless of panoptic_features_type."""
        return (self.fuse_dual_grid
                and (not check_pft
                     or self.panoptic_features_type in ("delta", None))
                and (self.delta_grid is None or self.delta_grid == self.grid)
                and self.grid.grid_type in _DUAL_FUSABLE)

    def _delta_fused_feats(self, coordsT, feats, lod_weights,
                           separate: bool = False):
        """Non-fused delta fusion (panoptic_delta_nef.py:211-236): delta grid at
        DETACHED coords, added to DETACHED main feats ('separate': delta alone)."""
        delta_feats = self._grid_feats(self.delta_grid_module,
                                       jax.lax.stop_gradient(coordsT),
                                       lod_weights)
        if separate:
            return delta_feats
        return jax.lax.stop_gradient(feats) + delta_feats

    def _dual_feats(self, coordsT, lod_weights):
        """Shared-lattice gather of main + delta tables. Returns
        (feats, panop_feats) with the exact delta stop-grad contract."""
        fa, fb = self.grid_module.spec.encode_dual_T(
            self.grid_module.tables, self.delta_grid_module.tables, coordsT,
            compute_dtype=self.grid_module.compute_dtype)
        feats = self._post_grid(fa, lod_weights)
        delta_feats = self._post_grid(fb, lod_weights)
        return feats, jax.lax.stop_gradient(feats) + delta_feats

    def _panoptic_feats(self, coordsT, feats, lod_weights):
        """Grid additive fusion (panoptic_delta_nef.py:211-236). All [C, N]."""
        pft = self.panoptic_features_type
        if pft in ("delta", "separate", None):
            return self._delta_fused_feats(coordsT, feats, lod_weights,
                                           separate=pft == "separate")
        if pft == "appearance":
            return jax.lax.stop_gradient(feats)
        if pft == "pos_encoding":
            return positional_embed_T(coordsT, self.pos_multires, True, True)
        if pft == "position":
            return coordsT
        raise ValueError(f'panoptic feature type "{pft}" not implemented')

    def __call__(self, coordsT, ray_dT, channels, lod_weights=None):
        out: Dict[str, jnp.ndarray] = {}
        if not channels:
            return out
        need_panop = bool(channels & {"semantics", "inst_embedding"})
        panop_feats = None
        if need_panop and self._can_fuse_dual():
            feats, panop_feats = self._dual_feats(coordsT, lod_weights)
        else:
            feats = self._grid_feats(self.grid_module, coordsT, lod_weights)

        if channels & {"density", "rgb", "semantics", "inst_embedding"}:
            density_feats, density = self._density(feats)
            if "density" in channels:
                out["density"] = density
        if "rgb" in channels:
            out["rgb"] = self._rgb(density_feats, ray_dT)
        if need_panop:
            if panop_feats is None:
                panop_feats = self._panoptic_feats(coordsT, feats, lod_weights)
            if "semantics" in channels:
                out["semantics"] = self._semantics(panop_feats)
            if "inst_embedding" in channels:
                out["inst_embedding"] = self._inst(panop_feats)
        return out


class PanopticDDensityNeF(PanopticDeltaNeF):
    """Delta-density panoptic NeF (reference pc_nerf/panoptic_dd_nef.py): adds a
    ``delta_density`` head so panoptic channels integrate under their own
    transmittance (consumed by the DD tracer)."""

    separate_sem_grid: bool = False

    def setup(self):
        PanopticNeF.setup(self)
        # the DD variant always has a delta grid (dd_nef init_grid, dd_nef.py:58-62)
        cfg = self.delta_grid or self.grid
        self.delta_grid_module = cfg.build("delta_grid")
        dd_hidden = self.delta_hidden_dim if self.delta_num_layers > 0 else self.effective_feature_dim
        self.decoder_delta_density = BasicDecoder(
            output_dim=1, hidden_dim=dd_hidden, num_layers=self.delta_num_layers,
            activation="none", compute_dtype=self.compute_dtype,
            name="decoder_delta_density")

    def __call__(self, coordsT, ray_dT, channels, lod_weights=None):
        out: Dict[str, jnp.ndarray] = {}
        if not channels:
            return out
        panop_needed = channels & {"delta_density", "panoptic_density", "semantics",
                                   "inst_embedding"}
        fuse = (bool(panop_needed) and not self.separate_sem_grid
                and self._can_fuse_dual(check_pft=False))
        panop_feats = None
        if fuse:
            feats, panop_feats = self._dual_feats(coordsT, lod_weights)
        else:
            feats = self._grid_feats(self.grid_module, coordsT, lod_weights)

        need_density = bool(channels & {"density", "rgb"}) or (
            "panoptic_density" in channels and not self.separate_sem_grid)
        if need_density:
            density_feats, density = self._density(feats)
            if "density" in channels:
                out["density"] = density
        if "rgb" in channels:
            out["rgb"] = self._rgb(density_feats, ray_dT)

        if panop_needed and panop_feats is None:
            panop_feats = self._delta_fused_feats(coordsT, feats, lod_weights,
                                                  separate=self.separate_sem_grid)

        if channels & {"delta_density", "panoptic_density"}:
            delta_density = self.decoder_delta_density(panop_feats)  # [1, N]
            if "delta_density" in channels:
                out["delta_density"] = delta_density
        if "panoptic_density" in channels:
            # stop-grad of the RAW density logit (pre-relu), dd_nef.py:248-252
            base = jax.lax.stop_gradient(density_feats[0:1, :]) \
                if not self.separate_sem_grid else 0.0
            out["panoptic_density"] = jax.nn.relu(base + delta_density)
        if "semantics" in channels:
            out["semantics"] = self._semantics(panop_feats)
        if "inst_embedding" in channels:
            out["inst_embedding"] = self._inst(panop_feats)
        return out

    def supported_channels(self) -> Channels:
        return frozenset({"density", "rgb", "delta_density", "panoptic_density",
                          "semantics", "inst_embedding"})
