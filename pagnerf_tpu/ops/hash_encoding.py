"""Multiresolution hash encoding (Instant-NGP style), TPU-native.

Reimplements the algorithm the reference documents in pure torch at
/root/reference/grids/hash_grid_torch.py:13-108 (XOR-prime spatial hash, 8-corner
lookup, trilinear interpolation, per-level tables, geometric resolution schedule) and
wraps with the same API surface as the reference's ``HashGrid`` wrappers
(grids/hash_grid_torch.py:110-140, grids/hash_grid_tinycudann.py:24-47).

TPU design notes:
  * All levels are evaluated in one batched pass: tables are a single [L, T, F] array
    and the per-level lookup is ``vmap``-ed over L, producing one large fused gather
    that XLA lowers to native TPU dynamic-gather. No Python loop over levels.
  * Corner weights are computed once as an [N, 8] tensor and contracted against the
    gathered [L, N, 8, F] features — an elementwise-mul + reduce that XLA fuses.
  * Tables can be held in bfloat16 (the reference casts encodings to half under AMP,
    grids/permuto_grid.py:65); gradients accumulate in fp32 via ``preferred dtype``.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

# XOR-hash primes, identical to the reference (grids/hash_grid_torch.py:18).
_PRIMES = (1, 2654435761, 805459861)


def geometric_resolutions(base_resolution: int, finest_resolution: int,
                          num_levels: int) -> np.ndarray:
    """Per-level grid resolutions: floor(base * b^i) with geometric growth factor b
    (reference: grids/hash_grid_torch.py:59,99)."""
    if num_levels == 1:
        return np.array([base_resolution], dtype=np.int32)
    b = np.exp((np.log(finest_resolution) - np.log(base_resolution)) / (num_levels - 1))
    return np.floor(base_resolution * b ** np.arange(num_levels)).astype(np.int32)


def init_hash_table(key: jax.Array, num_levels: int, table_size: int,
                    feature_dim: int, init_std: float = 1e-4,
                    dtype=jnp.float32) -> jnp.ndarray:
    """[L, T, F] feature tables, uniform in [-init_std, init_std]
    (reference init: grids/hash_grid_torch.py:63-65)."""
    return jax.random.uniform(key, (num_levels, table_size, feature_dim),
                              minval=-init_std, maxval=init_std, dtype=jnp.float32
                              ).astype(dtype)


def _spatial_hash(corner_idx: jnp.ndarray, log2_table_size: int) -> jnp.ndarray:
    """XOR-prime spatial hash of integer corner coords [..., 3] -> flat table indices.

    Matches the reference hash exactly (grids/hash_grid_torch.py:13-24): wraparound
    uint32 multiply, XOR-combine, mask to table size.
    """
    c = corner_idx.astype(jnp.uint32)
    h = c[..., 0] * jnp.uint32(_PRIMES[0])
    h = h ^ (c[..., 1] * jnp.uint32(_PRIMES[1]))
    h = h ^ (c[..., 2] * jnp.uint32(_PRIMES[2]))
    return (h & jnp.uint32((1 << log2_table_size) - 1)).astype(jnp.int32)


def _spatial_hash_T(corner_idx: jnp.ndarray, log2_table_size: int) -> jnp.ndarray:
    """Feature-major spatial hash: corner coords [3, V, N] -> indices [V, N]."""
    c = corner_idx.astype(jnp.uint32)
    h = c[0] * jnp.uint32(_PRIMES[0])
    h = h ^ (c[1] * jnp.uint32(_PRIMES[1]))
    h = h ^ (c[2] * jnp.uint32(_PRIMES[2]))
    return (h & jnp.uint32((1 << log2_table_size) - 1)).astype(jnp.int32)


# The 8 voxel-corner offsets in zyx bit order, matching BOX_OFFSETS ordering of the
# reference (grids/hash_grid_torch.py:10): index b -> (b>>2 & 1, b>>1 & 1, b & 1).
_CORNERS = np.array([[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)],
                    dtype=np.int32)  # [8, 3]


def hash_encode_T(tables: jnp.ndarray, coordsT: jnp.ndarray,
                  resolutions: Sequence[int] | np.ndarray,
                  compute_dtype=jnp.float32) -> jnp.ndarray:
    """Encode coords [3, N] in [-1, 1] against multiresolution hash tables [L, T, F].

    Returns featsT [L*F, N] concatenated level features (multiscale 'cat', the mode
    the reference always uses internally: panoptic_nef.py:193).

    TPU layout note: the sample axis stays MINOR throughout — TPU pads the minor dim
    to 128 lanes, so [N, 8]/[N, 3] sample-scale tensors would cost 16-42x their
    logical size; in [8, N]/[3, N] layout padding is negligible.
    """
    num_levels, table_size, feat_dim = tables.shape
    log2_t = int(np.log2(table_size))
    assert (1 << log2_t) == table_size, "table size must be a power of two"
    res = jnp.asarray(np.asarray(resolutions), jnp.float32)  # [L]

    x = jnp.clip(coordsT, -1.0, 1.0).astype(jnp.float32)     # [3, N]
    n = x.shape[1]
    cornersT = jnp.asarray(_CORNERS.T)                       # [3, 8]

    from .table_gather import multilevel_table_gather

    def level_index(r):
        # Voxel-grid coords in [0, r]; bottom-left corner and fractional offset.
        cell = (x + 1.0) * (r / 2.0)                           # [3, N]
        bl = jnp.floor(cell)
        frac = cell - bl                                       # [3, N] in [0, 1)
        corners = bl.astype(jnp.int32)[:, None, :] + cornersT[:, :, None]  # [3,8,N]
        idx = _spatial_hash_T(corners, log2_t)                 # [8, N]
        # Trilinear weights per corner: prod over axes of (frac or 1-frac).
        w = jnp.where(cornersT[:, :, None].astype(bool),
                      frac[:, None, :], 1.0 - frac[:, None, :])  # [3, 8, N]
        return idx, w[0] * w[1] * w[2]                         # [8,N], [8,N]

    # Per-level voxel math is cheap VPU work; the gathers for all levels run as ONE
    # fused op (Pallas kernel on TPU).
    idx, w = jax.vmap(level_index)(res)                        # [L, 8, N] x2
    per_level = multilevel_table_gather(tables.astype(compute_dtype), idx,
                                        w.astype(compute_dtype))   # [L, F, N]
    return per_level.reshape(num_levels * feat_dim, n)


def hash_encode(tables: jnp.ndarray, coords: jnp.ndarray,
                resolutions: Sequence[int] | np.ndarray,
                compute_dtype=jnp.float32) -> jnp.ndarray:
    """Sample-major wrapper: coords [N, 3] -> [N, L*F]."""
    return hash_encode_T(tables, coords.T, resolutions, compute_dtype).T


def hash_encode_dual_T(tables_a: jnp.ndarray, tables_b: jnp.ndarray,
                       coordsT: jnp.ndarray,
                       resolutions: Sequence[int] | np.ndarray,
                       compute_dtype=jnp.float32):
    """Encode against TWO same-spec table stacks with one shared voxel lattice —
    the delta-grid fusion (see ops/permuto_encoding.permuto_encode_dual_T and
    ops/table_gather.dual_multilevel_table_gather). Returns (featsA, featsB),
    each [L*F, N]; the B side's trilinear weights carry no coordinate gradient."""
    num_levels, table_size, feat_dim = tables_a.shape
    assert tables_b.shape == tables_a.shape, "dual encode needs same-spec tables"
    log2_t = int(np.log2(table_size))
    res = jnp.asarray(np.asarray(resolutions), jnp.float32)
    x = jnp.clip(coordsT, -1.0, 1.0).astype(jnp.float32)
    n = x.shape[1]
    cornersT = jnp.asarray(_CORNERS.T)

    from .table_gather import dual_multilevel_table_gather

    def level_index(r):
        cell = (x + 1.0) * (r / 2.0)
        bl = jnp.floor(cell)
        frac = cell - bl
        corners = bl.astype(jnp.int32)[:, None, :] + cornersT[:, :, None]
        idx = _spatial_hash_T(corners, log2_t)
        w = jnp.where(cornersT[:, :, None].astype(bool),
                      frac[:, None, :], 1.0 - frac[:, None, :])
        return idx, w[0] * w[1] * w[2]

    idx, w = jax.vmap(level_index)(res)
    out_a, out_b = dual_multilevel_table_gather(
        tables_a.astype(compute_dtype), tables_b.astype(compute_dtype),
        idx, w.astype(compute_dtype))
    return (out_a.reshape(num_levels * feat_dim, n),
            out_b.reshape(num_levels * feat_dim, n))


class HashEncodingSpec:
    """Static spec for a multiresolution hash encoder (shapes, resolutions).

    Mirrors the construction parameters of the reference HashGrid wrappers
    (grids/hash_grid_torch.py:49-57: n_levels, n_features_per_level,
    log2_hashmap_size, base/finest resolution).
    """

    def __init__(self, num_levels: int = 16, feature_dim: int = 2,
                 log2_table_size: int = 19, base_resolution: int = 16,
                 finest_resolution: int = 512):
        self.num_levels = num_levels
        self.feature_dim = feature_dim
        self.log2_table_size = log2_table_size
        self.table_size = 1 << log2_table_size
        self.resolutions = geometric_resolutions(base_resolution, finest_resolution,
                                                 num_levels)
        self.output_dim = num_levels * feature_dim

    def init(self, key: jax.Array, dtype=jnp.float32) -> jnp.ndarray:
        return init_hash_table(key, self.num_levels, self.table_size,
                               self.feature_dim, dtype=dtype)

    def encode(self, tables: jnp.ndarray, coords: jnp.ndarray,
               compute_dtype=jnp.float32) -> jnp.ndarray:
        return hash_encode(tables, coords, self.resolutions, compute_dtype)

    def encode_T(self, tables: jnp.ndarray, coordsT: jnp.ndarray,
                 compute_dtype=jnp.float32) -> jnp.ndarray:
        return hash_encode_T(tables, coordsT, self.resolutions, compute_dtype)

    def encode_dual_T(self, tables_a: jnp.ndarray, tables_b: jnp.ndarray,
                      coordsT: jnp.ndarray, compute_dtype=jnp.float32):
        return hash_encode_dual_T(tables_a, tables_b, coordsT, self.resolutions,
                                  compute_dtype)
