"""Multiresolution permutohedral-lattice hash encoding, TPU-native.

Capability-equivalent of the CUDA ``permutohedral_encoding.PermutoEncoding`` the
reference wraps at /root/reference/grids/permuto_grid.py:57-70 (3-D input, capacity
2^18 tables, 24 levels x 2 features, geomspace scales coarsest->finest). The lattice
math follows the public permutohedral-lattice construction (Adams et al., "Fast
High-Dimensional Filtering Using the Permutohedral Lattice", 2010), which is also what
the CUDA library implements.

Why permutohedral on TPU: a 3-D simplex has d+1 = 4 vertices vs 8 voxel corners, so the
encoding does half the gathers of a hash grid per level. All per-level work is
``vmap``-ed into single fused gathers; rank/sort logic is a fixed 4x4 comparison
network — fully vectorised, no data-dependent control flow (jit/XLA friendly).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_D = 3            # input dimensionality
_VERTS = _D + 1   # simplex vertices

# Hash primes (first coordinate prime 1 keeps parity with the reference hash family,
# grids/hash_grid_torch.py:18; vertices are integer lattice keys).
_PRIMES = (1, 2654435761, 805459861)


def _elevation_matrix() -> np.ndarray:
    """E: R^3 -> R^4 embedding onto the sum-zero hyperplane H_d, scaled so lattice
    cells have unit size. Built by running the canonical elevation recurrence on the
    basis vectors."""
    inv_std_dev = np.sqrt(2.0 / 3.0) * _VERTS
    sf = np.array([inv_std_dev / np.sqrt((i + 1) * (i + 2)) for i in range(_D)])
    e = np.zeros((_VERTS, _D))
    for j in range(_D):
        vec = np.zeros(_D)
        vec[j] = sf[j]
        sm = 0.0
        col = np.zeros(_VERTS)
        for i in range(_D, 0, -1):
            cf = vec[i - 1]
            col[i] = sm - i * cf
            sm += cf
        col[0] = sm
        e[:, j] = col
    return e


_E = _elevation_matrix()  # [4, 3]


def _hash_keys_T(keys: jnp.ndarray, log2_capacity: int) -> jnp.ndarray:
    """Feature-major hash: keys [V, 3, N] -> indices [V, N]."""
    k = keys.astype(jnp.uint32)
    h = k[:, 0] * jnp.uint32(_PRIMES[0])
    h = h ^ (k[:, 1] * jnp.uint32(_PRIMES[1]))
    h = h ^ (k[:, 2] * jnp.uint32(_PRIMES[2]))
    return (h & jnp.uint32((1 << log2_capacity) - 1)).astype(jnp.int32)


def direct_level_specs(scales, capacity: int, feature_dim: int):
    """Per-level direct (collision-free) indexing spec for coords in [-1, 1]^3.

    Every lattice key coordinate of vertex/remainder r is ``4*m + r`` (the
    rounding to multiples of (d+1)=4 in simplex_vertices_and_weights_T), so a
    level whose key box fits the table can index entries DIRECTLY as
    ``r*Dm^3 + flatten(m + Mm)`` with zero collisions instead of hashing —
    exactly what tcnn does for under-capacity levels (a deliberate deviation
    from the always-hashing CUDA permuto library; strictly fewer collisions).
    The analytic key bound K = ceil(max_row_sum|E| / scale) + 8 covers rounding
    and rank-wrap shifts (verified against dense probes).

    Returns (Mm[L], Dm[L], direct_mask[L], rows_used[L]): per-level m-offset,
    m-range size, direct flag (Mm=0/Dm=1 for hashed levels so the vectorised
    index math cannot overflow), and the packed-row bound each direct level's
    indices can address (0 for hashed levels) — consumed by the MXU scatter to
    shrink its one-hot/dot (ops/table_gather.py)."""
    bound_base = float(np.abs(_E).sum(axis=1).max())
    mm, dm, mask, rows = [], [], [], []
    for s in np.asarray(scales):
        k_bound = int(np.ceil(bound_base / float(s))) + 8
        m_off = k_bound // 4 + 2
        d = 2 * m_off + 1
        cells = _VERTS * d ** 3
        if cells <= capacity:
            mm.append(m_off); dm.append(d); mask.append(True)
            rows.append(int(np.ceil(cells * feature_dim / 128.0)))
        else:
            mm.append(0); dm.append(1); mask.append(False); rows.append(0)
    return (np.asarray(mm, np.int32), np.asarray(dm, np.int32),
            np.asarray(mask), tuple(rows))


def _rank_and_el(scaledT: jnp.ndarray) -> tuple:
    """One level's (el, gr, rank) from scale-divided coords [3, N]: elevation
    onto the sum-zero hyperplane, nearest remainder-0 point (wrap-adjusted),
    and per-coordinate differential rank. Shared by the simplex forward and
    the zero-residual lattice backward (which recomputes rather than saves)."""
    el = jnp.asarray(_E, scaledT.dtype) @ scaledT                # [4, N]

    # Closest remainder-0 lattice point by rounding to multiples of (d+1).
    gr = jnp.round(el / _VERTS) * _VERTS                         # [4, N]
    sum_val = jnp.sum(gr, axis=0) / _VERTS                       # [N] integer-valued

    # Rank of each coordinate's differential (descending), ties broken by index.
    diff = el - gr                                               # [4, N]
    di = diff[:, None, :]                                        # coordinate i
    dj = diff[None, :, :]                                        # coordinate j
    idx4 = jnp.arange(_VERTS)
    tie = (dj == di) & (idx4[None, :, None] < idx4[:, None, None])
    rank = jnp.sum((dj > di) | tie, axis=1).astype(jnp.int32)    # [4, N]
    rank = rank + sum_val.astype(jnp.int32)[None, :]

    # Wrap out-of-range ranks, adjusting the rounded point accordingly.
    under = rank < 0
    over = rank > _D
    rank = rank + _VERTS * under.astype(jnp.int32) - _VERTS * over.astype(jnp.int32)
    gr = gr + _VERTS * under.astype(gr.dtype) - _VERTS * over.astype(gr.dtype)
    return el, gr, rank


def _flat_lattice_bytes(num_levels: int, n: int) -> int:
    """HBM footprint of the flat path's [L, V, 3, N] int32 key intermediate."""
    return num_levels * _VERTS * _D * n * 4


def _lattice_flat_ok(num_levels: int, n: int) -> bool:
    """Flat (vmap-over-levels) lattice iff the all-levels key intermediate fits
    the budget (PAGNERF_LATTICE_FLAT_MB; 0 disables flat).

    N is static under jit, so this is a trace-time decision: at e.g. 256 MB
    the post-prune packed regimes (N ~ 200k -> ~230 MB) go flat, the
    seeded/pre regimes (N ~ 2.2M -> ~2.6 GB, the measured HBM envelope) keep
    the scan. Default 0 (off): the round-4-queued chip A/B measured the flat
    path as a NULL end-to-end (8-step bench arms, PAGNERF_LATTICE_FLAT_MB=256
    vs 0: post[rgb] 69.3k vs 73.3k, post[panoptic] 50.7k vs 47.8k rays/s,
    schedule-weighted 18,276 vs 18,368 — within run-to-run noise) — the
    24-step scan's sequential structure is NOT a measurable fixed cost at
    post scale on this toolchain."""
    import os
    budget_mb = float(os.environ.get("PAGNERF_LATTICE_FLAT_MB", "0"))
    return _flat_lattice_bytes(num_levels, n) <= budget_mb * 2 ** 20


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _lattice_levels(statics, x):
    """idx [L, V, N] int32 + bary [L, V, N] for all levels of coords x [3, N].

    ``statics`` is the hashable per-level spec tuple
    (log2_c, inv_scales, mm, dm, direct) — all derived from the static scale
    schedule, so they ride nondiff_argnums and the VJP deals only in x.

    Two memory design points (this op is the measured HBM envelope of every
    training regime, PERFORMANCE.md round 3):

      * At large N the per-level math runs as a SCAN over levels: vmapping
        materialises the [L, V, 3, N] int32 key intermediate for all levels
        at once — 2.5 GB at flagship scale (L=24, N=2.23M). The scan keeps
        one level's keys alive at a time (~107 MB) with identical outputs.
        At SMALL N (the post-prune packed regimes, N ~ 200k) the same
        intermediate is ~230 MB — there the levels run FLAT (vmap), removing
        24 sequential scan dependencies whose per-iteration work is too small
        to fill the chip (part of the post regimes' fixed per-step cost,
        ROOFLINE.md). Dispatch is trace-time on N (_lattice_flat_ok).
      * The backward saves NO lattice residuals. Autodiff through the rank /
        tie-break masks would stack [L, 5, V, N]-scale multiply partners
        (~4 GB); instead the VJP recomputes each level's rank from x (cheap
        VPU work) and turns dbary into dx directly:
        bary5[b] = sum_v (plus-minus)[b, v] * delta[v], delta = (el-gr)/4,
        el = E @ (x*inv_s)  =>  dx += inv_s * E^T @ ddelta / 4.
        This is manual rematerialisation WITHOUT jax.checkpoint — a remat'd
        scan body trips the known 10-20+ min compile pathology on the axon
        toolchain (CLAUDE.md rule 4); a plain second scan does not.
    """
    log2_c, inv_scales, mm, dm, direct = _statics_arrays(statics)

    def level(inv_s, mm_l, dm_l, direct_l):
        keys, bary = simplex_vertices_and_weights_T(x * inv_s)
        return _index_keys_T(keys, log2_c, mm_l, dm_l, direct_l), bary

    if _lattice_flat_ok(len(statics[1]), x.shape[1]):
        return jax.vmap(level)(inv_scales, mm, dm, direct)

    def body(_, xs):
        return None, level(*xs)
    _, (idx, bary) = jax.lax.scan(body, None, (inv_scales, mm, dm, direct))
    return idx, bary


def _statics_arrays(statics):
    log2_c, inv_scales, mm, dm, direct = statics
    return (log2_c, jnp.asarray(inv_scales, jnp.float32),
            jnp.asarray(mm, jnp.int32), jnp.asarray(dm, jnp.int32),
            jnp.asarray(direct))


def _lattice_levels_fwd(statics, x):
    return _lattice_levels(statics, x), x


def _lattice_levels_bwd(statics, x, g):
    _, inv_scales, _, _, _ = _statics_arrays(statics)
    _, dbary = g                                   # didx is float0 (int output)
    b5 = jnp.arange(_VERTS + 1, dtype=jnp.int32)[:, None, None]   # [5, 1, 1]

    def level_dx(inv_s, dbary_l):                  # dbary_l [V, N]
        _, _, rank = _rank_and_el(x * inv_s)
        pm = (((_D - rank)[None] == b5).astype(dbary_l.dtype)
              - ((_D + 1 - rank)[None] == b5).astype(dbary_l.dtype))  # [5, 4, N]
        # bary = bary5[:V] with bary5[0] folded += bary5[V]: transpose the fold.
        db5 = jnp.concatenate([dbary_l, dbary_l[:1]], axis=0)         # [5, N]
        ddelta = jnp.einsum("bvn,bn->vn", pm, db5) / _VERTS           # [4, N]
        return (jnp.asarray(_E, x.dtype).T @ ddelta) * inv_s          # [3, N]

    if _lattice_flat_ok(len(statics[1]), x.shape[1]):
        # UNROLLED levels (not vmap): each body is the exact scan-iteration
        # program, accumulated in scan order, so the flat backward is
        # bit-identical to the scan backward (a vmapped einsum batches the
        # matmuls and reassociates within ~1 ulp). The bodies have no
        # cross-level dependency, so XLA schedules them concurrently —
        # which is the whole point at post-prune N (ROOFLINE.md fixed costs).
        dx = jnp.zeros_like(x)
        for l in range(len(statics[1])):
            dx = dx + level_dx(inv_scales[l], dbary[l])
        return (dx,)

    def body(dx, xs):
        return dx + level_dx(*xs), None

    dx, _ = jax.lax.scan(body, jnp.zeros_like(x), (inv_scales, dbary))
    return (dx,)


_lattice_levels.defvjp(_lattice_levels_fwd, _lattice_levels_bwd)


def _lattice_all_levels(log2_c, x, inv_scales, mm, dm, direct):
    statics = (int(log2_c), tuple(float(s) for s in np.asarray(inv_scales)),
               tuple(int(v) for v in np.asarray(mm)),
               tuple(int(v) for v in np.asarray(dm)),
               tuple(bool(v) for v in np.asarray(direct)))
    return _lattice_levels(statics, x)


def _index_keys_T(keys: jnp.ndarray, log2_capacity: int,
                  mm, dm, direct) -> jnp.ndarray:
    """Branchless per-level direct-or-hash indexing. keys [V, 3, N] int32;
    mm/dm/direct are this level's scalars (traced via vmap)."""
    hashed = _hash_keys_T(keys, log2_capacity)
    r = jnp.arange(_VERTS, dtype=keys.dtype)[:, None, None]
    m = jnp.clip((keys - r) // _VERTS, -mm, mm) + mm       # [V, 3, N]
    lin = (m[:, 0] * dm + m[:, 1]) * dm + m[:, 2]          # [V, N]
    direct_idx = (jnp.arange(_VERTS, dtype=jnp.int32)[:, None] * dm * dm * dm
                  + lin).astype(jnp.int32)
    return jnp.where(direct, direct_idx, hashed)


def simplex_vertices_and_weights_T(scaledT: jnp.ndarray):
    """Locate the enclosing lattice simplex of points [3, N] (already divided by the
    level scale) and compute barycentric weights.

    TPU layout note: all sample-scale tensors keep the sample axis MINOR (lanes).
    TPU tiles the two minor dims to (8, 128); a `[N, 4]` tensor would be padded to
    `[N, 128]` — 32x the memory and bandwidth. In `[4, N]` layout the pad is
    negligible. This is the difference between the encoder fitting in HBM at
    production sample counts and a 50 GB allocation failure.

    Returns:
      keys: [4, 3, N] int32 lattice coordinates of the 4 simplex vertices
            (first 3 of 4 coords; the 4th is implied by the sum-zero constraint).
      bary: [4, N] barycentric weights (>= 0, sum to 1).
    """
    el, gr, rank = _rank_and_el(scaledT)

    # Barycentric coordinates from the sorted differentials: bary_b = sum_i delta_i *
    # ([d - rank_i == b] - [d + 1 - rank_i == b]), then fold the (d+1)th bin into 0.
    delta = (el - gr) / _VERTS                                   # [4, N]
    b = jnp.arange(_VERTS + 1, dtype=jnp.int32)[:, None, None]   # [5, 1, 1]
    plus = ((_D - rank)[None] == b).astype(delta.dtype)          # [5, 4, N]
    minus = ((_D + 1 - rank)[None] == b).astype(delta.dtype)
    bary = jnp.sum((plus - minus) * delta[None], axis=1)         # [5, N]
    bary = bary.at[0].add(1.0 + bary[_VERTS])
    bary = bary[:_VERTS]                                         # [4, N]

    # Vertex keys for remainders r = 0..d:
    # key_i = gr_i + r - (d+1 if rank_i > d - r else 0); only first 3 coords hashed.
    r = jnp.arange(_VERTS, dtype=jnp.int32)[:, None, None]       # [4, 1, 1]
    gri = gr.astype(jnp.int32)[None, :_D, :]                     # [1, 3, N]
    ranki = rank[None, :_D, :]                                   # [1, 3, N]
    sub = (ranki > (_D - r)).astype(jnp.int32) * _VERTS
    keys = gri + r - sub                                         # [4, 3, N]
    return keys, bary


def simplex_vertices_and_weights(scaled: jnp.ndarray):
    """Sample-major wrapper ([N, 3] -> keys [N, 4, 3], bary [N, 4]) for tests and
    small hosts; the hot path uses the _T variant."""
    keys, bary = simplex_vertices_and_weights_T(scaled.T)
    return jnp.transpose(keys, (2, 0, 1)), bary.T


def permuto_encode_T(tables: jnp.ndarray, coordsT: jnp.ndarray,
                     scales: np.ndarray, compute_dtype=jnp.float32) -> jnp.ndarray:
    """Encode coords [3, N] against permutohedral tables [L, C, F] with per-level
    scales [L] (geomspace coarsest->finest; reference grids/permuto_grid.py:53).

    Returns featsT [L*F, N] concatenated level features, sample axis minor (see
    simplex_vertices_and_weights_T for why this layout).

    Precondition: coords must lie in [-1, 1]^3 (the tracer's normalised scene
    cube). Direct-indexed coarse levels size their key box from that range;
    out-of-range coords get CLIPPED onto boundary lattice cells, silently
    merging all their gradients into the same edge entries (hashed levels would
    at least spread them). Callers with unnormalised coords must rescale first.
    """
    num_levels, capacity, feat_dim = tables.shape
    log2_c = int(np.log2(capacity))
    assert (1 << log2_c) == capacity, "capacity must be a power of two"
    inv_scales = (1.0 / np.asarray(scales)).astype(np.float32)
    mm, dm, direct, rows_used = direct_level_specs(scales, capacity, feat_dim)

    x = coordsT.astype(jnp.float32)                              # [3, N]
    n = x.shape[1]

    from .table_gather import multilevel_table_gather

    # Per-level lattice math is cheap VPU work ([V, N] tensors, sample-minor),
    # scanned over levels with a recompute-in-backward VJP (_lattice_levels);
    # the gathers for all levels run as ONE fused op (Pallas kernel on TPU).
    idx, bary = _lattice_all_levels(log2_c, x, inv_scales, mm, dm, direct)
    per_level = multilevel_table_gather(tables.astype(compute_dtype), idx,
                                        bary.astype(compute_dtype),
                                        rows_used=rows_used)     # [L, F, N]
    return per_level.reshape(num_levels * feat_dim, n)


def permuto_encode(tables: jnp.ndarray, coords: jnp.ndarray,
                   scales: np.ndarray, compute_dtype=jnp.float32) -> jnp.ndarray:
    """Sample-major wrapper: coords [N, 3] -> [N, L*F]."""
    return permuto_encode_T(tables, coords.T, scales, compute_dtype).T


def permuto_encode_dual_T(tables_a: jnp.ndarray, tables_b: jnp.ndarray,
                          coordsT: jnp.ndarray, scales: np.ndarray,
                          compute_dtype=jnp.float32):
    """Encode coords against TWO same-spec table stacks with one shared lattice.

    The delta-grid fusion (PanopticDeltaNeF): the delta grid is queried at
    stop-gradient copies of the same coordinates (panoptic_delta_nef.py:215), so
    the simplex/hash math is identical — compute it once, gather both tables, and
    let the fused backward scatter both tables' gradients per one-hot build
    (ops/table_gather.dual_multilevel_table_gather). The B side's barycentric
    weights carry no coordinate gradient, matching the stop-grad contract.

    Precondition: coords in [-1, 1]^3, as for ``permuto_encode_T``.

    Returns (featsA [L*F, N], featsB [L*F, N]).
    """
    num_levels, capacity, feat_dim = tables_a.shape
    assert tables_b.shape == tables_a.shape, "dual encode needs same-spec tables"
    log2_c = int(np.log2(capacity))
    assert (1 << log2_c) == capacity, "capacity must be a power of two"
    inv_scales = (1.0 / np.asarray(scales)).astype(np.float32)
    mm, dm, direct, rows_used = direct_level_specs(scales, capacity, feat_dim)
    x = coordsT.astype(jnp.float32)
    n = x.shape[1]

    from .table_gather import dual_multilevel_table_gather

    idx, bary = _lattice_all_levels(log2_c, x, inv_scales, mm, dm, direct)
    out_a, out_b = dual_multilevel_table_gather(
        tables_a.astype(compute_dtype), tables_b.astype(compute_dtype),
        idx, bary.astype(compute_dtype), rows_used=rows_used)
    return (out_a.reshape(num_levels * feat_dim, n),
            out_b.reshape(num_levels * feat_dim, n))


class PermutoEncodingSpec:
    """Static spec mirroring the reference PermutoGrid constructor
    (grids/permuto_grid.py:16-28: coarsest_scale, finest_scale, capacity_log_2,
    num_lods, feature_dim)."""

    def __init__(self, num_levels: int = 24, feature_dim: int = 2,
                 capacity_log2: int = 18, coarsest_scale: float = 1.0,
                 finest_scale: float = 0.0001):
        self.num_levels = num_levels
        self.feature_dim = feature_dim
        self.capacity_log2 = capacity_log2
        self.capacity = 1 << capacity_log2
        # geomspace coarsest->finest (reference grids/permuto_grid.py:53)
        self.scales = np.geomspace(coarsest_scale, finest_scale, num=num_levels)
        self.output_dim = num_levels * feature_dim

    def init(self, key: jax.Array, init_std: float = 1e-4, dtype=jnp.float32) -> jnp.ndarray:
        return jax.random.uniform(
            key, (self.num_levels, self.capacity, self.feature_dim),
            minval=-init_std, maxval=init_std, dtype=jnp.float32).astype(dtype)

    def encode(self, tables: jnp.ndarray, coords: jnp.ndarray,
               compute_dtype=jnp.float32) -> jnp.ndarray:
        return permuto_encode(tables, coords, self.scales, compute_dtype)

    def encode_T(self, tables: jnp.ndarray, coordsT: jnp.ndarray,
                 compute_dtype=jnp.float32) -> jnp.ndarray:
        return permuto_encode_T(tables, coordsT, self.scales, compute_dtype)

    def encode_dual_T(self, tables_a: jnp.ndarray, tables_b: jnp.ndarray,
                      coordsT: jnp.ndarray, compute_dtype=jnp.float32):
        return permuto_encode_dual_T(tables_a, tables_b, coordsT, self.scales,
                                     compute_dtype)
