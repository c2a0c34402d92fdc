"""Cross-ray PACKED sample layout — the TPU equivalent of the reference's
ragged packed tensors (kaolin raymarch emits only occupied samples;
/root/reference/tracers/panoptic_packed_rf_tracer.py:85-114 composites them
with ``mark_pack_boundaries``/``exponential_integration``/``sum_reduce``).

The per-ray compacted layout (ops/raymarch.compact_samples) pays a STATIC
per-ray budget sized for the tail of the valid-count distribution — measured
2.1x the mean at deployed occupancy and 12x at sparse fields (PERFORMANCE.md,
scripts/probe_compact_budget.py). Packing instead flattens a microbatch's
valid samples, ray-major and depth-ordered, into ONE static [B] buffer sized
for the batch MEAN (CLT makes the batch total tight even though per-ray
counts are wide).

Because the packed order is ray-major, every ray's segment is CONTIGUOUS —
so no scatter appears anywhere in forward or backward:
  * segment reductions (compositing sums, per-ray alpha/sparsity) are
    prefix-sum differences at the segment boundaries (``segment_sum``);
  * per-ray -> per-sample broadcasts (ray origins/dirs, t0/span) are gathers
    whose custom VJP is again a ``segment_sum`` (``segment_broadcast``) —
    XLA's autodiff would emit a B-event scatter-add (the known ~100M
    updates/s cliff, PERFORMANCE.md).
Measured overheads at flagship post scale (scripts/probe_packed_costs.py):
pack-sort 20 ms, pack-gather 27 ms, segmented integration 11 ms per step.

When the batch's valid total exceeds the budget, rays are truncated by
WATER-FILLING: the largest per-ray cap k* with sum(min(count, k*)) <= B, so
every ray keeps its k* shallowest valid samples before any ray keeps more —
the fairest static truncation (deep-tail samples behind dense geometry carry
the least transmittance).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from .raymarch import RaymarchResult



@struct.dataclass
class PackedSamples:
    """A microbatch's valid samples, ray-major and depth-ordered.

    ray_id:   [B] int32 owning ray (clamped to R-1 on the padding tail).
    step_id:  [B] int32 step index within the ray's dense [S] grid.
    offsets:  [R+1] int32 segment boundaries (offsets[r]..offsets[r+1] is
              ray r's slice; offsets[R] = total packed count <= B).
    valid:    [B] bool (False on the padding tail).
    depths:   [B] sample depth along the ray.
    deltas:   [B] inter-sample step length.
    positionsT: [3, B] world-space positions (feature-major).
    """

    ray_id: jnp.ndarray
    step_id: jnp.ndarray
    offsets: jnp.ndarray
    valid: jnp.ndarray
    depths: jnp.ndarray
    deltas: jnp.ndarray
    positionsT: jnp.ndarray


# ------------------------------------------------------------- segment ops
def _comp_prefix(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compensated inclusive prefix sum along axis -1, with a leading zero.

    Returns ``(hi, lo)`` of shape [..., B+1] with ``hi + lo`` ≈ the exact
    prefix. A single fp32 prefix over the whole packed buffer reaches
    magnitudes ~1e4-1e5 at flagship scale (B~2.9M), where the fp32 ulp is
    ~1e-2 — so boundary DIFFERENCES (per-segment sums ~1e0-1e1) lose 2-4
    digits to representation quantisation alone. The fix keeps the rounding
    residual of each accumulation step in a second fp32 stream:
        hi = cumsum(x);  r = x - diff(hi)   (the per-step increment error,
                                             == -(e_i - e_{i-1}) exactly)
        lo = cumsum(r)  ≈ -e_i  (second-order error only)
    so (hi_a - hi_b) + (lo_a - lo_b) recovers the segment-scale value to
    ~fp32 precision regardless of the global prefix magnitude. The residual
    stream is mathematically zero, so it is wrapped in stop_gradient:
    backward is exactly the plain-cumsum gradient (no extra cost, and
    gradient parity with the dense path is preserved).

    Accumulation always runs in float32 (bf16 inputs are upcast)."""
    x = x.astype(jnp.promote_types(x.dtype, jnp.float32))
    hi = jnp.cumsum(x, axis=-1)
    zero = jnp.zeros(x.shape[:-1] + (1,), x.dtype)
    r = x - jnp.diff(hi, axis=-1, prepend=zero)
    lo = jax.lax.stop_gradient(jnp.cumsum(r, axis=-1))
    return (jnp.concatenate([zero, hi], axis=-1),
            jnp.concatenate([jax.lax.stop_gradient(zero), lo], axis=-1))


def segment_sum(x: jnp.ndarray, offsets: jnp.ndarray) -> jnp.ndarray:
    """Sum contiguous segments: x [C, B], offsets [R+1] -> [C, R].

    Compensated prefix-sum differences at the boundaries (see
    ``_comp_prefix`` — a plain fp32 prefix loses segment-scale accuracy at
    flagship buffer sizes) — no scatter. Elements at or beyond offsets[-1]
    (the padding tail) are excluded by construction. Empty segments sum to
    exactly 0 (equal boundary prefixes)."""
    hi, lo = _comp_prefix(x)
    return ((hi[:, offsets[1:]] - hi[:, offsets[:-1]])
            + (lo[:, offsets[1:]] - lo[:, offsets[:-1]]))


@jax.custom_vjp
def segment_broadcast(x: jnp.ndarray, ray_id: jnp.ndarray,
                      offsets: jnp.ndarray) -> jnp.ndarray:
    """Broadcast per-ray values to packed samples: x [C, R] -> [C, B].

    Forward is a plain gather; the custom VJP replaces autodiff's B-event
    scatter-add with a segment_sum (cumsum + 2R boundary gathers).

    Backward contract: cotangents arriving on the PADDING TAIL (positions
    >= offsets[-1], whose forward values gather ray 0 through the clamped
    ray_id) are DROPPED, not accumulated into ray 0 — the boundary
    differences in segment_sum never cover positions outside a segment, so
    the exclusion is structural, not a masking pass. This is the adjoint of
    the op's semantics (padding outputs are not part of the packed layout);
    autodiff of the raw gather would instead credit tail cotangents to
    ray 0. Callers reading padding outputs AND differentiating through them
    get gradients that deliberately ignore the tail."""
    return x[:, ray_id]


def _segment_broadcast_fwd(x, ray_id, offsets):
    return x[:, ray_id], (ray_id, offsets)


def _segment_broadcast_bwd(res, g):
    ray_id, offsets = res
    return segment_sum(g, offsets), None, None


segment_broadcast.defvjp(_segment_broadcast_fwd, _segment_broadcast_bwd)


# ------------------------------------------------------------------ pack
def _pack_gather_map() -> bool:
    """Build the pack permutation by per-slot GATHER search instead of the
    dense [R*S]-source scatter (PAGNERF_PACK_GATHER_MAP, default on).

    The scatter variant writes all R*S candidate slots (most dropped), so its
    cost is set by the DENSE march size at any occupancy; the gather variant
    touches O(B + R) elements plus log2(S) lane-packed row gathers of [B]."""
    import os
    return os.environ.get("PAGNERF_PACK_GATHER_MAP", "1") == "1"


def _gather_1d_i32(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather from a 1-D int32 table at int32 indices via 128-lane-packed
    rows. A narrow-minor 1-D gather falls to XLA's element-at-a-time path
    (CLAUDE.md rule 2); rows from a [rows, 128] view of the same data run at
    the hardware row-gather rate (same structure as ops/occupancy._lookup)."""
    flat = idx.reshape(-1)
    t = table
    pad = (-t.size) % 128
    if pad:
        t = jnp.pad(t, (0, pad))
    rows = t.reshape(-1, 128).at[flat >> 7].get(mode="promise_in_bounds")
    rows = jax.lax.optimization_barrier(rows)
    lane = (flat & 127)[:, None]
    sel = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1) == lane
    return jnp.sum(rows * sel.astype(rows.dtype), axis=-1).reshape(idx.shape)


def _water_fill_cap(counts: jnp.ndarray, num_steps: int, budget: int
                    ) -> jnp.ndarray:
    """Largest per-ray cap k with sum(min(counts, k)) <= budget (k >= 0).

    totals(k) = sum_j<=k #{rays with count >= j} is monotone in k; evaluated
    for all k in one [S] cumsum over the count histogram."""
    # hist[j] = #rays with count >= j+1, j = 0..S-1
    hist = jnp.sum(counts[None, :] >= jnp.arange(1, num_steps + 1,
                                                 dtype=counts.dtype)[:, None],
                   axis=1)
    totals = jnp.cumsum(hist)                      # totals[k-1] = sum min(c, k)
    return jnp.sum(totals <= budget).astype(counts.dtype)   # k*


def pack_samples(rm: RaymarchResult, rays_oT: jnp.ndarray, rays_dT: jnp.ndarray,
                 budget: int) -> PackedSamples:
    """Pack a dense march [R, S] into a static [B = budget] buffer.

    rays_oT / rays_dT: [3, R] ray origins / directions (feature-major). The
    packed positions/depths are recomputed IN packed space from per-ray
    geometry (t0/span via segment_broadcast) and the pose-independent
    unit-interval coordinate u = (depth - t0)/span (stop-gradient: u is
    exactly frac + jitter/S, independent of the pose by construction of
    ops/raymarch._uniform_samples) — so pose gradients flow through
    segment_broadcast's scatter-free VJP instead of a dense [R, S] scatter.
    """
    r, s = rm.mask.shape
    assert rm.t0 is not None and rm.span is not None, \
        "pack_samples needs a RaymarchResult carrying t0/span (ops/raymarch)"
    counts = jnp.sum(rm.mask, axis=-1, dtype=jnp.int32)          # [R]
    cap = _water_fill_cap(counts, s, budget)
    keep = jnp.minimum(counts, cap)                              # [R]
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(keep, dtype=jnp.int32)])

    # eligibility: a sample survives iff valid and among its ray's `keep`
    # shallowest valid samples
    rank = jnp.cumsum(rm.mask, axis=-1, dtype=jnp.int32) - 1     # [R, S]
    eligible = rm.mask & (rank < keep[:, None])

    # pack permutation DIRECTLY from the segment structure: an eligible
    # sample's packed slot is offsets[ray] + its within-ray valid rank. Slot
    # targets are produced in ray-major depth order (strictly increasing over
    # the row-major [R, S] walk), i.e. the exact permutation the original
    # ascending lax.sort produced — bit-identical buffers either way.
    valid = jnp.arange(budget, dtype=jnp.int32) < offsets[-1]
    if _pack_gather_map():
        # GATHER construction (default): invert the segment structure per
        # packed slot instead of scattering all R*S dense candidates (the
        # scatter's cost is set by the dense march size at ANY occupancy).
        #   ray_id: +1 at every segment start, inclusive-cumsum - 1. A run of
        #   empty rays stacks its starts on one slot, so the cumsum jumps past
        #   them exactly.
        starts = jnp.zeros((budget,), jnp.int32).at[offsets[:-1]].add(
            1, mode="drop")                                      # [B]
        ray_id = jnp.cumsum(starts) - 1                          # [B]
        #   step_id: the i-th valid sample of the ray (i < keep <= counts, so
        #   eligibility is implied) = smallest step with cumsum(mask) == i+1,
        #   by branchless binary search over the row's nondecreasing `rank`
        #   (= cumsum(mask) - 1): log2(S) lane-packed row gathers of [B].
        i_in_ray = jnp.arange(budget, dtype=jnp.int32) \
            - _gather_1d_i32(offsets, ray_id)                    # [B]
        rank_flat = rank.reshape(-1)
        lo = jnp.zeros((budget,), jnp.int32)
        hi = jnp.full((budget,), s - 1, jnp.int32)
        for _ in range(max(1, (s - 1).bit_length())):
            mid = (lo + hi) >> 1
            below = _gather_1d_i32(rank_flat, ray_id * s + mid) < i_in_ray
            lo = jnp.where(below, mid + 1, lo)
            hi = jnp.where(below, hi, mid)
        ray_id = jnp.where(valid, ray_id, 0)
        step_id = jnp.where(valid, lo, 0)
        sidx = ray_id * s + step_id
    else:
        # SCATTER construction (round-4 default, kept as the reference
        # implementation): one scatter of the eligible flat indices.
        slot = jnp.where(eligible, offsets[:-1, None] + rank, budget)  # [R, S]
        flat = jnp.arange(r * s, dtype=jnp.int32).reshape(r, s)
        sidx = jnp.zeros((budget,), jnp.int32).at[slot.reshape(-1)].set(
            flat.reshape(-1), mode="drop")                       # [B]
        sidx = jnp.where(valid, sidx, 0)
        ray_id = sidx // s
        step_id = sidx % s

    # pose-independent unit coordinate of every dense sample (STOP-GRAD: see
    # docstring — the value is exact, the zero pose-derivative is exact)
    span = rm.span
    safe_span = jnp.where(span > 0, span, 1.0)
    u = jax.lax.stop_gradient((rm.depths - rm.t0[:, None]) / safe_span[:, None])
    u_b = u.reshape(-1)[sidx]                                    # [B]

    geom = jnp.stack([rm.t0, span])                              # [2, R]
    geom_b = segment_broadcast(geom, ray_id, offsets)            # [2, B]
    depths = geom_b[0] + u_b * geom_b[1]
    deltas = geom_b[1] / jnp.float32(s)

    od = jnp.concatenate([rays_oT, rays_dT], axis=0)             # [6, R]
    od_b = segment_broadcast(od, ray_id, offsets)                # [6, B]
    positionsT = od_b[:3] + od_b[3:] * depths[None, :]

    return PackedSamples(ray_id=ray_id, step_id=step_id, offsets=offsets,
                         valid=valid, depths=depths, deltas=deltas,
                         positionsT=positionsT)


# ------------------------------------------------------------ integration
def packed_integration_weights(tau: jnp.ndarray, ps: PackedSamples
                               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Packed equivalent of ops/composite.exponential_integration_weights.

    tau [B] -> (weights [B], alpha [R, 1]). The per-ray exclusive-cumsum
    transmittance becomes one global cumsum minus the ray's prefix at its
    segment start (contiguity makes the reset a gather, not a scan reset).
    The global prefix is COMPENSATED (``_comp_prefix``): at flagship scale
    the fp32 prefix magnitude (~1e4+) would otherwise quantise the
    segment-scale exclusive sums to ~1e-2 absolute — percent-level error in
    exp(-excl) for rays late in the buffer."""
    tau = jnp.where(ps.valid, tau, 0.0)
    hi, lo = _comp_prefix(tau)                                   # [B+1] each
    base = jnp.stack([hi[ps.offsets[:-1]], lo[ps.offsets[:-1]]])  # [2, R]
    base_b = segment_broadcast(base, ps.ray_id, ps.offsets)      # [2, B]
    # sum_{j<i, same ray}: hi and lo differenced SEPARATELY (hi-hi is the
    # near-cancelling large pair; lo-lo the small correction)
    excl = (hi[:-1] - base_b[0]) + (lo[:-1] - base_b[1])
    weights = jnp.exp(-excl) * (1.0 - jnp.exp(-tau))
    weights = jnp.where(ps.valid, weights, 0.0)
    alpha = segment_sum(weights[None, :], ps.offsets).T          # [R, 1]
    return weights, alpha


def packed_composite(feats: jnp.ndarray, weights: jnp.ndarray,
                     ps: PackedSamples) -> jnp.ndarray:
    """Weighted per-ray reduction: feats [C, B], weights [B] -> [R, C]
    (packed equivalent of ops/composite.composite_channel_T)."""
    return segment_sum(feats * weights[None, :], ps.offsets).T
