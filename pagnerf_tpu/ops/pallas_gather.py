"""Pallas TPU kernel: multi-level lane-packed table gather + barycentric weighting.

The encoding hot op (see ops/table_gather.py for the layout rationale). The XLA
formulation leaves [N, 128] gathered-row intermediates in HBM (~100 GB of traffic per
step at production scale); this kernel keeps the gather -> lane-select -> weighted
accumulate entirely in VMEM:

  * packed level tables [L, R, 128] stream through VMEM one level at a time (grid is
    (level, sample-chunk) with the chunk axis innermost, so Pallas re-uses the
    table block across the inner loop — each 2 MB level table is DMA'd once);
  * the hardware gather (`tpu.dynamic_gather` via ``jnp.take_along_axis`` with
    indices shaped exactly like the [R, 128] table — the only form Mosaic lowers)
    pulls V vertex rows per sample; the per-sample feature lanes are selected with an
    iota-compare mult-reduce on the VPU, in registers;
  * each grid step processes exactly R samples (the dynamic_gather shape contract).

Backward splits: d(table) is a V*F-nonzero-per-sample scatter-add done in XLA
(ops/table_gather.py); d(bary) reuses this kernel's gather in a second variant.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _select_feats(rows, lane0, feat_dim):
    """rows [R, 128], lane0 [R] -> [F, R] lane-selected features (VPU)."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
    return [jnp.sum(rows * (lanes == (lane0 + f)[:, None]).astype(rows.dtype),
                    axis=1) for f in range(feat_dim)]


def _fwd_kernel(feat_dim, table_ref, idx_ref, bary_ref, out_ref):
    """One (level, chunk) step: out[f, :] = sum_v bary[v] * T[idx[v], f]."""
    r = table_ref.shape[1]        # block is [1, R, 128]
    epr = LANES // feat_dim
    v = idx_ref.shape[1]
    accs = [jnp.zeros((r,), table_ref.dtype) for _ in range(feat_dim)]
    for vi in range(v):
        idx = idx_ref[0, vi]                                   # [R]
        row = idx // epr
        lane0 = (idx % epr) * feat_dim
        idx2 = jnp.broadcast_to(row[:, None], (r, LANES))
        rows = jnp.take_along_axis(table_ref[0], idx2, axis=0,
                                   mode="promise_in_bounds")    # [R, 128] hw gather
        w = bary_ref[0, vi]
        for f, sel in enumerate(_select_feats(rows, lane0, feat_dim)):
            accs[f] = accs[f] + w * sel
    for f in range(feat_dim):
        out_ref[0, f] = accs[f]


def _dbary_kernel(feat_dim, table_ref, idx_ref, g_ref, out_ref):
    """One (level, chunk) step: dbary[v, :] = sum_f g[f] * T[idx[v], f]."""
    r = table_ref.shape[1]        # block is [1, R, 128]
    epr = LANES // feat_dim
    v = idx_ref.shape[1]
    for vi in range(v):
        idx = idx_ref[0, vi]
        row = idx // epr
        lane0 = (idx % epr) * feat_dim
        idx2 = jnp.broadcast_to(row[:, None], (r, LANES))
        rows = jnp.take_along_axis(table_ref[0], idx2, axis=0,
                                   mode="promise_in_bounds")
        acc = jnp.zeros((r,), table_ref.dtype)
        for f, sel in enumerate(_select_feats(rows, lane0, feat_dim)):
            acc = acc + g_ref[0, f] * sel
        out_ref[0, vi] = acc


def _call(kernel, feat_dim, tables_packed, idx, weights, out_feat,
          interpret=False):
    l, r, _ = tables_packed.shape
    _, v, n = idx.shape
    assert n % r == 0, "sample count must be padded to a multiple of packed rows"
    chunks = n // r
    return pl.pallas_call(
        functools.partial(kernel, feat_dim),
        grid=(l, chunks),
        in_specs=[
            pl.BlockSpec((1, r, LANES), lambda li, c: (li, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, v, r), lambda li, c: (li, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, weights.shape[1], r), lambda li, c: (li, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, out_feat, r), lambda li, c: (li, 0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((l, out_feat, n), tables_packed.dtype),
        interpret=interpret,
    )(tables_packed, idx, weights)


def multilevel_gather_fwd(tables_packed: jnp.ndarray, idx: jnp.ndarray,
                          bary: jnp.ndarray, feat_dim: int,
                          interpret: bool = False) -> jnp.ndarray:
    """tables_packed [L, R, 128], idx [L, V, N], bary [L, V, N] -> [L, F, N]."""
    return _call(_fwd_kernel, feat_dim, tables_packed, idx,
                 bary.astype(tables_packed.dtype), feat_dim,
                 interpret=interpret)


def multilevel_gather_dbary(tables_packed: jnp.ndarray, idx: jnp.ndarray,
                            g: jnp.ndarray, feat_dim: int,
                            interpret: bool = False) -> jnp.ndarray:
    """tables_packed [L, R, 128], idx [L, V, N], g [L, F, N] -> dbary [L, V, N]."""
    return _call(_dbary_kernel, feat_dim, tables_packed, idx,
                 g.astype(tables_packed.dtype), idx.shape[1],
                 interpret=interpret)


def multilevel_gather_dual_fwd(packed_a: jnp.ndarray, packed_b: jnp.ndarray,
                               idx: jnp.ndarray, bary: jnp.ndarray,
                               feat_dim: int, interpret: bool = False):
    """Fused dual-table gather: both grids' features in ONE lookup per vertex.

    The PAg-NeRF delta grid reads the SAME lattice indices as the main grid
    (stop-gradient coords, reference panoptic_delta_nef.py:215), and the row
    gather is lookup-RATE-bound (~300-400M rows/s on v5e regardless of row
    bytes) — so the two [C, F] tables are lane-concatenated into [C, 2F]
    packed rows and gathered once, exactly like the XLA dual path
    (ops/table_gather._gather_feats_dual).

    packed_a/b [L, R, 128] (each table's own packing); idx/bary [L, V, N].
    Returns (out_a, out_b), each [L, F, N]. Bit-exact vs two single gathers.
    """
    l, r, _ = packed_a.shape
    c = (r * LANES) // feat_dim
    # repack [C, F] + [C, F] -> [C, 2F] -> [L, 2R, 128] (row-major reshapes)
    both = jnp.concatenate([packed_a.reshape(l, c, feat_dim),
                            packed_b.reshape(l, c, feat_dim)], axis=2)
    packed = both.reshape(l, 2 * r, LANES)
    out = _call(_fwd_kernel, 2 * feat_dim, packed, idx,
                bary.astype(packed.dtype), 2 * feat_dim, interpret=interpret)
    return out[:, :feat_dim], out[:, feat_dim:]
