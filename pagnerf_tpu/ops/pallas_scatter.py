"""Scatter-add on the MXU: duplicate-index row accumulation as one-hot matmuls.

The table-gradient scatter (ops/table_gather.py backward) is the hot op XLA executes
on its element-addressed path (~100-130M element-ops/s measured end-to-end on v5e —
see PERFORMANCE.md). This kernel reformulates the scatter

    dpacked[r, c] += sum_m 1{row[m] == r} * vals[m, c]

as a sum of one-hot matmuls: for each chunk of M events, build the one-hot matrix
``oh[mb, RB] = (row == block_rows)`` in VMEM (iota + compare — nothing here touches
the toolchain-blocked ``tpu.dynamic_gather``) and accumulate ``oh^T @ vals`` into the
output row-block on the MXU. Exactly reproduces the duplicate-index sum.

Cost model: M x R x 128 x 2 FLOPs (R = packed rows). For the flagship encodings
(R=4096, M=V*N per level) this trades ~9 TFLOP/level/microbatch on the MXU against
the element-addressed path — see PERFORMANCE.md round-2 notes for the accounting.

The reference has no analogue (CUDA atomics do this in permutohedral_encoding's
backward); this is the TPU-native equivalent of its scatter-add.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
# Default event-chunk sizes (swept in round 2: 512 falls off a cliff, 768-1536
# flat, >1024 single / >768 dual exceed VMEM). table_gather._use_mxu_scatter
# imports these to model the kernels' VMEM footprint — keep them in sync by
# construction, not by hand.
EVENT_CHUNK = 1024
EVENT_CHUNK_DUAL = 768


def _scatter_kernel(row_ref, vals_ref, out_ref):
    """Grid (num_row_blocks, num_event_chunks); out block [RB, 128] revisited
    across the event axis (index_map independent of the chunk dim)."""
    rb = pl.program_id(0)
    mc = pl.program_id(1)

    @pl.when(mc == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    rows = row_ref[:]                                   # [MB, 1] int32
    mb = rows.shape[0]
    rblock = out_ref.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (mb, rblock), 1) + rb * rblock
    oh = (rows == cols).astype(jnp.bfloat16)            # [MB, RB] one-hot
    # oh^T @ vals on the MXU; accumulate in f32
    out_ref[:] += jax.lax.dot_general(
        oh, vals_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _scatter_kernel_resident(row_ref, vals_ref, out_ref):
    """Single event-chunk grid; the WHOLE output table stays VMEM-resident
    (R*128*4 bytes — 2 MB for the flagship tables), so events stream through HBM
    exactly once and every chunk issues one large [R, MB] @ [MB, 128] dot."""
    mc = pl.program_id(0)

    @pl.when(mc == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    rows = row_ref[:]                                   # [MB, 1] int32
    mb = rows.shape[0]
    r = out_ref.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (mb, r), 1)
    oh = (rows == cols).astype(jnp.bfloat16)            # [MB, R] one-hot
    out_ref[:] += jax.lax.dot_general(
        oh, vals_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("num_rows", "row_block",
                                             "event_chunk", "interpret"))
def scatter_rows_matmul(row: jnp.ndarray, vals: jnp.ndarray, num_rows: int,
                        row_block: int = 512, event_chunk: int = EVENT_CHUNK,
                        interpret: bool = False) -> jnp.ndarray:
    """sum-scatter ``vals`` [M, 128] into rows ``row`` [M] of a [num_rows, 128]
    f32 output (duplicates accumulate). Out-of-range rows (e.g. -1 padding) are
    dropped by the one-hot construction.

    LEGACY LAYOUT — test reference only. The [M]-shaped event operands reshape
    to [M, 1] columns inside, which lane-pad 128x in HBM (CLAUDE.md rule 8);
    production table gradients go through the lane-major ``*_T`` variants."""
    m = row.shape[0]
    assert vals.shape == (m, LANES)
    # the resident path never tiles rows; only the grid path needs a divisor,
    # so pick the largest sublane-aligned divisor <= row_block instead of
    # rejecting e.g. num_rows=640 (which the resident path handles anyway)
    row_block = min(row_block, num_rows)
    while row_block > 8 and (num_rows % row_block or row_block % 8):
        row_block -= 8
    if num_rows % row_block:
        row_block = num_rows          # untiled fallback (one row block)
    # m == 0 (zero events) must still run ONE grid step: the kernel's
    # mc==0 branch is what zero-initialises the output buffer — a
    # zero-size grid would return it uninitialised. The -1 pad rows are
    # dropped by the one-hot construction, so the result is exact zeros.
    pad = (-m) % event_chunk if m else event_chunk
    if pad:
        row = jnp.pad(row, (0, pad), constant_values=-1)
        vals = jnp.pad(vals, ((0, pad), (0, 0)))
        m += pad

    # resident variant: whole table + one event chunk's one-hot fit in VMEM
    # (~16 MB): stream events once, biggest possible dots
    resident_bytes = num_rows * LANES * 4 + event_chunk * (num_rows * 2 + 512)
    if resident_bytes < 12 * 2 ** 20:
        return pl.pallas_call(
            _scatter_kernel_resident,
            grid=(m // event_chunk,),
            in_specs=[
                pl.BlockSpec((event_chunk, 1), lambda mc: (mc, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((event_chunk, LANES), lambda mc: (mc, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((num_rows, LANES), lambda mc: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((num_rows, LANES), jnp.float32),
            interpret=interpret,
        )(row.reshape(m, 1).astype(jnp.int32), vals)

    grid = (num_rows // row_block, m // event_chunk)
    return pl.pallas_call(
        _scatter_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((event_chunk, 1), lambda rb, mc: (mc, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((event_chunk, LANES), lambda rb, mc: (mc, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_block, LANES), lambda rb, mc: (rb, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_rows, LANES), jnp.float32),
        interpret=interpret,
    )(row.reshape(m, 1).astype(jnp.int32), vals)


def _table_grad_kernel(row_ref, lane0_ref, bg_ref, out_ref):
    """Fused per-chunk table-gradient scatter: lane-spread the compact [MB, F]
    value block in VMEM (never materialising [M, 128] values to HBM), then one
    [R, MB] @ [MB, 128] MXU dot accumulated into the VMEM-resident table."""
    mc = pl.program_id(0)

    @pl.when(mc == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    rows = row_ref[:]                                    # [MB, 1] int32
    lane0 = lane0_ref[:]                                 # [MB, 1] int32
    bg = bg_ref[:]                                       # [MB, F]
    mb, f = bg.shape
    r = out_ref.shape[0]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (mb, LANES), 1)
    vals = jnp.zeros((mb, LANES), jnp.bfloat16)
    for fi in range(f):                                  # static, F is 2 or 4
        sel = lanes == (lane0 + fi)
        vals = vals + sel.astype(jnp.bfloat16) * bg[:, fi:fi + 1].astype(jnp.bfloat16)
    cols = jax.lax.broadcasted_iota(jnp.int32, (mb, r), 1)
    oh = (rows == cols).astype(jnp.bfloat16)             # [MB, R]
    out_ref[:] += jax.lax.dot_general(
        oh, vals, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _table_grad_kernel_dual(row_ref, lane0_ref, bg_ref, out_ref):
    """Paired-table gradient scatter: two tables gathered at IDENTICAL indices
    (the delta-grid contract — panoptic_delta_nef.py:215 queries the delta grid at
    stop-gradient coords, so both grids share rows). The [MB, R] one-hot — roughly
    half the kernel's non-MXU cost — is built ONCE and contracted against a
    [MB, 256] lane-spread holding table A's values in lanes 0-127 and table B's in
    lanes 128-255; one dot feeds a [R, 256] VMEM-resident accumulator."""
    mc = pl.program_id(0)

    @pl.when(mc == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    rows = row_ref[:]                                    # [MB, 1] int32
    lane0 = lane0_ref[:]                                 # [MB, 1] int32
    bg = bg_ref[:]                                       # [MB, 2F] (A then B)
    mb, f2 = bg.shape
    f = f2 // 2
    r = out_ref.shape[0]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (mb, 2 * LANES), 1)
    vals = jnp.zeros((mb, 2 * LANES), jnp.bfloat16)
    for fi in range(f):                                  # static, F is 2 or 4
        sel_a = lanes == (lane0 + fi)
        sel_b = lanes == (lane0 + fi + LANES)
        vals = vals + sel_a.astype(jnp.bfloat16) * bg[:, fi:fi + 1].astype(jnp.bfloat16)
        vals = vals + sel_b.astype(jnp.bfloat16) * bg[:, f + fi:f + fi + 1].astype(jnp.bfloat16)
    cols = jax.lax.broadcasted_iota(jnp.int32, (mb, r), 1)
    oh = (rows == cols).astype(jnp.bfloat16)             # [MB, R]
    out_ref[:] += jax.lax.dot_general(
        oh, vals, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _table_grad_kernel_dual_T(row_ref, lane0_ref, bgT_ref, out_ref):
    """Lane-major variant of the paired-table gradient scatter: event streams
    arrive as [1, MB] / [2F, MB] (events on LANES), so the HBM operands are
    [1, M] / [2F, M] — sublane-padded 8x at worst instead of the 128x
    lane-padding a [M, 1] layout suffers. The one-hot and the lane-spread are
    built TRANSPOSED ([R, MB], [256, MB]) and contracted over the event axis:
    dot(ohT, valsT^T-free) = A @ B^T on the MXU."""
    mc = pl.program_id(0)

    @pl.when(mc == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    rowv = row_ref[:]                                    # [1, MB] int32
    l0 = lane0_ref[:]                                    # [1, MB] int32
    bgT = bgT_ref[:]                                     # [2F, MB]
    f2, mb = bgT.shape
    f = f2 // 2
    r = out_ref.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (r, mb), 0)
    ohT = (cols == rowv).astype(jnp.bfloat16)            # [R, MB]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (2 * LANES, mb), 0)
    valsT = jnp.zeros((2 * LANES, mb), jnp.bfloat16)
    for fi in range(f):                                  # static, F is 2 or 4
        sel_a = lanes == (l0 + fi)
        sel_b = lanes == (l0 + fi + LANES)
        valsT = valsT + sel_a.astype(jnp.bfloat16) * bgT[fi:fi + 1].astype(jnp.bfloat16)
        valsT = valsT + sel_b.astype(jnp.bfloat16) * bgT[f + fi:f + fi + 1].astype(jnp.bfloat16)
    out_ref[:] += jax.lax.dot_general(
        ohT, valsT, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # [R, 256]


def table_grad_matmul_dual_T(idx: jnp.ndarray, bary: jnp.ndarray,
                             g_a: jnp.ndarray, g_b: jnp.ndarray,
                             capacity: int, feature_dim: int,
                             rows_used: int, event_chunk: int = EVENT_CHUNK_DUAL,
                             interpret: bool = False):
    """Row-bounded paired-table gradients with lane-major event streams.

    Same contract as ``table_grad_matmul_dual`` but the event operands live as
    [1, M] / [2F, M] (events minor), which keeps HBM temps small when several
    of these kernels are alive in one program (the unrolled per-level scatter
    for direct-indexed coarse levels, ops/table_gather.py)."""
    v, n = idx.shape
    f = feature_dim
    epr = LANES // f
    rows_full = (capacity * f) // LANES
    rows = min(rows_used, rows_full) if rows_used > 0 else rows_full
    rows = max(8, -(-rows // 8) * 8)
    row_idx = (idx // epr).reshape(1, -1)                     # [1, M]
    lane0 = ((idx % epr) * f).reshape(1, -1)                  # [1, M]
    # [V, F, N] -> [F, V*N] feature-major, event order matching row_idx
    bg_a = (bary[:, None, :] * g_a[None, :, :]).transpose(1, 0, 2).reshape(f, -1)
    bg_b = (bary[:, None, :] * g_b[None, :, :]).transpose(1, 0, 2).reshape(f, -1)
    bgT = jnp.concatenate([bg_a, bg_b], axis=0)               # [2F, M]

    m = row_idx.shape[1]
    # m == 0 (zero events) must still run ONE grid step: the kernel's
    # mc==0 branch is what zero-initialises the output buffer — a
    # zero-size grid would return it uninitialised. The -1 pad rows are
    # dropped by the one-hot construction, so the result is exact zeros.
    pad = (-m) % event_chunk if m else event_chunk
    if pad:
        row_idx = jnp.pad(row_idx, ((0, 0), (0, pad)), constant_values=-1)
        lane0 = jnp.pad(lane0, ((0, 0), (0, pad)))
        bgT = jnp.pad(bgT, ((0, 0), (0, pad)))
        m += pad

    dpacked = pl.pallas_call(
        _table_grad_kernel_dual_T,
        grid=(m // event_chunk,),
        in_specs=[
            pl.BlockSpec((1, event_chunk), lambda mc: (0, mc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, event_chunk), lambda mc: (0, mc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * f, event_chunk), lambda mc: (0, mc),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, 2 * LANES), lambda mc: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 2 * LANES), jnp.float32),
        interpret=interpret,
    )(row_idx.astype(jnp.int32), lane0.astype(jnp.int32), bgT)
    dpacked = _fit_rows(dpacked, rows_full)
    return (dpacked[:, :LANES].reshape(capacity, f),
            dpacked[:, LANES:].reshape(capacity, f))


def _fit_rows(dpacked: jnp.ndarray, rows_full: int) -> jnp.ndarray:
    """Resize the kernel's sublane-aligned [rows, ...] output to exactly
    ``rows_full`` rows: pad when the scatter was row-bounded below the full
    table, slice when sublane alignment (rows = max(8, ceil/8*8)) exceeded a
    small table's true row count (e.g. capacity 256 x F=2 -> 4 packed rows)."""
    rows = dpacked.shape[0]
    if rows < rows_full:
        return jnp.pad(dpacked, ((0, rows_full - rows),) +
                       ((0, 0),) * (dpacked.ndim - 1))
    if rows > rows_full:
        return dpacked[:rows_full]
    return dpacked


def _table_grad_kernel_T(row_ref, lane0_ref, bgT_ref, out_ref):
    """Single-table lane-major variant (see _table_grad_kernel_dual_T)."""
    mc = pl.program_id(0)

    @pl.when(mc == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    rowv = row_ref[:]                                    # [1, MB]
    l0 = lane0_ref[:]                                    # [1, MB]
    bgT = bgT_ref[:]                                     # [F, MB]
    f, mb = bgT.shape
    r = out_ref.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (r, mb), 0)
    ohT = (cols == rowv).astype(jnp.bfloat16)            # [R, MB]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (LANES, mb), 0)
    valsT = jnp.zeros((LANES, mb), jnp.bfloat16)
    for fi in range(f):
        sel = lanes == (l0 + fi)
        valsT = valsT + sel.astype(jnp.bfloat16) * bgT[fi:fi + 1].astype(jnp.bfloat16)
    out_ref[:] += jax.lax.dot_general(
        ohT, valsT, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # [R, 128]


def table_grad_matmul_T(idx: jnp.ndarray, bary: jnp.ndarray, g: jnp.ndarray,
                        capacity: int, feature_dim: int, rows_used: int,
                        event_chunk: int = EVENT_CHUNK,
                        interpret: bool = False) -> jnp.ndarray:
    """Row-bounded single-table gradient with lane-major event streams
    (see table_grad_matmul_dual_T)."""
    v, n = idx.shape
    f = feature_dim
    epr = LANES // f
    rows_full = (capacity * f) // LANES
    rows = min(rows_used, rows_full) if rows_used > 0 else rows_full
    rows = max(8, -(-rows // 8) * 8)
    row_idx = (idx // epr).reshape(1, -1)
    lane0 = ((idx % epr) * f).reshape(1, -1)
    bgT = (bary[:, None, :] * g[None, :, :]).transpose(1, 0, 2).reshape(f, -1)

    m = row_idx.shape[1]
    # m == 0 (zero events) must still run ONE grid step: the kernel's
    # mc==0 branch is what zero-initialises the output buffer — a
    # zero-size grid would return it uninitialised. The -1 pad rows are
    # dropped by the one-hot construction, so the result is exact zeros.
    pad = (-m) % event_chunk if m else event_chunk
    if pad:
        row_idx = jnp.pad(row_idx, ((0, 0), (0, pad)), constant_values=-1)
        lane0 = jnp.pad(lane0, ((0, 0), (0, pad)))
        bgT = jnp.pad(bgT, ((0, 0), (0, pad)))
        m += pad

    dpacked = pl.pallas_call(
        _table_grad_kernel_T,
        grid=(m // event_chunk,),
        in_specs=[
            pl.BlockSpec((1, event_chunk), lambda mc: (0, mc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, event_chunk), lambda mc: (0, mc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, event_chunk), lambda mc: (0, mc),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, LANES), lambda mc: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        interpret=interpret,
    )(row_idx.astype(jnp.int32), lane0.astype(jnp.int32), bgT)
    return _fit_rows(dpacked, rows_full).reshape(capacity, f)


def table_grad_matmul_dual(idx: jnp.ndarray, bary: jnp.ndarray,
                           g_a: jnp.ndarray, g_b: jnp.ndarray,
                           capacity: int, feature_dim: int,
                           event_chunk: int = EVENT_CHUNK_DUAL,
                           interpret: bool = False,
                           rows_used: int = 0):
    """Table gradients for TWO tables sharing indices, via one fused MXU scatter.

    LEGACY LAYOUT — test reference only: its [M, 1]/[M, 2F] event operands
    lane-pad up to 128x in HBM (CLAUDE.md rule 8); production uses the
    lane-major ``table_grad_matmul_dual_T``.

    idx [V, N]; bary [V, N]; g_a/g_b [F, N] cotangents of the two gathers.
    Returns (dtable_a, dtable_b), each [C, F] f32.

    Compared to two ``table_grad_matmul`` calls this halves the one-hot builds and
    the event-stream passes; the dot does the same total MXU work in one issue.
    Default event_chunk is 768 (vs 1024 single): the [MB, R] one-hot plus the
    [R, 256] accumulator must fit VMEM together.

    ``rows_used`` > 0 bounds the scatter to the first ``rows_used`` packed rows:
    for direct-indexed (non-hashed) coarse encoding levels every event row is
    provably < rows_used, so the one-hot build and the MXU dot shrink
    proportionally (the dominant cost is M x R x lanes FLOPs). Rows beyond the
    bound get zero gradient by construction and are zero-padded on return.
    """
    v, n = idx.shape
    f = feature_dim
    epr = LANES // f
    rows_full = (capacity * f) // LANES
    rows = min(rows_used, rows_full) if rows_used > 0 else rows_full
    rows = max(8, -(-rows // 8) * 8)          # sublane-aligned kernel shape
    row_idx = (idx // epr).reshape(-1)                        # [M]
    lane0 = ((idx % epr) * f).reshape(-1)                     # [M]
    bg_a = (bary[:, None, :] * g_a[None, :, :]).transpose(0, 2, 1).reshape(-1, f)
    bg_b = (bary[:, None, :] * g_b[None, :, :]).transpose(0, 2, 1).reshape(-1, f)
    bg = jnp.concatenate([bg_a, bg_b], axis=-1)               # [M, 2F]

    m = row_idx.shape[0]
    # m == 0 (zero events) must still run ONE grid step: the kernel's
    # mc==0 branch is what zero-initialises the output buffer — a
    # zero-size grid would return it uninitialised. The -1 pad rows are
    # dropped by the one-hot construction, so the result is exact zeros.
    pad = (-m) % event_chunk if m else event_chunk
    if pad:
        row_idx = jnp.pad(row_idx, (0, pad), constant_values=-1)
        lane0 = jnp.pad(lane0, (0, pad))
        bg = jnp.pad(bg, ((0, pad), (0, 0)))
        m += pad

    dpacked = pl.pallas_call(
        _table_grad_kernel_dual,
        grid=(m // event_chunk,),
        in_specs=[
            pl.BlockSpec((event_chunk, 1), lambda mc: (mc, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((event_chunk, 1), lambda mc: (mc, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((event_chunk, 2 * f), lambda mc: (mc, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, 2 * LANES), lambda mc: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 2 * LANES), jnp.float32),
        interpret=interpret,
    )(row_idx.reshape(m, 1).astype(jnp.int32),
      lane0.reshape(m, 1).astype(jnp.int32), bg)
    dpacked = _fit_rows(dpacked, rows_full)
    return (dpacked[:, :LANES].reshape(capacity, f),
            dpacked[:, LANES:].reshape(capacity, f))


def table_grad_matmul(idx: jnp.ndarray, bary: jnp.ndarray, g: jnp.ndarray,
                      capacity: int, feature_dim: int,
                      event_chunk: int = EVENT_CHUNK,
                      interpret: bool = False,
                      rows_used: int = 0) -> jnp.ndarray:
    """Per-level table gradient via the fused MXU scatter.

    LEGACY LAYOUT — test reference only: its [M, 1]/[M, F] event operands
    lane-pad up to 128x in HBM (CLAUDE.md rule 8 — 4.25 GB per 34 MB logical
    operand at flagship scale); production uses the lane-major
    ``table_grad_matmul_T``.

    idx [V, N] table entries; bary [V, N]; g [F, N] output cotangent.
    Returns dtable [C, F] f32 = scatter of bary[v,n]*g[f,n] at (idx[v,n], f).

    Within the kernel, traffic is ~(2 ints + F floats) per event; the [M, 128] lane-spread and
    the [M, R] one-hot exist only as per-chunk VMEM tiles. ``rows_used`` bounds
    the scatter for direct-indexed levels (see table_grad_matmul_dual).
    """
    v, n = idx.shape
    f = feature_dim
    epr = LANES // f
    rows_full = (capacity * f) // LANES
    rows = min(rows_used, rows_full) if rows_used > 0 else rows_full
    rows = max(8, -(-rows // 8) * 8)
    row_idx = (idx // epr).reshape(-1)                        # [M]
    lane0 = ((idx % epr) * f).reshape(-1)                     # [M]
    bg = (bary[:, None, :] * g[None, :, :]).transpose(0, 2, 1).reshape(-1, f)

    m = row_idx.shape[0]
    # m == 0 (zero events) must still run ONE grid step: the kernel's
    # mc==0 branch is what zero-initialises the output buffer — a
    # zero-size grid would return it uninitialised. The -1 pad rows are
    # dropped by the one-hot construction, so the result is exact zeros.
    pad = (-m) % event_chunk if m else event_chunk
    if pad:
        row_idx = jnp.pad(row_idx, (0, pad), constant_values=-1)
        lane0 = jnp.pad(lane0, (0, pad))
        bg = jnp.pad(bg, ((0, pad), (0, 0)))
        m += pad

    dpacked = pl.pallas_call(
        _table_grad_kernel,
        grid=(m // event_chunk,),
        in_specs=[
            pl.BlockSpec((event_chunk, 1), lambda mc: (mc, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((event_chunk, 1), lambda mc: (mc, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((event_chunk, f), lambda mc: (mc, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, LANES), lambda mc: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        interpret=interpret,
    )(row_idx.reshape(m, 1).astype(jnp.int32),
      lane0.reshape(m, 1).astype(jnp.int32), bg)
    return _fit_rows(dpacked, rows_full).reshape(capacity, f)
