"""Lane-packed feature-table gather with sparse-scatter backward.

THE hot op of the framework: every grid encoding (hash + permutohedral) reduces to
"gather F features for V vertices per sample from a 2^18-entry table and
barycentric-weight them". Two XLA-on-TPU facts shape the implementation (measured on
v5e, see repo history):

  * Gathering rows from a table whose minor dim is the FULL 128 lanes runs at
    hardware gather speed (~0.1 ms for 2.1M rows from a 2 MB table — the table stays
    VMEM-resident). Gathering from a [C, 2] table lane-pads it 64x (exceeds VMEM) and
    falls off a latency cliff (~1000x slower).
  * Autodiff of a row gather produces a DENSE [N, 128] row scatter-add (25B element
    adds at production scale); the true gradient is 2 non-zeros per row.

So: tables are reshaped (free, row-major) to [C*F/128, 128]; the forward gathers
rows and lane-selects on the VPU; a custom VJP scatters exactly V*F non-zeros per
sample back into the table and routes feature gradients to the barycentric weights
(which stay on the autodiff tape, so coordinate/pose gradients flow untouched).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

LANES = 128


def _direct_gather_mode() -> tuple:
    """(mode, max_onehot_rows) for the direct-level forward gather.

    PAGNERF_GATHER_DIRECT: "onehot" (default) — levels whose packed-row bound
    is <= PAGNERF_ONEHOT_MAX_ROWS replace the hardware gather with an MXU
    iota+eq+dot row select, larger direct levels gather from the sliced live
    rows; "slice" — all direct levels gather from the sliced live rows;
    "0" — disable (round-3 behaviour: every level gathers from the full table).

    Default "0" per the round-4 end-to-end TPU A/B (ROOFLINE.md): the one-hot
    dot wins ~7x per unit STANDALONE for levels under ~160 packed rows, but
    the full 24-level dual forward measured 764 ms (onehot) vs 760 ms
    (hardware gather) — XLA already hides the coarse levels' gather latency
    under the large hashed levels' stream, so there is nothing to win end to
    end and the unrolled direct prefix only adds compile surface. The modes
    stay available for re-probing on other shapes/toolchains."""
    import os
    mode = os.environ.get("PAGNERF_GATHER_DIRECT", "0")
    max_rows = int(os.environ.get("PAGNERF_ONEHOT_MAX_ROWS", "160"))
    return mode, max_rows


def _bf16_gather() -> bool:
    """Cast table rows to bf16 for the FORWARD gather (PAGNERF_BF16_GATHER=1).

    The row gather is partially byte-sensitive (f32->bf16 rows measured 1.16x
    standalone, ROOFLINE.md); the reference itself stores encodings at half
    precision (permuto_grid.py:65). Params stay f32 masters — only the gathered
    read path quantises: features (and the dbary residuals computed from them)
    carry bf16 values; table gradients are unaffected (built from idx/bary/g).
    Default OFF until the end-to-end loss-trajectory A/B pins the quality cost."""
    import os
    return os.environ.get("PAGNERF_BF16_GATHER", "0") == "1"


def _packed_rows(table: jnp.ndarray) -> jnp.ndarray:
    """[C, F] -> [C*F/128, 128] row-major repack (layout-free reshape)."""
    c, f = table.shape
    assert (c * f) % LANES == 0, "table entries*features must fill 128-lane rows"
    # The entries-per-row lane math ((idx % epr) * f) requires every entry to
    # live wholly inside one packed row: f must divide 128, or an entry whose
    # flat offset spans a row boundary silently reads the wrong lanes.
    assert LANES % f == 0, f"feature_dim {f} must divide {LANES}"
    return table.reshape((c * f) // LANES, LANES)


def _gather_feats(table: jnp.ndarray, idx: jnp.ndarray,
                  rows_used: int = 0) -> jnp.ndarray:
    """Gather features for vertex indices. table [C, F], idx [V, N] -> [V, F, N].

    ``rows_used``: static bound on the packed rows the indices can address
    (direct-indexed coarse levels, ops/permuto_encoding.direct_level_specs).
    When >0 the forward exploits it per the direct-gather strategy
    (_direct_gather_mode): slice the packed table to its live rows before the
    hardware gather, or — for levels small enough that an MXU one-hot matmul
    beats the ~150M rows/s hardware gather rate (ROOFLINE.md) — replace the
    gather with an iota+eq+dot row select, the pattern this toolchain is known
    to lower (CLAUDE.md rule 5). Both strategies return values identical to the
    plain gather (the one-hot dot multiplies by exact 1.0/0.0 at HIGHEST
    precision, so no operand rounding occurs)."""
    c, f = table.shape
    epr = LANES // f                      # entries per packed row
    packed = _packed_rows(table)
    mode, max_rows = _direct_gather_mode()
    use_direct = rows_used > 0 and mode != "0"
    if use_direct:
        packed = packed[:rows_used]       # static slice: live rows only
    onehot = use_direct and mode == "onehot" and rows_used <= max_rows
    v, n = idx.shape
    outs = []
    for vi in range(v):                   # static, small (4 or 8)
        lane0 = (idx[vi] % epr) * f                         # [N]
        if onehot:
            # MXU row select: [rows, N] one-hot (lane-major — N on lanes) dotted
            # with the [rows, 128] table slice. HIGHEST keeps f32 operands
            # unrounded (bf16x3 split is exact for 1.0/0.0 x value anyway).
            rowid = idx[vi] // epr                          # [N]
            riota = jax.lax.broadcasted_iota(jnp.int32, (rows_used, n), 0)
            oh = (riota == rowid[None, :]).astype(packed.dtype)
            rows_mat = jnp.einsum("rl,rn->ln", packed, oh,
                                  precision=jax.lax.Precision.HIGHEST)  # [128, N]
            lanes = jax.lax.broadcasted_iota(jnp.int32, (LANES, n), 0)
            per_f = [jnp.sum(rows_mat * (lanes == (lane0 + fi)[None, :]), axis=0)
                     for fi in range(f)]                    # each [N]
        else:
            # promise_in_bounds skips the bounds-check select (indices are
            # hash-masked so always in range); keep the gather standalone via
            # the barrier — fused into the select loop it degrades to
            # element-at-a-time addressing
            rows = packed.at[idx[vi] // epr].get(
                mode="promise_in_bounds")                   # [N, 128] hw gather
            rows = jax.lax.optimization_barrier(rows)
            lanes = jax.lax.broadcasted_iota(jnp.int32, (n, LANES), 1)
            per_f = [jnp.sum(rows * (lanes == (lane0 + fi)[:, None]), axis=1)
                     for fi in range(f)]                    # each [N]
        outs.append(jnp.stack(per_f))                       # [F, N]
    return jnp.stack(outs)                                  # [V, F, N]


@partial(jax.custom_vjp, nondiff_argnums=())
def table_gather_weighted(table: jnp.ndarray, idx: jnp.ndarray,
                          bary: jnp.ndarray) -> jnp.ndarray:
    """out[f, n] = sum_v bary[v, n] * table[idx[v, n], f].

    table [C, F] (differentiable), idx [V, N] int (non-diff), bary [V, N]
    (differentiable — coordinate/pose gradients flow through it). Returns [F, N].
    """
    feats = _gather_feats(table, idx)                       # [V, F, N]
    return jnp.sum(feats * bary[:, None, :], axis=0)


def _fwd(table, idx, bary):
    # Save the gathered features as residuals: the backward then needs ZERO table
    # reads (re-gathering would repeat the most expensive op of the model).
    feats = _gather_feats(table, idx)                       # [V, F, N]
    out = jnp.sum(feats * bary[:, None, :], axis=0)
    return out, (feats, idx, bary, jax.ShapeDtypeStruct(table.shape, table.dtype))


def _bwd(res, g):
    feats, idx, bary, tspec = res                           # g [F, N]
    c, f = tspec.shape
    tdtype = tspec.dtype
    # d table: V*F non-zeros per sample, scattered into the flat [C*F] layout.
    # Events flatten SAMPLE-MAJOR (transpose N to the front): under ray-axis
    # data parallelism the sample axis is the sharded one, and a sample-minor
    # flatten would force XLA to ALL-GATHER the full event stream onto every
    # device before the scatter (caught by __graft_entry__'s collective
    # audit); sample-major blocks keep each device scattering only its own
    # events, joined by the parameter-shaped grad all-reduce.
    flat_idx = (idx[:, None, :] * f
                + jnp.arange(f, dtype=idx.dtype)[None, :, None])   # [V, F, N]
    vals = bary[:, None, :] * g[None, :, :]                        # [V, F, N]
    dtable = jnp.zeros((c * f,), g.dtype).at[
        flat_idx.transpose(2, 0, 1).reshape(-1)].add(
        vals.transpose(2, 0, 1).reshape(-1)).reshape(c, f)
    # d bary from the saved forward features.
    dbary = jnp.sum(feats.astype(g.dtype) * g[None, :, :], axis=1)  # [V, N]
    return dtable.astype(tdtype), None, dbary.astype(bary.dtype)


table_gather_weighted.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Multi-level variant: all levels in one op, Pallas-fused on TPU.
# ---------------------------------------------------------------------------

_PALLAS_GATHER_PROBE: dict = {}


def _probe_pallas_gather(rows: int, f: int, v: int) -> bool:
    """One-shot compile probe for the fused Pallas gather.

    The axon remote-compile toolchain has historically crashed lowering
    ``tpu.dynamic_gather`` beyond one (8, 128) tile (R=8 compiled, R>=64 killed
    the compile helper — which surfaces as a recoverable JaxRuntimeError, see
    PERFORMANCE.md). Rather than a hard env gate, try compiling the kernel once
    at the actual packed-row shape: the moment a toolchain accepts it, the
    VMEM-resident hot path turns itself on."""
    key = (rows, f, v)
    if key not in _PALLAS_GATHER_PROBE:
        try:
            from .pallas_gather import multilevel_gather_fwd
            tp = jax.ShapeDtypeStruct((1, rows, LANES), jnp.float32)
            ip = jax.ShapeDtypeStruct((1, v, rows), jnp.int32)
            bp = jax.ShapeDtypeStruct((1, v, rows), jnp.float32)
            jax.jit(lambda t, i, b: multilevel_gather_fwd(t, i, b, f)).lower(
                tp, ip, bp).compile()
            _PALLAS_GATHER_PROBE[key] = True
        except Exception as e:  # toolchain rejection — fall back to XLA gathers
            import logging
            logging.getLogger(__name__).info(
                "pallas gather probe failed at rows=%d (%s) — using XLA gathers",
                rows, type(e).__name__)
            _PALLAS_GATHER_PROBE[key] = False
    return _PALLAS_GATHER_PROBE[key]


def _use_pallas_cf(c: int, f: int, v: int) -> bool:
    """Gate the fused Pallas gather for a [*, C, F] table stack (see
    ``_use_pallas``). ``f`` is the EFFECTIVE feature width — 2F for the
    lane-concatenated dual-table gather."""
    import os
    mode = os.environ.get("PAGNERF_PALLAS_GATHER", "0")
    if mode not in ("1", "probe", "auto"):
        return False
    try:
        platform = jax.devices()[0].platform
    except Exception:
        platform = "cpu"
    rows = (c * f) // LANES
    if not (platform == "tpu" and rows >= 8 and (c * f) % LANES == 0
            and LANES % f == 0):
        return False
    if mode == "1":
        return True
    return _probe_pallas_gather(rows, f, v)


def _use_pallas(tables: jnp.ndarray, idx: jnp.ndarray) -> bool:
    """Use the fused Pallas gather kernel when on TPU, the packed-row count
    satisfies the hardware gather's shape contract, and (in probe mode) a
    one-shot compile probe confirms the toolchain lowers ``tpu.dynamic_gather``
    at this shape.

    Default OFF (CLAUDE.md rule 5): the probe itself is a remote compile of an
    op known to crash the axon compile helper beyond one tile, and the service
    is fragile enough (multi-minute stalls, outright outages — PERFORMANCE.md)
    that a speculative compile at the start of every fresh training process is
    a poor trade for a lever that needs a toolchain fix anyway.
    PAGNERF_PALLAS_GATHER=1 forces on, =probe compiles once per shape per
    process and turns on iff the toolchain accepts it."""
    c, f = tables.shape[1:]
    return _use_pallas_cf(int(c), int(f), int(idx.shape[1]))


def multilevel_table_gather(tables: jnp.ndarray, idx: jnp.ndarray,
                            bary: jnp.ndarray,
                            rows_used=None) -> jnp.ndarray:
    """out[l, f, n] = sum_v bary[l, v, n] * tables[l, idx[l, v, n], f].

    tables [L, C, F]; idx [L, V, N] int32; bary [L, V, N]. Returns [L, F, N].
    On TPU this runs as a single Pallas kernel (ops/pallas_gather.py); elsewhere it
    falls back to a scan of per-level XLA gathers.

    ``rows_used``: optional per-level static bound on the packed rows the level's
    indices can address (direct-indexed coarse levels, ops/permuto_encoding.py).
    Levels bounded well below the full table get an exact-size MXU scatter in
    the backward instead of the full [MB, R] one-hot/dot.
    """
    l = tables.shape[0]
    ru = tuple(int(r) for r in rows_used) if rows_used is not None else (0,) * l
    return _mtg(ru, tables, idx, bary)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _mtg(rows_used, tables, idx, bary):
    return _ml_forward(tables, idx, bary, rows_used)


def _fwd_split(rows_used) -> int:
    """Static count of leading direct levels the FORWARD unrolls (sliced or
    one-hot gathers need a per-level static row bound, so those levels leave
    the lax.scan). Direct levels are always a coarse prefix (scales decrease
    with level, permuto_encoding.direct_level_specs), so this is a contiguous
    split — the backward already unrolls the same prefix (_split_levels)."""
    mode, _ = _direct_gather_mode()
    if mode == "0":
        return 0
    k = 0
    while k < len(rows_used) and rows_used[k] > 0:
        k += 1
    return k


def _ml_feats(tables, idx, rows_used):
    """Per-level forward features [L, V, F, N]: unrolled direct prefix (static
    rows_used each) + one scan over the hashed tail. bf16 row reads when
    PAGNERF_BF16_GATHER=1 (_bf16_gather)."""
    l = tables.shape[0]
    if _bf16_gather():
        tables = tables.astype(jnp.bfloat16)
    k = _fwd_split(rows_used)

    def body(_, level_in):
        t, i = level_in
        return None, _gather_feats(t, i)                  # [V, F, N]

    if k == 0:
        _, feats = jax.lax.scan(body, None, (tables, idx))
        return feats                                      # [L, V, F, N]
    parts = [_gather_feats(tables[lv], idx[lv], rows_used=rows_used[lv])
             for lv in range(k)]
    if k < l:
        _, tail = jax.lax.scan(body, None, (tables[k:], idx[k:]))
        return jnp.concatenate([jnp.stack(parts), tail])
    return jnp.stack(parts)


def _ml_forward(tables, idx, bary, rows_used=None):
    l, c, f = tables.shape
    n = idx.shape[2]
    if _use_pallas(tables, idx):
        from .pallas_gather import multilevel_gather_fwd
        rows = (c * f) // LANES
        pad = (-n) % rows
        if pad:
            idx = jnp.pad(idx, ((0, 0), (0, 0), (0, pad)))
            bary = jnp.pad(bary, ((0, 0), (0, 0), (0, pad)))
        packed = tables.reshape(l, rows, LANES)
        out = multilevel_gather_fwd(packed, idx, bary, f)
        return out[:, :, :n]
    # Weight per level (never materialise [L, V, F, N] — the no-grad primal
    # serves rendering, where that residual would cost ~1.2 GB at flagship N).
    ru = rows_used if rows_used is not None else (0,) * l
    if _bf16_gather():
        tables = tables.astype(jnp.bfloat16)
    k = _fwd_split(ru)

    def body(_, level_in):
        t, i, b = level_in
        return None, jnp.sum(_gather_feats(t, i) * b[:, None, :], axis=0)

    if k == 0:
        _, out = jax.lax.scan(body, None, (tables, idx, bary))
        return out
    parts = [jnp.sum(_gather_feats(tables[lv], idx[lv], rows_used=ru[lv])
                     * bary[lv][:, None, :], axis=0) for lv in range(k)]
    if k < l:
        _, tail = jax.lax.scan(body, None, (tables[k:], idx[k:], bary[k:]))
        return jnp.concatenate([jnp.stack(parts), tail])
    return jnp.stack(parts)


def _ml_fwd(rows_used, tables, idx, bary):
    if _use_pallas(tables, idx):
        # Pallas path re-gathers in bwd (kernel keeps everything in VMEM anyway).
        return _ml_forward(tables, idx, bary), (None, tables, idx, bary)
    # XLA path: save forward features so the backward does ZERO table reads.
    feats = _ml_feats(tables, idx, rows_used)             # [L, V, F, N]
    out = jnp.sum(feats * bary[:, :, None, :], axis=1)    # [L, F, N]
    return out, (feats, jax.ShapeDtypeStruct(tables.shape, tables.dtype), idx, bary)


def _use_mxu_scatter(c: int, f: int, dual: bool = False) -> bool:
    """MXU scatter for the table gradients — default ON for TPU (opt out with
    PAGNERF_MXU_SCATTER=0): the one-hot-matmul kernel (ops/pallas_scatter.py)
    takes the flagship train step from 349.5 to 539.9 rays/s (1.54x) with an
    identical loss trajectory (bf16-multiply grads; measured on v5e, see
    PERFORMANCE.md)."""
    import os
    if os.environ.get("PAGNERF_MXU_SCATTER", "1") != "1":
        return False
    try:
        platform = jax.devices()[0].platform
    except Exception:
        platform = "cpu"
    # whole packed table + a chunk's one-hot must fit VMEM (~16 MB). The dual
    # kernel accumulates both grids' gradients ([R, 256] f32 vs [R, 128]) but
    # runs 768-event chunks (vs 1024) — model each kernel's actual footprint
    # (flagship c=2^18/f=2: single 11.0 MB, dual 10.9 MB, both deployed).
    from .pallas_scatter import EVENT_CHUNK, EVENT_CHUNK_DUAL
    rows = (c * f) // LANES
    chunk = EVENT_CHUNK_DUAL if dual else EVENT_CHUNK
    acc_lanes = 2 * LANES if dual else LANES
    return (platform == "tpu" and (c * f) % LANES == 0
            and rows * acc_lanes * 4 + chunk * (rows * 2 + 512) < 12 * 2 ** 20)


def _split_levels(rows_used, rows_full):
    """Static split point k: levels [0, k) are direct-indexed with a row bound
    well under the full table (exact-size unrolled scatters pay off); [k, L)
    scatter at full rows. Direct levels are always a coarse PREFIX (scales
    decrease with level), so the split is a contiguous slice — no gather/copy
    of the [L, V, N] event tensors in the backward.

    Default ON (disable with PAGNERF_DIRECT_SCATTER=0). The unrolled kernels
    use the lane-major [1, M] / [2F, M] event layout
    (pallas_scatter.table_grad_matmul_dual_T): the original [M, 1] operands
    lane-pad 128x in HBM and OOM'd with several alive at once. Measured on the
    flagship bench: 5595 -> 6482 rays/s post-prune (1.16x) and 808 -> 946
    pre-prune, with a bit-identical loss trajectory."""
    import os
    if os.environ.get("PAGNERF_DIRECT_SCATTER", "1") != "1":
        return 0
    k = 0
    while k < len(rows_used) and 0 < rows_used[k] <= rows_full // 2:
        k += 1
    return k


def _ml_bwd(rows_used, res, g):
    feats, tables_or_spec, idx, bary = res        # g [L, F, N]
    l, c, f = tables_or_spec.shape
    tdtype = tables_or_spec.dtype
    v, n = idx.shape[1:]
    if _use_mxu_scatter(c, f):
        from .pallas_scatter import table_grad_matmul_T
        rows_full = (c * f) // LANES
        k = _split_levels(rows_used, rows_full)

        # Full-R levels also use the lane-major [1, M]/[F, M] event layout:
        # the [M, 1] column layout lane-pads 128x in HBM (T(8,128) tiling),
        # which at flagship scale materialises ~4.25 GB per 34 MB operand and
        # OOM'd the 16 GB chip with several alive at once (bench round 3).
        def body(_, level_in):
            i_l, b_l, g_l = level_in
            return None, table_grad_matmul_T(i_l, b_l, g_l, c, f, rows_used=0)

        if k == 0:
            _, dtables = jax.lax.scan(body, None, (idx, bary, g))
        else:
            parts = [table_grad_matmul_T(idx[lv], bary[lv], g[lv], c, f,
                                         rows_used=rows_used[lv])
                     for lv in range(k)]   # exact-rows unrolled (lane-major)
            if k < l:
                _, dbig = jax.lax.scan(body, None, (idx[k:], bary[k:], g[k:]))
                dtables = jnp.concatenate([jnp.stack(parts), dbig])
            else:
                dtables = jnp.stack(parts)
    else:
        # d tables: sparse scatter of V*F nonzeros per sample per level, [L*C*F].
        # Sample-major event flatten — see _bwd for the DP-sharding rationale.
        level_off = (jnp.arange(l, dtype=idx.dtype) * (c * f))[:, None, None, None]
        flat_idx = (idx[:, :, None, :] * f
                    + jnp.arange(f, dtype=idx.dtype)[None, None, :, None]
                    + level_off)                                   # [L, V, F, N]
        vals = bary[:, :, None, :] * g[:, None, :, :]              # [L, V, F, N]
        dtables = jnp.zeros((l * c * f,), g.dtype).at[
            flat_idx.transpose(3, 0, 1, 2).reshape(-1)].add(
            vals.transpose(3, 0, 1, 2).reshape(-1)).reshape(l, c, f)
    if feats is None:
        from .pallas_gather import multilevel_gather_dbary
        tables = tables_or_spec
        rows = (c * f) // LANES
        pad = (-n) % rows
        gp = jnp.pad(g, ((0, 0), (0, 0), (0, pad))) if pad else g
        ip = jnp.pad(idx, ((0, 0), (0, 0), (0, pad))) if pad else idx
        packed = tables.reshape(l, rows, LANES)
        dbary = multilevel_gather_dbary(packed, ip, gp, f)[:, :, :n]
    else:
        dbary = jnp.sum(feats.astype(g.dtype) * g[:, None, :, :], axis=2)  # [L,V,N]
    return dtables.astype(tdtype), None, dbary.astype(bary.dtype)


_mtg.defvjp(_ml_fwd, _ml_bwd)


# ---------------------------------------------------------------------------
# Dual-table variant: two same-shape table stacks gathered at SHARED indices.
# ---------------------------------------------------------------------------


def _gather_feats_dual(ta: jnp.ndarray, tb: jnp.ndarray, idx: jnp.ndarray,
                       rows_used: int = 0):
    """One row-gather fetches BOTH tables' features for an index.

    The dual-grid forward reads two [C, F] tables at IDENTICAL indices (the
    delta grid queries stop-gradient copies of the same coords). The row
    gather is lookup-RATE-bound on v5e (~300-400M rows/s regardless of row
    bytes), so two separate gathers pay twice; concatenating the tables on
    the feature axis ([C, 2F] -> 2x-dense packed rows) fetches both grids'
    features in ONE lookup — half the lookups for the same bytes. Exact:
    gather-then-slice returns bit-identical features to two gathers.

    ta/tb [C, F] -> (feats_a, feats_b), each [V, F, N]. ``rows_used`` is in
    [C, F]-packing units (permuto_encoding.direct_level_specs); the [C, 2F]
    concat packs the same entries into 2x-dense rows, so the dual bound is
    2*rows_used (>= the exact ceil(entries*2F/128)).
    """
    c, f = ta.shape
    # (c*f) % 128 == 0 is required of every table anyway, so 2F always packs.
    ru2 = min(2 * rows_used, (c * 2 * f) // LANES) if rows_used > 0 else 0
    both = _gather_feats(jnp.concatenate([ta, tb], axis=1), idx,
                         rows_used=ru2)                   # [V, 2F, N]
    return both[:, :f], both[:, f:]

def dual_multilevel_table_gather(tables_a: jnp.ndarray, tables_b: jnp.ndarray,
                                 idx: jnp.ndarray, bary: jnp.ndarray,
                                 rows_used=None):
    """Gather from two table stacks at one shared lattice.

    out_a[l,f,n] = sum_v bary[l,v,n]                   * tables_a[l, idx[l,v,n], f]
    out_b[l,f,n] = sum_v stop_grad(bary)[l,v,n]        * tables_b[l, idx[l,v,n], f]

    The PAg-NeRF delta-grid contract (panoptic_delta_nef.py:215-226): the delta
    grid is queried at stop-gradient coordinates, so its indices AND barycentric
    weights are numerically identical to the main grid's but carry no coordinate
    gradient. Fusing the two gathers (a) computes the lattice once, (b) skips
    saving the B-side forward features (no dbary_b is ever needed), and (c) lets
    the backward scatter both tables' gradients through ONE one-hot build per
    event chunk (ops/pallas_scatter.table_grad_matmul_dual).

    tables_a/b [L, C, F] (same shape); idx [L, V, N] int32; bary [L, V, N].
    Returns (out_a, out_b), each [L, F, N]. ``rows_used``: see
    multilevel_table_gather.
    """
    l = tables_a.shape[0]
    ru = tuple(int(r) for r in rows_used) if rows_used is not None else (0,) * l
    return _dual_mtg(ru, tables_a, tables_b, idx, bary)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _dual_mtg(rows_used, tables_a, tables_b, idx, bary):
    return _dual_forward(tables_a, tables_b, idx, bary, rows_used)


def _dual_use_pallas(c: int, f: int, v: int) -> bool:
    """The fused dual path needs the toolchain to lower BOTH gather shapes:
    the [C, 2F]-packed forward (2x-dense rows) and the [C, F]-packed A-side
    re-gather that the backward's dbary uses."""
    return _use_pallas_cf(c, 2 * f, v) and _use_pallas_cf(c, f, v)


def _dual_forward(tables_a, tables_b, idx, bary, rows_used=None):
    l, c, f = tables_a.shape
    v, n = idx.shape[1:]
    if _dual_use_pallas(int(c), int(f), int(v)):
        from .pallas_gather import multilevel_gather_dual_fwd
        rows2 = (c * 2 * f) // LANES
        pad = (-n) % rows2
        if pad:
            idx = jnp.pad(idx, ((0, 0), (0, 0), (0, pad)))
            bary = jnp.pad(bary, ((0, 0), (0, 0), (0, pad)))
        rows = (c * f) // LANES
        out_a, out_b = multilevel_gather_dual_fwd(
            tables_a.reshape(l, rows, LANES), tables_b.reshape(l, rows, LANES),
            idx, bary, f)
        return out_a[:, :, :n], out_b[:, :, :n]
    ru = rows_used if rows_used is not None else (0,) * l
    if _bf16_gather():
        tables_a = tables_a.astype(jnp.bfloat16)
        tables_b = tables_b.astype(jnp.bfloat16)
    k = _fwd_split(ru)

    def body(_, level_in):
        ta, tb, i, b = level_in
        fa, fb = _gather_feats_dual(ta, tb, i)            # [V, F, N] each
        return None, (jnp.sum(fa * b[:, None, :], axis=0),
                      jnp.sum(fb * b[:, None, :], axis=0))

    def one(lv):
        fa, fb = _gather_feats_dual(tables_a[lv], tables_b[lv], idx[lv],
                                    rows_used=ru[lv])
        return (jnp.sum(fa * bary[lv][:, None, :], axis=0),
                jnp.sum(fb * bary[lv][:, None, :], axis=0))

    if k == 0:
        _, (out_a, out_b) = jax.lax.scan(body, None,
                                         (tables_a, tables_b, idx, bary))
        return out_a, out_b
    parts = [one(lv) for lv in range(k)]
    pa = jnp.stack([p[0] for p in parts])
    pb = jnp.stack([p[1] for p in parts])
    if k < l:
        _, (ta_, tb_) = jax.lax.scan(body, None, (tables_a[k:], tables_b[k:],
                                                  idx[k:], bary[k:]))
        return jnp.concatenate([pa, ta_]), jnp.concatenate([pb, tb_])
    return pa, pb


def _dual_fwd(rows_used, tables_a, tables_b, idx, bary):
    l, c, f = tables_a.shape
    if _dual_use_pallas(int(c), int(f), int(idx.shape[1])):
        # Pallas path re-gathers the A table in bwd for dbary (everything
        # stays VMEM-resident in the kernel), so no forward features are
        # saved — tables_a itself rides the residuals in spec_a's slot.
        out = _dual_forward(tables_a, tables_b, idx, bary, rows_used)
        res = (None, tables_a,
               jax.ShapeDtypeStruct(tables_b.shape, tables_b.dtype), idx, bary)
        return out, res
    # Capture the PARAM dtypes before any bf16 read-path cast: the backward
    # casts the table gradients to these specs.
    spec_a = jax.ShapeDtypeStruct(tables_a.shape, tables_a.dtype)
    spec_b = jax.ShapeDtypeStruct(tables_b.shape, tables_b.dtype)
    if _bf16_gather():
        tables_a = tables_a.astype(jnp.bfloat16)
        tables_b = tables_b.astype(jnp.bfloat16)
    k = _fwd_split(rows_used)

    def body(_, level_in):
        ta, tb, i, b = level_in
        fa, fb = _gather_feats_dual(ta, tb, i)            # fa saved for dbary,
        return None, (fa, jnp.sum(fb * b[:, None, :], axis=0))   # fb NOT saved

    def one(lv):
        fa, fb = _gather_feats_dual(tables_a[lv], tables_b[lv], idx[lv],
                                    rows_used=rows_used[lv])
        return fa, jnp.sum(fb * bary[lv][:, None, :], axis=0)

    if k == 0:
        _, (feats_a, out_b) = jax.lax.scan(body, None,
                                           (tables_a, tables_b, idx, bary))
    else:
        parts = [one(lv) for lv in range(k)]
        fa_head = jnp.stack([p[0] for p in parts])
        ob_head = jnp.stack([p[1] for p in parts])
        if k < l:
            _, (fa_tail, ob_tail) = jax.lax.scan(
                body, None, (tables_a[k:], tables_b[k:], idx[k:], bary[k:]))
            feats_a = jnp.concatenate([fa_head, fa_tail])
            out_b = jnp.concatenate([ob_head, ob_tail])
        else:
            feats_a, out_b = fa_head, ob_head
    out_a = jnp.sum(feats_a * bary[:, :, None, :], axis=1)
    res = (feats_a, spec_a, spec_b, idx, bary)
    return (out_a, out_b), res


def _dual_bwd(rows_used, res, g):
    feats_a, spec_a, spec_b, idx, bary = res
    g_a, g_b = g                                          # each [L, F, N]
    l, c, f = spec_a.shape
    if _use_mxu_scatter(c, f, dual=True):
        from .pallas_scatter import table_grad_matmul_dual_T
        rows_full = (c * f) // LANES
        k = _split_levels(rows_used, rows_full)

        # lane-major events for full-R levels too — see _ml_bwd for why the
        # [M, 1] column layout is a 128x HBM hazard.
        def body(_, level_in):
            i_l, b_l, ga_l, gb_l = level_in
            return None, table_grad_matmul_dual_T(i_l, b_l, ga_l, gb_l, c, f,
                                                  rows_used=0)

        if k == 0:
            _, (dta, dtb) = jax.lax.scan(body, None, (idx, bary, g_a, g_b))
        else:
            pa, pb = [], []
            for lv in range(k):   # exact-rows unrolled kernels (lane-major)
                a_lv, b_lv = table_grad_matmul_dual_T(
                    idx[lv], bary[lv], g_a[lv], g_b[lv], c, f,
                    rows_used=rows_used[lv])
                pa.append(a_lv)
                pb.append(b_lv)
            if k < l:
                _, (da, db) = jax.lax.scan(body, None, (idx[k:], bary[k:],
                                                        g_a[k:], g_b[k:]))
                dta = jnp.concatenate([jnp.stack(pa), da])
                dtb = jnp.concatenate([jnp.stack(pb), db])
            else:
                dta, dtb = jnp.stack(pa), jnp.stack(pb)
    else:
        def xla_scatter(gg):
            # sample-major event flatten — see _bwd for the DP rationale
            level_off = (jnp.arange(l, dtype=idx.dtype) * (c * f))[:, None, None, None]
            flat_idx = (idx[:, :, None, :] * f
                        + jnp.arange(f, dtype=idx.dtype)[None, None, :, None]
                        + level_off)
            vals = bary[:, :, None, :] * gg[:, None, :, :]
            return jnp.zeros((l * c * f,), gg.dtype).at[
                flat_idx.transpose(3, 0, 1, 2).reshape(-1)].add(
                vals.transpose(3, 0, 1, 2).reshape(-1)).reshape(l, c, f)
        dta, dtb = xla_scatter(g_a), xla_scatter(g_b)
    # bary cotangent from the A side only (B's bary is stop-gradient by contract)
    if feats_a is None:
        # Pallas path: re-gather the A table inside the dbary kernel.
        from .pallas_gather import multilevel_gather_dbary
        tables_a = spec_a                       # real array in the spec slot
        rows = (c * f) // LANES
        n = idx.shape[2]
        pad = (-n) % rows
        gp = jnp.pad(g_a, ((0, 0), (0, 0), (0, pad))) if pad else g_a
        ip = jnp.pad(idx, ((0, 0), (0, 0), (0, pad))) if pad else idx
        dbary = multilevel_gather_dbary(
            tables_a.reshape(l, rows, LANES), ip, gp, f)[:, :, :n]
    else:
        dbary = jnp.sum(feats_a.astype(g_a.dtype) * g_a[:, None, :, :], axis=2)
    return (dta.astype(spec_a.dtype), dtb.astype(spec_b.dtype), None,
            dbary.astype(bary.dtype))


_dual_mtg.defvjp(_dual_fwd, _dual_bwd)
