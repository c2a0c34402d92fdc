"""Golden tests for the lane-packed table gather (the encoding hot op)."""
import jax
import jax.numpy as jnp
import numpy as np

from pagnerf_tpu.ops.table_gather import (multilevel_table_gather,
                                          table_gather_weighted)


def naive(table, idx, bary):
    feats = table[idx]                       # [V, N, F]
    return jnp.einsum("vn,vnf->fn", bary, feats)


def test_single_level_forward_and_grads():
    key = jax.random.PRNGKey(0)
    c, f, v, n = 256, 2, 4, 37
    table = jax.random.normal(key, (c, f))
    idx = jax.random.randint(key, (v, n), 0, c)
    bary = jax.random.uniform(key, (v, n))
    np.testing.assert_allclose(np.asarray(table_gather_weighted(table, idx, bary)),
                               np.asarray(naive(table, idx, bary)), atol=1e-5)
    gt, gb = jax.grad(lambda t, b: jnp.sum(table_gather_weighted(t, idx, b) ** 2),
                      (0, 1))(table, bary)
    gt_r, gb_r = jax.grad(lambda t, b: jnp.sum(naive(t, idx, b) ** 2),
                          (0, 1))(table, bary)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(gt_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_r), atol=1e-4)


def test_multilevel_matches_per_level():
    key = jax.random.PRNGKey(1)
    l, c, f, v, n = 3, 128, 2, 8, 29
    tables = jax.random.normal(key, (l, c, f))
    idx = jax.random.randint(key, (l, v, n), 0, c)
    bary = jax.random.uniform(key, (l, v, n))
    out = multilevel_table_gather(tables, idx, bary)
    ref = jnp.stack([naive(tables[i], idx[i], bary[i]) for i in range(l)])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # grads including duplicate indices (hash collisions must accumulate)
    idx_dup = idx.at[:, 1].set(idx[:, 0])
    g = jax.grad(lambda t: jnp.sum(multilevel_table_gather(t, idx_dup, bary)))(tables)
    g_ref = jax.grad(lambda t: jnp.sum(
        jnp.stack([naive(t[i], idx_dup[i], bary[i]) for i in range(l)])))(tables)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-4)


def test_bary_grad_flows_to_coords():
    """Pose/coordinate gradients flow through bary (the custom VJP must not cut the
    tape above the weights)."""
    key = jax.random.PRNGKey(2)
    c, f, v, n = 64, 2, 4, 11
    table = jax.random.normal(key, (c, f))
    idx = jax.random.randint(key, (v, n), 0, c)

    def loss(raw):
        bary = jax.nn.softmax(raw, axis=0)
        return jnp.sum(table_gather_weighted(table, idx, bary) ** 2)

    raw = jax.random.normal(key, (v, n))
    g = jax.grad(loss)(raw)
    assert float(jnp.abs(g).sum()) > 0


def test_dual_multilevel_matches_separate_gathers():
    """Fused dual-table gather == two independent gathers, with the delta
    contract: bary cotangent comes from the A side only (B gathers at
    stop-gradient bary, panoptic_delta_nef.py:215)."""
    from pagnerf_tpu.ops.table_gather import dual_multilevel_table_gather
    key = jax.random.PRNGKey(3)
    ka, kb, ki, kw, kc = jax.random.split(key, 5)
    l, c, f, v, n = 3, 128, 2, 4, 41
    ta = jax.random.normal(ka, (l, c, f))
    tb = jax.random.normal(kb, (l, c, f))
    idx = jax.random.randint(ki, (l, v, n), 0, c)
    idx = idx.at[:, 1].set(idx[:, 0])   # include duplicate rows
    bary = jax.random.uniform(kw, (l, v, n))
    ca = jax.random.normal(kc, (l, f, n))
    cb = jax.random.normal(kc, (l, f, n)) * 0.5

    def fused(ta, tb, bary):
        oa, ob = dual_multilevel_table_gather(ta, tb, idx, bary)
        return jnp.sum(oa * ca) + jnp.sum(ob * cb)

    def separate(ta, tb, bary):
        oa = multilevel_table_gather(ta, idx, bary)
        ob = multilevel_table_gather(tb, idx, jax.lax.stop_gradient(bary))
        return jnp.sum(oa * ca) + jnp.sum(ob * cb)

    vf, gf = jax.value_and_grad(fused, argnums=(0, 1, 2))(ta, tb, bary)
    vs, gs = jax.value_and_grad(separate, argnums=(0, 1, 2))(ta, tb, bary)
    np.testing.assert_allclose(float(vf), float(vs), rtol=1e-5)
    for a, b, name in zip(gf, gs, ("dtables_a", "dtables_b", "dbary")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   err_msg=name)


def test_mxu_scan_path_matches_xla_in_interpret_mode(monkeypatch):
    """The DEPLOYED TPU backward (MXU scatter branch of _ml_bwd/_dual_bwd:
    lax.scan over lane-major _T kernels) run on CPU via pallas interpret mode
    must produce the same table/bary gradients as the XLA fallback. Guards the
    scan+kernel composition, not just the standalone kernels."""
    import functools

    from pagnerf_tpu.ops import pallas_scatter, table_gather
    from pagnerf_tpu.ops.table_gather import dual_multilevel_table_gather

    monkeypatch.setattr(table_gather, "_use_mxu_scatter", lambda c, f, dual=False: True)
    monkeypatch.setattr(
        table_gather, "_split_levels", lambda rows_used, rows_full: 0)
    for name in ("table_grad_matmul_T", "table_grad_matmul_dual_T"):
        fn = getattr(pallas_scatter, name)
        monkeypatch.setattr(pallas_scatter, name,
                            functools.partial(fn, interpret=True))

    key = jax.random.PRNGKey(7)
    ka, kb, ki, kw, kc = jax.random.split(key, 5)
    l, c, f, v, n = 2, 256, 2, 4, 37
    ta = jax.random.normal(ka, (l, c, f))
    tb = jax.random.normal(kb, (l, c, f))
    idx = jax.random.randint(ki, (l, v, n), 0, c)
    idx = idx.at[:, 2].set(idx[:, 0])   # duplicates must accumulate
    bary = jax.random.uniform(kw, (l, v, n))
    ct = jax.random.normal(kc, (l, f, n))

    def loss_single(t, b):
        return jnp.sum(multilevel_table_gather(t, idx, b) * ct)

    def loss_dual(t1, t2, b):
        oa, ob = dual_multilevel_table_gather(t1, t2, idx, b)
        return jnp.sum(oa * ct) + jnp.sum(ob * ct * 0.5)

    g_mxu = jax.grad(loss_single, argnums=(0, 1))(ta, bary)
    gd_mxu = jax.grad(loss_dual, argnums=(0, 1, 2))(ta, tb, bary)

    monkeypatch.setattr(table_gather, "_use_mxu_scatter", lambda c, f, dual=False: False)
    g_xla = jax.grad(loss_single, argnums=(0, 1))(ta, bary)
    gd_xla = jax.grad(loss_dual, argnums=(0, 1, 2))(ta, tb, bary)

    for a, b, name in zip(g_mxu, g_xla, ("dtables", "dbary")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-2,
                                   err_msg=f"single {name}")
    for a, b, name in zip(gd_mxu, gd_xla, ("dta", "dtb", "dbary")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-2,
                                   err_msg=f"dual {name}")


def test_dual_interleaved_gather_exact():
    """The interleaved dual gather (one row-gather fetches both tables' features,
    table_gather._gather_feats_dual) is bit-identical to two separate gathers —
    across shapes and in bf16."""
    from pagnerf_tpu.ops.table_gather import _gather_feats, _gather_feats_dual
    key = jax.random.PRNGKey(3)
    ka, kb, ki = jax.random.split(key, 3)
    for c, f, dtype in ((256, 2, jnp.float32),
                        (256, 2, jnp.bfloat16),
                        (512, 4, jnp.float32)):
        ta = jax.random.normal(ka, (c, f)).astype(dtype)
        tb = jax.random.normal(kb, (c, f)).astype(dtype)
        idx = jax.random.randint(ki, (4, 51), 0, c)
        fa, fb = _gather_feats_dual(ta, tb, idx)
        np.testing.assert_array_equal(np.asarray(fa),
                                      np.asarray(_gather_feats(ta, idx)))
        np.testing.assert_array_equal(np.asarray(fb),
                                      np.asarray(_gather_feats(tb, idx)))


def _direct_case(key, l=5, c=512, f=2, v=4, n=201):
    """Tables/indices with a 3-level direct prefix whose indices honour the
    per-level live-entry bound (as permuto_encoding's direct indexing does)."""
    ka, kb, ki, kw = jax.random.split(key, 4)
    rows_used = (2, 3, 5, 0, 0)
    epr = 128 // f
    ta = jax.random.normal(ka, (l, c, f))
    tb = jax.random.normal(kb, (l, c, f))
    idx = np.array(jax.random.randint(ki, (l, v, n), 0, c))
    for lv, r in enumerate(rows_used):
        if r:
            idx[lv] = idx[lv] % (r * epr)
    bary = jax.random.uniform(kw, (l, v, n))
    return ta, tb, jnp.asarray(idx), bary, rows_used


def test_direct_gather_strategies_match(monkeypatch):
    """The sliced-table and MXU one-hot forward strategies for direct levels
    (PAGNERF_GATHER_DIRECT, ROOFLINE.md lever 1) return per-vertex features
    BIT-identical to the full-table gather; end-to-end outputs and grads agree
    to float-reassociation tolerance (the unrolled-vs-scanned V-sum
    reassociates at ~1e-7)."""
    from pagnerf_tpu.ops import table_gather as tg

    ta, tb, idx, bary, rows_used = _direct_case(jax.random.PRNGKey(13))

    def run(mode):
        monkeypatch.setenv("PAGNERF_GATHER_DIRECT", mode)

        def loss(t1, t2, b):
            oa, ob = tg.dual_multilevel_table_gather(t1, t2, idx, b, rows_used)
            o1 = tg.multilevel_table_gather(t1, idx, b, rows_used)
            return jnp.sum(oa ** 2) + jnp.sum(ob ** 2) + jnp.sum(o1 * ob)

        val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(ta, tb, bary)
        feats = [np.asarray(tg._gather_feats(ta[lv], idx[lv],
                                             rows_used=rows_used[lv]))
                 for lv in range(3)]
        return float(val), grads, feats

    v0, g0, f0 = run("0")
    for mode in ("slice", "onehot"):
        v1, g1, f1 = run(mode)
        for a, b in zip(f0, f1):   # gather values themselves: exact
            np.testing.assert_array_equal(a, b, err_msg=mode)
        np.testing.assert_allclose(v1, v0, rtol=1e-6, err_msg=mode)
        for a, b, name in zip(g0, g1, ("dta", "dtb", "dbary")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                       err_msg=f"{mode} {name}")


def test_onehot_rows_threshold(monkeypatch):
    """Levels above PAGNERF_ONEHOT_MAX_ROWS fall back to the sliced hardware
    gather inside onehot mode — outputs stay exact either way."""
    from pagnerf_tpu.ops import table_gather as tg

    ta, tb, idx, bary, rows_used = _direct_case(jax.random.PRNGKey(17))
    monkeypatch.setenv("PAGNERF_GATHER_DIRECT", "onehot")
    monkeypatch.setenv("PAGNERF_ONEHOT_MAX_ROWS", "3")   # level 2 (rows 5) -> slice
    out = tg.multilevel_table_gather(ta, idx, bary, rows_used)
    monkeypatch.setenv("PAGNERF_GATHER_DIRECT", "0")
    ref = tg.multilevel_table_gather(ta, idx, bary, rows_used)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_bf16_gather_read_path(monkeypatch):
    """PAGNERF_BF16_GATHER=1 (ROOFLINE.md lever 2) quantises the gather READ
    path only: outputs track f32 within bf16 tolerance, and all gradients keep
    the f32 param dtype (the masters never quantise)."""
    from pagnerf_tpu.ops import table_gather as tg

    ta, tb, idx, bary, rows_used = _direct_case(jax.random.PRNGKey(19))

    def loss(t1, t2, b):
        oa, ob = tg.dual_multilevel_table_gather(t1, t2, idx, b, rows_used)
        o1 = tg.multilevel_table_gather(t1, idx, b, rows_used)
        return jnp.sum(oa ** 2) + jnp.sum(ob ** 2) + jnp.sum(o1 * ob)

    v0, g0 = jax.value_and_grad(loss, argnums=(0, 1, 2))(ta, tb, bary)
    monkeypatch.setenv("PAGNERF_BF16_GATHER", "1")
    v1, g1 = jax.value_and_grad(loss, argnums=(0, 1, 2))(ta, tb, bary)
    assert all(g.dtype == jnp.float32 for g in g1)
    np.testing.assert_allclose(float(v1), float(v0), rtol=2e-2)
    for a, b, name in zip(g0, g1, ("dta", "dtb", "dbary")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-2,
                                   atol=5e-2 * float(jnp.abs(a).max()),
                                   err_msg=name)


def test_rejects_feature_dim_not_dividing_lanes():
    """f must divide 128: an entry whose flat offset spans a packed-row
    boundary silently reads the wrong lanes (confirmed: table [384, 3], entry
    43 returned entry 43.67's bytes). The pack must fail fast instead."""
    import pytest
    table = jnp.zeros((384, 3))   # c*f = 1152 fills lanes, but 3 ∤ 128
    idx = jnp.zeros((4, 8), jnp.int32)
    bary = jnp.ones((4, 8))
    with pytest.raises(AssertionError, match="must divide"):
        table_gather_weighted(table, idx, bary)


def test_pallas_gather_path_matches_xla_in_interpret_mode(monkeypatch):
    """The TPU-only fused Pallas GATHER branches of _ml_* and _dual_* (forward,
    re-gathered dbary, padding for non-multiple sample counts) run on CPU via
    interpret mode must match the XLA fallback's outputs AND gradients. This is
    the only CI coverage the gather hot path gets — the real path is gated on
    the axon toolchain accepting tpu.dynamic_gather."""
    import functools

    from pagnerf_tpu.ops import pallas_gather, table_gather
    from pagnerf_tpu.ops.table_gather import dual_multilevel_table_gather

    l, c, f, v, n = 2, 512, 2, 4, 37       # n != 0 mod rows: exercises padding
    key = jax.random.PRNGKey(11)
    ka, kb, ki, kw, kc = jax.random.split(key, 5)
    ta = jax.random.normal(ka, (l, c, f))
    tb = jax.random.normal(kb, (l, c, f))
    idx = jax.random.randint(ki, (l, v, n), 0, c)
    idx = idx.at[:, 3].set(idx[:, 1])      # duplicates must accumulate
    bary = jax.random.uniform(kw, (l, v, n))
    ct = jax.random.normal(kc, (l, f, n))

    def loss_single(t, b):
        return jnp.sum(multilevel_table_gather(t, idx, b) * ct)

    def loss_dual(t1, t2, b):
        oa, ob = dual_multilevel_table_gather(t1, t2, idx, b)
        return jnp.sum(oa * ct) + jnp.sum(ob * ct * 0.5)

    v_xla, g_xla = jax.value_and_grad(loss_single, (0, 1))(ta, bary)
    vd_xla, gd_xla = jax.value_and_grad(loss_dual, (0, 1, 2))(ta, tb, bary)

    monkeypatch.setattr(table_gather, "_use_pallas", lambda t, i: True)
    monkeypatch.setattr(table_gather, "_dual_use_pallas", lambda c, f, v: True)
    for name in ("multilevel_gather_fwd", "multilevel_gather_dbary",
                 "multilevel_gather_dual_fwd"):
        fn = getattr(pallas_gather, name)
        monkeypatch.setattr(pallas_gather, name,
                            functools.partial(fn, interpret=True))

    v_pl, g_pl = jax.value_and_grad(loss_single, (0, 1))(ta, bary)
    vd_pl, gd_pl = jax.value_and_grad(loss_dual, (0, 1, 2))(ta, tb, bary)

    np.testing.assert_allclose(float(v_pl), float(v_xla), rtol=1e-5)
    np.testing.assert_allclose(float(vd_pl), float(vd_xla), rtol=1e-5)
    for a, b, name in zip(g_pl, g_xla, ("dtables", "dbary")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   err_msg=f"single {name}")
    for a, b, name in zip(gd_pl, gd_xla, ("dta", "dtb", "dbary")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   err_msg=f"dual {name}")
