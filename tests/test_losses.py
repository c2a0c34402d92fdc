"""Loss unit tests: Hungarian virtual labels, things variant + repeated-ID rejection,
SupCon, regularizers, photometric."""
import jax
import jax.numpy as jnp
import numpy as np

from pagnerf_tpu.losses.lin_assignment import (add_position_id_range_cost,
                                               centers_from_points_with_labels,
                                               hungarian_assign,
                                               lin_assignment_loss,
                                               lin_assignment_things_loss)
from pagnerf_tpu.losses.photometric import rgb_l1_loss, semantic_loss
from pagnerf_tpu.losses.regularizers import (grid_tv_l1_loss,
                                             segment_consistency_regularizer,
                                             sigma_sparsity_loss)
from pagnerf_tpu.losses.sup_contrastive import sup_contrastive_loss


def test_hungarian_assign_diagonal():
    cost = jnp.array([[0.0, 1, 1], [1, 0, 1], [1, 1, 0.0]])
    present = jnp.array([True, True, True])
    a = np.asarray(hungarian_assign(cost, present))
    np.testing.assert_array_equal(a, [0, 1, 2])


def test_hungarian_absent_rows_ignored():
    cost = jnp.array([[0.0, 0, 0], [9, 0, 9], [0, 0, 0.0]])
    present = jnp.array([False, True, False])
    a = np.asarray(hungarian_assign(cost, present))
    assert a[1] == 1
    assert a[0] == 0 and a[2] == 0  # absent rows default to 0


def test_lin_assignment_zero_when_consistent():
    """If predictions already match an optimal assignment, the loss is zero
    (reference: 'should never reinforce correct labels', lin_assignment.py:35)."""
    b, r, m = 1, 16, 4
    labels = jnp.array([[i % 3 for i in range(r)]])
    probs = jax.nn.one_hot(labels, m) * 0.97 + 0.01
    loss = lin_assignment_loss(probs, labels, num_labels=m)
    assert float(loss) == 0.0


def test_lin_assignment_positive_when_wrong():
    b, r, m = 1, 12, 4
    labels = jnp.array([[i % 2 for i in range(r)]])
    key = jax.random.PRNGKey(0)
    probs = jax.nn.softmax(jax.random.normal(key, (b, r, m)), -1)
    loss = lin_assignment_loss(probs, labels, num_labels=m)
    assert float(loss) > 0.0


def test_things_loss_reserves_slot_zero():
    """Stuff pixels map to slot 0; things labels to slots >= 1."""
    b, r, m, k = 1, 20, 5, 6
    gt = jnp.array([[0] * 10 + [1] * 5 + [2] * 5])
    stuff = gt == 0
    # predictions: stuff pixels love slot 0; things are uniform (wrong -> loss)
    probs = jnp.full((b, r, m), 1.0 / m)
    loss_map = lin_assignment_things_loss(probs, gt, stuff, num_labels=k)
    assert loss_map.shape == (b, r)
    assert float(loss_map.sum()) > 0.0
    # perfect case: zero loss
    assign_probs = jnp.zeros((b, r, m)).at[0, :10, 0].set(1.0)
    assign_probs = assign_probs.at[0, 10:15, 1].set(1.0).at[0, 15:, 2].set(1.0)
    assign_probs = assign_probs * 0.97 + 0.005
    lm = lin_assignment_things_loss(assign_probs, gt, stuff, num_labels=k)
    np.testing.assert_allclose(np.asarray(lm), 0.0, atol=1e-6)


def test_centers_from_points():
    pts = jnp.array([[0.0, 0, 0], [2, 0, 0], [4, 4, 4]])
    labels = jnp.array([1, 1, 2])
    w = jnp.ones(3)
    c = centers_from_points_with_labels(pts, labels, w, 4)
    np.testing.assert_allclose(np.asarray(c[1]), [1, 0, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(c[2]), [4, 4, 4], atol=1e-5)


def test_position_id_range_cost_penalises_out_of_band():
    k, m = 3, 60
    cost = jnp.zeros((k, m))
    centers_x = jnp.array([1.0, -1.0, 0.0])  # remapped -> x=0, 1, 0.5
    present = jnp.array([True, True, False])
    out = np.asarray(add_position_id_range_cost(cost, centers_x, present))
    assert (out[0] >= 10000).any() and (out[0] == 0).any()
    np.testing.assert_allclose(out[2], 0.0)  # absent rows untouched


def test_things_loss_outlier_rejection_runs():
    b, r, m, k = 1, 16, 5, 6
    gt = jnp.array([[0] * 8 + [1] * 4 + [2] * 4])
    stuff = gt == 0
    probs = jnp.full((b, r, m), 1.0 / m)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (b, r, 3), minval=-1, maxval=1)
    lm = lin_assignment_things_loss(probs, gt, stuff, num_labels=k,
                                    points_3d=pts, outlier_rejection=True)
    assert np.isfinite(np.asarray(lm)).all()


def test_supcon_separable_embeddings_low_loss():
    key = jax.random.PRNGKey(0)
    labels = jnp.array([[0] * 8 + [1] * 8])
    # clustered features -> low loss; random features -> higher loss
    base = jax.nn.one_hot(labels, 4) * 5.0
    clustered = base + 0.01 * jax.random.normal(key, base.shape)
    rand = jax.random.normal(key, base.shape)
    l_c = float(sup_contrastive_loss(clustered, labels))
    l_r = float(sup_contrastive_loss(rand, labels))
    assert l_c < l_r


def test_supcon_anchor_mask():
    labels = jnp.array([[0, 0, 1, 1]])
    feats = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 8))
    mask = jnp.array([[True, True, False, False]])
    out = sup_contrastive_loss(feats, labels, anchor_mask=mask)
    assert np.isfinite(float(out))


def test_segment_consistency_zero_when_consistent():
    b, r, c, k = 1, 12, 4, 5
    labels = jnp.array([[1] * 6 + [2] * 6])
    probs = jax.nn.one_hot(jnp.array([[1] * 6 + [2] * 6]), c) * 0.97 + 0.01
    loss = segment_consistency_regularizer(probs, labels, num_segments=k)
    # consistent segments: loss is the NLL of confident correct predictions (small)
    assert float(loss) < 0.1
    # inconsistent: one pixel disagrees inside segment 1
    bad = probs.at[0, 0].set(jnp.array([0.01, 0.01, 0.97, 0.01]))
    loss_bad = segment_consistency_regularizer(bad, labels, num_segments=k)
    assert float(loss_bad) > float(loss)


def test_sigma_sparsity():
    s = sigma_sparsity_loss(jnp.array([0.0, 1.0]))
    np.testing.assert_allclose(np.asarray(s), [0.0, np.log(3.0)], atol=1e-6)


def test_grid_tv_l1_smooth_vs_rough():
    smooth = lambda x: jnp.ones((x.shape[0], 2))
    rough = lambda x: jnp.sin(x[:, :2] * 50.0)
    key = jax.random.PRNGKey(0)
    l_s = float(grid_tv_l1_loss(smooth, key, sample_size=0.2, num_dim_samples=4))
    l_r = float(grid_tv_l1_loss(rough, key, sample_size=0.2, num_dim_samples=4))
    assert l_s < 1e-6 < l_r


def test_photometric_losses():
    assert float(rgb_l1_loss(jnp.ones((4, 3)), jnp.ones((4, 3)))) == 0.0
    probs = jnp.array([[0.9, 0.1], [0.2, 0.8]])
    t = jnp.array([0, 1])
    l = semantic_loss(probs, t, sem_softmax=True)
    np.testing.assert_allclose(float(l), -(np.log(0.9) + np.log(0.8)) / 2, rtol=1e-5)
    lw = semantic_loss(probs, t, sem_softmax=True, conf=jnp.array([1.0, 0.0]))
    np.testing.assert_allclose(float(lw), -np.log(0.9) / 2, rtol=1e-5)


def test_semantic_loss_ignores_invalid_labels():
    """-1 (unlabeled) targets must contribute zero loss, not wrap to the last
    class (losses/photometric.py guard; reference always has dense preds so a
    raw take_along_axis bug would be silent)."""
    probs = jnp.array([[0.9, 0.1], [0.2, 0.8], [0.5, 0.5]])
    t_all = jnp.array([0, 1])
    t_inv = jnp.array([0, 1, -1])
    l_valid = semantic_loss(probs[:2], t_all, sem_softmax=True)
    l_guard = semantic_loss(probs, t_inv, sem_softmax=True)
    np.testing.assert_allclose(float(l_guard), float(l_valid), rtol=1e-6)
    # out-of-range high labels are also dropped
    l_high = semantic_loss(probs, jnp.array([0, 1, 99]), sem_softmax=True)
    np.testing.assert_allclose(float(l_high), float(l_valid), rtol=1e-6)
    # all-invalid stays finite
    assert np.isfinite(float(semantic_loss(probs, jnp.array([-1, -1, -1]),
                                           sem_softmax=True)))


def test_snap_microbatch():
    """Microbatches must tile the batch exactly (no wrapped remainder slice that
    double-counts images in the accumulated gradient)."""
    from pagnerf_tpu.train.trainer import snap_microbatch
    assert snap_microbatch(6, 4) == 3
    assert snap_microbatch(6, 6) == 6
    assert snap_microbatch(6, 5) == 3
    assert snap_microbatch(7, 3) == 1
    assert snap_microbatch(8, 4) == 4
    assert snap_microbatch(2, 100) == 2


def test_supcon_all_masked_image_is_finite_zero():
    """An image whose anchor_mask is all-False used to produce inf logits ->
    NaN loss/grads poisoning the whole batch (reference returns 0 for it,
    sup_contrastive.py:129-131)."""
    labels = jnp.array([[0, 0, 1, 1], [2, 2, 3, 3]])
    mask = jnp.array([[False] * 4, [True] * 4])
    feats = jax.random.normal(jax.random.PRNGKey(4), (2, 4, 8))

    def loss(f):
        return sup_contrastive_loss(f, labels, anchor_mask=mask)

    v, g = jax.value_and_grad(loss)(feats)
    assert np.isfinite(float(v))
    assert np.isfinite(np.asarray(g)).all()
    # the all-masked image contributes nothing: dropping it (with the same
    # anchor-count denominator) gives the same value
    v_only = sup_contrastive_loss(feats[1:], labels[1:], anchor_mask=mask[1:])
    np.testing.assert_allclose(float(v), float(v_only), rtol=1e-5)


def test_supcon_single_label_image_contributes_zero():
    """Reference gate (sup_contrastive.py:134-136): an image whose masked-in
    pixels carry ONE unique label contributes exactly 0."""
    labels = jnp.array([[5, 5, 5, 5]])
    feats = jax.random.normal(jax.random.PRNGKey(5), (1, 4, 8))
    v = sup_contrastive_loss(feats, labels)
    assert float(v) == 0.0


def test_assignment_yields_valid_matching():
    """Every active row must receive a DISTINCT column (a collapse onto
    column 0 would train several GT labels onto the same slot)."""
    from pagnerf_tpu.ops.assignment import lap_assign

    key = jax.random.PRNGKey(0)
    cost = jax.random.uniform(key, (6, 8))
    present = jnp.ones((6,), bool)
    out = np.asarray(lap_assign(cost, present))
    assert len(set(out.tolist())) == 6, f"duplicate slots: {out}"


def test_things_loss_ignores_out_of_range_ids():
    """GT ids >= num_labels must not be trained toward an arbitrary slot
    (assign[gt] used to clamp to the last label's slot)."""
    b, r, k, m = 1, 8, 4, 6
    gt = jnp.array([[1, 1, 2, 2, 0, 0, 9, 9]])     # 9 >= num_labels
    stuff = gt == 0
    probs = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(1), (b, r, m)), -1)
    lm = lin_assignment_things_loss(probs, gt, stuff, num_labels=k)
    arr = np.asarray(lm)
    assert np.isfinite(arr).all()
    assert (arr[0, 6:] == 0.0).all()   # out-of-range pixels: no supervision


def test_position_id_range_cost_small_m_noop():
    """m <= id_margin (30): the band covers every slot; the helper must skip
    cleanly (the reference NaNs at exactly m == 30 via x % 0)."""
    for m in (6, 30):
        cost = jnp.zeros((3, m))
        out = add_position_id_range_cost(cost, jnp.array([0.5, 0.0, -0.5]),
                                         jnp.ones((3,), bool))
        assert np.isfinite(np.asarray(out)).all()
        np.testing.assert_array_equal(np.asarray(out), np.asarray(cost))


def test_prob_losses_finite_on_packed_cancellation_noise():
    """The packed tracer composites probability channels as prefix-sum
    DIFFERENCES (ops/packed.segment_sum): where the true sum is ~0, fp32
    cancellation can leave tiny NEGATIVE entries, and a raw log(p + eps)
    NaNs — which poisoned the panoptic params of a flagship run from the
    first panoptic epoch. Every log-of-probability loss site must clamp
    (losses.photometric.safe_prob_log). Gradients must be finite too: a NaN
    reaching the optimizer is permanent."""
    from pagnerf_tpu.losses.regularizers import segment_consistency_regularizer

    b, r, m = 2, 16, 6
    probs = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(0), (b, r, m)), -1)
    # inject packed-style noise: a few entries at -1e-8 (true value 0)
    probs = probs.at[:, ::5, 2].set(-1e-8)
    gt = jnp.tile(jnp.arange(r) % 4, (b, 1))
    stuff = gt == 0

    def all_losses(p):
        sem = semantic_loss(p.reshape(-1, m), gt.reshape(-1), sem_softmax=True)
        la = lin_assignment_loss(p, gt, num_labels=4)
        lt = lin_assignment_things_loss(p, gt, stuff, num_labels=4).mean()
        seg = segment_consistency_regularizer(p, gt, num_segments=4)
        return sem + la + lt + seg

    val, grad = jax.value_and_grad(all_losses)(probs)
    assert np.isfinite(float(val)), f"loss NaN on negative-noise probs: {val}"
    assert np.isfinite(np.asarray(grad)).all(), "gradient NaN on negative-noise probs"


def test_nonfinite_grads_skip_update():
    """masked_update must skip the whole step (params AND optimizer state
    bit-identical) when any gradient is non-finite — the reference trains
    under torch AMP GradScaler, which does exactly this; without it one bad
    step poisons the params permanently."""
    import optax
    from pagnerf_tpu.train.optimizer import masked_update

    params = {"a": jnp.ones((4,)), "b": jnp.ones((2, 2))}
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    good = {"a": jnp.full((4,), 0.5), "b": jnp.full((2, 2), -0.5)}
    upd, st = masked_update(tx, good, opt_state, params)
    assert all(np.abs(np.asarray(u)).max() > 0 for u in jax.tree.leaves(upd))

    for poison in (jnp.nan, jnp.inf):
        bad = {"a": good["a"].at[1].set(poison), "b": good["b"]}
        upd, st = masked_update(tx, bad, opt_state, params)
        assert all((np.asarray(u) == 0).all() for u in jax.tree.leaves(upd))
        for n, o in zip(jax.tree.leaves(st), jax.tree.leaves(opt_state)):
            np.testing.assert_array_equal(np.asarray(n), np.asarray(o))


def test_clip_grad_norm_guard_rail():
    """clip_grad_norm must leave in-range gradients bit-identical (scale = 1
    exactly when the global norm <= clip) and rescale blowup gradients to the
    clip norm — the fp32 guard-rail for the -log(p + 1e-27) finite-but-huge
    gradient events the reference's fp16 AMP range bounds implicitly
    (observed: flagship 120v run, sem head destroyed in one epoch)."""
    import optax
    from pagnerf_tpu.train.optimizer import masked_update

    params = {"a": jnp.ones((4,)), "b": jnp.ones((2, 2))}
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    good = {"a": jnp.full((4,), 0.5), "b": jnp.full((2, 2), -0.5)}
    u0, _ = masked_update(tx, good, opt_state, params)
    u1, _ = masked_update(tx, good, opt_state, params, clip_norm=100.0)
    for a, b in zip(jax.tree.leaves(u0), jax.tree.leaves(u1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    huge = {"a": jnp.full((4,), 1e8), "b": jnp.full((2, 2), -1e8)}
    gnorm = float(optax.global_norm(huge))
    scale = 100.0 / gnorm
    clipped = jax.tree.map(lambda g: g * scale, huge)
    u_clip, _ = masked_update(tx, huge, opt_state, params, clip_norm=100.0)
    u_ref, _ = masked_update(tx, clipped, opt_state, params)
    for a, b in zip(jax.tree.leaves(u_clip), jax.tree.leaves(u_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
