"""Loss parity against the reference's OWN torch modules as oracles.

The reference loss files are pure torch/scipy/numpy, so they run on CPU here:
random inputs go through both implementations and the outputs must agree.
This is the strongest available parity evidence for the loss layer — golden
numbers computed by the actual reference code, not by a re-derivation.

Skipped when the read-only reference checkout is absent. Nothing is copied:
the reference modules are imported from /root/reference at test time.
"""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.exists(REF),
                                reason="reference checkout absent")


def _load_ref(relpath, name, stub_outlier=False):
    if stub_outlier and "utils.outlier_rejection" not in sys.modules:
        # lin_assignment_things imports kaolin-backed helpers at module load;
        # with outlier_rejection=False they are never CALLED — stub the import.
        pkg = types.ModuleType("utils")
        sub = types.ModuleType("utils.outlier_rejection")
        sub.centers_from_3d_points_with_ids = None
        sub.add_position_id_range_cost = None
        pkg.outlier_rejection = sub
        sys.modules["utils"] = pkg
        sys.modules["utils.outlier_rejection"] = sub
    spec = importlib.util.spec_from_file_location(name,
                                                  os.path.join(REF, relpath))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("pn_ratio", [0.5, 0.3])
def test_supcon_matches_reference(pn_ratio):
    import torch

    import jax.numpy as jnp
    from pagnerf_tpu.losses.sup_contrastive import sup_contrastive_loss

    ref = _load_ref("loss/sup_contrastive.py", "ref_supcon")
    rng = np.random.default_rng(3)
    b, r, d = 3, 40, 8
    feats = rng.normal(size=(b, r, d)).astype(np.float32)
    labels = rng.integers(0, 5, size=(b, r))
    mask = rng.random((b, r)) > 0.3
    mask[1] = False                      # one all-masked image must contribute 0

    loss_ref = ref.SupConLoss(temperature=0.07, base_temperature=0.07,
                              pn_ratio=pn_ratio)(
        torch.tensor(feats), labels=torch.tensor(labels),
        reduction="mean", anchor_mask=torch.tensor(mask))
    loss_ours = sup_contrastive_loss(jnp.asarray(feats), jnp.asarray(labels),
                                     jnp.asarray(mask), temperature=0.07,
                                     base_temperature=0.07, pn_ratio=pn_ratio)
    np.testing.assert_allclose(float(loss_ours), float(loss_ref), rtol=2e-4)


def test_lin_assignment_matches_reference():
    import torch

    import jax.numpy as jnp
    from pagnerf_tpu.losses.lin_assignment import lin_assignment_loss

    ref = _load_ref("loss/lin_assignment.py", "ref_linassign")
    rng = np.random.default_rng(5)
    b, r, m = 4, 64, 6
    scores = rng.random((b, r, m)).astype(np.float32) + 1e-3
    probs = scores / scores.sum(-1, keepdims=True)     # trainer passes softmaxed
    labels = rng.integers(0, m, size=(b, r))

    loss_ref = ref.LinAssignmentLoss()(torch.tensor(probs),
                                       torch.tensor(labels))
    loss_ours = lin_assignment_loss(jnp.asarray(probs), jnp.asarray(labels),
                                    num_labels=m)
    np.testing.assert_allclose(float(loss_ours), float(loss_ref), rtol=1e-4)


def test_lin_assignment_things_map_matches_reference():
    import torch

    import jax.numpy as jnp
    from pagnerf_tpu.losses.lin_assignment import lin_assignment_things_loss

    ref = _load_ref("loss/lin_assignment_things.py", "ref_things",
                    stub_outlier=True)
    rng = np.random.default_rng(7)
    b, r, m, k = 3, 80, 7, 7
    scores = rng.random((b, r, m)).astype(np.float32) + 1e-3
    probs = scores / scores.sum(-1, keepdims=True)
    labels = rng.integers(0, k, size=(b, r))           # 0 = stuff/background
    stuff = labels == 0                                # stuff pixels valid too

    # the reference ctor eagerly allocates its centers db on 'cuda'
    # (lin_assignment_things.py:20) — build the module without __init__
    loss_obj = ref.LinAssignmentThingsLoss.__new__(ref.LinAssignmentThingsLoss)
    torch.nn.Module.__init__(loss_obj)
    loss_obj.outlier_rejection = False
    loss_obj.min_distance, loss_obj.max_distance = 0.2, 0.5
    map_ref = loss_obj(torch.tensor(probs), torch.tensor(labels),
                       torch.tensor(stuff))
    map_ours = lin_assignment_things_loss(jnp.asarray(probs),
                                          jnp.asarray(labels),
                                          jnp.asarray(stuff), num_labels=k)
    np.testing.assert_allclose(np.asarray(map_ours), map_ref.numpy(),
                               rtol=1e-4, atol=1e-6)
