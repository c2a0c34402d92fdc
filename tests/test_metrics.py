"""Metric tests. The PQ example is the reference's own doctest
(utils/metrics/panoptic_quality.py:57-88) — expected pq_all = 0.5463."""
import numpy as np

from pagnerf_tpu.utils.metrics import (IoU, MeanAveragePrecision, PSNR,
                                       PanopticQuality, _mask_iou)


def test_psnr():
    m = PSNR()
    m.update(np.full((4, 4), 0.5), np.full((4, 4), 0.5))
    assert m.compute() > 100  # identical -> huge psnr
    m2 = PSNR()
    m2.update(np.zeros((10, 10)), np.full((10, 10), 0.1))
    np.testing.assert_allclose(m2.compute(), 20.0, atol=1e-5)


def test_iou_macro():
    m = IoU(num_classes=3)
    pred = np.array([0, 0, 1, 1, 2, 2])
    tgt = np.array([0, 0, 1, 2, 2, 2])
    m.update(pred, tgt)
    # class0: 2/2=1; class1: 1/2; class2: 2/3
    np.testing.assert_allclose(m.compute(), (1 + 0.5 + 2 / 3) / 3, atol=1e-6)


def test_panoptic_quality_reference_example():
    pred_sem = np.array([[6, 0, 6, 6],
                         [0, 0, 6, 0],
                         [0, 0, 6, 0],
                         [0, 7, 6, 1],
                         [0, 7, 7, 7]])
    pred_inst = np.array([[0, 0, 0, 0],
                          [0, 0, 0, 9],
                          [0, 0, 0, 9],
                          [0, 0, 0, 0],
                          [0, 0, 0, 0]])
    tgt_sem = np.array([[6, 0, 6, 0],
                        [0, 0, 6, 0],
                        [0, 0, 6, 1],
                        [0, 7, 1, 1],
                        [0, 7, 7, 7]])
    tgt_inst = np.array([[0, 1, 0, 1],
                         [1, 1, 0, 1],
                         [1, 1, 0, 0],
                         [1, 0, 0, 0],
                         [1, 0, 0, 0]])
    pred = np.stack([pred_sem, pred_inst])[None]
    target = np.stack([tgt_sem, tgt_inst])[None]
    pq = PanopticQuality(things={0, 1}, stuff={6, 7},
                         allow_unknown_preds_category=True)
    pq.update(pred, target)
    res = pq.compute()
    np.testing.assert_allclose(res["all"]["pq"], 0.5463, atol=1e-3)


def test_panoptic_quality_perfect():
    sem = np.random.default_rng(0).integers(0, 2, (1, 8, 8))
    inst = (sem == 1).astype(np.int64) * 3
    img = np.stack([sem, inst], axis=1)
    pq = PanopticQuality(things={1}, stuff={0})
    pq.update(img, img)
    res = pq.compute()
    assert res["all"]["pq"] == 1.0
    assert res["things"]["pq"] == 1.0


def test_mask_iou():
    a = np.zeros((1, 4, 4), bool); a[0, :2] = True
    b = np.zeros((2, 4, 4), bool); b[0, :2] = True; b[1, 2:] = True
    iou = _mask_iou(a, b)
    np.testing.assert_allclose(iou, [[1.0, 0.0]], atol=1e-9)


def test_map_perfect_predictions():
    m = MeanAveragePrecision()
    gt = np.zeros((2, 8, 8), bool); gt[0, :4] = True; gt[1, 4:] = True
    m.update(gt.copy(), np.ones(2), gt)
    res = m.compute()
    np.testing.assert_allclose(res["map"], 1.0, atol=1e-6)
    np.testing.assert_allclose(res["map_50"], 1.0, atol=1e-6)


def test_map_half_matched():
    m = MeanAveragePrecision()
    gt = np.zeros((2, 8, 8), bool); gt[0, :4] = True; gt[1, 4:] = True
    pred = np.zeros((2, 8, 8), bool); pred[0, :4] = True  # second mask empty-wrong
    pred[1, 0, 0] = True
    m.update(pred, np.array([0.9, 0.8]), gt)
    res = m.compute()
    assert 0.0 < res["map_50"] < 1.0


def test_clean_instance_map_scale_aware_min_px():
    """The reference's hardcoded 100-px small-mask drop (pc_nerf/trainer.py:765,
    tuned for 1280x720) deletes half the valid 45-220 px instances at synthetic
    96x72 scale — min_mask_px must be configurable (round-2 weak point #3:
    cleanup on PERFECT GT input halved mAP)."""
    import numpy as np

    from pagnerf_tpu.utils.postprocess import clean_instance_map

    inst = np.zeros((72, 96), np.int32)
    inst[10:17, 10:17] = 1            # 49 px: valid sphere at this resolution
    inst[40:55, 40:55] = 2            # 225 px
    cleaned100, masks100, _ = clean_instance_map(inst, 0, outlier_rejection=False,
                                                 min_mask_px=100)
    assert 1 not in np.unique(cleaned100)          # reference default drops it
    cleaned10, masks10, _ = clean_instance_map(inst, 0, outlier_rejection=False,
                                               min_mask_px=10)
    np.testing.assert_array_equal(cleaned10, inst)  # scale-aware keeps both


def test_decode_instance_map_gated_vs_joint():
    """The semantic-gated decode (utils/postprocess.decode_instance_map): the
    semantic head decides stuff-vs-things; the instance head only picks WHICH
    thing (slots 1..M-1). The confidence map must report the activation of the
    slot the decode chose — not the joint max, which can belong to the
    gated-out stuff slot."""
    import numpy as np

    from pagnerf_tpu.utils.postprocess import decode_instance_map

    # 2x2 image, 3 slots. Pixel (0,0): stuff slot dominates (0.6) but the
    # semantic head says "things" -> gated decode must pick slot 2 (0.3).
    e = np.array([[0.6, 0.1, 0.3],    # things px, stuff slot spuriously high
                  [0.1, 0.8, 0.1],    # things px, slot 1
                  [0.9, 0.05, 0.05],  # stuff px
                  [0.2, 0.1, 0.7]])   # things px, slot 2
    sem_map = np.array([[1, 1], [0, 2]])   # 0 = stuff
    stuff_ids = [0]

    inst, conf = decode_instance_map(e, sem_map, stuff_ids, gated=True)
    np.testing.assert_array_equal(inst, [[2, 1], [0, 2]])
    # confidence of the CHOSEN slot: 0.3 (not the joint max 0.6)
    np.testing.assert_allclose(conf, [[0.3, 0.8], [0.9, 0.7]])

    inst_j, conf_j = decode_instance_map(e, sem_map, stuff_ids, gated=False)
    np.testing.assert_array_equal(inst_j, [[0, 1], [0, 2]])
    np.testing.assert_allclose(conf_j, [[0.6, 0.8], [0.9, 0.7]])
