"""Evaluation math: AP modes (vs sklearn), mask IoU, min-area-rect, metrics.

Mirrors the reference's pure-tensor eval tests
(mask_bev_test/evaluation/test_average_precision.py:20-89).
"""
import numpy as np
import pytest
from sklearn.metrics import average_precision_score

from mask_bev_tpu.evaluation.average_precision import (
    IntegrationMode, average_precision, batched_mask_iou, mask_iou,
    mask_to_min_area_box, rot_mask_iou)
from mask_bev_tpu.evaluation.detection_metric import (
    BinaryClassifMapMetric, DetectionMapMetric, MaskMeanAveragePrecision,
    MeanIoU)
from mask_bev_tpu.evaluation.min_area_rect import (
    convex_hull, min_area_rect, rect_corners)


def test_ap_perfect_ranking():
    conf = np.array([0.9, 0.8, 0.7, 0.2, 0.1])
    tp = np.array([1.0, 1, 1, 0, 0])
    # the appended (recall=1, precision=0) point (reference parity,
    # average_precision.py:44-47) caps interpolated modes below 1.0
    expected = {
        IntegrationMode.InterpolationCOCO: (1.0, 0.01),
        IntegrationMode.InterpolationPASCAL: (10 / 11, 0.01),
        IntegrationMode.Continuous: (1.0, 1e-6),
        IntegrationMode.Diff: (1.0, 1e-6),
    }
    for mode, (want, tol) in expected.items():
        ap = average_precision(conf, tp, total_gt=3, method=mode)
        assert ap == pytest.approx(want, abs=tol), mode


def test_ap_zero():
    conf = np.array([0.9, 0.8])
    tp = np.array([0.0, 0.0])
    assert average_precision(conf, tp, 3, IntegrationMode.Continuous) == 0.0
    assert average_precision(np.zeros(0), np.zeros(0), 3) == 0.0


def test_ap_matches_sklearn_continuous(rng):
    # continuous-envelope AP ~ sklearn AP for large-ish samples
    for _ in range(5):
        conf = rng.uniform(0, 1, 200)
        tp = (rng.uniform(0, 1, 200) < 0.4).astype(float)
        total_gt = int(tp.sum())
        if total_gt == 0:
            continue
        ours = average_precision(conf, tp, total_gt, IntegrationMode.Continuous)
        theirs = average_precision_score(tp, conf) * 1.0
        # sklearn's AP equals the 'diff' integration of the unsmoothed curve;
        # envelope version is >= and close for random data
        assert ours >= theirs - 0.02


def test_mask_iou():
    a = np.zeros((10, 10))
    b = np.zeros((10, 10))
    a[:5] = 1
    b[:5, :5] = 1
    assert mask_iou(a, a) == pytest.approx(1.0)
    assert mask_iou(a, b) == pytest.approx(0.5)
    got = batched_mask_iou(np.stack([a, a]), np.stack([a, b]))
    np.testing.assert_allclose(got, [1.0, 0.5], atol=1e-9)


def test_min_area_rect_axis_aligned():
    pts = np.array([[0, 0], [4, 0], [4, 2], [0, 2], [2, 1]])
    center, size, ang = min_area_rect(pts)
    np.testing.assert_allclose(center, [2, 1], atol=1e-9)
    assert sorted(size.tolist()) == pytest.approx([2, 4])


def test_min_area_rect_rotated(rng):
    # rectangle rotated by known angle: recover area
    base = np.array([[x, y] for x in np.linspace(-2, 2, 9)
                     for y in np.linspace(-1, 1, 5)])
    th = 0.6
    c, s = np.cos(th), np.sin(th)
    pts = base @ np.array([[c, -s], [s, c]]).T + [5, 3]
    center, size, ang = min_area_rect(pts)
    np.testing.assert_allclose(center, [5, 3], atol=1e-6)
    assert size[0] * size[1] == pytest.approx(8.0, abs=1e-6)


def test_mask_to_min_area_box_picks_largest_component():
    m = np.zeros((30, 30), bool)
    m[2:5, 2:5] = True  # small
    m[10:25, 10:20] = True  # large
    center, size, ang = mask_to_min_area_box(m)
    assert 10 <= center[0] <= 20 and 10 <= center[1] <= 25
    assert size[0] * size[1] == pytest.approx(14 * 9, rel=0.2)
    assert mask_to_min_area_box(np.zeros((5, 5))) is None


def test_rot_mask_iou_identical():
    m = np.zeros((2, 40, 40), bool)
    m[0, 10:30, 5:15] = True
    m[1, 0:8, 0:8] = True
    ious = rot_mask_iou(m, m)
    assert (ious > 0.9).all()


def test_binary_classif_map_metric():
    met = BinaryClassifMapMetric()
    assert met.compute() == 0.0
    met.update(np.array([0.9, 0.8, 0.1]), np.array([1, 1, 0]))
    met.update(np.array([0.7]), np.array([1]))
    assert met.compute() == pytest.approx(1.0, abs=0.01)
    met.reset()
    assert met.compute() == 0.0


def test_detection_map_metric():
    met = DetectionMapMetric()
    met.update(np.array([0.9, 0.2]), np.array([1.0, 0.0]), total_gt=1)
    ap = met.compute()
    assert 0.9 < ap <= 1.0


def test_mean_iou():
    met = MeanIoU()
    met.update(np.array([0.5, 1.0]))
    met.update(np.array([0.0]))
    assert met.compute() == pytest.approx(0.5)


def test_mask_map_perfect_predictions():
    m = MaskMeanAveragePrecision()
    gm = np.zeros((2, 20, 20), bool)
    gm[0, 2:10, 2:10] = True
    gm[1, 12:18, 12:18] = True
    m.update(pred_masks=gm, pred_scores=[0.9, 0.8], pred_labels=[1, 1],
             gt_masks=gm, gt_labels=[1, 1])
    assert m.compute() == pytest.approx(1.0, abs=0.01)


def test_mask_map_misses():
    m = MaskMeanAveragePrecision()
    gm = np.zeros((1, 20, 20), bool)
    gm[0, 2:10, 2:10] = True
    wrong = np.zeros((1, 20, 20), bool)
    wrong[0, 12:18, 12:18] = True
    m.update(pred_masks=wrong, pred_scores=[0.9], pred_labels=[1],
             gt_masks=gm, gt_labels=[1])
    assert m.compute() == pytest.approx(0.0, abs=0.01)


# ---------------------------------------------------------------------------
# Vendored COCO-mAP oracle cases: expected values hand-computed from the
# pycocotools COCOeval rules (score-ordered greedy matching, first-max gt
# tie-break, 101-recall-point precision lookup with zero beyond the attained
# recall). These pin MaskMeanAveragePrecision — the stand-in for
# torchmetrics MeanAveragePrecision(iou_type='segm') used by the reference
# (mask_bev_module.py:87) — since torchmetrics/pycocotools cannot be
# installed here. Derivations in comments; thresholds are
# 0.50:0.95:0.05, AP_t averaged over classes then thresholds.
# ---------------------------------------------------------------------------


def _mk_map_from_ious(images):
    from mask_bev_tpu.evaluation.detection_metric import (
        MaskMeanAveragePrecision)
    m = MaskMeanAveragePrecision()
    for scores, labels, gt_labels, ious in images:
        m.update_from_ious(np.asarray(scores), np.asarray(labels),
                           np.asarray(gt_labels), np.asarray(ious))
    return m


def test_mask_map_oracle_partial_matches():
    """2 GT, 3 dets with IoUs spanning thresholds.

    t=.50/.55: TP(g0),FP,TP(g1) -> rc .5,.5,1; prec env 1,2/3,2/3;
      AP = (51*1 + 50*2/3)/101 = 0.8349835
    t=.60: TP,FP,FP -> AP = 51/101 = 0.5049505
    t=.65/.70: FP,TP(g0),FP -> env prec .5 up to rc .5 -> AP = 25.5/101
    t>=.75: all FP -> 0.
    map = (2*0.8349835 + 0.5049505 + 2*0.2524752)/10 = 0.2679868
    (IoUs sit strictly between thresholds — arange thresholds carry float
    error, so a mask IoU exactly AT a nominal threshold is ill-defined.)
    """
    m = _mk_map_from_ious([(
        [0.9, 0.8, 0.7], [1, 1, 1], [1, 1],
        [[0.61, 0.1],
         [0.71, 0.4],
         [0.2, 0.56]],
    )])
    d = m.compute_dict()
    assert d["map_50"] == pytest.approx(0.8349835, abs=1e-6)
    assert d["map_75"] == pytest.approx(0.0, abs=1e-9)
    assert d["map"] == pytest.approx(0.2679868, abs=1e-6)


def test_mask_map_oracle_two_classes_two_images():
    """Class 1: perfect det (IoU .96) in image 1 -> AP 1 at all thresholds.
    Class 2: its only gt (image 2) has no det -> AP 0. map = 0.5."""
    m = _mk_map_from_ious([
        ([0.9], [1], [1], [[0.96]]),
        (np.zeros(0), np.zeros(0, np.int64), [2], np.zeros((0, 1))),
    ])
    d = m.compute_dict()
    assert d["map"] == pytest.approx(0.5, abs=1e-9)
    assert d["map_50"] == pytest.approx(0.5, abs=1e-9)
    assert d["map_75"] == pytest.approx(0.5, abs=1e-9)


def test_mask_map_oracle_score_order_greedy():
    """The higher-score det takes the gt even when a lower-score det
    overlaps it better (COCOeval is greedy in score order).

    1 GT; d0 (s .9, IoU .62), d1 (s .8, IoU .92).
    t=.50/.55/.60: TP,FP -> env prec 1 at rc 1 -> AP 1.
    t=.65..-.90 (6): FP,TP -> env prec .5 everywhere -> AP .5.
    t=.95: 0. map = (3 + 6*.5)/10 = 0.6
    """
    m = _mk_map_from_ious([(
        [0.9, 0.8], [1, 1], [1], [[0.62], [0.92]],
    )])
    d = m.compute_dict()
    assert d["map_50"] == pytest.approx(1.0, abs=1e-9)
    assert d["map_75"] == pytest.approx(0.5, abs=1e-9)
    assert d["map"] == pytest.approx(0.6, abs=1e-9)


def test_mask_map_oracle_gt_tie_breaks_last():
    """Exact IoU tie between two gts: COCOeval's gt scan skips only on
    strictly-smaller IoU (``if ious < iou: continue``), so an equal IoU
    still updates the match — the LAST gt of the tie wins. d0 ties
    (.82/.82) and must take g1, leaving g0 (IoU .92 to d1) free.

    2 GT. t=.50..-.80 (7): TP(g1), TP(g0) -> rc 1, prec 1 -> AP = 1
    t=.85/.90: FP (.82<t), TP (g0 free, .92>=t) -> AP = 25.5/101 = .2524752
    t=.95: 0. map = (7*1 + 2*.2524752)/10 = 0.7504951
    (A first-max tie-break would send d0 to g0, make d1 a FP below t=.85,
    and deflate map to 0.4039604 — the case this oracle exists to catch.)
    """
    m = _mk_map_from_ious([(
        [0.9, 0.8], [1, 1], [1, 1],
        [[0.82, 0.82],
         [0.92, 0.30]],
    )])
    d = m.compute_dict()
    assert d["map_50"] == pytest.approx(1.0, abs=1e-6)
    assert d["map"] == pytest.approx(0.7504951, abs=1e-6)


def test_mask_map_oracle_no_trapezoid_ramp():
    """Beyond the attained recall the precision is ZERO (pycocotools
    searchsorted lookup), not a linear ramp to (1, 0): one TP at rc .5 with
    nothing after it must give AP exactly 51/101, not the trapezoid 0.75."""
    m = _mk_map_from_ious([(
        [0.9], [1], [1, 1], [[0.96, 0.0]],
    )])
    d = m.compute_dict()
    assert d["map"] == pytest.approx(0.5049505, abs=1e-6)
