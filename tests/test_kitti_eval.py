"""Official-style KITTI AP: synthetic known-answer cases."""
import numpy as np
import pytest

from mask_bev_tpu.config import MaskBevConfig
from mask_bev_tpu.evaluation.kitti_eval import (
    boxes_to_annos, clean_data, compute_statistics, eval_class,
    get_official_eval_result, get_thresholds, gt_boxes_to_annos,
    image_box_overlap, mask_to_boxes)


def _gt(centers, yaws=None, names=None):
    centers = np.asarray(centers, float).reshape(-1, 3)
    n = len(centers)
    yaws = np.zeros(n) if yaws is None else np.asarray(yaws)
    names = ["Car"] * n if names is None else names
    dims = np.tile([4.0, 1.8, 1.5], (n, 1))
    return gt_boxes_to_annos(centers, dims, yaws, names)


def _dt(centers, scores, yaws=None):
    centers = np.asarray(centers, float).reshape(-1, 3)
    n = len(centers)
    yaws = np.zeros(n) if yaws is None else np.asarray(yaws)
    boxes = np.stack([centers[:, 0], centers[:, 1],
                      np.full(n, 1.8), np.full(n, 4.0), yaws], -1)
    return boxes_to_annos(boxes, np.asarray(scores))


def test_image_box_overlap():
    a = np.array([[0, 0, 10, 10.0]])
    b = np.array([[0, 0, 10, 10.0], [5, 5, 15, 15], [20, 20, 30, 30]])
    ov = image_box_overlap(a, b)
    np.testing.assert_allclose(ov[0], [1.0, 25 / 175, 0.0], atol=1e-9)


def test_thresholds_monotone():
    scores = np.array([0.9, 0.8, 0.7, 0.6, 0.5])
    th = get_thresholds(scores, num_gt=5)
    assert (np.diff(th) <= 0).all()
    assert th[0] == 0.9


def test_clean_data_gating():
    gt = _gt([[10, 0, 0]])
    gt["occluded"] = np.array([2])  # largely occluded
    dt = _dt([[10, 0, 0]], [0.9])
    nv, ig_gt, ig_dt = clean_data(gt, dt, current_class=0, difficulty=0)
    assert nv == 0 and ig_gt[0] == 1  # ignored on easy
    nv2, ig_gt2, _ = clean_data(gt, dt, 0, 2)
    assert nv2 == 1 and ig_gt2[0] == 0  # counted on hard


def test_perfect_detection_ap_100():
    # >= 41 GT so the official 41-point threshold schedule fills completely
    rng = np.random.default_rng(0)
    gts, dts = [], []
    score = 0.99
    for _ in range(10):
        centers = np.column_stack([
            rng.uniform(-30, 30, 6), rng.uniform(-30, 30, 6), np.zeros(6)])
        scores = score - rng.uniform(0, 0.01, 6)
        score -= 0.02
        gts.append(_gt(centers))
        dts.append(_dt(centers, scores))
    res = get_official_eval_result(gts, dts, current_classes=[0])
    # bev exact; 3d: dt dummy height 1.6 vs gt 1.5 -> IoU 0.9375, > 0.7 overlap.
    # (bbox uses the zero-width dummy 2D boxes of mask-derived predictions --
    # degenerate by design, as in the reference's _preds_to_annos.)
    for metric in ("bev", "3d"):
        for ap in res["car"][metric]:
            assert ap == pytest.approx(100.0, abs=1.0), metric


def test_bbox_metric_with_real_2d_boxes():
    rng = np.random.default_rng(1)
    gts, dts = [], []
    score = 0.99
    for _ in range(10):
        gt = _gt(np.column_stack([rng.uniform(-30, 30, 6),
                                  rng.uniform(-30, 30, 6), np.zeros(6)]))
        x1 = rng.uniform(0, 800, 6)
        y1 = rng.uniform(0, 200, 6)
        bbox = np.column_stack([x1, y1, x1 + 80, y1 + 60])
        gt["bbox"] = bbox
        dt = _dt(gt["location"], score - rng.uniform(0, 0.01, 6))
        dt["bbox"] = bbox.copy()
        score -= 0.02
        gts.append(gt)
        dts.append(dt)
    res = get_official_eval_result(gts, dts, current_classes=[0])
    for ap in res["car"]["bbox"]:
        assert ap == pytest.approx(100.0, abs=1.0)


def test_false_positives_reduce_ap():
    gts = [_gt([[10, 0, 0]])]
    dts = [_dt([[10, 0, 0], [30, 30, 0]], [0.5, 0.9])]  # high-scored FP
    res = get_official_eval_result(gts, dts, [0])
    assert res["car"]["bev"][1] < 100.0


def test_misses_reduce_ap():
    gts = [_gt([[10, 0, 0], [20, 0, 0]])]
    dts = [_dt([[10, 0, 0]], [0.9])]
    prec = eval_class(gts, dts, 0, 1, "bev", 0.7)
    # recall caps at 0.5 -> precision envelope hits zero past recall 0.5
    assert prec[0] == pytest.approx(1.0)
    assert prec[-1] == 0.0


def test_van_ignored_not_fp():
    gts = [_gt([[10, 0, 0]], names=["Van"])]
    dts = [_dt([[10, 0, 0]], [0.9])]
    tp, fp, fn, _ = compute_statistics(
        np.array([[1.0]]), np.array([1]), np.array([0]), np.array([0.9]),
        min_overlap=0.7, score_threshold=0.0)
    assert tp == 0 and fp == 0 and fn == 0  # matched to ignored gt


def test_mask_to_boxes_roundtrip():
    cfg = MaskBevConfig(x_range=(-20, 20), y_range=(-20, 20), voxel_size=0.5)
    h = w = 80
    masks = np.zeros((3, h, w), np.float32)
    # box centered at (x=5, y=-5): col = (5+20)/0.5 = 50, row = (-5+20)/0.5=30
    masks[0, 26:34, 42:58] = 1.0  # 16 cols x 8 rows -> 8m x 4m
    cls = np.zeros((3, 2), np.float32)
    cls[0] = [0.1, 0.9]  # class 1 (car in unflipped convention)
    cls[1] = [0.95, 0.05]  # background
    cls[2] = [0.2, 0.8]  # car but empty mask
    boxes, scores, labels = mask_to_boxes(cls, masks, cfg)
    assert boxes.shape == (1, 5)
    np.testing.assert_allclose(boxes[0, :2], [5.0, -5.0], atol=0.5)
    dims = sorted(boxes[0, 2:4].tolist())
    assert dims == pytest.approx([4.0, 8.0], abs=0.6)
    assert scores[0] == pytest.approx(0.9)
