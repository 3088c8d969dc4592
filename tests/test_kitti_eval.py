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
    prec, _ = eval_class(gts, dts, 0, 1, "bev", 0.7)
    # recall caps at 0.5 -> precision envelope hits zero past recall 0.5
    assert prec[0] == pytest.approx(1.0)
    assert prec[-1] == 0.0


def test_van_ignored_not_fp():
    gts = [_gt([[10, 0, 0]], names=["Van"])]
    dts = [_dt([[10, 0, 0]], [0.9])]
    tp, fp, fn, _, _ = compute_statistics(
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


def test_aos_perfect_orientation_equals_bbox_ap():
    """With exact alphas, AOS == bbox AP; with opposite alphas, AOS == 0
    (similarity (1+cos(pi))/2 = 0 per TP, reference kitti_eval.py:375-383)."""
    from mask_bev_tpu.evaluation.kitti_eval import get_official_eval_result

    def frame(alpha_dt):
        gt = _gt([[10, 0, 0], [20, 5, 0]])
        gt["alpha"] = np.array([0.3, -0.7])
        dt = _dt([[10, 0, 0], [20, 5, 0]], [0.9, 0.8])
        dt["alpha"] = np.array(alpha_dt)
        return gt, dt

    gt, dt = frame([0.3, -0.7])
    res = get_official_eval_result([gt], [dt])
    assert "aos" in res["car"]
    assert res["car"]["aos"][1] == pytest.approx(res["car"]["bbox"][1])

    gt, dt = frame([0.3 + np.pi, -0.7 + np.pi])
    res = get_official_eval_result([gt], [dt])
    assert res["car"]["aos"][1] == pytest.approx(0.0, abs=1e-9)


def test_aos_disabled_for_no_alpha_sentinel():
    from mask_bev_tpu.evaluation.kitti_eval import get_official_eval_result

    gt = _gt([[10, 0, 0]])
    dt = _dt([[10, 0, 0]], [0.9])
    dt["alpha"] = np.array([-10.0])  # official 'no orientation' sentinel
    res = get_official_eval_result([gt], [dt])
    assert "aos" not in res["car"]


def test_coco_eval_sweeps_overlaps():
    """Perfect detections: coco AP == 100 at every overlap; a sloppy box
    scores lower under coco (strict 0.95 sweep) than the fixed 0.7 metric."""
    from mask_bev_tpu.evaluation.kitti_eval import (
        get_coco_eval_result, get_official_eval_result)

    locs = [[10 + 7 * i, 6 * (i % 5), 0] for i in range(45)]
    scores = [0.99 - 0.01 * i for i in range(45)]
    gts = [_gt(locs)]
    res = get_coco_eval_result(gts, [_dt(locs, scores)])
    assert res["car"]["bev"][1] == pytest.approx(100.0, abs=1.0)

    # shift detections: passes IoU 0.7 but not the strict end of the sweep
    locs_off = [[x + 0.35, y, z] for x, y, z in locs]
    coco = get_coco_eval_result(gts, [_dt(locs_off, scores)])["car"]["bev"][1]
    official = get_official_eval_result(
        gts, [_dt(locs_off, scores)])["car"]["bev"][1]
    assert coco < official


def test_mask_to_boxes_anisotropic_grid():
    """Rotated box on a non-square grid: the metric-space rect fit must
    recover true dims (pixel-space fit + scaling would distort them)."""
    from mask_bev_tpu.datasets.synthetic import rasterize_rotated_box

    cfg = MaskBevConfig(x_range=(-20, 20), y_range=(-10, 10), voxel_size=0.25)
    # grid: W = 160 (0.25 m), H = 80 (0.25 m) -- then fake anisotropy by
    # evaluating at half vertical resolution
    h, w = cfg.grid_hw
    m = np.zeros((h, w), bool)
    rasterize_rotated_box(m, 4.0, -2.0, 8.0, 3.0, np.deg2rad(30), cfg)
    masks = m[None, ::2, :].astype(np.float32)  # (1, H/2, W) -> sy = 2*sx
    cls = np.array([[0.1, 0.9]], np.float32)
    boxes, scores, labels = mask_to_boxes(cls, masks, cfg)
    assert boxes.shape == (1, 5)
    np.testing.assert_allclose(boxes[0, :2], [4.0, -2.0], atol=0.5)
    dims = sorted(boxes[0, 2:4].tolist())
    assert dims == pytest.approx([3.0, 8.0], abs=0.7)


def test_compute_statistics_multi_matches_scalar():
    """The threshold-vectorized matcher reproduces the scalar greedy loop
    bit-for-bit across randomized frames (incl. ignored gts/dts, ties)."""
    from mask_bev_tpu.evaluation.kitti_eval import compute_statistics_multi

    rng = np.random.default_rng(7)
    for _ in range(60):
        ng = int(rng.integers(0, 9))
        nd = int(rng.integers(0, 12))
        ov = rng.uniform(0, 1, (ng, nd))
        # force exact ties sometimes
        if ng >= 2 and nd >= 2 and rng.random() < 0.5:
            ov[0, :] = ov[-1, :]
            ov[:, 0] = ov[:, -1]
        ig_gt = rng.choice([-1, 0, 0, 0, 1], ng)
        ig_dt = rng.choice([-1, 0, 0, 0, 1], nd)
        scores = np.round(rng.uniform(0, 1, nd), 2)
        ga = rng.uniform(-np.pi, np.pi, ng)
        da = rng.uniform(-np.pi, np.pi, nd)
        thr = np.round(np.sort(rng.uniform(0, 1, 5))[::-1], 2)
        min_ov = 0.5
        tp, fp, fn, sim = compute_statistics_multi(
            ov, ig_gt, ig_dt, scores, min_ov, thr,
            gt_alphas=ga, dt_alphas=da)
        for t_idx, t in enumerate(thr):
            a, b, c, s, _ = compute_statistics(
                ov, ig_gt, ig_dt, scores, min_ov, float(t),
                gt_alphas=ga, dt_alphas=da)
            assert (a, b, c) == (tp[t_idx], fp[t_idx], fn[t_idx]), (
                t_idx, ng, nd)
            np.testing.assert_allclose(s, sim[t_idx], atol=1e-12)


def test_eval_class_overlap_injection_identical():
    """eval_class(overlaps=prepare_overlaps(...)) == recomputing inline."""
    from mask_bev_tpu.evaluation.kitti_eval import prepare_overlaps

    rng = np.random.default_rng(3)
    gts, dts = [], []
    for _ in range(6):
        n = int(rng.integers(1, 6))
        centers = np.column_stack([
            rng.uniform(5, 60, n), rng.uniform(-20, 20, n), np.zeros(n)])
        gts.append(_gt(centers))
        jitter = centers + rng.normal(0, 0.4, centers.shape)
        dts.append(_dt(jitter, rng.uniform(0.3, 1, n)))
    ovs = prepare_overlaps(gts, dts, "bev")
    p1, _ = eval_class(gts, dts, 0, 1, "bev", 0.5)
    p2, _ = eval_class(gts, dts, 0, 1, "bev", 0.5, overlaps=ovs)
    np.testing.assert_array_equal(p1, p2)
