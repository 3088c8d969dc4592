"""Cross-validation of the cv2-free reimplementations against cv2 itself.

The framework replaces the reference's OpenCV calls (SURVEY N9: 9x9
close/open in the SemanticKITTI rasterizer ``semantic_kitti_rasterizer.py:
71-88``, minAreaRect in ``average_precision.py:92-106`` / ``kitti_eval.py:
36-40``, drawContours box fill in ``kitti_rasterizer.py:36-58``) with numpy/
native code. cv2 IS installed in this environment, so the parity claims are
verified directly instead of only against each other.
"""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from mask_bev_tpu.datasets.kitti.kitti_rasterizer import fill_rotated_boxes
from mask_bev_tpu.evaluation.min_area_rect import min_area_rect, rect_corners
from mask_bev_tpu.ops.morphology import (
    binary_close, binary_dilate, binary_erode, binary_open, close_then_open)


def _rand_mask(rng, h=64, w=64, blobs=4):
    m = np.zeros((h, w), np.uint8)
    for _ in range(blobs):
        cx, cy = rng.integers(8, w - 8), rng.integers(8, h - 8)
        r = int(rng.integers(2, 7))
        cv2.circle(m, (int(cx), int(cy)), r, 1, -1)
    # speckle noise to exercise open/close differences
    noise = rng.random((h, w)) < 0.02
    return (m.astype(bool) | noise).astype(np.uint8)


@pytest.mark.parametrize("k", [3, 9])
def test_morphology_matches_cv2(rng, k):
    kernel = cv2.getStructuringElement(cv2.MORPH_RECT, (k, k))
    for seed in range(5):
        m = _rand_mask(np.random.default_rng(seed))
        np.testing.assert_array_equal(
            binary_dilate(m.astype(bool), k),
            cv2.dilate(m, kernel).astype(bool), err_msg=f"dilate k={k}")
        np.testing.assert_array_equal(
            binary_erode(m.astype(bool), k),
            cv2.erode(m, kernel).astype(bool), err_msg=f"erode k={k}")
        np.testing.assert_array_equal(
            binary_close(m.astype(bool), k),
            cv2.morphologyEx(m, cv2.MORPH_CLOSE, kernel).astype(bool),
            err_msg=f"close k={k}")
        np.testing.assert_array_equal(
            binary_open(m.astype(bool), k),
            cv2.morphologyEx(m, cv2.MORPH_OPEN, kernel).astype(bool),
            err_msg=f"open k={k}")
        # the rasterizer's exact sequence (ref :71-88): CLOSE then OPEN, 9x9
        ref = cv2.morphologyEx(
            cv2.morphologyEx(m, cv2.MORPH_CLOSE, kernel), cv2.MORPH_OPEN,
            kernel).astype(bool)
        np.testing.assert_array_equal(close_then_open(m.astype(bool), k), ref)


def test_min_area_rect_matches_cv2(rng):
    """Minimal area identical to cv2.minAreaRect, and the rect contains all
    points. (Equal-area ties can pick different-but-valid rects, so corners
    are compared only when the solutions coincide in area AND center.)"""
    for seed in range(20):
        r = np.random.default_rng(seed)
        pts = r.normal(scale=10, size=(int(r.integers(3, 40)), 2))
        # include collinear-ish and integer-grid cases
        if seed % 3 == 0:
            pts = np.round(pts)
        center, size, ang = min_area_rect(pts)
        (ccx, ccy), (cw, ch), cang = cv2.minAreaRect(
            pts.astype(np.float32).reshape(-1, 1, 2))
        # same MINIMAL area (the defining property)
        assert size[0] * size[1] == pytest.approx(cw * ch, rel=1e-3, abs=1e-3)
        # our rect contains every input point
        c, s = np.cos(ang), np.sin(ang)
        d = pts - center
        lx = d[:, 0] * c + d[:, 1] * s
        ly = -d[:, 0] * s + d[:, 1] * c
        assert (np.abs(lx) <= size[0] / 2 + 1e-6).all()
        assert (np.abs(ly) <= size[1] / 2 + 1e-6).all()
        if (abs(center[0] - ccx) < 1e-3 and abs(center[1] - ccy) < 1e-3):
            ours = rect_corners(center, size, ang)
            theirs = cv2.boxPoints(((ccx, ccy), (cw, ch), cang))
            dd = np.linalg.norm(ours[:, None] - theirs[None], axis=-1)
            assert dd.min(axis=1).max() < 1e-2


def test_box_fill_matches_cv2_drawcontours(rng):
    """Analytic half-plane fill vs cv2.drawContours(filled) on rotated boxes.

    Boundary-cell conventions differ (cell-center test vs polygon raster),
    so agreement is asserted on interior cells and a tight symmetric-diff
    bound on the 1-cell boundary band."""
    x_range, y_range, vs = (-20.0, 20.0), (-20.0, 20.0), 0.25
    h = w = 160
    for seed in range(10):
        r = np.random.default_rng(seed)
        center = r.uniform(-12, 12, 2)
        dims = np.array([r.uniform(2, 8), r.uniform(1, 4)])
        yaw = r.uniform(-np.pi, np.pi)
        ours = fill_rotated_boxes(center[None], dims[None], np.array([yaw]),
                                  x_range, y_range, vs)[0]

        corners_m = rect_corners(center, dims, yaw)  # meters
        corners_px = (corners_m - [x_range[0], y_range[0]]) / vs - 0.5
        img = np.zeros((h, w), np.uint8)
        cv2.drawContours(
            img, [np.round(corners_px).astype(np.int32).reshape(-1, 1, 2)],
            0, 1, -1)
        theirs = img.astype(bool)

        inner = cv2.erode(theirs.astype(np.uint8),
                          np.ones((3, 3), np.uint8)).astype(bool)
        assert (ours | ~inner).all(), "interior cells must be filled"
        sym = np.logical_xor(ours, theirs).sum()
        boundary = (theirs ^ inner).sum()
        assert sym <= max(boundary, 8), (sym, boundary)
