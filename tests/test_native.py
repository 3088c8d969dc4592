"""Native C++ host core vs numpy reference implementations."""
import numpy as np
import pytest

from mask_bev_tpu import native
from mask_bev_tpu.augmentations.box_ops import points_in_rbbox
from mask_bev_tpu.datasets.kitti.kitti_rasterizer import fill_rotated_boxes
from mask_bev_tpu.ops.morphology import close_then_open as np_cto

needs_native = pytest.mark.skipif(
    not native.available(), reason="libmaskbev_host.so not built")


def test_morphology_fallback_works(rng):
    m = rng.random((60, 60)) < 0.05
    out = native.close_then_open(m, 9)  # native or fallback
    np.testing.assert_array_equal(out, np_cto(m, 9))


@needs_native
def test_morphology_parity(rng):
    for shape in ((64, 64), (120, 140), (500, 500)):
        for k in (3, 9):
            m = rng.random(shape) < 0.03
            np.testing.assert_array_equal(
                native.close_then_open(m, k), np_cto(m, k))


@needs_native
def test_box_fill_parity(rng):
    centers = rng.uniform(-15, 15, (5, 2)).astype(np.float32)
    dims = np.tile([4.0, 1.8], (5, 1)).astype(np.float32)
    yaws = rng.uniform(-np.pi, np.pi, 5).astype(np.float32)
    keep = np.array([1, 1, 0, 1, 1], np.uint8)
    img = native.fill_rotated_boxes_img(
        100, 100, centers, dims, yaws, keep, -25.0, -25.0, 0.5)
    foot = fill_rotated_boxes(centers, dims, yaws, (-25, 25), (-25, 25), 0.5)
    ref = np.zeros((100, 100), np.int32)
    for i in range(5):
        if keep[i]:
            ref[foot[i]] = i + 1
    np.testing.assert_array_equal(img, ref)


@needs_native
def test_points_in_boxes_parity(rng):
    pts = rng.uniform(-20, 20, (3000, 4)).astype(np.float32)
    centers3 = rng.uniform(-15, 15, (4, 3)).astype(np.float32)
    dims3 = np.tile([4.0, 1.8, 1.5], (4, 1)).astype(np.float32)
    yaws = rng.uniform(-np.pi, np.pi, 4).astype(np.float32)
    got = native.points_in_boxes_count(pts, centers3, dims3, yaws)
    ref = points_in_rbbox(pts, centers3, dims3[:, :2], yaws,
                          z0=centers3[:, 2], heights=dims3[:, 2]).sum(0)
    np.testing.assert_array_equal(got, ref)
