"""Rotated-box IoU (polygon clipping) vs shapely-free analytic cases."""
import jax.numpy as jnp
import numpy as np
import pytest

from mask_bev_tpu.ops.rotated_iou import rotate_iou_eval, rotated_iou_pair


def _box(cx, cy, w, l, a):
    return np.array([cx, cy, w, l, a], np.float32)


def test_identical_boxes():
    b = _box(1, 2, 2, 4, 0.5)
    assert float(rotated_iou_pair(jnp.asarray(b), jnp.asarray(b))) == pytest.approx(1.0, abs=1e-5)


def test_disjoint_boxes():
    a = _box(0, 0, 2, 2, 0.0)
    b = _box(10, 10, 2, 2, 0.7)
    assert float(rotated_iou_pair(jnp.asarray(a), jnp.asarray(b))) == 0.0


def test_axis_aligned_overlap():
    a = _box(0, 0, 2, 2, 0.0)  # unit square scaled: 2x2 at origin
    b = _box(1, 1, 2, 2, 0.0)  # shifted by (1,1): inter = 1x1
    iou = float(rotated_iou_pair(jnp.asarray(a), jnp.asarray(b)))
    assert iou == pytest.approx(1.0 / 7.0, abs=1e-5)


def test_rotated_45_overlap():
    # square 2x2 at origin vs same square rotated 45 deg: octagon intersection
    a = _box(0, 0, 2, 2, 0.0)
    b = _box(0, 0, 2, 2, np.pi / 4)
    inter = 8 * (np.sqrt(2) - 1)  # analytic octagon area
    expect = inter / (8 - inter)
    iou = float(rotated_iou_pair(jnp.asarray(a), jnp.asarray(b)))
    assert iou == pytest.approx(expect, abs=1e-4)


def test_contained_box():
    a = _box(0, 0, 4, 4, 0.3)
    b = _box(0, 0, 2, 2, 0.3)
    iou = float(rotated_iou_pair(jnp.asarray(a), jnp.asarray(b)))
    assert iou == pytest.approx(4.0 / 16.0, abs=1e-5)


def test_matrix_shape_and_symmetry(rng):
    a = np.stack([_box(*rng.uniform(-5, 5, 2), *rng.uniform(1, 3, 2),
                       rng.uniform(-np.pi, np.pi)) for _ in range(6)])
    b = a[:4]
    m = rotate_iou_eval(a, b)
    assert m.shape == (6, 4)
    np.testing.assert_allclose(np.diag(m), 1.0, atol=1e-4)
    m2 = rotate_iou_eval(b, a)
    np.testing.assert_allclose(m, m2.T, atol=1e-5)
    assert rotate_iou_eval(np.zeros((0, 5)), b).shape == (0, 4)
