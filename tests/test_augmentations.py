"""Augmentation semantics (numpy, hermetic)."""
import numpy as np
import pytest

from mask_bev_tpu.augmentations.kitti_augmentations import (
    BoxNoise, CutPc, Flip, GlobalNoise, JitterPoints, RandomDropPoints,
    RandomRotate, ShufflePoints, make_kitti_augmentation_list)
from mask_bev_tpu.datasets.kitti.kitti_dataset import BoxArray, KittiFrame


def _frame(rng, n_pts=500, n_boxes=3):
    pts = rng.uniform(-20, 20, size=(n_pts, 4)).astype(np.float32)
    pts[:, 3] = rng.uniform(0, 1, n_pts)
    boxes = BoxArray(
        center=rng.uniform(-15, 15, (n_boxes, 3)).astype(np.float32),
        dims=np.tile([4.0, 1.8, 1.5], (n_boxes, 1)).astype(np.float32),
        yaw=rng.uniform(-np.pi, np.pi, n_boxes).astype(np.float32),
        types=np.zeros(n_boxes, np.int32),
        truncated=np.zeros(n_boxes, np.float32),
        occluded=np.zeros(n_boxes, np.int32),
        alpha=np.zeros(n_boxes, np.float32),
        bbox=np.zeros((n_boxes, 4), np.float32),
        location_cam=np.zeros((n_boxes, 3), np.float32),
        rotation_y=np.zeros(n_boxes, np.float32),
    )
    return KittiFrame(None, boxes, pts)


def test_flip_y(rng):
    f = _frame(rng)
    p0 = f.points.copy()
    c0 = f.boxes.center.copy()
    y0 = f.boxes.yaw.copy()
    Flip(prob_flip_y=1.0)(f, rng)
    np.testing.assert_allclose(f.points[:, 1], -p0[:, 1])
    np.testing.assert_allclose(f.boxes.center[:, 1], -c0[:, 1])
    np.testing.assert_allclose(f.boxes.yaw, -y0)


def test_flip_x_rejected():
    with pytest.raises(ValueError):
        Flip(prob_flip_x=0.5)


def test_rotate_preserves_radii(rng):
    f = _frame(rng)
    r0 = np.linalg.norm(f.points[:, :2], axis=1)
    b0 = np.linalg.norm(f.boxes.center[:, :2], axis=1)
    RandomRotate(rotate_prob=1.0, rotation_range=30)(f, rng)
    np.testing.assert_allclose(np.linalg.norm(f.points[:, :2], axis=1), r0,
                               rtol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(f.boxes.center[:, :2], axis=1),
                               b0, rtol=1e-5)


def test_drop_and_decimate(rng):
    f = _frame(rng, n_pts=1000)
    RandomDropPoints(prob_drop=1.0, per_point_drop_prob=0.5)(f, rng)
    assert 300 < f.points.shape[0] < 700


def test_jitter_clips_intensity(rng):
    f = _frame(rng)
    JitterPoints(prob_jitter=1.0, jitter_std=0.1, intensity_std=5.0)(f, rng)
    assert f.points[:, 3].min() >= 0 and f.points[:, 3].max() <= 1


def test_global_noise_scales_labels(rng):
    f = _frame(rng)
    d0 = f.boxes.dims.copy()
    GlobalNoise(prob_aug=1.0, trans_std=0.0, scale_delta=0.5)(f, rng)
    ratio = f.boxes.dims / d0
    assert np.allclose(ratio, ratio[0, 0])  # uniform scale
    assert 0.5 <= ratio[0, 0] <= 1.5


def test_box_noise_moves_in_box_points(rng):
    f = _frame(rng, n_pts=0, n_boxes=2)
    f.boxes.center[0] = [0, 0, 0]
    f.boxes.center[1] = [12, 12, 0]
    f.points = np.array([[0.5, 0.2, 0.5, 0.5]], np.float32)
    BoxNoise(translation_std=[1.0, 1.0, 0.0], num_try=50)(f, rng)
    # the point inside box 0 should have moved with it (almost surely)
    moved = not np.allclose(f.points[0, :2], [0.5, 0.2])
    box_moved = not np.allclose(f.boxes.center[0, :2], [0, 0])
    assert moved == box_moved


def test_cut_pc_removes_points(rng):
    f = _frame(rng, n_pts=3000)
    n0 = f.points.shape[0]
    CutPc(prob_cut=1.0, scale=(0.2, 0.3))(f, rng)
    assert f.points.shape[0] < n0


def test_factory_from_yaml_config(rng):
    augs = make_kitti_augmentation_list([
        {"name": "flip", "prob_flip_x": 0, "prob_flip_y": 0.5},
        {"name": "rotate", "rotate_prob": 0.5, "rotation_range": 5},
        {"name": "jitter", "prob_jitter": 0.5, "jitter_std": 0.02,
         "intensity_std": 0.01},
        {"name": "drop", "prob_drop": 0.5, "per_point_drop_prob": 0.05},
        {"name": "shuffle", "prob_shuffle": 0.5},
        {"name": "object_noise"},
        {"name": "global_noise", "prob_aug": 0.5},
    ])
    assert len(augs) == 7
    f = _frame(rng)
    for a in augs:
        f = a(f, rng)
    assert np.isfinite(f.points).all()


def test_unknown_augmentation_raises():
    with pytest.raises(NotImplementedError):
        make_kitti_augmentation_list([{"name": "nope"}])
