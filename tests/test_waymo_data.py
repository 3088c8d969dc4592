"""Waymo converted-dataset layer against synthetic npz fixtures."""
import numpy as np
import pytest

from mask_bev_tpu.config import waymo_default
from mask_bev_tpu.datasets.waymo.waymo_data import (
    TYPE_PEDESTRIAN, TYPE_VEHICLE, WaymoDataModule, WaymoDataset,
    WaymoRasterizer, frame_to_sample)


def _write_waymo_fixture(root, n_frames=3, seed=0):
    rng = np.random.default_rng(seed)
    for split in ("training", "validation"):
        d = root / split
        d.mkdir(parents=True)
        for i in range(n_frames):
            pts = rng.uniform(-30, 30, (1500, 3)).astype(np.float32)
            np.savez(
                d / f"{i:06d}.npz",
                points=pts,
                box_center=np.array([[5.0, 5.0, 0], [-10.0, 0.0, 0],
                                     [20.0, -10.0, 0]], np.float32),
                box_dims=np.tile([4.5, 2.0, 1.8], (3, 1)).astype(np.float32),
                box_heading=np.array([0.4, -1.0, 2.0], np.float32),
                box_type=np.array([TYPE_VEHICLE, TYPE_VEHICLE, TYPE_PEDESTRIAN],
                                  np.int32),
                box_num_points=np.array([50, 0, 80], np.int32),
            )


@pytest.fixture
def waymo_root(tmp_path):
    _write_waymo_fixture(tmp_path)
    return tmp_path


def test_rasterizer_vehicle_only_and_min_points(waymo_root):
    cfg = waymo_default().replace(voxel_size=0.5)
    ds = WaymoDataset(str(waymo_root), "training")
    r = WaymoRasterizer(cfg.x_range, cfg.y_range, cfg.z_range, cfg.voxel_size,
                        min_points=1)
    mask = r.get_mask(ds[0])[TYPE_VEHICLE]
    assert mask.shape == (160, 160)
    # vehicle #2 has 0 lidar points -> dropped; pedestrian dropped
    assert set(np.unique(mask)) == {0, 1}


def test_frame_to_sample(waymo_root):
    cfg = waymo_default().replace(
        voxel_size=0.5, num_queries=6, max_points_per_scan=2048)
    ds = WaymoDataset(str(waymo_root), "training")
    r = WaymoRasterizer(cfg.x_range, cfg.y_range, cfg.z_range, cfg.voxel_size,
                        min_points=1)
    s = frame_to_sample(ds[0], cfg, r)
    assert s["points"].shape == (2048, 3)  # pc_point_dim=3 (no intensity)
    assert s["gt_labels"][0] == TYPE_VEHICLE + 1 == 2
    assert s["num_instances"] == 1
    assert s["gt_masks"].shape == (6, 160, 160)


def test_datamodule_with_augmentations(waymo_root):
    cfg = waymo_default().replace(
        voxel_size=0.5, num_queries=6, max_points_per_scan=2048, batch_size=2,
        augmentations=[{"name": "flip", "prob_flip_x": 0, "prob_flip_y": 1.0},
                       {"name": "rotate", "rotate_prob": 1.0,
                        "rotation_range": 5}])
    dm = WaymoDataModule(str(waymo_root), cfg)
    batch = next(iter(dm.train_batches(seed=0)))
    assert batch["points"].shape == (2, 2048, 3)
    assert batch["gt_masks"].shape == (2, 6, 160, 160)
    assert batch["num_instances"].min() >= 1
