"""KITTI data layer: synthetic on-disk fixtures (no real dataset needed).

Mirrors the reference's dataset-bound contracts
(mask_bev_test/datasets/kitti/test_kitti_data_module.py:16-56 — batch
shapes, exact mask grid, label values) against generated files.
"""
import pathlib

import numpy as np
import pytest

from mask_bev_tpu.config import MaskBevConfig
from mask_bev_tpu.datasets.kitti.kitti_data import (
    KittiMaskDataModule, difficulty_of, frame_to_sample)
from mask_bev_tpu.datasets.kitti.kitti_dataset import (
    KittiDataset, KittiType, parse_calib)
from mask_bev_tpu.datasets.kitti.kitti_rasterizer import (
    KittiRasterizer, fill_rotated_boxes)
from mask_bev_tpu.augmentations.box_ops import (
    box_collision_test, center_to_corner_box2d, points_in_rbbox)


def _write_kitti_fixture(root: pathlib.Path, n_frames: int = 4, seed: int = 0):
    rng = np.random.default_rng(seed)
    for sub in ("data_object_calib/training/calib",
                "data_object_label_2/training/label_2",
                "data_object_velodyne/training/velodyne"):
        (root / sub).mkdir(parents=True)
    # identity-ish calib: velo == cam frame for simplicity of the fixture
    calib_txt = "\n".join(
        [f"P{i}: " + " ".join(["7.2e+02", "0", "6.0e+02", "0", "0",
                               "7.2e+02", "1.7e+02", "0", "0", "0", "1", "0"])
         for i in range(4)]
        + ["R0_rect: 1 0 0 0 1 0 0 0 1",
           "Tr_velo_to_cam: 0 -1 0 0 0 0 -1 0 1 0 0 0",
           "Tr_imu_to_velo: 1 0 0 0 0 1 0 0 0 0 1 0"])
    for i in range(n_frames):
        (root / f"data_object_calib/training/calib/{i:06d}.txt").write_text(calib_txt)
        # two cars at known velodyne spots; write labels in CAMERA frame
        # velo (x, y, z) -> cam (-y, -z, x) under the Tr above
        lines = []
        for (vx, vy) in [(10.0 + i, 3.0), (20.0, -5.0)]:
            cx, cy, cz = -vy, 1.0, vx  # cam frame, ground-ish
            h, w, l = 1.5, 1.7, 4.0
            ry = 0.3
            lines.append(
                f"Car 0.0 0 0.0 100 100 200 200 {h} {w} {l} {cx} {cy} {cz} {ry}")
        lines.append("DontCare -1 -1 -10 0 0 0 0 -1 -1 -1 -1000 -1000 -1000 -10")
        (root / f"data_object_label_2/training/label_2/{i:06d}.txt").write_text(
            "\n".join(lines))
        pts = rng.uniform(-5, 40, size=(2000, 4)).astype(np.float32)
        pts[:, 2] = rng.uniform(-1.0, 0.4, 2000)  # ground-level z
        pts[:, 3] = rng.uniform(0, 1, 2000)
        pts.tofile(root / f"data_object_velodyne/training/velodyne/{i:06d}.bin")
    (root / "train.txt").write_text("\n".join(str(i) for i in range(n_frames - 1)))
    (root / "val.txt").write_text(str(n_frames - 1))


@pytest.fixture
def kitti_root(tmp_path):
    _write_kitti_fixture(tmp_path)
    return tmp_path


def _cfg():
    return MaskBevConfig(
        dataset="kitti", x_range=(0, 48), y_range=(-24, 24), z_range=(-3, 3),
        voxel_size=0.48, num_queries=8, head_num_classes=3,
        max_points_per_scan=4096, batch_size=2)


def test_dataset_label_transform(kitti_root):
    ds = KittiDataset(str(kitti_root), "training")
    assert len(ds) == 4
    f = ds[0]
    assert f.points.shape[1] == 4
    assert len(f.boxes) == 2  # DontCare dropped
    # camera (cx,cy,cz)=(-vy,1,vx) maps back to velodyne (vx, vy, ...)
    np.testing.assert_allclose(f.boxes.center[0, :2], [10.0, 3.0], atol=1e-5)
    np.testing.assert_allclose(f.boxes.center[1, :2], [20.0, -5.0], atol=1e-5)
    # dims reordered camera (h,w,l) -> velo (l,w,h)
    np.testing.assert_allclose(f.boxes.dims[0], [4.0, 1.7, 1.5], atol=1e-6)
    # yaw remap: wrap(-ry - pi/2)
    expect = np.arctan2(np.sin(-0.3 - np.pi / 2), np.cos(-0.3 - np.pi / 2))
    np.testing.assert_allclose(f.boxes.yaw[0], expect, atol=1e-6)


def test_rasterizer_mask_grid(kitti_root):
    cfg = _cfg()
    ds = KittiDataset(str(kitti_root), "training")
    r = KittiRasterizer(cfg.x_range, cfg.y_range, cfg.z_range, cfg.voxel_size)
    out = r.get_mask(ds[0])
    img = out[KittiType.Car]
    assert img.shape == (100, 100)  # (num_voxel_y, num_voxel_x)
    assert set(np.unique(img)) == {0, 1, 2}
    # instance 1 around (x=10, y=3) -> col=(10-0)/0.48, row=(3+24)/0.48
    ys, xs = np.where(img == 1)
    assert abs(xs.mean() - 10 / 0.48) < 5
    assert abs(ys.mean() - 27 / 0.48) < 5


def test_frame_to_sample_contract(kitti_root):
    cfg = _cfg()
    dm = KittiMaskDataModule(str(kitti_root), cfg)
    s = dm.sample(0, train=False)
    assert s["gt_masks"].shape == (8, 100, 100)
    assert s["gt_labels"].shape == (8,)
    assert s["gt_labels"][:2].tolist() == [1, 1]  # Car -> type+1
    assert s["gt_labels"][2:].sum() == 0
    assert s["gt_valid"].all()  # reference-parity: padding counts as GT
    assert s["num_instances"] == 2
    assert 1.0 <= s["gt_heights"][0] <= 3.0
    assert s["points"].shape == (4096, 4)


def test_datamodule_batches(kitti_root):
    cfg = _cfg()
    dm = KittiMaskDataModule(str(kitti_root), cfg)
    batches = list(dm.train_batches(seed=1))
    assert len(batches) == 1  # 3 train ids, batch 2, drop_last
    b = batches[0]
    assert b["points"].shape == (2, 4096, 4)
    assert b["gt_masks"].shape == (2, 8, 100, 100)


def test_difficulty_rules(kitti_root):
    ds = KittiDataset(str(kitti_root), "training")
    d = difficulty_of(ds[0].boxes)
    assert (d == 1).all()  # fully visible, untruncated


# ---- box ops ----

def test_corner_box_roundtrip():
    centers = np.array([[1.0, 2.0]])
    dims = np.array([[4.0, 2.0]])
    yaws = np.array([np.pi / 2])
    c = center_to_corner_box2d(centers, dims, yaws)
    # after 90deg rotation, the long axis is along y
    assert c[:, :, 1].max() - c[:, :, 1].min() == pytest.approx(4.0)
    assert c[:, :, 0].max() - c[:, :, 0].min() == pytest.approx(2.0)


def test_collision_test():
    a = center_to_corner_box2d(np.array([[0.0, 0]]), np.array([[4.0, 2]]),
                               np.array([0.0]))
    b = center_to_corner_box2d(np.array([[3.0, 0], [10.0, 0]]),
                               np.array([[4.0, 2], [4.0, 2]]),
                               np.array([0.0, 0.0]))
    col = box_collision_test(a, b)
    assert col.tolist() == [[True, False]]
    # rotated near-miss: diagonal box
    c = center_to_corner_box2d(np.array([[4.2, 0]]), np.array([[4.0, 0.5]]),
                               np.array([np.pi / 2]))
    assert not box_collision_test(a, c)[0, 0]


def test_points_in_rbbox():
    pts = np.array([[0.0, 0, 0.5], [5.0, 0, 0.5], [1.5, 0.5, 0.5]])
    inside = points_in_rbbox(pts, np.array([[0.0, 0]]), np.array([[4.0, 2]]),
                             np.array([0.0]))
    assert inside[:, 0].tolist() == [True, False, True]


def test_fill_rotated_boxes_area():
    foot = fill_rotated_boxes(
        np.array([[0.0, 0]]), np.array([[4.0, 2]]), np.array([0.3]),
        (-10, 10), (-10, 10), 0.1)
    area = foot[0].sum() * 0.1 * 0.1
    assert abs(area - 8.0) < 0.5
