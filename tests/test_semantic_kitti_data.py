"""SemanticKITTI data layer against a synthetic on-disk fixture.

Mirrors the reference's dataset-bound invariants (label LUT remap +
include/exclude, pose algebra, rasterizer mask shape and seen-instance
filtering, cache behavior — mask_bev_test/datasets/semantic_kitti/*) on
generated sequences.
"""
import pathlib

import numpy as np
import pytest

from mask_bev_tpu.config import MaskBevConfig
from mask_bev_tpu.datasets.semantic_kitti.dataset import (
    SemanticKittiDataset, SemanticKittiSequenceDataset)
from mask_bev_tpu.datasets.semantic_kitti.mask_data import (
    SemanticKittiMaskDataModule, SemanticKittiMaskDataset, filter_small_masks)
from mask_bev_tpu.datasets.semantic_kitti.rasterizer import SemanticKittiRasterizer
from mask_bev_tpu.datasets.semantic_kitti.scene import SceneMaker
from mask_bev_tpu.datasets.semantic_kitti.taxonomy import (
    RawLabel, learning_map_lut)
from mask_bev_tpu.ops.morphology import close_then_open


N_SCANS = 3


def _write_sequence(seq_dir: pathlib.Path, n_scans: int, rng, with_labels=True):
    (seq_dir / "velodyne").mkdir(parents=True)
    if with_labels:
        (seq_dir / "labels").mkdir()
    poses = []
    for i in range(n_scans):
        # car cluster at (10, 5) world, instance 7; forward motion along x
        n_car, n_bg = 150, 500
        offset = np.array([2.0 * i, 0.0])  # sensor moves +x in world
        car_pts = rng.normal([10.0 - 2.0 * i, 5.0, 0.0], [1.0, 0.6, 0.3],
                             (n_car, 3))
        bg_pts = rng.uniform([-30, -30, -2], [30, 30, 2], (n_bg, 3))
        pts = np.concatenate([car_pts, bg_pts]).astype(np.float32)
        scan = np.concatenate(
            [pts, rng.uniform(0, 1, (n_car + n_bg, 1)).astype(np.float32)], 1)
        scan.astype(np.float32).tofile(seq_dir / "velodyne" / f"{i:06d}.bin")
        if with_labels:
            sem = np.full(n_car + n_bg, RawLabel.ROAD, np.uint32)
            sem[:n_car] = RawLabel.CAR
            inst = np.zeros(n_car + n_bg, np.uint32)
            inst[:n_car] = 7
            packed = (inst << 16) | sem
            packed.astype(np.uint32).tofile(seq_dir / "labels" / f"{i:06d}.label")
        pose = np.eye(4)
        pose[0, 3] = 2.0 * i  # cam-frame translation; calib Tr = identity
        poses.append(pose[:3].reshape(-1))
    np.savetxt(seq_dir / "poses.txt", np.stack(poses))
    np.savetxt(seq_dir / "times.txt", np.arange(n_scans, dtype=float))
    (seq_dir / "calib.txt").write_text(
        "P0: 1 0 0 0 0 1 0 0 0 0 1 0\n"
        "Tr: 1 0 0 0 0 1 0 0 0 0 1 0\n")


@pytest.fixture
def sk_root(tmp_path):
    rng = np.random.default_rng(3)
    for seq in (0, 8):  # train seq 0, valid seq 8
        _write_sequence(tmp_path / "dataset" / "sequences" / f"{seq:02d}",
                        N_SCANS, rng)
    _write_sequence(tmp_path / "dataset" / "sequences" / "11",
                    N_SCANS, rng, with_labels=False)  # test split
    return tmp_path


def test_lut_include_exclude():
    lut = learning_map_lut()
    assert lut[RawLabel.CAR] == 1
    assert lut[RawLabel.MOVING_CAR] == 1
    assert lut[RawLabel.ROAD] == 9
    lut_car = learning_map_lut(included_labels=[RawLabel.CAR])
    assert lut_car[RawLabel.CAR] == 1
    assert lut_car[RawLabel.ROAD] == 0
    lut_excl = learning_map_lut(excluded_labels=[RawLabel.CAR])
    assert lut_excl[RawLabel.CAR] == 0
    with pytest.raises(ValueError):
        learning_map_lut(excluded_labels=[1], included_labels=[2])


def test_dataset_scan_loading(sk_root):
    ds = SemanticKittiDataset(str(sk_root), "train",
                              included_labels=[RawLabel.CAR])
    assert len(ds) == N_SCANS  # only seq 0 in train
    scan = ds[1]
    assert scan.seq_number == 0 and scan.scan_number == 1
    assert scan.point_cloud.shape[1] == 4
    assert set(np.unique(scan.sem_label)) == {0, 1}  # CAR kept, ROAD excluded
    assert (scan.inst_label[scan.sem_label == 0] == 0).all()
    # velo_to_pose with identity Tr == pose
    np.testing.assert_allclose(scan.velo_to_pose, scan.pose)
    np.testing.assert_allclose(scan.position, [2.0, 0, 0])


def test_valid_split(sk_root):
    ds = SemanticKittiDataset(str(sk_root), "valid")
    assert len(ds) == N_SCANS
    assert ds[0].seq_number == 8


def test_scene_accumulation_aligns_instances(sk_root):
    ds = SemanticKittiSequenceDataset(str(sk_root), "train",
                                      included_labels=[RawLabel.CAR])
    seq = ds[0]
    maker = SceneMaker()
    for s in ds.load_scan_numbers_in_sequence(seq, range(N_SCANS)):
        maker.add_scan(s)
    scene = maker.scene
    # car points from all scans should coincide in world frame near (10, 5)
    car = scene.point_cloud[scene.inst_label == 7]
    assert len(car) == 150 * N_SCANS
    assert np.abs(car[:, 0].mean() - 10.0) < 1.0
    assert np.abs(car[:, 1].mean() - 5.0) < 1.0


def test_eager_sequence_matches_lazy(sk_root):
    lazy_ds = SemanticKittiSequenceDataset(str(sk_root), "train",
                                           included_labels=[RawLabel.CAR])
    eager_ds = SemanticKittiSequenceDataset(str(sk_root), "train", lazy=False,
                                            included_labels=[RawLabel.CAR])
    lazy = lazy_ds[0]
    eager = eager_ds[0]
    assert eager.seq_number == lazy.seq_number
    assert len(eager.scans) == len(lazy.scan_indices) == N_SCANS
    np.testing.assert_allclose(eager.positions(), lazy.positions())
    for i, scan in enumerate(eager.scans):
        ref = lazy_ds.load_scan_number_in_sequence(lazy, i)
        np.testing.assert_array_equal(scan.point_cloud, ref.point_cloud)
        np.testing.assert_array_equal(scan.inst_label, ref.inst_label)
    # scan-index loaders shared by both views
    one = eager_ds.load_scan_index(1)
    assert one.scan_number == 1
    assert len(list(eager_ds.load_scan_indices([0, 2]))) == 2


def test_rasterizer_mask(sk_root):
    ds = SemanticKittiSequenceDataset(str(sk_root), "train",
                                      included_labels=[RawLabel.CAR])
    seq = ds[0]
    maker = SceneMaker()
    for s in ds.load_scan_numbers_in_sequence(seq, range(N_SCANS)):
        maker.add_scan(s)
    scan = ds.dataset[0]
    r = SemanticKittiRasterizer((-40, 40), (-40, 40), (-10, 10), 0.16,
                                remove_unseen=True, min_points=1)
    mask = r.get_mask_around(scan, maker.scene)
    assert mask.shape == (500, 500)
    assert set(np.unique(mask)) == {0, 7}
    ys, xs = np.where(mask == 7)
    # car at (x=10, y=5) in scan 0 frame -> col ~ (10+40)/0.16, row ~ (5+40)/0.16
    assert abs(xs.mean() - 50 / 0.16) < 15
    assert abs(ys.mean() - 45 / 0.16) < 15


def test_remove_unseen_filters_instances(sk_root):
    ds = SemanticKittiSequenceDataset(str(sk_root), "train",
                                      included_labels=[RawLabel.CAR])
    scan = ds.dataset[0]
    maker = SceneMaker()
    maker.add_scan(ds.dataset[1])
    r = SemanticKittiRasterizer((-40, 40), (-40, 40), (-10, 10), 0.16,
                                remove_unseen=True, min_points=10_000)
    mask = r.get_mask_around(scan, maker.scene)
    assert (mask == 0).all()  # instance has < min_points in center scan


def test_mask_dataset_cache_roundtrip(sk_root):
    ds = SemanticKittiSequenceDataset(str(sk_root), "train",
                                      included_labels=[RawLabel.CAR])
    md = SemanticKittiMaskDataset(ds, (-40, 40), (-40, 40), (-10, 10), 0.16,
                                  remove_unseen=True, min_points=1)
    first = md[0]
    assert md.cache_miss == 1
    cache_file = (sk_root / "dataset" / "masks_cache" / "0" / "0.npy")
    assert cache_file.exists()
    again = md[0]
    assert md.cache_hit == 1
    np.testing.assert_array_equal(first.mask, again.mask)
    assert 7 in first.heights and first.heights[7] > 0


def test_filter_small_masks():
    m = np.zeros((10, 10), np.int64)
    m[0, :3] = 1
    m[5:9, 5:9] = 2
    out = filter_small_masks(m.copy(), min_pixels=5)
    assert set(np.unique(out)) == {0, 2}


def test_test_split_points_only(sk_root):
    cfg = MaskBevConfig(
        dataset="semantic_kitti", x_range=(-40, 40), y_range=(-40, 40),
        z_range=(-10, 10), voxel_size=0.16, num_queries=5,
        max_points_per_scan=2048, batch_size=2)
    dm = SemanticKittiMaskDataModule(str(sk_root), cfg)
    batch = next(iter(dm.test_batches()))
    assert set(batch) == {"points", "point_mask"}
    assert batch["points"].shape == (2, 2048, 4)
    assert batch["point_mask"].any()


def test_datamodule_batch_contract(sk_root):
    cfg = MaskBevConfig(
        dataset="semantic_kitti", x_range=(-40, 40), y_range=(-40, 40),
        z_range=(-10, 10), voxel_size=0.16, num_queries=5,
        max_points_per_scan=2048, batch_size=2,
        augmentations=[{"name": "flip", "prob_flip_x": 0.5, "prob_flip_y": 0.5}])
    dm = SemanticKittiMaskDataModule(str(sk_root), cfg)
    batch = next(iter(dm.train_batches(seed=0)))
    assert batch["points"].shape == (2, 2048, 4)
    assert batch["gt_masks"].shape == (2, 5, 500, 500)
    assert batch["gt_labels"].max() == 1  # CAR learning label
    assert batch["gt_valid"].all()
    assert batch["num_instances"].max() >= 1
    assert (1.0 <= batch["gt_heights"][batch["gt_labels"] == 1]).all()
