"""Waymo converter: npz mapping fixture test (SDK-free).

The tfrecord decoding needs the optional waymo-open-dataset SDK; the frame ->
npz mapping is pure and verified here with duck-typed labels, round-tripped
through the WaymoDataset consumer (schema contract both ways)."""
import pathlib
import sys
import types

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "scripts"))

from convert_waymo import extract_frame_arrays  # noqa: E402

from mask_bev_tpu.datasets.waymo.waymo_data import (  # noqa: E402
    TYPE_VEHICLE, WaymoDataset)


def _label(cx, cy, cz, l, w, h, heading, typ, npts):
    box = types.SimpleNamespace(center_x=cx, center_y=cy, center_z=cz,
                                length=l, width=w, height=h, heading=heading)
    return types.SimpleNamespace(box=box, type=typ,
                                 num_lidar_points_in_box=npts)


def test_extract_and_roundtrip(tmp_path):
    pts = np.random.default_rng(0).normal(size=(500, 3)).astype(np.float32)
    labels = [
        _label(1, 2, 0.5, 4.5, 1.9, 1.6, 0.3, TYPE_VEHICLE, 120),
        _label(-3, 8, 0.2, 0.8, 0.8, 1.8, -1.2, 2, 40),  # pedestrian
    ]
    arrays = extract_frame_arrays(pts, labels)
    assert arrays["points"].shape == (500, 3)
    assert arrays["box_center"].shape == (2, 3)
    np.testing.assert_allclose(arrays["box_dims"][0], [4.5, 1.9, 1.6])
    assert arrays["box_type"].tolist() == [TYPE_VEHICLE, 2]
    assert arrays["box_num_points"].tolist() == [120, 40]

    split = tmp_path / "training"
    split.mkdir()
    np.savez_compressed(split / "00000000.npz", **arrays)
    ds = WaymoDataset(str(tmp_path), "training")
    frame = ds[0]
    np.testing.assert_allclose(frame.points, pts)
    np.testing.assert_allclose(frame.box_heading, [0.3, -1.2])
    assert frame.box_type.dtype == np.int32
