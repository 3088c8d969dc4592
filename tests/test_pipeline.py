"""Pipeline combinator DSL (reference ``utils/pipeline.py:8-202`` parity)."""
import numpy as np
import pytest

from mask_bev_tpu.utils.pipeline import (
    Bifunctor, Both, Compose, First, Identity, Inspect, Lambda, MapAll,
    MapNth, Second, Tee, Third, Tupled)


def test_lambda_identity_compose():
    f = Compose([Lambda(lambda x: x + 1), Lambda(lambda x: x * 3), Identity()])
    assert f(2) == 9


def test_tupled_and_positional():
    t = Tupled(3)
    assert t(5) == (5, 5, 5)
    assert First(Lambda(lambda x: x + 1))((1, 2, 3)) == (2, 2, 3)
    assert Second(Lambda(lambda x: x * 10))((1, 2, 3)) == (1, 20, 3)
    assert Third(Lambda(str))((1, 2, 3)) == (1, 2, "3")


def test_mapnth_mapall_both():
    assert MapNth(1, Lambda(lambda x: -x))((4, 5)) == (4, -5)
    assert MapAll(Lambda(lambda x: x + 1))((1, 2, 3)) == (2, 3, 4)
    assert Both(Lambda(lambda x: x * 2))((3, 4)) == (6, 8)


def test_bifunctor_tee_inspect(capsys):
    bf = Bifunctor(Lambda(lambda x: x + 1), Lambda(lambda x: x * 2))
    assert bf((1, 10)) == (2, 20)
    tee = Tee([Lambda(lambda x: x + 1), Lambda(lambda x: x - 1)])
    assert tee(5) == (6, 4)
    ins = Inspect()
    assert ins(42) == 42  # pass-through


def test_compose_mirrors_reference_pipeline_shape():
    """The reference's SemanticKITTI pipeline shape (Tupled(3) -> per-slot
    transforms, semantic_kitti_mask_data_module.py:88-120) expressed in the
    DSL produces the (pc, (labels, masks), meta)-style triple."""
    scan = {"pc": np.arange(6).reshape(3, 2), "mask": np.array([[0, 1], [2, 0]])}
    pipe = Compose([
        Tupled(3),
        First(Lambda(lambda s: s["pc"] * 1.0)),
        Second(Lambda(lambda s: (s["mask"] > 0).sum())),
        Third(Lambda(lambda s: {"id": 7})),
    ])
    pc, n_fg, meta = pipe(scan)
    assert pc.shape == (3, 2) and n_fg == 2 and meta == {"id": 7}
