"""Optimizer construction: schedules, differential LR, stage freezing, plateau."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mask_bev_tpu.config import tiny_test_config
from mask_bev_tpu.train.optim import (
    PlateauState, frozen_mask_fn, make_optimizer, set_lr_scale)


def _fake_params():
    return {
        "backbone": {
            "patch_embed": {"kernel": jnp.ones((2, 2))},
            "stage0_block0": {"norm1": {"scale": jnp.ones(3)}},
            "stage2_block1": {"norm1": {"scale": jnp.ones(3)}},
            "merge0": {"reduction": {"kernel": jnp.ones((4, 2))}},
        },
        "decoder": {"query_feat": jnp.ones((4, 8))},
    }


def _grads_like(params):
    return jax.tree.map(jnp.ones_like, params)


@pytest.mark.parametrize("opt", ["adam", "adam_w", "lamb", "sgd"])
def test_all_optimizer_types_step(opt):
    cfg = tiny_test_config().replace(optimiser_type=opt)
    params = _fake_params()
    tx = make_optimizer(cfg, params)
    state = tx.init(params)
    updates, _ = tx.update(_grads_like(params), state, params)
    assert np.isfinite(jax.tree.leaves(updates)[0]).all()


@pytest.mark.parametrize("sched", ["plateau", "cosine", "poly"])
def test_all_scheduler_types(sched):
    # the reference's cosine branch crashes on a typo'd attribute
    # (mask_bev_module.py:156); all types must work here
    cfg = tiny_test_config().replace(lr_schedulers_type=sched)
    params = _fake_params()
    tx = make_optimizer(cfg, params)
    state = tx.init(params)
    tx.update(_grads_like(params), state, params)


def test_differential_lr_scales_backbone():
    cfg = tiny_test_config().replace(
        differential_lr=True, differential_lr_scaling=0.1,
        optimiser_type="sgd", lr=1.0)
    params = _fake_params()
    tx = make_optimizer(cfg, params)
    state = tx.init(params)
    updates, _ = tx.update(_grads_like(params), state, params)
    bb = updates["backbone"]["stage0_block0"]["norm1"]["scale"][0]
    dec = updates["decoder"]["query_feat"][0, 0]
    assert abs(float(bb) / float(dec)) == pytest.approx(0.1, rel=1e-4)


def test_frozen_stages_zero_updates():
    cfg = tiny_test_config().replace(backbone_frozen_stages=0,
                                     optimiser_type="sgd")
    params = _fake_params()
    labels = frozen_mask_fn(cfg)(params)
    assert labels["backbone"]["patch_embed"]["kernel"] == "frozen"
    assert labels["backbone"]["stage0_block0"]["norm1"]["scale"] == "frozen"
    assert labels["backbone"]["merge0"]["reduction"]["kernel"] == "frozen"
    assert labels["backbone"]["stage2_block1"]["norm1"]["scale"] == "trainable"
    assert labels["decoder"]["query_feat"] == "trainable"

    tx = make_optimizer(cfg, params)
    state = tx.init(params)
    updates, _ = tx.update(_grads_like(params), state, params)
    assert float(jnp.abs(updates["backbone"]["patch_embed"]["kernel"]).sum()) == 0
    assert float(jnp.abs(updates["decoder"]["query_feat"]).sum()) > 0


def test_plateau_state():
    p = PlateauState(factor=0.1, patience=2)
    for v in (5.0, 4.0, 3.0):
        assert p.update(v) == 1.0
    p.update(3.5); p.update(3.5)
    assert p.update(3.5) == pytest.approx(0.1)  # 3 bad epochs > patience 2


def test_set_lr_scale_roundtrip():
    cfg = tiny_test_config()
    params = _fake_params()
    tx = make_optimizer(cfg, params)
    state = tx.init(params)
    state = set_lr_scale(state, 0.25)
    assert float(optax.tree_utils.tree_get(state, "lr_scale")) == 0.25
