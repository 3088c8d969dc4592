"""Kill+resume must continue bitwise-identically to an uninterrupted run.

The reference resumes full Lightning checkpoints (optimizer moments included,
``train_mask_bev.py:104-111``); the TPU trainer checkpoints the complete
train state (params, batch_stats, opt_state, step) plus host-side plateau /
early-stop counters, and derives per-epoch RNG from (seed, epoch) so a
resumed run replays exactly the keys an unbroken run would use.
"""
import numpy as np
import pytest

from mask_bev_tpu.config import tiny_test_config
from mask_bev_tpu.datasets.synthetic import make_batch


def _cfg(ndev):
    return tiny_test_config().replace(
        batch_size=ndev, max_points_per_scan=512, limit_train_batches=2,
        limit_val_batches=1, log_every_n_step=1,
        compute_train_metrics=False, log_images=False)


def _batches_fn(cfg):
    def fn(seed):
        r = np.random.default_rng(seed)
        for _ in range(2):
            yield make_batch(r, cfg)
    return fn


@pytest.mark.slow
def test_resume_matches_unbroken_run(tmp_path):
    import jax

    from mask_bev_tpu.train.loop import Trainer

    # hermetic: pin to the virtual CPU mesh (a force-registered TPU plugin
    # would otherwise grab the trainer, see tests/conftest.py)
    devices = jax.devices("cpu")
    ndev = len(devices)
    cfg = _cfg(ndev)

    with jax.default_device(devices[0]):
        # control: 2 uninterrupted epochs
        t_ctrl = Trainer(cfg.replace(name="ctrl"), workdir=str(tmp_path / "a"),
                         devices=devices)
        t_ctrl.fit(_batches_fn(cfg), _batches_fn(cfg), max_epochs=2)
        ctrl_params = jax.tree.map(np.asarray, t_ctrl.state.params)
        ctrl_loss = t_ctrl.ckpt.index["last_meta"]

        # interrupted: 1 epoch, then a fresh Trainer resuming from 'last'
        t_a = Trainer(cfg.replace(name="res"), workdir=str(tmp_path / "b"),
                      devices=devices)
        t_a.fit(_batches_fn(cfg), _batches_fn(cfg), max_epochs=1)
        assert t_a.ckpt.has_last
        del t_a

        t_b = Trainer(cfg.replace(name="res", checkpoint="last"),
                      workdir=str(tmp_path / "b"), devices=devices)
        assert t_b.epoch == 1  # resumes at the next epoch
        assert int(t_b.state.step) == 2  # optimizer step count restored
        t_b.fit(_batches_fn(cfg), _batches_fn(cfg), max_epochs=2)

    res_params = jax.tree.map(np.asarray, t_b.state.params)
    flat_c = jax.tree.leaves(ctrl_params)
    flat_r = jax.tree.leaves(res_params)
    assert len(flat_c) == len(flat_r)
    for c, r in zip(flat_c, flat_r):
        np.testing.assert_array_equal(c, r)
    # plateau/early-stop state carried over
    assert t_b.ckpt.meta()["plateau_best"] == pytest.approx(
        ctrl_loss["plateau_best"])
    assert (t_b.ckpt.meta()["early_stop_bad_epochs"]
            == ctrl_loss["early_stop_bad_epochs"])
