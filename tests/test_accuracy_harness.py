"""Smoke coverage for the cross-implementation accuracy harness.

The full harness (``scripts/accuracy_harness.py``) trains the torch
reference re-expression and the flax model to convergence on synthetic
fixtures (see measurements/r4/accuracy_parity.json for an executed run).
Here: one training step of each side on the same fixture must run and
produce finite losses of the same order, and the shared eval protocol must
score a perfect prediction at mAP 1.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

torch = pytest.importorskip("torch")


def _tiny_harness_cfg():
    from accuracy_harness import harness_config

    # shrink further for test speed: 48x48 grid keeps stages even (12/6/3...)
    return harness_config().replace(
        x_range=(-6, 6), y_range=(-6, 6), max_points_per_scan=512,
        max_num_pillars=512, head_num_points=64, batch_size=2)


def test_torch_side_one_step():
    from accuracy_harness import make_fixture_batches, pillarize_for_torch
    from torch_ref import TMaskBev, total_loss

    cfg = _tiny_harness_cfg()
    batches = make_fixture_batches(cfg, 1, 2, 123)
    (feats, npts, coords, valid), = pillarize_for_torch(batches, cfg)

    torch.manual_seed(0)
    model = TMaskBev(cfg)
    cls_list, mask_list = model(
        torch.tensor(feats), torch.tensor(npts), torch.tensor(coords),
        torch.tensor(valid))
    assert len(cls_list) == cfg.head_num_decoder_layers + 1
    b = batches[0]
    loss = total_loss(cls_list, mask_list,
                      torch.tensor(b["gt_labels"], dtype=torch.long),
                      torch.tensor(b["gt_masks"]),
                      torch.tensor(b["gt_valid"]), cfg)
    loss.backward()
    assert np.isfinite(float(loss.detach()))
    # every parameter participates in the graph (re-expression sanity)
    n_nograd = sum(1 for p in model.parameters() if p.grad is None)
    assert n_nograd == 0


def test_flax_side_one_step_same_fixture():
    import jax

    from accuracy_harness import make_fixture_batches
    from mask_bev_tpu.train.step import create_train_state, make_train_step

    cfg = _tiny_harness_cfg()
    b = make_fixture_batches(cfg, 1, 2, 123)[0]
    model, state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, cfg), donate_argnums=0)
    import jax.numpy as jnp

    state, logs, _ = step(state, {k: jnp.asarray(v) for k, v in b.items()},
                          jax.random.PRNGKey(1))
    assert np.isfinite(float(logs["loss"]))


def test_shared_eval_protocol_perfect_prediction():
    from accuracy_harness import eval_predictions

    q, h, w = 4, 16, 16
    gm = np.zeros((1, q, h, w), bool)
    gm[0, 0, 2:8, 2:8] = True
    gm[0, 1, 10:14, 10:14] = True
    batch = {
        "gt_labels": np.array([[1, 1, 0, 0]], np.int32),
        "gt_masks": gm,
        "gt_valid": np.ones((1, q), bool),
    }
    probs = np.zeros((1, q, 2), np.float32)
    probs[0, :2, 1] = 0.9  # two confident CAR predictions
    probs[0, :2, 0] = 0.1
    probs[0, 2:, 0] = 0.9  # the rest predict no-object
    probs[0, 2:, 1] = 0.1
    masks = gm.astype(np.float32)  # (S=1, Q, H, W) sigmoid outputs
    out = eval_predictions(probs, masks, [batch])
    assert out["map"] == pytest.approx(1.0, abs=1e-6)
    assert out["miou"] == pytest.approx(1.0, abs=1e-6)
