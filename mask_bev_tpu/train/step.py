"""Train/eval step builders: pure jitted functions over a flax TrainState.

The TPU equivalent of the reference LightningModule step methods
(``mask_bev_module.py:242-299``): forward -> deep-supervised loss -> grads ->
optimizer update, with batch-stat (masked BN) mutation threaded through.
Distribution is by construction: steps are written against the GLOBAL batch;
under ``jax.jit`` with sharded inputs XLA inserts the gradient/normalizer
collectives the reference got from DDP + ``reduce_mean``
(``train_mask_bev.py:92-96``, ``mask2former_head.py:388``).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import core, struct

from mask_bev_tpu.config import MaskBevConfig
from mask_bev_tpu.losses import maskbev_loss
from mask_bev_tpu.models.maskbev import MaskBev
from mask_bev_tpu.train.optim import make_optimizer
from mask_bev_tpu.utils.precision import cast_float_leaves, resolve_dtype


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: core.FrozenDict
    batch_stats: core.FrozenDict
    opt_state: Any
    tx: Any = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            batch_stats=new_batch_stats,
            opt_state=new_opt,
        )


def create_train_state(cfg: MaskBevConfig, rng: jax.Array,
                       steps_per_epoch: int = 1000) -> Tuple[MaskBev, TrainState]:
    model = MaskBev(cfg)
    n = cfg.max_points_per_scan
    dummy_pts = jnp.zeros((1, n, cfg.pc_point_dim))
    dummy_mask = jnp.zeros((1, n), bool)
    init_rng, drop_rng = jax.random.split(rng)
    # init under jit: eager flax init dispatches thousands of single ops,
    # which is pathological through a remote-attached TPU relay (~30 ms RTT
    # per op); one compiled program initializes in seconds
    variables = jax.jit(lambda r, p, m: model.init(r, p, m, train=True))(
        {"params": init_rng, "dropout": drop_rng}, dummy_pts, dummy_mask)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", core.FrozenDict())
    tx = make_optimizer(cfg, params, steps_per_epoch)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats=batch_stats, opt_state=tx.init(params), tx=tx)
    return model, state


def make_train_step(model: MaskBev, cfg: MaskBevConfig):
    # mixed-precision training (cfg.compute_dtype: bfloat16): master params
    # stay float32 in the optimizer; the forward runs on a bf16 cast (grads
    # flow back through the cast as f32), losses are computed in f32
    # (losses.py casts logits), and batch_stats keep their f32 storage dtype.
    dtype = resolve_dtype(cfg.compute_dtype)
    mixed = dtype != jnp.float32

    def train_step(state: TrainState, batch: Dict[str, jax.Array],
                   rng: jax.Array):
        loss_rng, path_rng = jax.random.split(rng)

        def loss_fn(params):
            if mixed:
                params = cast_float_leaves(params, dtype)
            pts = batch["points"].astype(dtype) if mixed else batch["points"]
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                pts, batch["point_mask"], train=True,
                mutable=["batch_stats"], rngs={"dropout": path_rng})
            total, logs = maskbev_loss(
                loss_rng, out,
                batch["gt_labels"], batch["gt_masks"], batch["gt_valid"],
                batch.get("gt_heights") if cfg.predict_height else None,
                cfg)
            return total, (logs, mut["batch_stats"], out)

        grads, (logs, new_bs, out) = jax.grad(loss_fn, has_aux=True)(
            state.params)
        if mixed:  # keep running-stat storage dtype stable across steps
            new_bs = jax.tree.map(
                lambda a, b: a.astype(b.dtype), new_bs, state.batch_stats)
        state = state.apply_gradients(grads, new_bs)
        # outputs returned for the per-layer train metric bank (reference
        # computes metrics for all 10 layers on train too,
        # mask_bev_module.py:293-296)
        return state, logs, out

    return train_step


def make_eval_step(model: MaskBev, cfg: MaskBevConfig):
    dtype = resolve_dtype(cfg.compute_dtype)
    mixed = dtype != jnp.float32

    def eval_step(state: TrainState, batch: Dict[str, jax.Array],
                  rng: jax.Array):
        params = (cast_float_leaves(state.params, dtype)
                  if mixed else state.params)
        pts = batch["points"].astype(dtype) if mixed else batch["points"]
        out = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            pts, batch["point_mask"], train=False)
        _, logs = maskbev_loss(
            rng, out,
            batch["gt_labels"], batch["gt_masks"], batch["gt_valid"],
            batch.get("gt_heights") if cfg.predict_height else None,
            cfg)
        return logs, out

    return eval_step


def make_predict_step(model: MaskBev, cfg: MaskBevConfig):
    """Inference: final-layer class scores + sigmoid masks."""

    def predict(state_or_vars, points, point_mask):
        if isinstance(state_or_vars, TrainState):
            variables = {"params": state_or_vars.params,
                         "batch_stats": state_or_vars.batch_stats}
        else:
            variables = state_or_vars
        out = model.apply(variables, points, point_mask, train=False)
        cls = jax.nn.softmax(out.cls_logits[-1], axis=-1)  # (B, Q, K+1)
        masks = jax.nn.sigmoid(out.mask_logits[-1])  # (B, Q, H/4, W/4)
        return cls, masks

    return predict
