"""Optimizers and LR schedules (optax).

Mirrors the reference's optimizer zoo (``mask_bev_module.py:132-171``):
Adam / AdamW / LAMB / SGD, plateau / cosine / poly schedules, and the
differential-LR option that scales the backbone's learning rate by
``differential_lr_scaling`` (ref :132-137; implemented with
``optax.multi_transform`` over a params-path mask instead of param groups).

The plateau schedule is host-driven (like torch ReduceLROnPlateau): the
train loop calls :class:`PlateauState`.update(val_loss) and the resulting
scale enters the injected ``lr_scale`` hyperparameter — no recompilation.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from mask_bev_tpu.config import MaskBevConfig


def _base_opt(cfg: MaskBevConfig, lr) -> optax.GradientTransformation:
    t = cfg.optimiser_type
    if t == "adam":
        return optax.adam(lr)
    if t == "adam_w":
        return optax.adamw(lr, weight_decay=cfg.weight_decay)
    if t == "lamb":
        return optax.lamb(lr, weight_decay=cfg.weight_decay)
    if t == "sgd":
        return optax.sgd(lr, momentum=0.9)
    raise ValueError(f"unknown optimiser_type: {t}")


def lr_schedule(cfg: MaskBevConfig, steps_per_epoch: int = 1000):
    """Static schedule component (cosine/poly); plateau handled by lr_scale."""
    t = cfg.lr_schedulers_type
    if t == "cosine":
        return optax.cosine_decay_schedule(
            cfg.lr, decay_steps=max(cfg.max_epochs * steps_per_epoch, 1))
    if t == "poly":
        return optax.polynomial_schedule(
            init_value=cfg.lr, end_value=0.0, power=0.9,
            transition_steps=max(cfg.max_epochs * steps_per_epoch, 1))
    # plateau / none: constant base lr; host scales via lr_scale
    return cfg.lr


def frozen_mask_fn(cfg: MaskBevConfig):
    """Zero-out gradients of frozen backbone stages (reference
    ``swin.py:652-672`` frozen_stages semantics: patch embed + stages <= k)."""
    k = cfg.backbone_frozen_stages

    def is_frozen(path) -> bool:
        keys = [getattr(p, "key", "") for p in path]
        if "backbone" not in keys:
            return False
        for name in keys:
            if name in ("patch_embed", "patch_norm", "absolute_pos_embed"):
                return k >= 0
            if name.startswith("stage") and "_block" in name:
                return int(name[5 : name.index("_")]) <= k
            if name.startswith("merge"):
                return int(name[5:]) <= k
        return False

    def label(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: "frozen" if is_frozen(path) else "trainable",
            params)

    return label


def make_optimizer(cfg: MaskBevConfig, params=None,
                   steps_per_epoch: int = 1000) -> optax.GradientTransformation:
    sched = lr_schedule(cfg, steps_per_epoch)

    @optax.inject_hyperparams
    def build(lr_scale):
        def scaled(lr_mult: float):
            if callable(sched):
                lr_fn = lambda step: sched(step) * lr_scale * lr_mult
            else:
                lr_fn = sched * lr_scale * lr_mult
            return _base_opt(cfg, lr_fn)

        if cfg.differential_lr:
            def label_fn(p):
                return jax.tree_util.tree_map_with_path(
                    lambda path, _: "backbone"
                    if any(getattr(k, "key", None) == "backbone" for k in path)
                    else "main",
                    p,
                )
            tx = optax.multi_transform(
                {"main": scaled(1.0),
                 "backbone": scaled(cfg.differential_lr_scaling)},
                label_fn,
            )
        else:
            tx = scaled(1.0)
        if cfg.grad_clip_norm > 0:
            tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), tx)
        if cfg.backbone_frozen_stages >= 0:
            tx = optax.multi_transform(
                {"trainable": tx, "frozen": optax.set_to_zero()},
                frozen_mask_fn(cfg))
        return tx

    return build(lr_scale=1.0)


@dataclasses.dataclass
class PlateauState:
    """Host-side ReduceLROnPlateau (torch semantics: factor 0.1, patience 10)."""

    factor: float = 0.1
    patience: int = 10
    min_scale: float = 1e-4
    best: float = float("inf")
    bad_epochs: int = 0
    scale: float = 1.0

    def update(self, metric: float) -> float:
        if metric < self.best - 1e-8:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.scale = max(self.scale * self.factor, self.min_scale)
                self.bad_epochs = 0
        return self.scale


def set_lr_scale(opt_state, scale: float):
    """Write the plateau scale into an inject_hyperparams optimizer state."""
    return optax.tree_utils.tree_set(opt_state, lr_scale=jnp.asarray(scale))
