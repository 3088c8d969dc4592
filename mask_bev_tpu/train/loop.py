"""Training driver: epochs, validation, checkpoints, early stop, logging.

The TPU-native equivalent of the reference's Lightning Trainer usage
(``train_mask_bev.py:85-119`` + ``mask_bev_module.py:189-240``): jitted
global-batch train/eval steps over a data-parallel mesh, ReduceLROnPlateau
on val_loss, EarlyStopping(patience=30), best+last checkpoints, per-epoch
metric computation, and jsonl metric logging (stdout mirrors scalars).
"""
from __future__ import annotations

import json
import pathlib
import time
from typing import Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mask_bev_tpu.config import MaskBevConfig
from mask_bev_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch
from mask_bev_tpu.train.checkpoint import CheckpointManager
from mask_bev_tpu.train.metrics import LayerMetrics, update_layer_metrics
from mask_bev_tpu.train.optim import PlateauState, set_lr_scale
from mask_bev_tpu.train.step import (
    create_train_state, make_eval_step, make_train_step)
from mask_bev_tpu.utils.prefetch import prefetch


class MetricLogger:
    def __init__(self, log_dir: str, name: str):
        self.dir = pathlib.Path(log_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.path = self.dir / f"{name}.metrics.jsonl"
        self._f = open(self.path, "a")

    def log(self, payload: Dict) -> None:
        payload = {k: (float(v) if hasattr(v, "item") or isinstance(v, float)
                       else v) for k, v in payload.items()}
        self._f.write(json.dumps(payload) + "\n")
        self._f.flush()
        scalars = {k: v for k, v in payload.items()
                   if isinstance(v, (int, float))}
        print(" ".join(f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
                       for k, v in scalars.items()), flush=True)


class Trainer:
    def __init__(self, cfg: MaskBevConfig, workdir: str = "runs"):
        self.cfg = cfg
        self.workdir = pathlib.Path(workdir) / cfg.name
        self.mesh = make_mesh()
        self.logger = MetricLogger(str(self.workdir), cfg.name)
        self.ckpt = CheckpointManager(str(self.workdir / "checkpoints"))

        rng = jax.random.PRNGKey(cfg.seed)
        self.model, self.state = create_train_state(cfg, rng)
        self.state = replicate_state(self.state, self.mesh)
        self._train_step = jax.jit(
            make_train_step(self.model, cfg), donate_argnums=0)
        self._eval_step = jax.jit(make_eval_step(self.model, cfg))
        self.plateau = PlateauState()
        self.epoch = 0

        # resume (reference: checkpoint key 'last' | path,
        # mask_bev_module.py:113-118)
        if cfg.checkpoint:
            restored = self.ckpt.restore(
                {"params": self.state.params,
                 "batch_stats": self.state.batch_stats},
                which=cfg.checkpoint)
            if restored is not None:
                self.state = self.state.replace(
                    params=restored["params"],
                    batch_stats=restored["batch_stats"])
                self.epoch = int(self.ckpt.index.get("last_epoch", 0)) + 1

    def _device_batch(self, batch: Dict[str, np.ndarray]):
        batch = {k: v for k, v in batch.items() if k != "num_instances"}
        return shard_batch(
            {k: jnp.asarray(v) for k, v in batch.items()}, self.mesh)

    def train_epoch(self, batches: Iterator[Dict], rng: jax.Array) -> float:
        losses = []
        t0 = time.time()
        for i, batch in enumerate(prefetch(batches)):
            if (self.cfg.limit_train_batches is not None
                    and i >= self.cfg.limit_train_batches):
                break
            rng, sub = jax.random.split(rng)
            self.state, logs = self._train_step(
                self.state, self._device_batch(batch), sub)
            if i % max(self.cfg.log_every_n_step, 1) == 0:
                loss = float(logs["loss"])
                losses.append(loss)
                self.logger.log({
                    "phase": "train", "epoch": self.epoch, "step": i,
                    "loss": loss,
                    "loss_cls": float(logs["loss_cls"]),
                    "loss_mask": float(logs["loss_mask"]),
                    "loss_dice": float(logs["loss_dice"]),
                    "sec_per_step": (time.time() - t0) / (i + 1),
                })
        return float(np.mean(losses)) if losses else float("nan")

    def validate(self, batches: Iterator[Dict], rng: jax.Array,
                 with_metrics: bool = True) -> Dict[str, float]:
        losses = []
        metrics = LayerMetrics.create()
        for i, batch in enumerate(batches):
            if (self.cfg.limit_val_batches is not None
                    and i >= self.cfg.limit_val_batches):
                break
            rng, sub, sub2 = jax.random.split(rng, 3)
            logs, outputs = self._eval_step(
                self.state, self._device_batch(batch), sub)
            losses.append(float(logs["loss"]))
            if with_metrics:
                update_layer_metrics(sub2, outputs, batch, metrics, self.cfg)
        out = {"val_loss": float(np.mean(losses)) if losses else float("nan")}
        if with_metrics:
            out.update({f"val_{k}": v for k, v in metrics.compute().items()})
        return out

    def fit(self, train_batches_fn: Callable[[int], Iterator[Dict]],
            val_batches_fn: Callable[[int], Iterator[Dict]],
            max_epochs: Optional[int] = None) -> Dict[str, float]:
        max_epochs = max_epochs or self.cfg.max_epochs
        rng = jax.random.PRNGKey(self.cfg.seed + 1)
        best_val = self.ckpt.index.get("best_val_loss") or float("inf")
        bad_epochs = 0
        last_val: Dict[str, float] = {}
        while self.epoch < max_epochs:
            rng, r1, r2 = jax.random.split(rng, 3)
            train_loss = self.train_epoch(
                train_batches_fn(self.cfg.seed + self.epoch), r1)
            last_val = self.validate(val_batches_fn(0), r2)
            val_loss = last_val["val_loss"]
            self.logger.log({"phase": "val", "epoch": self.epoch,
                             "train_loss": train_loss, **last_val})

            scale = self.plateau.update(val_loss)
            if self.cfg.lr_schedulers_type == "plateau":
                self.state = self.state.replace(
                    opt_state=set_lr_scale(self.state.opt_state, scale))

            ckpt_state = {"params": self.state.params,
                          "batch_stats": self.state.batch_stats}
            self.ckpt.save_last(ckpt_state, int(self.state.step), self.epoch)
            improved = self.ckpt.save_best(
                ckpt_state, int(self.state.step), self.epoch, val_loss)
            if improved:
                best_val = val_loss
                bad_epochs = 0
            else:
                bad_epochs += 1
                if bad_epochs > self.cfg.early_stop_patience:
                    self.logger.log({"phase": "early_stop",
                                     "epoch": self.epoch,
                                     "best_val_loss": best_val})
                    break
            self.epoch += 1
        return last_val
