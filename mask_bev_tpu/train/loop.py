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
from mask_bev_tpu.train.metrics import LayerMetricsBank
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
    def __init__(self, cfg: MaskBevConfig, workdir: str = "runs",
                 devices=None):
        self.mesh = make_mesh(devices)
        # the fused Pallas eval kernels only lower on TPU; when the trainer's
        # mesh is CPU (virtual-device tests, dryruns) force the XLA path even
        # if a TPU backend is registered as the process default
        if not any(d.platform == "tpu" for d in self.mesh.devices.flat):
            cfg = cfg.replace(use_pallas_encoder=False,
                              use_pallas_attention=False,
                              use_pallas_backbone=False)
        self.cfg = cfg
        self.workdir = pathlib.Path(workdir) / cfg.name
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
        # per-decoder-layer metric banks on BOTH phases (reference
        # mask_bev_module.py:85-94 keeps train and val triples for all layers)
        self.train_metrics = LayerMetricsBank(cfg)
        self.val_metrics = LayerMetricsBank(cfg)
        self._viz_fwd = None

        # resume (reference: checkpoint key 'last' | path,
        # mask_bev_module.py:113-118). Unlike the reference's strict=False
        # model-only load, the FULL train state is restored — optimizer
        # moments, plateau/early-stop counters and step — so a resumed run
        # continues bitwise-identically to an uninterrupted one (per-epoch
        # RNG is re-derived via fold_in, not stored).
        if cfg.checkpoint:
            restored = self.ckpt.restore(self._ckpt_state(), which=cfg.checkpoint)
            if restored is not None:
                self.state = self.state.replace(
                    params=restored["params"],
                    batch_stats=restored["batch_stats"],
                    opt_state=restored["opt_state"],
                    step=restored["step"])
                meta = self.ckpt.meta(
                    cfg.checkpoint if cfg.checkpoint in ("last", "best")
                    else "last")
                self.epoch = int(meta.get(
                    "epoch", self.ckpt.index.get("last_epoch", 0))) + 1
                for f in ("best", "bad_epochs", "scale"):
                    if f"plateau_{f}" in meta:
                        setattr(self.plateau, f, meta[f"plateau_{f}"])

    def _ckpt_state(self):
        return {"params": self.state.params,
                "batch_stats": self.state.batch_stats,
                "opt_state": self.state.opt_state,
                "step": self.state.step}

    def _ckpt_meta(self, bad_epochs: int):
        return {"epoch": self.epoch,
                "plateau_best": self.plateau.best,
                "plateau_bad_epochs": self.plateau.bad_epochs,
                "plateau_scale": self.plateau.scale,
                "early_stop_bad_epochs": bad_epochs}

    def _device_batch(self, batch: Dict[str, np.ndarray]):
        batch = {k: v for k, v in batch.items() if k != "num_instances"}
        if jax.process_count() > 1:
            # multi-host: each process loads only its local shard; assemble
            # the global batch-sharded arrays (the reference's
            # DistributedSampler + DDP boundary, train_mask_bev.py:92-96)
            from mask_bev_tpu.parallel.mesh import local_batch_to_global

            return local_batch_to_global(
                {k: np.asarray(v) for k, v in batch.items()}, self.mesh)
        return shard_batch(
            {k: jnp.asarray(v) for k, v in batch.items()}, self.mesh)

    def _dump_images(self, batch: Dict[str, np.ndarray], outputs) -> None:
        """First-batch observability images (reference TB dumps,
        ``mask_bev_module.py:257-264,281-294,353-364``): encoded pseudo-image,
        backbone features, GT instance map, per-query predicted masks."""
        from mask_bev_tpu.models.maskbev import MaskBev
        from mask_bev_tpu.visualization import bev_viz

        if self._viz_fwd is None:
            def viz(v, pts, pmask):
                enc = self.model.apply(v, pts, pmask, train=False,
                                       method=MaskBev.forward_encode)
                feats = self.model.apply(v, enc, train=False,
                                         method=MaskBev.forward_backbone)
                return enc, feats[0]
            self._viz_fwd = jax.jit(viz)

        d = self.workdir / "images"
        d.mkdir(parents=True, exist_ok=True)
        ep = self.epoch
        variables = {"params": self.state.params,
                     "batch_stats": self.state.batch_stats}
        enc, feat0 = self._viz_fwd(
            variables, jnp.asarray(batch["points"][:1]),
            jnp.asarray(batch["point_mask"][:1]))
        # NHWC -> (C, H, W) for the heatmap helpers
        bev_viz.plot_pseudo_image(
            np.asarray(enc[0]).transpose(2, 0, 1),
            path=str(d / f"epoch{ep:04d}_encoded.png"))
        bev_viz.plot_pseudo_image(
            np.asarray(feat0[0]).transpose(2, 0, 1),
            path=str(d / f"epoch{ep:04d}_backbone.png"))
        gt = batch["gt_masks"][0]
        inst = np.zeros(gt.shape[-2:], np.int32)
        for g in range(gt.shape[0]):
            if batch["gt_valid"][0][g]:
                inst[gt[g].astype(bool)] = g + 1
        bev_viz.plot_instance_mask(
            inst, path=str(d / f"epoch{ep:04d}_gt.png"))
        cls = np.asarray(outputs.cls_logits[-1][0])
        probs = np.asarray(jax.nn.sigmoid(outputs.mask_logits[-1][0]
                                          .astype(jnp.float32)))
        keep = cls.argmax(-1) != 0  # reference: per-query argmax > 0
        if keep.any():
            bev_viz.plot_query_masks(
                probs[keep], path=str(d / f"epoch{ep:04d}_pred_sig.png"))

    def train_epoch(self, batches: Iterator[Dict], rng: jax.Array) -> float:
        losses = []
        t0 = time.time()
        for i, batch in enumerate(prefetch(batches)):
            if (self.cfg.limit_train_batches is not None
                    and i >= self.cfg.limit_train_batches):
                break
            rng, sub, sub_m = jax.random.split(rng, 3)
            self.state, logs, outputs = self._train_step(
                self.state, self._device_batch(batch), sub)
            if self.cfg.compute_train_metrics:
                self.train_metrics.update(sub_m, outputs, batch)
            if i == 0 and self.cfg.log_images:
                try:
                    self._dump_images(batch, outputs)
                except Exception as e:  # viz must never kill training
                    self.logger.log({"phase": "viz_error", "error": repr(e)})
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
        self.val_metrics.reset()
        for i, batch in enumerate(batches):
            if (self.cfg.limit_val_batches is not None
                    and i >= self.cfg.limit_val_batches):
                break
            rng, sub, sub2 = jax.random.split(rng, 3)
            logs, outputs = self._eval_step(
                self.state, self._device_batch(batch), sub)
            # keep the loss ON DEVICE: a float() here would serialize the
            # device stream through the host relay every batch; one stacked
            # mean below costs a single sync per epoch
            losses.append(logs["loss"])
            if with_metrics:
                self.val_metrics.update(sub2, outputs, batch)
        out = {"val_loss": float(jnp.stack(losses).mean())
               if losses else float("nan")}
        if with_metrics:
            out.update(
                {f"val_{k}": v for k, v in self.val_metrics.compute().items()})
        return out

    def fit(self, train_batches_fn: Callable[[int], Iterator[Dict]],
            val_batches_fn: Callable[[int], Iterator[Dict]],
            max_epochs: Optional[int] = None) -> Dict[str, float]:
        max_epochs = max_epochs or self.cfg.max_epochs
        base_rng = jax.random.PRNGKey(self.cfg.seed + 1)
        best_val = self.ckpt.index.get("best_val_loss") or float("inf")
        bad_epochs = int(self.ckpt.meta().get("early_stop_bad_epochs", 0))
        last_val: Dict[str, float] = {}
        while self.epoch < max_epochs:
            # per-epoch RNG derived from (seed, epoch) — resume at epoch k
            # uses exactly the keys an uninterrupted run would have used
            r1 = jax.random.fold_in(base_rng, 2 * self.epoch)
            r2 = jax.random.fold_in(base_rng, 2 * self.epoch + 1)
            train_loss = self.train_epoch(
                train_batches_fn(self.cfg.seed + self.epoch), r1)
            if self.cfg.compute_train_metrics:
                self.logger.log({
                    "phase": "train_metrics", "epoch": self.epoch,
                    **{f"train_{k}": v
                       for k, v in self.train_metrics.compute().items()}})
                self.train_metrics.reset()
            last_val = self.validate(val_batches_fn(0), r2)
            val_loss = last_val["val_loss"]
            self.logger.log({"phase": "val", "epoch": self.epoch,
                             "train_loss": train_loss, **last_val})

            scale = self.plateau.update(val_loss)
            if self.cfg.lr_schedulers_type == "plateau":
                self.state = self.state.replace(
                    opt_state=set_lr_scale(self.state.opt_state, scale))

            if val_loss < best_val:
                best_val = val_loss
                bad_epochs = 0
            else:
                bad_epochs += 1
            ckpt_state = self._ckpt_state()
            meta = self._ckpt_meta(bad_epochs)
            self.ckpt.save_last(ckpt_state, int(self.state.step), self.epoch,
                                meta=meta)
            self.ckpt.save_best(
                ckpt_state, int(self.state.step), self.epoch, val_loss,
                meta=meta)
            if bad_epochs > self.cfg.early_stop_patience:
                self.logger.log({"phase": "early_stop",
                                 "epoch": self.epoch,
                                 "best_val_loss": best_val})
                break
            self.epoch += 1
        return last_val
