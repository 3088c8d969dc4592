#!/usr/bin/env python3
"""Training CLI: ``python train_mask_bev.py --config <yml> [--train] [--test]``.

Mirrors the reference driver (``train_mask_bev.py:34-119``): flat YAML config
-> model + data module -> trainer with early-stop/checkpoint/LR-plateau; the
``--test`` path restores the BEST checkpoint (tracked in the checkpoint
index instead of the reference's filename parsing, ``train_mask_bev.py:55-63``)
and runs validation + test metric passes.
"""
from __future__ import annotations

import argparse
import pathlib

import jax


def build_datamodule(cfg, root: str):
    if cfg.dataset == "kitti":
        from mask_bev_tpu.datasets.kitti.kitti_data import KittiMaskDataModule

        return KittiMaskDataModule(root, cfg)
    if cfg.dataset == "semantic_kitti":
        from mask_bev_tpu.datasets.semantic_kitti.mask_data import (
            SemanticKittiMaskDataModule)

        return SemanticKittiMaskDataModule(root, cfg)
    if cfg.dataset == "waymo":
        from mask_bev_tpu.datasets.waymo.waymo_data import WaymoDataModule

        return WaymoDataModule(root, cfg)
    if cfg.dataset == "synthetic":
        import numpy as np

        from mask_bev_tpu.datasets.synthetic import make_batch

        class SyntheticModule:
            def train_batches(self, seed=0):
                rng = np.random.default_rng(seed)
                for _ in range(cfg.limit_train_batches or 16):
                    yield make_batch(rng, cfg)

            def val_batches(self, seed=0):
                rng = np.random.default_rng(seed + 10_000)
                for _ in range(cfg.limit_val_batches or 4):
                    yield make_batch(rng, cfg)

        return SyntheticModule()
    raise ValueError(f"unknown dataset: {cfg.dataset}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True, help="flat YAML config")
    parser.add_argument("--train", action="store_true")
    parser.add_argument("--test", action="store_true")
    parser.add_argument("--data-root", default=None,
                        help="dataset root (overrides config dataset_root)")
    parser.add_argument("--workdir", default="runs")
    parser.add_argument("--max-epochs", type=int, default=None)
    args = parser.parse_args()

    from mask_bev_tpu.config import MaskBevConfig
    from mask_bev_tpu.parallel.mesh import maybe_init_distributed_from_env
    from mask_bev_tpu.train.loop import Trainer

    if maybe_init_distributed_from_env():
        print(f"multi-host: process {jax.process_index()}"
              f"/{jax.process_count()}")

    cfg = MaskBevConfig.from_yaml(args.config)
    if args.test and not args.train:
        # test-time overrides (reference train_mask_bev.py:62-63)
        cfg = cfg.replace(
            batch_size=cfg.test_batch_size or cfg.batch_size,
            num_workers=(cfg.test_num_workers
                         if cfg.test_num_workers is not None
                         else cfg.num_workers))
    root = args.data_root or cfg.dataset_root or f"data/{cfg.dataset}"

    print(f"devices: {jax.devices()}")
    print(f"experiment: {cfg.name} dataset={cfg.dataset} grid={cfg.grid_hw}")

    dm = build_datamodule(cfg, root)
    trainer = Trainer(cfg, workdir=args.workdir)

    if args.train or not args.test:
        trainer.fit(dm.train_batches, dm.val_batches,
                    max_epochs=args.max_epochs)

    if args.test:
        restored = trainer.ckpt.restore(trainer._ckpt_state(), which="best")
        if restored is not None:
            trainer.state = trainer.state.replace(
                params=restored["params"], batch_stats=restored["batch_stats"])
            print(f"restored best checkpoint "
                  f"(val_loss={trainer.ckpt.index.get('best_val_loss')})")
        results = trainer.validate(dm.val_batches(0), jax.random.PRNGKey(0))
        print("test results:", results)


if __name__ == "__main__":
    main()
