#!/usr/bin/env python3
"""Synthetic cross-implementation end-metric accuracy harness.

Trains TWO implementations of MaskBEV on IDENTICAL synthetic fixtures and
compares end metrics (COCO segm mAP + matched mIoU):

  * torch: the REFERENCE architecture re-expressed (``scripts/torch_ref.py``)
    including the real ``MSDeformAttnPixelDecoder`` — what the flax model's
    conv-FPN pixel decoder deviates from (docs/ARCHITECTURE.md deviation #1);
  * flax: this library's model, through its own train machinery
    (``train/step.py``), on the same batches with the same hyperparameters.

This is the executable stand-in for real-dataset parity (no datasets, no
reference checkpoint, no torchmetrics in this environment — reference
metric definitions at ``mask_bev_module.py:85-94``). Both sides share the
data pipeline, the GT convention (SemanticKITTI: label 0 = no-object,
real = class+1, ALL Q rows enter matching) and the numpy evaluation
protocol, so the remaining differences are exactly: architecture deviation
+ framework numerics + init/sampling RNG. Agreement of the metric
trajectories is the parity evidence.

Run: python scripts/accuracy_harness.py --steps 400 --out measurements/r4
CPU-only and slow-ish (~10-20 min at 400 steps on 1 core).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# CPU-pin BEFORE jax import (same recipe as tests/conftest.py): the harness
# is a numerics comparison; the force-registered TPU plugin must not grab it
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def harness_config():
    from mask_bev_tpu.config import tiny_test_config

    # 96x96 grid: every Swin stage input stays even (24/12/6/3), so the
    # torch and flax patch-merging paths see identical shapes
    return tiny_test_config().replace(
        name="harness", x_range=(-12, 12), y_range=(-12, 12),
        voxel_size=0.25, max_points_per_scan=2048, max_num_pillars=2048,
        predict_height=False, backbone_drop_path_rate=0.0,
        lr_schedulers_type="none", lr=1e-4, weight_decay=1e-4,
        use_pallas_encoder=False, use_pallas_attention=False,
        use_pallas_backbone=False, batch_size=4)


def make_fixture_batches(cfg, n_batches, batch_size, seed0, scene_kw=None):
    """Identical fixtures for both sides, SemanticKITTI GT convention."""
    from mask_bev_tpu.datasets.synthetic import make_batch

    batches = []
    for s in range(n_batches):
        b = make_batch(np.random.default_rng(seed0 + s), cfg,
                       batch_size=batch_size, **(scene_kw or {}))
        real = b["gt_valid"]
        b["gt_labels"] = np.where(real, b["gt_labels"] + 1, 0).astype(np.int32)
        b["gt_valid"] = np.ones_like(b["gt_valid"])  # all Q rows matched
        b.pop("gt_heights", None)
        batches.append(b)
    return batches


def pillarize_for_torch(batches, cfg):
    """Shared data prep: dense (P, K, 4) voxel batches for the torch side
    (the reference's hard voxelization), via the tested jax pillarizer."""
    import jax
    import jax.numpy as jnp

    from mask_bev_tpu.ops.voxelize import pillarize_batch

    geo = dict(x_range=cfg.x_range, y_range=cfg.y_range, z_range=cfg.z_range,
               voxel_size=cfg.voxel_size,
               max_points_per_pillar=cfg.max_num_points,
               max_pillars=cfg.max_num_pillars)
    fn = jax.jit(lambda p, m: pillarize_batch(p, m, **geo))
    out = []
    for b in batches:
        pb = fn(jnp.asarray(b["points"]), jnp.asarray(b["point_mask"]))
        out.append(tuple(np.asarray(x) for x in
                         (pb.feats, pb.num_points, pb.coords, pb.valid)))
    return out


# --------------------------------------------------------------------------
# shared evaluation protocol (numpy; both sides feed the same functions)
# --------------------------------------------------------------------------


def eval_predictions(cls_probs, mask_sigmoid, batches, noobj_class=0):
    """cls_probs (S, Q, K+1), mask_sigmoid (S, Q, H, W) in gt resolution;
    returns {segm mAP dict, matched mIoU}."""
    from scipy.optimize import linear_sum_assignment

    from mask_bev_tpu.evaluation.detection_metric import (
        MaskMeanAveragePrecision)

    m = MaskMeanAveragePrecision()
    ious_matched = []
    s = 0
    for b in batches:
        for i in range(b["gt_labels"].shape[0]):
            probs = cls_probs[s]
            pred = mask_sigmoid[s] > 0.5
            gm = b["gt_masks"][i]
            real = b["gt_masks"][i].sum((-2, -1)) > 0
            pf = pred.reshape(pred.shape[0], -1).astype(np.float64)
            gf = gm[real].reshape(real.sum(), -1).astype(np.float64)
            inter = pf @ gf.T
            union = pf.sum(-1)[:, None] + gf.sum(-1)[None, :] - inter
            ious = inter / np.maximum(union, 1e-9)
            pred_cls = probs.argmax(-1)
            keep = pred_cls != noobj_class
            m.update_from_ious(
                pred_scores=probs.max(-1)[keep], pred_labels=pred_cls[keep],
                gt_labels=b["gt_labels"][i][real], ious=ious[keep])
            # matched mIoU: IoU-maximizing assignment of kept preds to gts
            if real.any() and keep.any():
                sub = ious[keep]
                r, c = linear_sum_assignment(-sub)
                ious_matched.extend(sub[r, c].tolist())
            s += 1
    out = m.compute_dict()
    out["miou"] = float(np.mean(ious_matched)) if ious_matched else 0.0
    return out


# --------------------------------------------------------------------------
# torch side
# --------------------------------------------------------------------------


def run_torch(cfg, batches, voxel_batches, steps, eval_every, val_batches,
              val_voxels, lr, seed=0):
    import torch

    from torch_ref import TMaskBev, total_loss

    torch.manual_seed(seed)
    model = TMaskBev(cfg)
    opt = torch.optim.AdamW(model.parameters(), lr=lr,
                            weight_decay=cfg.weight_decay)
    h, w = (np.asarray(batches[0]["gt_masks"]).shape[-2:])

    def evaluate():
        model.eval()
        probs_all, masks_all = [], []
        with torch.no_grad():
            for vb in val_voxels:
                feats, npts, coords, valid = (torch.tensor(x) for x in vb)
                cls_list, mask_list = model(feats, npts, coords, valid)
                probs_all.append(cls_list[-1].softmax(-1).numpy())
                masks_all.append(torch.nn.functional.interpolate(
                    mask_list[-1], (h, w), mode="bilinear",
                    align_corners=False).sigmoid().numpy())
        model.train()
        return eval_predictions(
            np.concatenate(probs_all), np.concatenate(masks_all),
            val_batches)

    curve, losses = {}, []
    model.train()
    t0 = time.time()
    for it in range(steps):
        b = batches[it % len(batches)]
        feats, npts, coords, valid = (
            torch.tensor(x) for x in voxel_batches[it % len(batches)])
        cls_list, mask_list = model(feats, npts, coords, valid)
        loss = total_loss(
            cls_list, mask_list, torch.tensor(b["gt_labels"], dtype=torch.long),
            torch.tensor(b["gt_masks"]), torch.tensor(b["gt_valid"]), cfg)
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
        if (it + 1) % eval_every == 0 or it + 1 == steps:
            curve[it + 1] = evaluate()
            print(f"[torch] step {it+1}: loss={float(loss):.3f} "
                  f"map={curve[it+1]['map']:.4f} "
                  f"miou={curve[it+1]['miou']:.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    return {"loss_curve": losses, "metric_curve": curve}


# --------------------------------------------------------------------------
# flax side
# --------------------------------------------------------------------------


def run_flax(cfg, batches, steps, eval_every, val_batches, seed=0,
             eval_int8=False):
    import jax
    import jax.numpy as jnp

    from mask_bev_tpu.models.maskbev import MaskBev
    from mask_bev_tpu.train.step import (
        create_train_state, make_eval_step, make_train_step)

    model, state = create_train_state(cfg, jax.random.PRNGKey(seed))
    step = jax.jit(make_train_step(model, cfg), donate_argnums=0)
    h, w = np.asarray(batches[0]["gt_masks"]).shape[-2:]

    def make_predict(m):
        @jax.jit
        def predict(params, batch_stats, pts, msk):
            out = m.apply({"params": params, "batch_stats": batch_stats},
                          pts, msk, train=False)
            q = out.cls_logits.shape[2]
            probs = jax.nn.softmax(out.cls_logits[-1].astype(jnp.float32), -1)
            masks = jax.nn.sigmoid(jax.image.resize(
                out.mask_logits[-1].astype(jnp.float32),
                (pts.shape[0], q, h, w), "bilinear"))
            return probs, masks
        return predict

    predict = make_predict(model)

    def evaluate(st, predict_fn=None):
        pf = predict_fn or predict
        probs_all, masks_all = [], []
        for vb in val_batches:
            p, mk = pf(st.params, st.batch_stats,
                       jnp.asarray(vb["points"]),
                       jnp.asarray(vb["point_mask"]))
            probs_all.append(np.asarray(p))
            masks_all.append(np.asarray(mk))
        return eval_predictions(
            np.concatenate(probs_all), np.concatenate(masks_all),
            val_batches)

    jb = [{k: jnp.asarray(v) for k, v in b.items()} for b in batches]
    curve, losses = {}, []
    key = jax.random.PRNGKey(seed + 1)
    t0 = time.time()
    for it in range(steps):
        key, sub = jax.random.split(key)
        state, logs, _ = step(state, jb[it % len(jb)], sub)
        losses.append(float(logs["loss"]))
        if (it + 1) % eval_every == 0 or it + 1 == steps:
            curve[it + 1] = evaluate(state)
            print(f"[flax ] step {it+1}: loss={losses[-1]:.3f} "
                  f"map={curve[it+1]['map']:.4f} "
                  f"miou={curve[it+1]['miou']:.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    out = {"loss_curve": losses, "metric_curve": curve}
    if eval_int8:
        # same trained weights, backbone dense matmuls int8-quantized (the
        # XLA emulation of the fused kernels' scheme — models/swin.py
        # int8_sim_dense): the end-metric cost of backbone_quantize='int8'
        q_model = MaskBev(cfg.replace(backbone_quantize="int8"))
        out["metric_int8"] = evaluate(state, make_predict(q_model))
        print(f"[flax ] int8 eval: map={out['metric_int8']['map']:.4f} "
              f"miou={out['metric_int8']['miou']:.4f}", flush=True)
    return out


def _agg(finals):
    """mean/min/max/spread over per-seed final metric dicts."""
    keys = ("map", "map_50", "miou")
    return {k: {"mean": round(float(np.mean([f[k] for f in finals])), 4),
                "min": round(float(min(f[k] for f in finals)), 4),
                "max": round(float(max(f[k] for f in finals)), 4),
                "spread": round(float(max(f[k] for f in finals)
                                      - min(f[k] for f in finals)), 4)}
            for k in keys}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--eval-every", type=int, default=100)
    ap.add_argument("--train-batches", type=int, default=32)
    ap.add_argument("--val-batches", type=int, default=4)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--side", choices=("both", "torch", "flax"),
                    default="both")
    ap.add_argument("--seeds", type=str, default="0",
                    help="comma list; each seed trains BOTH sides (init + "
                         "train rng); report mean/spread over seeds")
    ap.add_argument("--lr", type=float, default=None,
                    help="override both sides' lr (default: config lr)")
    ap.add_argument("--torch-lr", type=float, default=None)
    ap.add_argument("--flax-lr", type=float, default=None)
    # scene difficulty (VERDICT r4 #4: scale until torch map_50 >= 0.3 so
    # deltas are read off curves that have left the noise floor)
    ap.add_argument("--max-instances", type=int, default=6)
    ap.add_argument("--ppi", type=int, default=200,
                    help="points per instance")
    ap.add_argument("--noise-points", type=int, default=256)
    ap.add_argument("--box-frac", type=str, default="0.10,0.18",
                    help="box length range as fraction of scene span")
    ap.add_argument("--max-overlap", type=float, default=1.0,
                    help="<1: rejection-sample box centers so a new box "
                         "covers at most this fraction of earlier boxes")
    ap.add_argument("--out", type=str, default=None,
                    help="directory for accuracy_parity.json")
    ap.add_argument("--eval_int8", action="store_true",
                    help="also evaluate the trained flax weights with the "
                         "backbone int8-quantized (XLA emulation of the "
                         "fused kernels' scheme) and report the delta")
    args = ap.parse_args()

    cfg = harness_config().replace(batch_size=args.batch)
    if args.lr is not None:
        cfg = cfg.replace(lr=args.lr)
    torch_lr = args.torch_lr or cfg.lr
    flax_cfg = cfg.replace(lr=args.flax_lr or cfg.lr)
    lo, hi = (float(x) for x in args.box_frac.split(","))
    scene_kw = dict(max_instances=args.max_instances,
                    points_per_instance=args.ppi,
                    noise_points=args.noise_points,
                    box_frac=(lo, hi), max_overlap=args.max_overlap)
    seeds = [int(s) for s in args.seeds.split(",")]
    train = make_fixture_batches(cfg, args.train_batches, args.batch, 1000,
                                 scene_kw)
    val = make_fixture_batches(cfg, args.val_batches, args.batch, 9000,
                               scene_kw)

    results = {"config": {"steps": args.steps, "batch": args.batch,
                          "torch_lr": torch_lr, "flax_lr": flax_cfg.lr,
                          "train_batches": args.train_batches,
                          "val_scenes": args.val_batches * args.batch,
                          "seeds": seeds, "scene": scene_kw}}
    vox_train = vox_val = None
    for seed in seeds:
        tag = f"seed{seed}"
        if args.side in ("both", "torch"):
            if vox_train is None:
                vox_train = pillarize_for_torch(train, cfg)
                vox_val = pillarize_for_torch(val, cfg)
            print(f"=== torch {tag} ===", flush=True)
            results.setdefault("torch", {})[tag] = run_torch(
                cfg, train, vox_train, args.steps, args.eval_every, val,
                vox_val, torch_lr, seed=seed)
        if args.side in ("both", "flax"):
            print(f"=== flax {tag} ===", flush=True)
            results.setdefault("flax", {})[tag] = run_flax(
                flax_cfg, train, args.steps, args.eval_every, val,
                seed=seed, eval_int8=args.eval_int8)

    def finals(side):
        return [results[side][f"seed{s}"]["metric_curve"][args.steps]
                for s in seeds]

    if args.side in ("both", "torch"):
        results["torch_final"] = _agg(finals("torch"))
        print("torch final:", results["torch_final"])
    if args.side in ("both", "flax"):
        results["flax_final"] = _agg(finals("flax"))
        print("flax final :", results["flax_final"])
        if args.eval_int8:
            results["int8_final"] = _agg(
                [results["flax"][f"seed{s}"]["metric_int8"] for s in seeds])
            print("int8 final :", results["int8_final"])
    if args.side == "both":
        results["final_delta"] = {
            k: round(results["flax_final"][k]["mean"]
                     - results["torch_final"][k]["mean"], 4)
            for k in ("map", "map_50", "miou")}
        print("delta of means (flax - torch):", results["final_delta"])
        if args.eval_int8:
            results["int8_delta"] = {
                k: round(results["int8_final"][k]["mean"]
                         - results["flax_final"][k]["mean"], 4)
                for k in ("map", "map_50", "miou")}
            print("delta of means (int8 - f32 flax):", results["int8_delta"])

    if args.out:
        os.makedirs(args.out, exist_ok=True)
        path = os.path.join(args.out, "accuracy_parity.json")
        with open(path, "w") as f:
            json.dump(results, f, indent=1)
        print("wrote", path)


if __name__ == "__main__":
    main()
