#!/usr/bin/env python3
"""Honest per-stage profiling of the flagship model on the attached TPU.

Timing methodology for remote-attached TPUs (documented in
docs/ARCHITECTURE.md): ``block_until_ready`` is not a reliable barrier
through the relay, so each measurement enqueues K steps over rotating
pre-staged inputs and forces ONE data-dependent scalar read of the last
output — device-stream ordering makes that a barrier for all K, and the
~30ms relay round-trip amortizes away.
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np

# persistent compile cache: repeated profiles only recompile what changed
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--window", type=int, default=None,
                    help="override backbone_window_size (perf experiments)")
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--band-layout", type=str, default=None,
                    choices=("row", "col", "wpair"),
                    help="override backbone_band_layout (A/B the banded "
                         "col-major attention)")
    ap.add_argument("--pallas-head", action="store_true",
                    help="fused decoder-layer kernel (A/B use_pallas_head)")
    ap.add_argument("--int8", action="store_true",
                    help="int8-quantized backbone dense matmuls (A/B)")
    ap.add_argument("--no-int8", action="store_true",
                    help="force backbone_quantize='none' (A/B against the "
                         "now-default int8 eval backbone)")
    ap.add_argument("--fuse-embed", action="store_true",
                    help="fused canvas->patch-embed->LN kernel (A/B; only "
                         "affects the --full graph, the staged phase API "
                         "keeps the NHWC contract)")
    ap.add_argument("--scan-eval", action="store_true",
                    help="keep the nn.scan deep-stage step at eval (A/B "
                         "against the default unrolled fused-eval path)")
    ap.add_argument("--pfn-bf16", action="store_true",
                    help="bf16 windowed pooling in the slot-PFN kernel "
                         "(A/B; needs Mosaic packed-lane roll support)")
    ap.add_argument("--full", action="store_true",
                    help="also time the whole forward as ONE jit (the bench "
                         "configuration — cross-stage layouts/fusions live)")
    ap.add_argument("--trace", type=str, default=None, metavar="DIR",
                    help="capture a jax.profiler trace of a few forward "
                         "steps into DIR (inspect with tensorboard or "
                         "the trace-event json inside)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mask_bev_tpu.config import semantic_kitti_default
    from mask_bev_tpu.models.maskbev import MaskBev

    B = args.batch
    cfg = semantic_kitti_default().replace(
        max_points_per_scan=131072, max_num_pillars=32768)
    if args.window:
        cfg = cfg.replace(backbone_window_size=args.window)
    if args.no_pallas:
        cfg = cfg.replace(use_pallas_encoder=False)
    if args.band_layout:
        cfg = cfg.replace(backbone_band_layout=args.band_layout)
    if args.pallas_head:
        cfg = cfg.replace(use_pallas_head=True)
    if args.int8:
        cfg = cfg.replace(backbone_quantize="int8")
    if args.no_int8:
        cfg = cfg.replace(backbone_quantize="none")
    if args.fuse_embed:
        cfg = cfg.replace(fuse_patch_embed=True)
    if args.scan_eval:
        cfg = cfg.replace(backbone_unroll_eval=False)
    if args.pfn_bf16:
        os.environ["MASKBEV_PFN_POOL_BF16"] = "1"
    model = MaskBev(cfg)
    n = cfg.max_points_per_scan
    r0 = np.random.default_rng(0)
    pts = r0.uniform(-40, 40, (B, n, 4)).astype(np.float32)
    mask = np.ones((B, n), bool)
    mask[:, 120_000:] = False

    variables = jax.jit(lambda r, p, m: model.init(r, p, m, train=False))(
        jax.random.PRNGKey(0), jnp.asarray(pts[:1]), jnp.asarray(mask[:1]))
    variables = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, variables)

    enc = jax.jit(lambda v, p, m: model.apply(
        v, p.astype(jnp.bfloat16), m, train=False,
        method=MaskBev.forward_encode))
    bck = jax.jit(lambda v, x: model.apply(
        v, x, train=False, method=MaskBev.forward_backbone))
    hed = jax.jit(lambda v, f: model.apply(
        v, f, train=False, final_only=True, method=MaskBev.pred_masks))

    staged = [jnp.asarray(pts + np.random.default_rng(10 + s).normal(
        0, 0.01, pts.shape).astype(np.float32)) for s in range(3)]
    dm = jnp.asarray(mask)

    def leaf_sum(o):
        return float(jax.tree.leaves(o)[0].astype(jnp.float32).sum())

    xs = [enc(variables, s, dm) for s in staged]
    fs = [bck(variables, x) for x in xs]
    leaf_sum(hed(variables, fs[0]))

    def t(name, f, args_list):
        o = f(*args_list[0])
        leaf_sum(o)
        t0 = time.time()
        for i in range(args.iters):
            o = f(*args_list[i % len(args_list)])
        leaf_sum(o)
        ms = (time.time() - t0) / args.iters * 1e3
        print(f"{name:10s} {ms:8.2f} ms/batch{B}  ({ms / B:.2f} ms/scan)")

    t("encoder", enc, [(variables, s, dm) for s in staged])
    t("backbone", bck, [(variables, x) for x in xs])
    t("head", hed, [(variables, f) for f in fs])

    if args.full:
        full = jax.jit(lambda v, p, m: model.apply(
            v, model.apply(v, model.apply(
                v, p.astype(jnp.bfloat16), m, train=False,
                method=MaskBev.forward_encode), train=False,
                method=MaskBev.forward_backbone), train=False,
            final_only=True, method=MaskBev.pred_masks))
        t("full", full, [(variables, s, dm) for s in staged])

    if args.trace:
        with jax.profiler.trace(args.trace):
            for i in range(3):
                if args.full:
                    o = full(variables, staged[i % len(staged)], dm)
                else:
                    x = enc(variables, staged[i % len(staged)], dm)
                    f = bck(variables, x)
                    o = hed(variables, f)
            leaf_sum(o)
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
