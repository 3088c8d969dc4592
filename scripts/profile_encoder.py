#!/usr/bin/env python3
"""Encoder-internals profiling on the attached TPU (relay-aware timing)."""
from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mask_bev_tpu.config import semantic_kitti_default
    from mask_bev_tpu.models.encoder import PillarFeatureNet, scatter_to_canvas
    from mask_bev_tpu.ops.pallas_canvas import canvas_from_table
    from mask_bev_tpu.ops.pallas_pfn import fused_stream_pfn
    from mask_bev_tpu.ops.stream_pillars import (
        gather_at_starts, pillarize_stream_batch)

    B = args.batch
    cfg = semantic_kitti_default().replace(
        max_points_per_scan=131072, max_num_pillars=32768)
    n = cfg.max_points_per_scan
    r0 = np.random.default_rng(0)
    th = r0.uniform(-np.pi, np.pi, (B, n))
    rad = r0.uniform(2, 45, (B, n))
    pts = np.stack([rad * np.cos(th), rad * np.sin(th),
                    r0.uniform(-2, 1, (B, n)), r0.uniform(0, 1, (B, n))],
                   -1).astype(np.float32)
    mask = np.ones((B, n), bool)
    mask[:, 120_000:] = False

    geo = dict(x_range=cfg.x_range, y_range=cfg.y_range, z_range=cfg.z_range,
               voxel_size=cfg.voxel_size,
               max_points_per_pillar=cfg.max_num_points,
               max_pillars=cfg.max_num_pillars)
    h, w = cfg.grid_hw
    grid_w = w

    pfn = PillarFeatureNet(
        feat_channels=tuple(cfg.encoder_feat_channels), x_range=cfg.x_range,
        y_range=cfg.y_range, z_range=cfg.z_range, voxel_size=cfg.voxel_size,
        max_points_per_pillar=cfg.max_num_points, use_pallas=False)

    pill = jax.jit(lambda p, m: pillarize_stream_batch(p, m, **geo))
    sp0 = pill(jnp.asarray(pts), jnp.asarray(mask))
    variables = jax.jit(lambda r, s: pfn.init(r, s, train=False))(
        jax.random.PRNGKey(0), sp0)

    def folded(vs):
        out = []
        for i in range(len(cfg.encoder_feat_channels)):
            lp = vs["params"][f"pfn_{i}"]
            st = vs["batch_stats"][f"pfn_{i}"]["norm"]
            g = lp["norm"]["scale"] * jax.lax.rsqrt(st["var"] + 1e-3)
            out.append((lp["linear"]["kernel"], g,
                        lp["norm"]["bias"] - st["mean"] * g))
        return out

    weights = folded(variables)

    kern = jax.jit(lambda sp, ws: gather_at_starts(
        fused_stream_pfn(
            sp.pts, sp.pid, sp.kept, ws, point_dim=4, with_distance=True,
            k=cfg.max_num_points, grid_w=grid_w, voxel_size=cfg.voxel_size,
            x0=cfg.x_range[0], y0=cfg.y_range[0]),
        sp.starts, sp.valid))
    tbl0 = kern(sp0, weights)

    cells0 = jnp.where(sp0.valid, sp0.coords[..., 0] * w + sp0.coords[..., 1],
                       h * w)
    canv = jax.jit(lambda t, c, v: canvas_from_table(t, c, v, (h, w)))
    canv_xla = jax.jit(
        lambda t, co, v: scatter_to_canvas(t, co, v, (h, w)))

    def sync(o):
        return float(jax.tree.leaves(o)[0].astype(jnp.float32).sum())

    staged_pts = [jnp.asarray(pts + np.random.default_rng(i).normal(
        0, 0.01, pts.shape).astype(np.float32)) for i in range(3)]
    dm = jnp.asarray(mask)
    sps = [pill(p, dm) for p in staged_pts]
    tbls = [kern(sp, weights) for sp in sps]
    cells = [jnp.where(sp.valid,
                       sp.coords[..., 0] * w + sp.coords[..., 1], h * w)
             for sp in sps]

    def t(name, f, arglists):
        sync(f(*arglists[0]))
        t0 = time.time()
        for i in range(args.iters):
            o = f(*arglists[i % len(arglists)])
        sync(o)
        ms = (time.time() - t0) / args.iters * 1e3
        print(f"{name:18s} {ms:8.2f} ms/batch{B}")

    t("pillarize(sort)", pill, [(p, dm) for p in staged_pts])
    t("pfn kernel+gather", kern, [(sp, weights) for sp in sps])
    t("canvas pallas", canv, list(zip(tbls, cells, [sp.valid for sp in sps])))
    t("canvas xla", canv_xla,
      list(zip(tbls, [sp.coords for sp in sps], [sp.valid for sp in sps])))


if __name__ == "__main__":
    main()
