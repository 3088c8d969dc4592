#!/usr/bin/env python3
"""Fast Mosaic-lowering smoke for every fused-kernel flag combo.

Runs a small (but production-head-dim) backbone + head on the real chip
once per configuration, so a kernel that fails to lower errors out in a
couple of minutes instead of after the flagship compile. Use before
bench/profile sessions whenever kernels changed.
"""
from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mask_bev_tpu.config import semantic_kitti_default
    from mask_bev_tpu.models.maskbev import MaskBev

    base = semantic_kitti_default().replace(
        # 25.6 m grid -> 160x160 canvas, 40x40 tokens; hd stays 64
        x_range=(-12.8, 12.8), y_range=(-12.8, 12.8),
        backbone_depths=(1, 1, 1, 1),  # 4 stages (pixel-decoder contract)
        head_num_decoder_layers=3,
        max_points_per_scan=8192, max_num_pillars=4096,
        compute_dtype="bfloat16")

    rng = np.random.default_rng(0)
    pts = rng.uniform(-12, 12, (2, base.max_points_per_scan, 4)).astype(
        np.float32)
    mask = np.ones(pts.shape[:2], bool)

    combos = [
        ("row", dict()),
        ("col", dict(backbone_band_layout="col")),
        ("wpair", dict(backbone_band_layout="wpair")),
        ("head", dict(use_pallas_head=True)),
        ("int8", dict(backbone_quantize="int8")),
        ("wpair+int8+head", dict(backbone_band_layout="wpair",
                                 backbone_quantize="int8",
                                 use_pallas_head=True)),
    ]
    for name, over in combos:
        cfg = base.replace(**over)
        model = MaskBev(cfg)
        t0 = time.time()
        v = jax.jit(lambda r, p, m, model=model: model.init(
            r, p, m, train=False))(
            jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(mask))
        out = jax.jit(lambda v, p, m, model=model: model.apply(
            v, p, m, train=False, final_only=True))(
            v, jnp.asarray(pts), jnp.asarray(mask))
        s = float(out.mask_logits[-1].astype(jnp.float32).sum())
        assert np.isfinite(s), (name, s)
        print(f"smoke[{name:14s}] ok in {time.time() - t0:6.1f}s "
              f"(sum={s:.3e})", flush=True)


if __name__ == "__main__":
    main()
