"""Pallas canvas scatter vs the XLA scatter+gather path (interpret mode)."""
import jax.numpy as jnp
import numpy as np

from mask_bev_tpu.models.encoder import scatter_to_canvas
from mask_bev_tpu.ops.pallas_canvas import canvas_from_table


def test_canvas_kernel_matches_xla(rng):
    b, p, c = 2, 256, 32
    h, w = 40, 48
    # ascending unique cell ids per sample (the stream pillarizer's order)
    cells = np.stack([
        np.sort(rng.choice(h * w, size=p - 30, replace=False)).astype(np.int32)
        for _ in range(b)])
    cells = np.concatenate(
        [cells, np.full((b, 30), h * w, np.int32)], axis=1)
    valid = cells < h * w
    table = rng.normal(size=(b, p, c)).astype(np.float32)
    table[~valid] = 0.0

    coords = np.stack([cells // w, cells % w], -1).astype(np.int32)
    coords[~valid] = -1

    expect = np.asarray(scatter_to_canvas(
        jnp.asarray(table), jnp.asarray(coords), jnp.asarray(valid), (h, w)))
    got = np.asarray(canvas_from_table(
        jnp.asarray(table), jnp.asarray(cells), jnp.asarray(valid), (h, w),
        rows_per_block=4, interpret=True))
    np.testing.assert_allclose(got, expect, rtol=1e-6, atol=1e-6)


def test_canvas_kernel_all_invalid(rng):
    b, p, c, h, w = 1, 16, 8, 8, 8
    cells = np.full((b, p), h * w, np.int32)
    valid = np.zeros((b, p), bool)
    table = rng.normal(size=(b, p, c)).astype(np.float32)
    got = np.asarray(canvas_from_table(
        jnp.asarray(table), jnp.asarray(cells), jnp.asarray(valid), (h, w),
        rows_per_block=2, interpret=True))
    assert (got == 0).all()


def test_canvas_scatter_vjp(rng):
    """custom VJP: d_table must equal gather(d_canvas, cells)."""
    import jax
    import jax.numpy as jnp

    from mask_bev_tpu.ops.pallas_canvas import (
        _canvas_scatter_bwd, canvas_from_table)

    b, p, c, h, w = 1, 64, 8, 8, 8
    cells = np.sort(rng.choice(h * w, size=p, replace=False)).astype(np.int32)
    valid = cells < h * w - 4  # a few invalid slots
    table = rng.normal(size=(b, p, c)).astype(np.float32)

    g = rng.normal(size=(b, h, w, c)).astype(np.float32)
    d_table, _, _ = _canvas_scatter_bwd(
        (h, w), (jnp.asarray(cells)[None], jnp.asarray(valid)[None]),
        jnp.asarray(g))
    # numeric check: loss = sum(canvas * g); d table[j] = g at its cell
    for j in range(p):
        expect = (g.reshape(h * w, c)[cells[j]] if valid[j]
                  else np.zeros(c, np.float32))
        np.testing.assert_allclose(np.asarray(d_table)[0, j], expect,
                                   rtol=1e-6)


def test_canvas_kernel_fused_norm(rng):
    """scatter+LayerNorm epilogue vs scatter followed by the XLA norm."""
    b, p, c = 2, 128, 16
    h, w = 16, 24
    cells = np.stack([
        np.sort(rng.choice(h * w, size=p - 20, replace=False)).astype(np.int32)
        for _ in range(b)])
    cells = np.concatenate(
        [cells, np.full((b, 20), h * w, np.int32)], axis=1)
    valid = cells < h * w
    table = rng.normal(size=(b, p, c)).astype(np.float32)
    table[~valid] = 0.0

    # reference stats semantics: over the whole canvas (zeros included)
    plain = np.asarray(canvas_from_table(
        jnp.asarray(table), jnp.asarray(cells), jnp.asarray(valid), (h, w),
        rows_per_block=2, interpret=True))
    mean = plain.reshape(b, -1).mean(1)
    var = plain.reshape(b, -1).var(1)
    eps = 1e-3
    for scale, bias in [
        (rng.normal(size=(h, w, c)).astype(np.float32),      # full mode
         rng.normal(size=(h, w, c)).astype(np.float32)),
        (rng.normal(size=(1, 1, c)).astype(np.float32),      # channel mode
         rng.normal(size=(1, 1, c)).astype(np.float32)),
    ]:
        expect = ((plain - mean.reshape(-1, 1, 1, 1))
                  / np.sqrt(var.reshape(-1, 1, 1, 1) + eps)
                  * scale[None if scale.shape[0] != 1 else slice(None)]
                  + bias)
        got = np.asarray(canvas_from_table(
            jnp.asarray(table), jnp.asarray(cells), jnp.asarray(valid),
            (h, w), rows_per_block=2, interpret=True,
            norm_stats=(jnp.asarray(mean), jnp.asarray(var)),
            norm_affine=(jnp.asarray(scale), jnp.asarray(bias)),
            norm_eps=eps))
        np.testing.assert_allclose(got, expect, rtol=2e-5, atol=2e-5)


def test_encoder_eval_fused_norm_matches_train_path(rng):
    """MaskBevEncoder eval (fused scatter+norm) vs the unfused XLA result."""
    import jax

    from mask_bev_tpu.config import tiny_test_config
    from mask_bev_tpu.models.maskbev import MaskBev

    cfg = tiny_test_config()
    model = MaskBev(cfg)
    n = cfg.max_points_per_scan
    pts = rng.uniform(-15, 15, (1, n, 4)).astype(np.float32)
    mask = np.ones((1, n), bool)
    v = jax.jit(lambda r, p, m: model.init(r, p, m, train=False))(
        jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(mask))
    enc = model.apply(v, jnp.asarray(pts), jnp.asarray(mask), train=False,
                      method=MaskBev.forward_encode)
    assert np.isfinite(np.asarray(enc)).all()

    # replicate the TPU eval wiring (pillar-table stats + fused norm
    # epilogue, interpret mode) and pin it against the CPU encoder output
    from mask_bev_tpu.ops.stream_pillars import (
        gather_at_starts, pillarize_stream_batch)
    from mask_bev_tpu.models.encoder import PillarFeatureNet

    h, w = cfg.grid_hw
    sp = pillarize_stream_batch(
        jnp.asarray(pts), jnp.asarray(mask),
        x_range=cfg.x_range, y_range=cfg.y_range, z_range=cfg.z_range,
        voxel_size=cfg.voxel_size, max_points_per_pillar=cfg.max_num_points,
        max_pillars=cfg.max_num_pillars)
    pfn = PillarFeatureNet(
        feat_channels=tuple(cfg.encoder_feat_channels),
        x_range=cfg.x_range, y_range=cfg.y_range, z_range=cfg.z_range,
        voxel_size=cfg.voxel_size,
        max_points_per_pillar=cfg.max_num_points, use_pallas=False)
    pf = pfn.apply(
        {"params": v["params"]["encoder"]["pillar_feature_net"],
         "batch_stats":
             v["batch_stats"]["encoder"]["pillar_feature_net"]},
        sp, train=False)
    pf32 = jnp.where(sp.valid[..., None], pf.astype(jnp.float32), 0.0)
    elems = float(h * w * pf.shape[-1])
    mean = pf32.sum(axis=(1, 2)) / elems
    var = jnp.square(pf32).sum(axis=(1, 2)) / elems - jnp.square(mean)
    cells = jnp.where(
        sp.valid, sp.coords[..., 0] * w + sp.coords[..., 1], h * w)
    nparams = v["params"]["encoder"]["norm"]
    fused = canvas_from_table(
        pf, cells, sp.valid, (h, w), interpret=True,
        norm_stats=(mean, var),
        norm_affine=(nparams["scale"], nparams["bias"]))
    np.testing.assert_allclose(np.asarray(fused), np.asarray(enc),
                               rtol=2e-4, atol=2e-4)
