"""Fused Pallas PFN kernel vs the XLA stream path (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mask_bev_tpu.models.encoder import PillarFeatureNet
from mask_bev_tpu.ops.pallas_pfn import fused_stream_pfn
from mask_bev_tpu.ops.stream_pillars import (
    gather_at_starts, pillarize_stream_batch)
from mask_bev_tpu.ops.voxelize import pad_points

GEO = dict(
    x_range=(-10.0, 10.0), y_range=(-10.0, 10.0), z_range=(-4.0, 4.0),
    voxel_size=0.5, max_points_per_pillar=8, max_pillars=512,
)


def _folded_weights(variables, n_layers):
    out = []
    for i in range(n_layers):
        lp = variables["params"][f"pfn_{i}"]
        st = variables["batch_stats"][f"pfn_{i}"]["norm"]
        g = lp["norm"]["scale"] * jax.lax.rsqrt(st["var"] + 1e-3)
        b = lp["norm"]["bias"] - st["mean"] * g
        out.append((lp["linear"]["kernel"], g, b))
    return out


@pytest.mark.parametrize("point_dim", [4, 3])
def test_fused_kernel_matches_xla_stream(rng, point_dim):
    b = 2
    clouds = []
    for _ in range(b):
        pts = rng.uniform(-9.5, 9.5, (900, point_dim)).astype(np.float32)
        pts[:, 2] = rng.uniform(-3, 3, 900)
        pts[:300, :2] = pts[0, :2] + rng.uniform(0, 0.3, (300, 2))
        clouds.append(pad_points(pts, 1024, point_dim))
    pts = jnp.asarray(np.stack([c[0] for c in clouds]))
    msk = jnp.asarray(np.stack([c[1] for c in clouds]))

    fc = (16, 16, 32)
    pfn = PillarFeatureNet(
        feat_channels=fc, x_range=GEO["x_range"], y_range=GEO["y_range"],
        z_range=GEO["z_range"], voxel_size=GEO["voxel_size"],
        max_points_per_pillar=GEO["max_points_per_pillar"],
        point_dim=point_dim, use_pallas=False)
    sp = pillarize_stream_batch(pts, msk, **GEO)
    variables = pfn.init(jax.random.PRNGKey(0), sp, train=False)
    # non-trivial BN stats so folding is actually exercised
    variables = jax.tree_util.tree_map_with_path(
        lambda path, x: x + 0.1 * (hash(str(path)) % 7)
        if "batch_stats" in str(path[0]) else x, variables)

    expect = pfn.apply(variables, sp, train=False)  # XLA stream path

    grid_w = int(round((GEO["x_range"][1] - GEO["x_range"][0])
                       / GEO["voxel_size"]))
    out = fused_stream_pfn(
        sp.pts, sp.pid, sp.kept, _folded_weights(variables, 3),
        point_dim=point_dim, with_distance=True,
        k=GEO["max_points_per_pillar"], grid_w=grid_w,
        voxel_size=GEO["voxel_size"], x0=GEO["x_range"][0],
        y0=GEO["y_range"][0], tile=256, interpret=True)
    got = gather_at_starts(out.astype(jnp.float32), sp.starts, sp.valid)

    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expect), rtol=2e-2, atol=2e-2)
    # agreement must be tight relative to feature scale
    scale = float(np.abs(np.asarray(expect)).max())
    err = float(np.abs(np.asarray(got) - np.asarray(expect)).max())
    assert err <= 0.02 * max(scale, 1.0)


@pytest.mark.parametrize("tile", [256, 512, 1024])
def test_slots_kernel_matches_xla_canvas(rng, tile):
    """v2 slot-form kernel (in-kernel kept/is_first/dup-cells/stats) vs the
    XLA stream path, compared at the CANVAS level (the kernel's contract).

    Exercises: a pillar run longer than the halo span AND crossing tile
    boundaries (the SMEM carry path), per-pillar K-truncation, out-of-range
    points (pid sentinel tail), a nearly-empty sample, and (via the
    tile grid) the clamped 128-lane halo loads at both array edges."""
    import jax

    from mask_bev_tpu.models.encoder import scatter_to_canvas
    from mask_bev_tpu.ops.pallas_canvas import canvas_from_table
    from mask_bev_tpu.ops.pallas_pfn import fused_stream_pfn_slots
    from mask_bev_tpu.ops.stream_pillars import pillarize_stream_packed

    geo = dict(x_range=(-5.0, 5.0), y_range=(-5.0, 5.0), z_range=(-4.0, 4.0),
               voxel_size=0.5)
    h = w = 20
    k, n, b = 8, 1024, 2

    pts = rng.uniform(-4.8, 4.8, (b, n, 4)).astype(np.float32)
    pts[:, :, 2] = rng.uniform(-3, 3, (b, n))
    # one giant run: 400 points in a single cell (> halo of 128 lanes,
    # crossing tile boundaries at tile=256) — only the first k count
    pts[0, 100:500, :2] = 2.05
    # out-of-range points -> sentinel tail
    pts[0, 900:, 0] = 50.0
    # sample 1: nearly empty (3 in-range points)
    pts[1, 3:, 0] = 50.0
    msk = np.ones((b, n), bool)
    msk[0, 950:] = False
    pj, mj = jnp.asarray(pts), jnp.asarray(msk)

    fc = (16, 16, 32)
    pfn = PillarFeatureNet(
        feat_channels=fc, x_range=geo["x_range"], y_range=geo["y_range"],
        z_range=geo["z_range"], voxel_size=geo["voxel_size"],
        max_points_per_pillar=k, use_pallas=False)
    sp = pillarize_stream_batch(pts, msk, max_points_per_pillar=k,
                                max_pillars=1024, **geo)
    variables = pfn.init(jax.random.PRNGKey(0), sp, train=False)
    variables = jax.tree_util.tree_map_with_path(
        lambda path, x: x + 0.1 * (hash(str(path)) % 7)
        if "batch_stats" in str(path[0]) else x, variables)
    table = pfn.apply(variables, sp, train=False)
    expect = np.asarray(scatter_to_canvas(table, sp.coords, sp.valid, (h, w)))

    p8 = pillarize_stream_packed(pj, mj, **geo)
    feats, cells, stats = fused_stream_pfn_slots(
        p8, _folded_weights(variables, 3), point_dim=4, with_distance=True,
        k=k, grid_w=w, grid_h=h, voxel_size=geo["voxel_size"],
        x0=geo["x_range"][0], y0=geo["y_range"][0], tile=tile,
        interpret=True)

    # cells ascending with the H*W sentinel tail
    ca = np.asarray(cells)
    assert (np.diff(ca, axis=1) >= 0).all()
    assert (ca[0, -50:] == h * w).all()       # out-of-range tail
    assert (ca <= h * w).all() and (ca >= 0).all()

    got = np.asarray(canvas_from_table(
        feats, cells.astype(jnp.int32), None, (h, w), rows_per_block=4,
        interpret=True)).astype(np.float32)
    scale = float(np.abs(expect).max())
    np.testing.assert_allclose(got, expect, rtol=2e-2,
                               atol=2e-2 * max(scale, 1.0))

    # stats describe the bf16-rounded written rows
    tbl16 = np.asarray(table).astype(jnp.bfloat16).astype(np.float32)
    tbl16[~np.asarray(sp.valid)] = 0.0
    np.testing.assert_allclose(np.asarray(stats)[:, 0], tbl16.sum(axis=1),
                               rtol=2e-2, atol=2e-2 * max(scale, 1.0))
    np.testing.assert_allclose(
        np.asarray(stats)[:, 1], (tbl16 ** 2).sum(axis=1),
        rtol=2e-2, atol=2e-2 * max(scale, 1.0) ** 2)


def test_slots_kernel_bf16_pooling_exact(rng):
    """pool_bf16=True (bf16 windowed max — half the vreg traffic of the
    kernel's VPU bottleneck) must be value-EXACT vs f32 pooling when the
    layer weights are bf16: round-to-nearest is monotone, so
    max(bf16(x_i)) == bf16(max(x_i)), and every downstream consumer (next
    layer's bf16-weight dot, the bf16 feature table) rounds identically."""
    from mask_bev_tpu.ops.pallas_pfn import fused_stream_pfn_slots
    from mask_bev_tpu.ops.stream_pillars import pillarize_stream_packed

    geo = dict(x_range=(-5.0, 5.0), y_range=(-5.0, 5.0), z_range=(-4.0, 4.0),
               voxel_size=0.5)
    h = w = 20
    k, n, b = 8, 1024, 2
    pts = rng.uniform(-4.8, 4.8, (b, n, 4)).astype(np.float32)
    pts[:, :, 2] = rng.uniform(-3, 3, (b, n))
    pts[0, 100:300, :2] = 2.05      # long run (> k, crosses tiles)
    msk = np.ones((b, n), bool)
    pj, mj = jnp.asarray(pts), jnp.asarray(msk)

    fc = (16, 16, 32)
    pfn = PillarFeatureNet(
        feat_channels=fc, x_range=geo["x_range"], y_range=geo["y_range"],
        z_range=geo["z_range"], voxel_size=geo["voxel_size"],
        max_points_per_pillar=k, use_pallas=False)
    sp = pillarize_stream_batch(pts, msk, max_points_per_pillar=k,
                                max_pillars=1024, **geo)
    variables = pfn.init(jax.random.PRNGKey(0), sp, train=False)
    weights = [(wm.astype(jnp.bfloat16), g, bb)
               for (wm, g, bb) in _folded_weights(variables, 3)]

    p8 = pillarize_stream_packed(pj, mj, **geo)
    kw = dict(point_dim=4, with_distance=True, k=k, grid_w=w, grid_h=h,
              voxel_size=geo["voxel_size"], x0=geo["x_range"][0],
              y0=geo["y_range"][0], tile=256, interpret=True)
    f16, c16, s16 = fused_stream_pfn_slots(p8, weights, pool_bf16=True, **kw)
    f32p, c32p, s32p = fused_stream_pfn_slots(p8, weights, pool_bf16=False,
                                              **kw)
    np.testing.assert_array_equal(np.asarray(f16), np.asarray(f32p))
    np.testing.assert_array_equal(np.asarray(c16), np.asarray(c32p))
    np.testing.assert_array_equal(np.asarray(s16), np.asarray(s32p))
