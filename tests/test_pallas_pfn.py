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
