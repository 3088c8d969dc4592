"""Stream-form pillar pipeline: windowed reductions + PFN equivalence.

The stream formulation (sorted runs + windowed segmented reductions, see
``ops/stream_pillars.py``) must be numerically equivalent to the direct
(P, K, D) padded-pillar formulation of the reference's hard voxelizer +
PillarFeatureNet (``mask_bev_encoders.py:69-92``). The (P, K, D) pipeline is
re-derived here from first principles as the test oracle.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mask_bev_tpu.models.encoder import PillarFeatureNet
from mask_bev_tpu.ops.stream_pillars import (
    pillarize_stream, pillarize_stream_batch, windowed_segment_max,
    windowed_segment_sum)
from mask_bev_tpu.ops.voxelize import pad_points, pillarize, pillarize_batch

GEO = dict(
    x_range=(-10.0, 10.0), y_range=(-10.0, 10.0), z_range=(-4.0, 4.0),
    voxel_size=0.5, max_points_per_pillar=8, max_pillars=256,
)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def make_cloud(rng, n_real=700, n_pad=1024, d=4, spread=9.5):
    pts = rng.uniform(-spread, spread, (n_real, d)).astype(np.float32)
    pts[:, 2] = rng.uniform(-3, 3, n_real)
    # force heavy collisions so many pillars exceed K
    pts[:200, :2] = pts[0, :2] + rng.uniform(0, 0.2, (200, 2))
    return pad_points(pts, n_pad, d)


def _brute_segments(pid, kept):
    segs = {}
    for i, (p, m) in enumerate(zip(pid, kept)):
        if m:
            segs.setdefault(int(p), []).append(i)
    return segs


def test_windowed_segment_max_matches_bruteforce(rng):
    n, c, k = 257, 5, 8
    pid = np.sort(rng.integers(0, 60, n)).astype(np.int32)
    rank = np.zeros(n, np.int32)
    for i in range(1, n):
        rank[i] = rank[i - 1] + 1 if pid[i] == pid[i - 1] else 0
    kept = rank < k
    vals = rng.uniform(0, 5, (n, c)).astype(np.float32)
    w = np.where(kept[:, None], vals, 0.0)

    out = np.asarray(windowed_segment_max(
        jnp.asarray(w)[None], jnp.asarray(pid)[None], k)[0])
    segs = _brute_segments(pid, kept)
    for p, idxs in segs.items():
        expect = w[idxs].max(axis=0)
        for i in idxs:
            np.testing.assert_allclose(out[i], expect, rtol=1e-6)

    # forward-only: exact at segment starts
    out_f = np.asarray(windowed_segment_max(
        jnp.asarray(w)[None], jnp.asarray(pid)[None], k, symmetric=False)[0])
    for p, idxs in segs.items():
        np.testing.assert_allclose(out_f[idxs[0]], w[idxs].max(axis=0), rtol=1e-6)


def test_windowed_segment_sum_matches_bruteforce(rng):
    n, c, k = 311, 4, 8
    pid = np.sort(rng.integers(0, 40, n)).astype(np.int32)
    rank = np.zeros(n, np.int32)
    for i in range(1, n):
        rank[i] = rank[i - 1] + 1 if pid[i] == pid[i - 1] else 0
    kept = rank < k
    vals = rng.normal(size=(n, c)).astype(np.float32)
    w = np.where(kept[:, None], vals, 0.0)

    out = np.asarray(windowed_segment_sum(
        jnp.asarray(w)[None], jnp.asarray(pid)[None], k)[0])
    for p, idxs in _brute_segments(pid, kept).items():
        expect = w[idxs].sum(axis=0)
        for i in idxs:
            np.testing.assert_allclose(out[i], expect, rtol=1e-4, atol=1e-5)


def test_pillarize_stream_agrees_with_pkd_pillarize(rng):
    padded, mask = make_cloud(rng)
    pb = pillarize(jnp.asarray(padded), jnp.asarray(mask), **GEO)
    sp = pillarize_stream(jnp.asarray(padded), jnp.asarray(mask), **GEO)

    np.testing.assert_array_equal(np.asarray(pb.valid), np.asarray(sp.valid))
    np.testing.assert_array_equal(
        np.asarray(pb.num_points), np.asarray(sp.num_points))
    np.testing.assert_array_equal(np.asarray(pb.coords), np.asarray(sp.coords))
    # kept rows per pillar == num_points, and the kept rows' points are the
    # pillar's feats rows
    kept = np.asarray(sp.kept)
    pid = np.asarray(sp.pid)
    pts = np.asarray(sp.pts)
    feats = np.asarray(pb.feats)
    starts = np.asarray(sp.starts)
    nump = np.asarray(sp.num_points)
    for s in range(int(np.asarray(sp.valid).sum())):
        rows = pts[starts[s]: starts[s] + nump[s]]
        np.testing.assert_allclose(rows, feats[s, : nump[s]], rtol=1e-6)
        assert kept[starts[s]: starts[s] + nump[s]].all()
        if nump[s] == GEO["max_points_per_pillar"]:
            # overflow rows of the same pillar must be dropped
            j = starts[s] + nump[s]
            while j < len(pid) and pid[j] == pid[starts[s]]:
                assert not kept[j]
                j += 1


def _pfn_pkd_reference(params, batch_stats, pb, geo, feat_channels, train):
    """(P, K, D) oracle for the PillarFeatureNet, re-derived from the
    reference semantics (linear -> masked BN -> relu -> masked max, cluster /
    center / distance decorations)."""
    feats, num_points, coords = pb.feats, pb.num_points, pb.coords
    bsz, p, k, d = feats.shape
    mask = jnp.arange(k)[None, None, :] < num_points[..., None]
    fm = mask[..., None].astype(feats.dtype)

    xyz = feats[..., :3]
    counts = jnp.maximum(num_points[..., None, None], 1).astype(feats.dtype)
    cluster_mean = jnp.sum(xyz * fm, axis=-2, keepdims=True) / counts
    f_cluster = xyz - cluster_mean
    vs = geo["voxel_size"]
    cx = coords[..., 1:2].astype(feats.dtype) * vs + geo["x_range"][0] + 0.5 * vs
    cy = coords[..., 0:1].astype(feats.dtype) * vs + geo["y_range"][0] + 0.5 * vs
    f_center = jnp.stack([xyz[..., 0] - cx, xyz[..., 1] - cy], axis=-1)
    dist = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    x = jnp.where(mask[..., None],
                  jnp.concatenate([feats, f_cluster, f_center, dist], -1), 0.0)

    new_stats = {}
    nl = len(feat_channels)
    for i, ch in enumerate(feat_channels):
        last = i == nl - 1
        units = ch if last else ch // 2
        lp = params[f"pfn_{i}"]
        x = x @ lp["linear"]["kernel"]
        st = batch_stats[f"pfn_{i}"]["norm"]
        if train:
            m = mask[..., None].astype(x.dtype)
            cnt = jnp.maximum(jnp.sum(m), 1.0)
            mean = jnp.sum(x * m, axis=(0, 1, 2)) / cnt
            var = jnp.sum(jnp.square(x - mean) * m, axis=(0, 1, 2)) / cnt
            new_stats[f"pfn_{i}"] = {"norm": {
                "mean": 0.99 * st["mean"] + 0.01 * mean,
                "var": 0.99 * st["var"] + 0.01 * var}}
        else:
            mean, var = st["mean"], st["var"]
        x = (x - mean) * jax.lax.rsqrt(var + 1e-3) * lp["norm"]["scale"] + lp["norm"]["bias"]
        x = jnp.where(mask[..., None], jax.nn.relu(x), 0.0)
        pooled = jnp.max(jnp.where(mask[..., None], x, -jnp.inf), axis=-2)
        pooled = jnp.where(jnp.any(mask, -1)[..., None], pooled, 0.0)
        if last:
            return pooled, new_stats
        x = jnp.concatenate(
            [x, jnp.broadcast_to(pooled[..., None, :], x.shape)], -1)


@pytest.mark.parametrize("train", [False, True])
def test_stream_pfn_matches_pkd_oracle(rng, train):
    b = 2
    clouds = [make_cloud(rng) for _ in range(b)]
    pts = jnp.asarray(np.stack([c[0] for c in clouds]))
    msk = jnp.asarray(np.stack([c[1] for c in clouds]))

    feat_channels = (16, 16, 24)
    # use_pallas=False: this test validates the XLA stream formulation
    # against the (P,K,D) oracle (the fused kernel has its own parity test)
    pfn = PillarFeatureNet(
        feat_channels=feat_channels, x_range=GEO["x_range"],
        y_range=GEO["y_range"], z_range=GEO["z_range"],
        voxel_size=GEO["voxel_size"],
        max_points_per_pillar=GEO["max_points_per_pillar"], use_pallas=False)

    sp = pillarize_stream_batch(pts, msk, **GEO)
    pb = pillarize_batch(pts, msk, **GEO)

    variables = pfn.init(jax.random.PRNGKey(0), sp, train=False)
    out, mut = pfn.apply(
        variables, sp, train=train, mutable=["batch_stats"] if train else [])
    expect, new_stats = _pfn_pkd_reference(
        variables["params"], variables["batch_stats"], pb, GEO,
        feat_channels, train)
    # stream output is the pillar table already; mask oracle rows to valid
    expect = jnp.where(sp.valid[..., None], expect, 0.0)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expect), rtol=2e-4, atol=2e-5)
    if train:
        for i in range(len(feat_channels)):
            got = mut["batch_stats"][f"pfn_{i}"]["norm"]
            want = new_stats[f"pfn_{i}"]["norm"]
            np.testing.assert_allclose(
                np.asarray(got["mean"]), np.asarray(want["mean"]),
                rtol=2e-4, atol=2e-5)
            np.testing.assert_allclose(
                np.asarray(got["var"]), np.asarray(want["var"]),
                rtol=2e-4, atol=2e-5)


def test_stream_pfn_grads_finite(rng):
    padded, mask = make_cloud(rng, n_real=300, n_pad=512)
    pts = jnp.asarray(padded)[None]
    msk = jnp.asarray(mask)[None]
    geo = dict(GEO)
    pfn = PillarFeatureNet(
        feat_channels=(8, 12), x_range=geo["x_range"], y_range=geo["y_range"],
        z_range=geo["z_range"], voxel_size=geo["voxel_size"],
        max_points_per_pillar=geo["max_points_per_pillar"])
    sp = pillarize_stream_batch(pts, msk, **geo)
    variables = pfn.init(jax.random.PRNGKey(1), sp, train=False)

    def loss(params):
        out, _ = pfn.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            sp, train=True, mutable=["batch_stats"])
        return jnp.sum(jnp.square(out))

    g = jax.grad(loss)(variables["params"])
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
    # gradients must flow into every layer
    assert any(float(jnp.abs(l).sum()) > 0 for l in jax.tree.leaves(g))
