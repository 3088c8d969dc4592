"""Sharding: batch-sharded jit over a virtual 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mask_bev_tpu.ops.voxelize import pillarize_batch
from mask_bev_tpu.parallel.mesh import (
    batch_sharding, make_mesh, replicated, shard_batch)

GEO = dict(x_range=(-10.0, 10.0), y_range=(-10.0, 10.0), z_range=(-4.0, 4.0),
           voxel_size=0.5, max_points_per_pillar=8, max_pillars=256)


def _cpu_mesh(n=8):
    devices = jax.devices("cpu")
    if len(devices) < n:
        pytest.skip(f"need {n} cpu devices, have {len(devices)}")
    return make_mesh(devices[:n])


def test_sharded_pillarize_matches_single_device(rng):
    mesh = _cpu_mesh()
    pts = rng.uniform(-9, 9, size=(8, 256, 4)).astype(np.float32)
    mask = np.ones((8, 256), bool)
    batch = shard_batch({"p": jnp.asarray(pts), "m": jnp.asarray(mask)}, mesh)
    fn = jax.jit(lambda p, m: pillarize_batch(p, m, **GEO))
    out_sharded = fn(batch["p"], batch["m"])
    out_local = fn(jnp.asarray(pts), jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(out_sharded.feats), np.asarray(out_local.feats))
    # result keeps the batch sharding
    assert len(out_sharded.feats.sharding.device_set) == 8


def test_global_reduction_over_sharded_batch(rng):
    mesh = _cpu_mesh()
    x = rng.normal(size=(8, 64)).astype(np.float32)
    xs = jax.device_put(jnp.asarray(x), batch_sharding(mesh))
    got = float(jax.jit(lambda v: v.sum())(xs))
    np.testing.assert_allclose(got, x.sum(), rtol=1e-5)
