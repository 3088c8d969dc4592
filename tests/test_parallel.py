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


def test_sharded_train_step_matches_single_device():
    """8-device DP train step == single-device on the SAME global batch.

    Pins the semantics the reference gets from DDP allreduce +
    ``reduce_mean`` avg-factor normalization (mask2former_head.py:388):
    loss AND gradients of the batch-sharded step must equal the unsharded
    result — the step is written against the global batch, so jit's SPMD
    partitioning may only reassociate float reductions, never change them.
    """
    from mask_bev_tpu.config import tiny_test_config
    from mask_bev_tpu.datasets.synthetic import make_batch
    from mask_bev_tpu.losses import maskbev_loss
    from mask_bev_tpu.parallel.mesh import replicate_state
    from mask_bev_tpu.train.step import create_train_state

    mesh = _cpu_mesh()
    cfg = tiny_test_config().replace(
        max_points_per_scan=512, batch_size=8,
        use_pallas_encoder=False, use_pallas_attention=False,
        use_pallas_backbone=False)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0))
    batch = make_batch(np.random.default_rng(0), cfg, batch_size=8)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    @jax.jit
    def loss_and_grads(params, batch_stats, b, rng_key):
        loss_rng, path_rng = jax.random.split(rng_key)

        def loss_fn(p):
            out, _ = model.apply(
                {"params": p, "batch_stats": batch_stats},
                b["points"], b["point_mask"], train=True,
                mutable=["batch_stats"], rngs={"dropout": path_rng})
            total, _ = maskbev_loss(
                loss_rng, out, b["gt_labels"], b["gt_masks"],
                b["gt_valid"],
                b.get("gt_heights") if cfg.predict_height else None, cfg)
            return total

        return jax.value_and_grad(loss_fn)(params)

    key = jax.random.PRNGKey(1)
    loss1, grads1 = loss_and_grads(state.params, state.batch_stats,
                                   batch, key)

    state8 = replicate_state(state, mesh)
    batch8 = shard_batch(batch, mesh)
    loss8, grads8 = loss_and_grads(state8.params, state8.batch_stats,
                                   batch8, key)

    np.testing.assert_allclose(float(loss8), float(loss1),
                               rtol=1e-5, atol=1e-7)

    flat1 = jax.tree_util.tree_leaves_with_path(grads1)
    flat8 = jax.tree.leaves(grads8)
    assert len(flat1) == len(flat8) and len(flat1) > 0
    for (path, g1), g8 in zip(flat1, flat8):
        a1, a8 = np.asarray(g1), np.asarray(g8)
        # psum reassociation noise only: f32 noise scales with the LEAF's
        # magnitude (eps * |g|max * a few reduction steps), and covers
        # elements that are analytically zero but numerically ~1e-8 (e.g.
        # attention k-bias grads, zero by softmax shift invariance) whose
        # relative error is meaningless.
        np.testing.assert_allclose(
            a8, a1, rtol=2e-4, atol=5e-6 * max(1.0, np.abs(a1).max()),
            err_msg=jax.tree_util.keystr(path))
