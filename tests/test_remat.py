"""remat_backbone: identical loss/grads, activations recomputed."""
import jax
import jax.numpy as jnp
import numpy as np

from mask_bev_tpu.config import tiny_test_config
from mask_bev_tpu.datasets.synthetic import make_batch
from mask_bev_tpu.train.step import create_train_state, make_train_step


def test_remat_backbone_same_grads():
    cfg = tiny_test_config().replace(
        max_points_per_scan=512, batch_size=2,
        backbone_depths=(1, 1, 2, 1))
    cfg_r = cfg.replace(remat_backbone=True)

    model, state = create_train_state(cfg, jax.random.PRNGKey(0))
    model_r, state_r = create_train_state(cfg_r, jax.random.PRNGKey(0))
    # identical init: remat is a lifted transform, params trees must match
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), state.params, state_r.params)

    batch = {k: jnp.asarray(v) for k, v in make_batch(
        np.random.default_rng(0), cfg, batch_size=2).items()
        if k != "num_instances"}
    rng = jax.random.PRNGKey(1)
    _, logs, _ = jax.jit(make_train_step(model, cfg))(state, batch, rng)
    _, logs_r, _ = jax.jit(make_train_step(model_r, cfg_r))(
        state_r, batch, rng)
    np.testing.assert_allclose(float(logs["loss"]), float(logs_r["loss"]),
                               rtol=1e-5)


def test_remat_scanned_stage_same_grads():
    """nn.scan over nn.remat(SwinBlockPair): same value + grads."""
    from mask_bev_tpu.models.swin import SwinTransformer

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 24, 24, 3)), jnp.float32)
    kw = dict(embed_dim=16, depths=(4,), num_heads=(4,), window=4,
              out_indices=(0,), use_pallas=False, use_pallas_block=False)
    ref = SwinTransformer(**kw)
    rem = SwinTransformer(remat=True, **kw)
    v = ref.init(jax.random.PRNGKey(0), x, train=True)

    def loss(m, v):
        return jnp.sum(m.apply(v, x, train=True,
                               rngs={"dropout": jax.random.PRNGKey(1)})[0]
                       ** 2)

    l0, g0 = jax.value_and_grad(lambda v: loss(ref, v))(v)
    l1, g1 = jax.value_and_grad(lambda v: loss(rem, v))(v)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6), g0, g1)
