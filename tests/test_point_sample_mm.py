"""Dense (matmul-form) bilinear sampling vs the gather form.

``point_sample_dense[_per]`` must match ``point_sample`` values (the hat
construction reproduces bilinear weights exactly, including zero padding),
its autodiff image gradient must match XLA's scatter-add gradient, and
chunked evaluation must be invariant to the chunk size.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mask_bev_tpu.ops.point_sample import (
    point_sample, point_sample_dense, point_sample_dense_per)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _coords(rng, *shape, margin=0.2):
    # include out-of-range points to exercise zero-padding semantics
    return jnp.asarray(
        rng.uniform(-margin, 1 + margin, shape + (2,)), jnp.float32)


def test_shared_forward_matches_gather(rng):
    imgs = jnp.asarray(rng.standard_normal((5, 17, 23)), jnp.float32)
    coords = _coords(rng, 300)
    want = np.asarray(point_sample(imgs, coords))
    for chunk in (None, 50, 300, 7):  # 7 does not divide 300 -> unchunked
        got = np.asarray(point_sample_dense(imgs, coords, chunk=chunk))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_per_forward_matches_gather(rng):
    imgs = jnp.asarray(rng.standard_normal((6, 11, 9)), jnp.float32)
    coords = _coords(rng, 6, 97)
    want = np.asarray(jax.vmap(point_sample)(imgs, coords))
    for chunk in (None, 2, 3, 6):
        got = np.asarray(point_sample_dense_per(imgs, coords, chunk=chunk))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_grad_matches_scatter_grad(rng):
    imgs = jnp.asarray(rng.standard_normal((4, 19, 13)), jnp.float32)
    coords = _coords(rng, 4, 257)
    g = jnp.asarray(rng.standard_normal((4, 257)), jnp.float32)

    def loss_ref(im):
        return jnp.vdot(jax.vmap(point_sample)(im, coords), g)

    def loss_mm(im):
        return jnp.vdot(point_sample_dense_per(im, coords, chunk=2), g)

    g_ref = jax.grad(loss_ref)(imgs)
    g_mm = jax.grad(loss_mm)(imgs)
    np.testing.assert_allclose(np.asarray(g_mm), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_shared_grad_matches(rng):
    imgs = jnp.asarray(rng.standard_normal((3, 10, 14)), jnp.float32)
    coords = _coords(rng, 120, margin=0.0)

    g_ref = jax.grad(lambda im: jnp.sum(point_sample(im, coords) ** 2))(imgs)
    g_mm = jax.grad(lambda im: jnp.sum(
        point_sample_dense(im, coords, chunk=40) ** 2))(imgs)
    np.testing.assert_allclose(np.asarray(g_mm), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_bf16_forward_close(rng):
    imgs = jnp.asarray(rng.standard_normal((2, 16, 16)), jnp.float32)
    coords = _coords(rng, 2, 64, margin=0.0)
    want = np.asarray(jax.vmap(point_sample)(imgs, coords))
    got = np.asarray(point_sample_dense_per(
        imgs, coords, mm_dtype=jnp.bfloat16))
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.02)
