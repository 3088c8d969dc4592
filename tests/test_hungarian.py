"""On-device Hungarian vs scipy linear_sum_assignment."""
import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment

from mask_bev_tpu.ops.hungarian import hungarian, match


def _opt_cost(c):
    r, col = linear_sum_assignment(c)
    return c[r, col].sum()


def test_matches_scipy_optimum(rng):
    f = jax.jit(hungarian)
    for n in (1, 2, 5, 17, 45):
        for _ in range(5):
            c = rng.normal(size=(n, n)).astype(np.float32)
            col = np.asarray(f(jnp.asarray(c)) if n == 45 else hungarian(jnp.asarray(c)))
            # valid permutation
            assert sorted(col.tolist()) == list(range(n))
            got = c[np.arange(n), col].sum()
            np.testing.assert_allclose(got, _opt_cost(c), rtol=1e-5, atol=1e-5)


def test_degenerate_ties(rng):
    c = np.zeros((6, 6), np.float32)
    col = np.asarray(hungarian(jnp.asarray(c)))
    assert sorted(col.tolist()) == list(range(6))


def test_match_with_padded_gt(rng):
    q, g_real = 10, 4
    c = rng.normal(size=(q, q)).astype(np.float32)
    gt_of_query, matched = jax.jit(match)(jnp.asarray(c), jnp.asarray(g_real))
    gt_of_query, matched = np.asarray(gt_of_query), np.asarray(matched)
    assert matched.sum() == g_real
    # matched queries map to distinct real columns
    real_cols = gt_of_query[matched]
    assert sorted(real_cols.tolist()) == sorted(set(real_cols.tolist()))
    assert (real_cols < g_real).all() and (real_cols >= 0).all()
    assert (gt_of_query[~matched] == -1).all()
    # restriction to real columns is optimal: compare against scipy on (Q, g) cost
    rows, cols = linear_sum_assignment(c[:, :g_real])
    expect = c[rows, cols].sum()
    got = c[np.flatnonzero(matched), real_cols].sum()
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_match_zero_gt():
    c = np.ones((5, 5), np.float32)
    gt_of_query, matched = match(jnp.asarray(c), jnp.asarray(0))
    assert (~np.asarray(matched)).all()
    assert (np.asarray(gt_of_query) == -1).all()


def test_batched_vmap(rng):
    c = rng.normal(size=(8, 12, 12)).astype(np.float32)
    cols = np.asarray(jax.jit(jax.vmap(hungarian))(jnp.asarray(c)))
    for i in range(8):
        np.testing.assert_allclose(
            c[i][np.arange(12), cols[i]].sum(), _opt_cost(c[i]), rtol=1e-5)
