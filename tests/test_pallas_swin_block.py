"""Equivalence of the fully fused Swin-block kernel with the XLA path.

Runs the whole SwinTransformer in interpret mode (CPU) with
``use_pallas_block`` on and compares against the plain XLA path on the same
params — covering roll chaining across shifted/unshifted blocks, padded
rectangular grids, shift-region masks, and the stage-end un-roll.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mask_bev_tpu.models.swin import SwinTransformer


def _close(got, want, atol=3e-2):
    """Interpret mode emulates the MXU's default bf16-pass precision, so
    per-element agreement is at bf16 resolution (~3e-3/block, compounding
    over blocks); a data-movement bug would blow up the MEAN error by
    orders of magnitude, so bound it tightly too."""
    g, w = np.asarray(got, np.float32), np.asarray(want, np.float32)
    np.testing.assert_allclose(g, w, rtol=0, atol=atol)
    assert np.abs(g - w).mean() < atol / 3


def _mk(window, depths=(2, 2), heads=(4, 8), embed=32, hw=(33, 26), seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((2, hw[0] * 4, hw[1] * 4, 3)),
                    jnp.float32)
    ref = SwinTransformer(
        embed_dim=embed, depths=depths, num_heads=heads, window=window,
        out_indices=tuple(range(len(depths))),
        use_pallas=False, use_pallas_block=False)
    params = ref.init(jax.random.PRNGKey(seed), x, train=False)
    return x, params, ref


@pytest.mark.parametrize("window,hw", [
    (4, (9, 7)),    # rectangular, needs padding, shifts active
    (4, (8, 8)),    # exact multiple, shifts active
    (4, (4, 4)),    # window covers grid -> shift disabled (ref swin.py:180)
    (6, (10, 13)),  # odd padding both axes
])
def test_fused_matches_xla(window, hw):
    x, params, ref = _mk(window, hw=hw)
    want = ref.apply(params, x, train=False)

    fused = SwinTransformer(
        embed_dim=32, depths=(2, 2), num_heads=(4, 8), window=window,
        out_indices=(0, 1),
        use_pallas=False, use_pallas_block=True, fused_interpret=True)
    got = fused.apply(params, x, train=False)

    assert len(got) == len(want)
    for g, w in zip(got, want):
        _close(g, w)


def test_fused_matches_xla_deep_stage():
    # 6-deep stage: three shift/no-shift pairs chained through roll state
    x, params, ref = _mk(4, depths=(6,), heads=(4,), hw=(7, 9), seed=3)
    want = ref.apply(params, x, train=False)
    fused = SwinTransformer(
        embed_dim=32, depths=(6,), num_heads=(4,), window=4,
        out_indices=(0,),
        use_pallas=False, use_pallas_block=True, fused_interpret=True)
    got = fused.apply(params, x, train=False)
    _close(got[0], want[0], atol=5e-2)  # 6 blocks compound


def test_fused_bf16_close():
    x, params, ref = _mk(4, hw=(6, 6), seed=1)
    xb = x.astype(jnp.bfloat16)
    want = ref.apply(params, xb, train=False)
    fused = SwinTransformer(
        embed_dim=32, depths=(2, 2), num_heads=(4, 8), window=4,
        out_indices=(0, 1),
        use_pallas=False, use_pallas_block=True, fused_interpret=True)
    got = fused.apply(params, xb, train=False)
    for g, w in zip(got, want):
        _close(g, w, atol=8e-2)


# --- col-major band layout + banded-chunk attention ---


@pytest.mark.parametrize("window,hw", [
    (4, (9, 7)),    # rectangular, padding, shifts active
    (4, (4, 4)),    # window covers grid -> shift disabled
    (6, (10, 13)),  # odd padding both axes
])
def test_fused_col_matches_xla(window, hw):
    x, params, ref = _mk(window, hw=hw)
    want = ref.apply(params, x, train=False)
    fused = SwinTransformer(
        embed_dim=32, depths=(2, 2), num_heads=(4, 8), window=window,
        out_indices=(0, 1),
        use_pallas=False, use_pallas_block=True, fused_interpret=True,
        band_layout="col", col_min_band=0)
    got = fused.apply(params, x, train=False)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        _close(g, w)


def test_fused_col_banded_matches_full():
    """Banded-chunk attention == full band attention == row kernel,
    straight at the kernel level (random weights, shifted + unshifted)."""
    from mask_bev_tpu.ops.pallas_swin_block import (
        from_col_bands, fused_swin_block, fused_swin_block_col, to_col_bands)

    rng = np.random.default_rng(7)
    win, heads, c = 4, 2, 32
    h, w = 11, 30                      # hp=12, wp=32 -> band 128 tokens
    hp, wp = 12, 32
    tp = wp * win                      # 128, multiple of the 32-chunk
    b, nwh = 2, hp // win

    def p(*shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * .1)

    weights = dict(
        rel_hnn=p(heads, win * win, win * win),
        ln1_scale=jnp.ones((c,)), ln1_bias=p(c),
        wqkv=p(c, 3 * c), bqkv=p(3 * c), wproj=p(c, c), bproj=p(c),
        ln2_scale=jnp.ones((c,)), ln2_bias=p(c),
        w1=p(c, 2 * c), b1=p(2 * c), w2=p(2 * c, c), b2=p(c))
    geom = dict(h=h, w=w, hp=hp, wp=wp, win=win, num_heads=heads)

    xg = p(b, hp, wp, c)
    xc = to_col_bands(xg, win, tp)
    for roll_in, shift in [(0, 0), (0, 2), (2, 0)]:
        row = fused_swin_block(
            xg.reshape(b, hp * wp, c), **weights, **geom,
            roll_in=roll_in, shift=shift, interpret=True)
        full = fused_swin_block_col(
            xc, **weights, **geom, roll_in=roll_in, shift=shift,
            key_w=tp, interpret=True)
        band = fused_swin_block_col(
            xc, **weights, **geom, roll_in=roll_in, shift=shift,
            chunk=32, key_w=96, interpret=True)
        # col outputs come back rolled by `shift`; so does the row kernel.
        # compare in the canonical grid: un-roll both identically
        row_g = row.reshape(b, hp // win, win * wp, c)
        want = np.asarray(row_g).reshape(b, hp // win, win, wp, c)
        for name, got_c in [("full", full), ("banded", band)]:
            got = np.asarray(from_col_bands(got_c, win, hp, wp))
            got = got.reshape(b, hp // win, win, wp, c)
            np.testing.assert_allclose(
                got, want, rtol=0, atol=3e-2,
                err_msg=f"{name} roll_in={roll_in} shift={shift}")
            assert np.abs(got - want).mean() < 1e-2


def test_wpair_plan_properties():
    """The window-aligned plan covers [0, tp) disjointly with 8-aligned
    static slices, and every owned row's (shifted) window fits the chunk's
    key range."""
    from mask_bev_tpu.ops.pallas_swin_block import _wpair_plan

    for win, wp_mult in [(4, 16), (5, 13), (5, 26), (10, 13), (10, 7)]:
        wp = win * wp_mult
        tp = ((wp * win + 127) // 128) * 128
        for shift in (0, win // 2):
            plan = _wpair_plan(tp, win, shift)
            if plan is None:
                continue
            q_starts, k_starts, own_lo, qs, ks = plan
            covered = []
            for q0, k0, lo in zip(q_starts, k_starts, own_lo):
                assert q0 % 8 == 0 and k0 % 8 == 0 and lo % 8 == 0
                assert 0 <= k0 <= tp - ks and 0 <= q0 <= tp - qs
                own = range(q0 + lo, q0 + qs)
                covered.extend(own)
                # every owned row's window lies inside the key range
                for t in (own[0], own[-1]):
                    if t >= wp * win:
                        continue  # pad token, bias-masked
                    j = (t + shift * win) // (win * win)
                    w_lo = j * win * win - shift * win
                    w_hi = w_lo + win * win
                    if w_lo < 0:
                        w_lo = 0  # wrapped wedge attends only above 0
                    assert w_lo >= k0 and min(w_hi, wp * win) <= k0 + ks, (
                        win, wp, shift, t, (w_lo, w_hi), (k0, ks))
            assert sorted(covered) == list(range(tp))


def test_fused_wpair_matches_full_kernel():
    """Window-aligned chunk attention == full-band attention at the kernel
    level, covering multi-chunk plans, the clamped last chunk (tp not a
    multiple of own), roll chaining and shifted windows."""
    from mask_bev_tpu.ops.pallas_swin_block import (
        _wpair_plan, from_col_bands, fused_swin_block_col, to_col_bands)

    rng = np.random.default_rng(11)
    win, heads, c = 5, 2, 32
    h, w = 13, 63                       # hp=15, wp=65 -> band 325 tokens
    hp, wp = 15, 65
    tp = ((wp * win + 127) // 128) * 128   # 384
    plan = _wpair_plan(tp, win, win // 2)
    assert plan is not None and len(plan[0]) == 2 and plan[2][-1] > 0
    b = 2

    def p(*shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * .1)

    weights = dict(
        rel_hnn=p(heads, win * win, win * win),
        ln1_scale=jnp.ones((c,)), ln1_bias=p(c),
        wqkv=p(c, 3 * c), bqkv=p(3 * c), wproj=p(c, c), bproj=p(c),
        ln2_scale=jnp.ones((c,)), ln2_bias=p(c),
        w1=p(c, 2 * c), b1=p(2 * c), w2=p(2 * c, c), b2=p(c))
    geom = dict(h=h, w=w, hp=hp, wp=wp, win=win, num_heads=heads)

    xg = p(b, hp, wp, c)
    xc = to_col_bands(xg, win, tp)
    for roll_in, shift in [(0, 0), (0, 2), (2, 0), (2, 2)]:
        full = fused_swin_block_col(
            xc, **weights, **geom, roll_in=roll_in, shift=shift,
            key_w=tp, interpret=True)
        wpair = fused_swin_block_col(
            xc, **weights, **geom, roll_in=roll_in, shift=shift,
            attn_mode="wpair", interpret=True)
        want = np.asarray(from_col_bands(full, win, hp, wp))
        got = np.asarray(from_col_bands(wpair, win, hp, wp))
        np.testing.assert_allclose(
            got, want, rtol=0, atol=3e-2,
            err_msg=f"wpair roll_in={roll_in} shift={shift}")
        assert np.abs(got - want).mean() < 1e-2


def test_fused_wpair_matches_xla_model():
    """Whole backbone with band_layout='wpair' == plain XLA path."""
    x, params, ref = _mk(4, hw=(9, 70), seed=12)
    want = ref.apply(params, x, train=False)
    fused = SwinTransformer(
        embed_dim=32, depths=(2, 2), num_heads=(4, 8), window=4,
        out_indices=(0, 1),
        use_pallas=False, use_pallas_block=True, fused_interpret=True,
        band_layout="wpair", col_min_band=0)
    got = fused.apply(params, x, train=False)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        _close(g, w)


def test_fused_int8_fidelity():
    """int8 dynamic quantization of the dense matmuls: bounded deviation
    from the f32 XLA path (weights ~N(0, 0.02) after init -> per-channel
    scales keep relative error at the percent level)."""
    x, params, ref = _mk(4, hw=(9, 7), seed=5)
    want = ref.apply(params, x, train=False)
    q = SwinTransformer(
        embed_dim=32, depths=(2, 2), num_heads=(4, 8), window=4,
        out_indices=(0, 1),
        use_pallas=False, use_pallas_block=True, fused_interpret=True,
        quantize_int8=True)
    got = q.apply(params, x, train=False)
    for g, w in zip(got, want):
        g32, w32 = np.asarray(g, np.float32), np.asarray(w, np.float32)
        scale = np.abs(w32).max() + 1e-6
        rel = np.abs(g32 - w32) / scale
        assert rel.max() < 0.12, rel.max()
        assert rel.mean() < 0.02, rel.mean()


def test_fused_col_int8_fidelity():
    x, params, ref = _mk(4, hw=(9, 7), seed=6)
    want = ref.apply(params, x, train=False)
    q = SwinTransformer(
        embed_dim=32, depths=(2, 2), num_heads=(4, 8), window=4,
        out_indices=(0, 1),
        use_pallas=False, use_pallas_block=True, fused_interpret=True,
        band_layout="col", col_min_band=0, quantize_int8=True)
    got = q.apply(params, x, train=False)
    for g, w in zip(got, want):
        g32, w32 = np.asarray(g, np.float32), np.asarray(w, np.float32)
        rel = np.abs(g32 - w32) / (np.abs(w32).max() + 1e-6)
        assert rel.max() < 0.12, rel.max()
        assert rel.mean() < 0.02, rel.mean()


def test_int8_sim_matches_fused_int8():
    """The XLA int8-emulation path (SwinBlock.quantize — what CPU and the
    accuracy harness run) implements the SAME quantization scheme as the
    fused kernel: per-token act scales, per-out-channel weight scales,
    int8 MXU matmul. The two int8 paths must agree far more tightly with
    each other than either does with f32."""
    x, params, ref = _mk(4, hw=(9, 7), seed=7)
    kernel = SwinTransformer(
        embed_dim=32, depths=(2, 2), num_heads=(4, 8), window=4,
        out_indices=(0, 1),
        use_pallas=False, use_pallas_block=True, fused_interpret=True,
        quantize_int8=True)
    want = kernel.apply(params, x, train=False)
    sim = SwinTransformer(
        embed_dim=32, depths=(2, 2), num_heads=(4, 8), window=4,
        out_indices=(0, 1),
        use_pallas=False, use_pallas_block=False, quantize_int8=True)
    got = sim.apply(params, x, train=False)
    for g, w in zip(got, want):
        # extra slack over _close: interpret-mode MXU-bf16 attention can
        # push a value across an int8 round() boundary
        _close(g, w, atol=5e-2)


def test_int8_sim_train_mode_unquantized():
    """quantize is eval-only: the train path must equal the plain XLA path
    bitwise (training never quantizes)."""
    x, params, ref = _mk(4, hw=(6, 6), seed=8)
    want = ref.apply(params, x, train=True,
                     rngs={"dropout": jax.random.PRNGKey(0)})
    sim = SwinTransformer(
        embed_dim=32, depths=(2, 2), num_heads=(4, 8), window=4,
        out_indices=(0, 1),
        use_pallas=False, use_pallas_block=False, quantize_int8=True)
    got = sim.apply(params, x, train=True,
                    rngs={"dropout": jax.random.PRNGKey(0)})
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
