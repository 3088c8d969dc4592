"""Fully fused Swin block Pallas kernel (eval path).

A profiled flagship forward (b8, bf16) spends ~40 ms in the backbone, and
the per-op trace shows it is NOT matmul-bound: ~10.4 ms of LayerNorm
reductions, ~6.4 ms of window partition/roll copies, and ~100 sub-ms matmul
fusions dominate. This kernel runs ONE ENTIRE Swin block — LN1 -> W-MSA
(rel-pos bias + shift masks) -> residual -> LN2 -> MLP -> residual — per
grid step over one window-row band held in VMEM, so each block costs one
HBM read + one HBM write of the activation tensor.

TPU-native design choices (vs the reference's torch ``swin.py:287-374``):

* **Everything is 2D.** The band lives as a flat (T = win*wp, C) tile; the
  window partition never happens as a data movement. Mosaic rejects the
  (win, wp, C) -> (nww, win*win, C) repacks (win=10 is not tile-aligned),
  so instead attention runs over the WHOLE band and a precomputed
  (T, T) additive bias encodes the block-diagonal window structure, the
  relative-position bias, the shifted-window boundaries AND the 3x3
  shift-region masks (-100 additive, reference swin.py:149-176). A column
  cyclic shift is therefore pure bias pattern — no roll, no copy.
* **Row shifts ride the loads.** Activations are stored flat
  (B, hp*wp, C), "rolled" by the producing block's shift (grid-row g
  holds original row (g+roll) mod hp). A block needing roll ``shift``
  from input rolled ``roll_in`` reads its band through ``win`` row-block
  BlockSpecs at static offset delta = (shift - roll_in) mod hp. Chain
  blocks by passing each block's shift as the next one's roll_in; un-roll
  rows once at stage end (columns are never rolled).
* Padded tokens are re-zeroed in-kernel after LN1 (iota validity masks),
  reproducing the reference's pad-with-zeros-every-block semantics
  without materializing pad/unpad copies in HBM.
* The band bias ships as (V, heads, T, T): V=2 variants for shifted
  blocks (interior band / last band differ in row regions), V=1
  otherwise. The BlockSpec index_map selects the variant per band, so
  interior bands hit the revisit cache and the extra HBM traffic is two
  fetches per batch row.

Equivalence with the XLA path is tested in
``tests/test_pallas_swin_block.py`` (interpret mode; compiled on TPU by the
perf scripts). One deliberate numeric deviation: Mosaic lowers neither erf
nor erfc, so the MLP uses tanh-gelu in-kernel (<1.1e-3 abs from the exact
erf gelu of the XLA path, below the MXU's bf16-pass noise of ~3e-3/block).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _layer_norm(x32, ln_ref, eps=1e-6):
    """x32 (T, C) f32; ln_ref (2, C) f32 [scale; bias]."""
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return (xc * jax.lax.rsqrt(var + eps) * ln_ref[0:1, :]
            + ln_ref[1:2, :])


def build_band_bias(rel_hnn, *, win: int, wp: int, hp: int, shift: int,
                    dtype):
    """(V, heads, T, T) additive attention bias for one band.

    Encodes, per token pair (t1, t2) of the flat row-major band:
    the relative-position bias when both tokens share a (shifted) window
    and the same shift region, else -100 (the reference's mask value,
    swin.py:149-176). Built per call from the traced bias table via two
    one-hot matmuls (MXU-friendly; avoids 10ns/element gathers).
    """
    heads, n, _ = rel_hnn.shape
    t = np.arange(win * wp)
    r_local = t // wp
    c = t % wp
    # canonical col c sits at rolled col (c - shift) mod wp: the XLA path
    # rolls by -shift (rolled[j] = orig[(j + shift) mod wp]), so inverting
    # for canonical coords subtracts
    cc = (c - shift) % wp
    w_id = cc // win
    n_idx = r_local * win + cc % win      # window-local flat index
    # one-hot (T, n) selector: bias_full = P @ rel @ P^T
    p_sel = jnp.asarray(np.eye(n, dtype=np.float32)[n_idx])
    full = jnp.einsum("tn,hnm,sm->hts", p_sel, rel_hnn.astype(jnp.float32),
                      p_sel)
    same_w = w_id[:, None] == w_id[None, :]
    if shift > 0:
        regc = np.where(cc < wp - win, 0, np.where(cc < wp - shift, 1, 2))
        variants = []
        for regr in (np.zeros_like(r_local),          # interior bands
                     np.where(r_local < win - shift, 1, 2)):  # last band
            reg = regr * 3 + regc
            ok = same_w & (reg[:, None] == reg[None, :])
            variants.append(jnp.where(jnp.asarray(ok), full, -100.0))
        out = jnp.stack(variants)
    else:
        out = jnp.where(jnp.asarray(same_w), full, -100.0)[None]
    return out.astype(dtype)


def _q8_act(x32):
    """Per-row (token) dynamic int8 quantization of f32 activations."""
    s = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True),
                    1e-6) / 127.0
    q = jnp.clip(jnp.round(x32 / s), -127.0, 127.0).astype(jnp.int8)
    return q, s


def _qdot(x32, w_ref, ws_ref, b_ref):
    """int8 x int8 -> int32 matmul with per-row/per-channel dequant."""
    q, s = _q8_act(x32)
    y = jax.lax.dot_general(q, w_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * s * ws_ref[...] + b_ref[...]


def _block_kernel(*refs, T, wp, win, hp, h, w, heads, shift, nloads,
                  quant: bool = False):
    if quant:
        # every dense weight ships as (int8 kernel, (1, F) f32 scale)
        (x_refs, (bias_ref, ln1_ref, wqkv_ref, wqkv_s, bqkv_ref,
                  projw_ref, projw_s, projb_ref, ln2_ref, w1_ref, w1_s,
                  b1_ref, w2_ref, w2_s, b2_ref), out_ref) = (
            refs[:nloads], refs[nloads:-1], refs[-1])
    else:
        (x_refs, (bias_ref, ln1_ref, wqkv_ref, bqkv_ref,
                  projw_ref, projb_ref, ln2_ref, w1_ref, b1_ref,
                  w2_ref, b2_ref), out_ref) = (
            refs[:nloads], refs[nloads:-1], refs[-1])

    band = pl.program_id(1)
    if nloads == 1:
        x = x_refs[0][0, 0]                                # (T, C)
    else:
        x = jnp.concatenate([r[0, 0] for r in x_refs], axis=0)
    c = x.shape[-1]
    hd = c // heads
    scale = hd ** -0.5

    # validity of each token: original (row, col) inside (h, w). Rows are
    # stored rolled by `shift`; columns are canonical (never rolled).
    tio = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
    r_local = tio // wp
    cpos = tio - r_local * wp
    orig_r = r_local + band * win + shift
    orig_r = jnp.where(orig_r >= hp, orig_r - hp, orig_r)
    validf = ((orig_r < h) & (cpos < w)).astype(jnp.float32)  # (T, 1)

    x32 = x.astype(jnp.float32)
    # zero padded tokens AFTER LN: the reference pads the normalized
    # tensor with zeros every block (swin.py:139-147)
    y32 = _layer_norm(x32, ln1_ref) * validf

    # ONE full-width QKV matmul (N = 3C keeps the MXU fully occupied;
    # per-head (C, hd=64) matmuls ran its output lanes half-empty), then
    # static per-head lane slices. qkv channel order: [q|k|v] x heads x hd.
    if quant:
        qkv = _qdot(y32, wqkv_ref, wqkv_s, bqkv_ref)          # (T, 3C) f32
    else:
        qkv = jax.lax.dot_general(
            y32.astype(x.dtype), wqkv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bqkv_ref[...]
    cols = []
    for hh in range(heads):
        q = qkv[:, hh * hd: (hh + 1) * hd]
        k = qkv[:, c + hh * hd: c + (hh + 1) * hd]
        v = qkv[:, 2 * c + hh * hd: 2 * c + (hh + 1) * hd]
        attn = jax.lax.dot_general(
            (q * scale).astype(x.dtype), k.astype(x.dtype),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        attn = attn + bias_ref[0, hh].astype(jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1)
        cols.append(jax.lax.dot_general(
            attn.astype(x.dtype), v.astype(x.dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    o32 = jnp.concatenate(cols, axis=-1)                    # (T, C) f32

    if quant:
        o32 = _qdot(o32, projw_ref, projw_s, projb_ref)
    else:
        o32 = jax.lax.dot_general(
            o32.astype(x.dtype), projw_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + projb_ref[...]

    x1 = x32 + o32                                          # residual, f32

    z32 = _layer_norm(x1, ln2_ref)
    if quant:
        hmid = _qdot(z32, w1_ref, w1_s, b1_ref)
    else:
        hmid = jax.lax.dot_general(
            z32.astype(x.dtype), w1_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b1_ref[...]
    # tanh gelu: Mosaic lowers neither erf nor erfc (see module docstring)
    hmid = jax.nn.gelu(hmid, approximate=True)
    if quant:
        mlp = _qdot(hmid, w2_ref, w2_s, b2_ref)
    else:
        mlp = jax.lax.dot_general(
            hmid.astype(x.dtype), w2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b2_ref[...]
    out_ref[0, 0] = (x1 + mlp).astype(out_ref.dtype)


def fused_swin_block(
    x: jax.Array,      # (B, hp*wp, C) flat grid, rows rolled by roll_in
    rel_hnn: jax.Array,  # (heads, n, n) f32 relative-position bias
    ln1_scale, ln1_bias, wqkv, bqkv, wproj, bproj,
    ln2_scale, ln2_bias, w1, b1, w2, b2,
    *, h: int, w: int, hp: int, wp: int, win: int, num_heads: int,
    roll_in: int = 0, shift: int = 0, quantize: bool = False,
    interpret: bool = False,
):
    """One full Swin block on a padded, flattened BEV grid.

    ``quantize``: int8 dynamic quantization of the four dense matmuls
    (per-token activation scales, per-output-channel weight scales; the
    attention matmuls and softmax stay bf16/f32) — v5e's int8 MXU runs 2x
    bf16 throughput on the FLOP-dominant projections.

    Returns the block output with rows rolled by ``shift`` — chain blocks
    by passing each block's ``shift`` as the next block's ``roll_in``, and
    un-roll rows once at stage end with ``jnp.roll(..., axis=1)``.
    """
    b, r_total, c = x.shape
    assert r_total == hp * wp and hp % win == 0 and wp % win == 0
    nwh = hp // win
    T = win * wp
    hd = c // num_heads
    delta = (shift - roll_in) % hp

    f32 = jnp.float32
    bias = build_band_bias(rel_hnn, win=win, wp=wp, hp=hp, shift=shift,
                           dtype=x.dtype)
    nvar = bias.shape[0]

    # qkv kernel (C, 3C) already packs output channels as [3, heads, hd]
    # (matches the XLA path's reshape in WindowMSA) — ship it whole; the
    # kernel slices per head after one full-width matmul

    # Pallas requires the last two block dims to be (8,128)-divisible OR
    # full; T = win*wp (e.g. 1300) is neither, so blocks are carved as 4D
    # views whose last two dims are always full.
    if delta == 0:
        nloads = 1
        x_in = x.reshape(b, nwh, T, c)
        x_specs = [pl.BlockSpec((1, 1, T, c), lambda bi, i: (bi, i, 0, 0),
                                memory_space=pltpu.VMEM)]
    else:
        # band rows cross input-band boundaries: read win row-blocks of wp
        # rows each at static offset delta (mod hp) — the roll rides the
        # loads, nothing is copied in HBM
        nloads = win
        x_in = x.reshape(b, hp, wp, c)
        x_specs = [
            pl.BlockSpec((1, 1, wp, c),
                         lambda bi, i, j=j: (bi, (i * win + delta + j) % hp,
                                             0, 0),
                         memory_space=pltpu.VMEM)
            for j in range(win)
        ]

    if nvar == 2:
        bias_spec = pl.BlockSpec(
            (1, num_heads, T, T),
            lambda bi, i: (jnp.where(i == nwh - 1, 1, 0), 0, 0, 0),
            memory_space=pltpu.VMEM)
    else:
        bias_spec = pl.BlockSpec((1, num_heads, T, T),
                                 lambda bi, i: (0, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)

    if quantize:
        def qw(wm):
            """Per-output-channel int8 weight quantization."""
            w32 = wm.astype(f32)
            s = jnp.maximum(jnp.max(jnp.abs(w32), axis=0, keepdims=True),
                            1e-8) / 127.0
            q = jnp.clip(jnp.round(w32 / s), -127, 127).astype(jnp.int8)
            return [q, s]

        inputs = [x_in] * nloads + [
            bias,
            jnp.stack([ln1_scale, ln1_bias]).astype(f32),
            *qw(wqkv), bqkv[None].astype(f32),
            *qw(wproj), bproj[None].astype(f32),
            jnp.stack([ln2_scale, ln2_bias]).astype(f32),
            *qw(w1), b1[None].astype(f32),
            *qw(w2), b2[None].astype(f32),
        ]
        in_specs = x_specs + [bias_spec] + [wspec] * 14
    else:
        inputs = [x_in] * nloads + [
            bias,
            jnp.stack([ln1_scale, ln1_bias]).astype(f32),
            wqkv.astype(x.dtype), bqkv[None].astype(f32),
            wproj.astype(x.dtype), bproj[None].astype(f32),
            jnp.stack([ln2_scale, ln2_bias]).astype(f32),
            w1.astype(x.dtype), b1[None].astype(f32),
            w2.astype(x.dtype), b2[None].astype(f32),
        ]
        in_specs = x_specs + [bias_spec] + [wspec] * 10

    kernel = functools.partial(
        _block_kernel, T=T, wp=wp, win=win, hp=hp, h=h, w=w,
        heads=num_heads, shift=shift, nloads=nloads, quant=quantize)
    out = pl.pallas_call(
        kernel,
        grid=(b, nwh),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, T, c), lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nwh, T, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)
    return out.reshape(b, r_total, c)


# ---------------------------------------------------------------------------
# Column-major band layout + banded-chunk attention
#
# Within a band (win grid rows), ordering tokens COLUMN-major
# (t' = c*win + r) makes every window — of either partition — a contiguous
# token range: unshifted window w covers t' in [w*win^2, (w+1)*win^2); a
# shifted window covers [w*win^2 - s*win, w*win^2 + s*win + ...), still
# contiguous, because any contiguous COLUMN range is a contiguous t' range.
# Attention therefore runs in 128-query chunks against a 384-key window
# around the diagonal instead of the full (T, T) band — ~3.4x fewer
# attention FLOPs and softmax elements at the 130-column stage-0 band.
# Row shifts cannot ride the loads in this layout (a global row roll
# interleaves adjacent bands); instead the kernel loads TWO adjacent bands
# and merges them with two sublane rolls + a period-win select (VPU-cheap).
# ---------------------------------------------------------------------------


def to_col_bands(xg: jax.Array, win: int, tp: int) -> jax.Array:
    """(B, hp, wp, C) canonical grid -> (B, nwh, Tp, C) col-major bands."""
    b, hp, wp, c = xg.shape
    nwh = hp // win
    x = xg.reshape(b, nwh, win, wp, c).transpose(0, 1, 3, 2, 4)
    x = x.reshape(b, nwh, wp * win, c)
    return jnp.pad(x, ((0, 0), (0, 0), (0, tp - wp * win), (0, 0)))


def from_col_bands(xc: jax.Array, win: int, hp: int, wp: int) -> jax.Array:
    """(B, nwh, Tp, C) col-major bands -> (B, hp, wp, C) canonical grid."""
    b, nwh, _, c = xc.shape
    x = xc[:, :, : wp * win].reshape(b, nwh, wp, win, c)
    return x.transpose(0, 1, 3, 2, 4).reshape(b, hp, wp, c)


def _col_chunk_starts(tp: int, chunk: int, key_w: int):
    """Static key-window start per query chunk (clamped to [0, tp-key_w])."""
    return [min(max((i - 1) * chunk, 0), tp - key_w)
            for i in range(tp // chunk)]


def _wpair_plan(tp: int, win: int, shift: int):
    """Static window-aligned attention plan for one col-major band.

    In col-major band order every (shifted) window is a contiguous token
    range, and window boundaries fall at multiples of win**2 (shifted: at
    ``j*win**2 - shift*win``). Query chunks of ``own = k*win**2`` tokens
    (the largest multiple of win**2 that is <= 256 and sublane-aligned)
    therefore never split a window across the chunks' OWNED ranges, so
    each chunk's keys are just its own range plus an aligned
    ``shift*win`` margin — near-ideal attention FLOPs (the banded
    chunk=128/key_w=384 scheme pays ~2x more keys per query, and the
    full-band form ~wp/win x).

    Returns (q_starts, k_starts, own_lo, qs, ks) — all-static lists; the
    i-th chunk computes attention for rows [q_starts[i], +qs) against keys
    [k_starts[i], +ks) and OWNS output rows [own_lo[i], qs) of its local
    range (disjoint cover of [0, tp)). None when win**2 cannot tile (no
    aligned multiple <= 256) or the margins do not fit tp.
    """
    win2 = win * win
    own = 0
    for kk in range(max(256 // win2, 1), 0, -1):
        if (kk * win2) % 8 == 0:
            own = kk * win2
            break
    if own == 0 or tp < own:
        return None
    m = int(np.ceil(tp / own))
    q_starts = [min(i * own, tp - own) for i in range(m)]
    own_lo = [0] * m
    if m > 1:
        own_lo[-1] = m * own - tp
    margin = ((shift * win + 7) // 8) * 8 if shift else 0
    ks = own + 2 * margin
    if ks > tp:
        return None
    k_starts = [min(max(q - margin, 0), tp - ks) for q in q_starts]
    return q_starts, k_starts, own_lo, own, ks


def build_band_bias_col(rel_hnn, *, win: int, wp: int, shift: int, tp: int,
                        chunk: int, key_w: int, dtype, plan=None):
    """Additive attention bias for one col-major band.

    Returns (V, nch, heads, chunk, key_w) banded chunks when
    ``key_w < tp`` else the full (V, heads, tp, tp) matrix. V = 2 variants
    for shifted blocks (interior band / last band), else 1. With ``plan``
    (from :func:`_wpair_plan`) the chunk ranges come from the plan instead
    of the uniform chunk/key_w stride.
    """
    heads, n, _ = rel_hnn.shape
    t = np.arange(tp)
    c = t // win
    r = t - c * win
    real = c < wp
    cc = (c - shift) % wp
    w_id = np.where(real, cc // win, -1)  # pad tokens alias no window
    n_idx = np.where(real, r * win + cc % win, 0)

    p_sel = jnp.asarray(np.eye(n, dtype=np.float32)[n_idx])
    same_w = real[:, None] & real[None, :] & (w_id[:, None] == w_id[None, :])
    if shift > 0:
        regc = np.where(cc < wp - win, 0, np.where(cc < wp - shift, 1, 2))
        reg_rows = [np.zeros_like(r),                     # interior bands
                    np.where(r < win - shift, 1, 2)]      # last band
    else:
        regc = np.zeros_like(cc)
        reg_rows = [np.zeros_like(r)]

    rel32 = rel_hnn.astype(jnp.float32)
    if plan is not None:
        q_starts, k_starts, _, chunk, key_w = plan
        spans = list(zip(q_starts, k_starts))
        banded = True
    else:
        spans = [(i * chunk, k0)
                 for i, k0 in enumerate(_col_chunk_starts(tp, chunk, key_w))]
        banded = key_w < tp
    variants = []
    for regr in reg_rows:
        reg = regr * 3 + regc
        ok = same_w & (reg[:, None] == reg[None, :])
        if banded:
            rows = []
            for q0, k0 in spans:
                q_sl = slice(q0, q0 + chunk)
                k_sl = slice(k0, k0 + key_w)
                blk = jnp.einsum(
                    "tn,hnm,sm->hts", p_sel[q_sl], rel32, p_sel[k_sl])
                rows.append(jnp.where(jnp.asarray(ok[q_sl, k_sl]),
                                      blk, -100.0))
            variants.append(jnp.stack(rows))       # (nch, heads, chunk, kw)
        else:
            full = jnp.einsum("tn,hnm,sm->hts", p_sel, rel32, p_sel)
            variants.append(jnp.where(jnp.asarray(ok), full, -100.0))
    return jnp.stack(variants).astype(dtype)


def _block_kernel_col(*refs, tp, wp, win, hp, h, w, heads, shift, delta,
                      nloads, chunk, key_w, plan=None, quant: bool = False):
    if quant:
        (x_refs, (bias_ref, ln1_ref, wqkv_ref, wqkv_s, bqkv_ref,
                  projw_ref, projw_s, projb_ref, ln2_ref, w1_ref, w1_s,
                  b1_ref, w2_ref, w2_s, b2_ref), out_ref) = (
            refs[:nloads], refs[nloads:-1], refs[-1])
    else:
        (x_refs, (bias_ref, ln1_ref, wqkv_ref, bqkv_ref, projw_ref,
                  projb_ref, ln2_ref, w1_ref, b1_ref, w2_ref, b2_ref),
         out_ref) = (refs[:nloads], refs[nloads:-1], refs[-1])

    band = pl.program_id(1)
    c = out_ref.shape[-1]
    hd = c // heads
    scale = hd ** -0.5
    banded = key_w < tp

    tio = jax.lax.broadcasted_iota(jnp.int32, (tp, 1), 0)
    col = tio // win
    rloc = tio - col * win

    if nloads == 2:
        # merge two adjacent stored bands into this block's shifted band:
        # rows r' < win - delta come from ref0 at t' + delta, the rest from
        # ref1 at t' - (win - delta). Wrapped roll garbage only lands where
        # the select takes the other ref (or in the pad tail).
        f0 = x_refs[0][0, 0].astype(jnp.float32)
        f1 = x_refs[1][0, 0].astype(jnp.float32)
        r0 = pltpu.roll(f0, (-delta) % tp, 0)
        r1 = pltpu.roll(f1, (win - delta) % tp, 0)
        x32 = jnp.where(rloc < win - delta, r0, r1)
    else:
        x32 = x_refs[0][0, 0].astype(jnp.float32)

    orig_r = rloc + band * win + shift
    orig_r = jnp.where(orig_r >= hp, orig_r - hp, orig_r)
    validf = ((orig_r < h) & (col < w)).astype(jnp.float32)  # (tp, 1)

    y32 = _layer_norm(x32, ln1_ref) * validf
    y = y32.astype(out_ref.dtype)

    if quant:
        qkv = _qdot(y32, wqkv_ref, wqkv_s, bqkv_ref)          # (tp, 3C) f32
    else:
        qkv = jax.lax.dot_general(
            y, wqkv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + bqkv_ref[...]

    if plan is not None or banded:
        if plan is not None:
            q_starts, k_starts, own_lo, qs, ksz = plan
            spans = list(zip(q_starts, k_starts, own_lo))
        else:
            qs, ksz = chunk, key_w
            spans = [(i * chunk, k0, 0) for i, k0 in
                     enumerate(_col_chunk_starts(tp, chunk, key_w))]
        o_rows = []
        for i, (q0, k0, lo) in enumerate(spans):
            cols = []
            for hh in range(heads):
                q = qkv[q0:q0 + qs, hh * hd:(hh + 1) * hd]
                k = qkv[k0:k0 + ksz, c + hh * hd: c + (hh + 1) * hd]
                v = qkv[k0:k0 + ksz, 2 * c + hh * hd: 2 * c + (hh + 1) * hd]
                attn = jax.lax.dot_general(
                    (q * scale).astype(y.dtype), k.astype(y.dtype),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                attn = attn + bias_ref[0, i, hh].astype(jnp.float32)
                attn = jax.nn.softmax(attn, axis=-1)
                cols.append(jax.lax.dot_general(
                    attn.astype(y.dtype), v.astype(y.dtype),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
            oc = jnp.concatenate(cols, axis=-1)
            # a clamped chunk re-computes rows another chunk owns (the
            # wpair plan's last chunk): emit only the owned tail
            o_rows.append(oc[lo:] if lo else oc)
        o = jnp.concatenate(o_rows, axis=0).astype(y.dtype)    # (tp, C)
    else:
        cols = []
        for hh in range(heads):
            q = qkv[:, hh * hd:(hh + 1) * hd]
            k = qkv[:, c + hh * hd: c + (hh + 1) * hd]
            v = qkv[:, 2 * c + hh * hd: 2 * c + (hh + 1) * hd]
            attn = jax.lax.dot_general(
                (q * scale).astype(y.dtype), k.astype(y.dtype),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            attn = attn + bias_ref[0, hh].astype(jnp.float32)
            attn = jax.nn.softmax(attn, axis=-1)
            cols.append(jax.lax.dot_general(
                attn.astype(y.dtype), v.astype(y.dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        o = jnp.concatenate(cols, axis=-1).astype(y.dtype)

    if quant:
        o32 = _qdot(o.astype(jnp.float32), projw_ref, projw_s, projb_ref)
    else:
        o32 = jax.lax.dot_general(
            o, projw_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + projb_ref[...]

    x1 = x32 + o32
    z32 = _layer_norm(x1, ln2_ref)
    if quant:
        hmid = _qdot(z32, w1_ref, w1_s, b1_ref)
    else:
        hmid = jax.lax.dot_general(
            z32.astype(y.dtype), w1_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b1_ref[...]
    hmid = jax.nn.gelu(hmid, approximate=True)
    if quant:
        mlp = _qdot(hmid, w2_ref, w2_s, b2_ref)
    else:
        mlp = jax.lax.dot_general(
            hmid.astype(y.dtype), w2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b2_ref[...]
    out_ref[0, 0] = (x1 + mlp).astype(out_ref.dtype)


def fused_swin_block_col(
    x: jax.Array,       # (B, nwh, Tp, C) col-major bands, rolled by roll_in
    rel_hnn: jax.Array,
    ln1_scale, ln1_bias, wqkv, bqkv, wproj, bproj,
    ln2_scale, ln2_bias, w1, b1, w2, b2,
    *, h: int, w: int, hp: int, wp: int, win: int, num_heads: int,
    roll_in: int = 0, shift: int = 0, chunk: int = 128, key_w: int = 384,
    attn_mode: str = "banded", quantize: bool = False,
    interpret: bool = False,
):
    """One Swin block on col-major bands with banded-chunk attention.

    Returns output bands rolled by ``shift`` (chain like the row kernel).
    ``key_w`` is clamped to Tp (full attention) when the band is small.
    ``attn_mode='wpair'`` replaces the uniform chunk/key_w stride with the
    window-aligned plan of :func:`_wpair_plan` (~2x fewer key columns and
    softmax elements per query; falls back to banded when the plan does
    not exist for this (win, tp)).
    """
    b, nwh, tp, c = x.shape
    assert tp % chunk == 0 and wp * win <= tp, (tp, chunk, wp, win)
    plan = _wpair_plan(tp, win, shift) if attn_mode == "wpair" else None
    key_w = min(key_w, tp)
    if plan is None and key_w < tp:
        # banded correctness bound: a query's window spans win^2 contiguous
        # tokens, which must fit inside the +-1-chunk key window
        assert key_w >= 3 * chunk and win * win <= chunk + 1, \
            (key_w, chunk, win)
    diff = shift - roll_in
    delta = diff % win
    base = (diff - delta) // win
    nloads = 1 if delta == 0 else 2

    f32 = jnp.float32
    bias = build_band_bias_col(
        rel_hnn, win=win, wp=wp, shift=shift, tp=tp, chunk=chunk,
        key_w=key_w, dtype=x.dtype, plan=plan)
    nvar = bias.shape[0]

    if nloads == 1:
        x_specs = [pl.BlockSpec((1, 1, tp, c), lambda bi, g: (bi, g, 0, 0),
                                memory_space=pltpu.VMEM)]
    else:
        x_specs = [
            pl.BlockSpec((1, 1, tp, c),
                         lambda bi, g, j=j: (bi, (g + base + j) % nwh, 0, 0),
                         memory_space=pltpu.VMEM)
            for j in range(2)
        ]

    ndim_tail = (0, 0, 0, 0) if (plan is not None or key_w < tp) \
        else (0, 0, 0)
    if nvar == 2:
        bias_spec = pl.BlockSpec(
            (1,) + bias.shape[1:],
            lambda bi, g: (jnp.where(g == nwh - 1, 1, 0),) + ndim_tail,
            memory_space=pltpu.VMEM)
    else:
        bias_spec = pl.BlockSpec(
            (1,) + bias.shape[1:], lambda bi, g: (0,) + ndim_tail,
            memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)

    if quantize:
        def qw(wm):
            w32 = wm.astype(f32)
            s = jnp.maximum(jnp.max(jnp.abs(w32), axis=0, keepdims=True),
                            1e-8) / 127.0
            q = jnp.clip(jnp.round(w32 / s), -127, 127).astype(jnp.int8)
            return [q, s]

        inputs = [x] * nloads + [
            bias,
            jnp.stack([ln1_scale, ln1_bias]).astype(f32),
            *qw(wqkv), bqkv[None].astype(f32),
            *qw(wproj), bproj[None].astype(f32),
            jnp.stack([ln2_scale, ln2_bias]).astype(f32),
            *qw(w1), b1[None].astype(f32),
            *qw(w2), b2[None].astype(f32),
        ]
        in_specs = x_specs + [bias_spec] + [wspec] * 14
    else:
        inputs = [x] * nloads + [
            bias,
            jnp.stack([ln1_scale, ln1_bias]).astype(f32),
            wqkv.astype(x.dtype), bqkv[None].astype(f32),
            wproj.astype(x.dtype), bproj[None].astype(f32),
            jnp.stack([ln2_scale, ln2_bias]).astype(f32),
            w1.astype(x.dtype), b1[None].astype(f32),
            w2.astype(x.dtype), b2[None].astype(f32),
        ]
        in_specs = x_specs + [bias_spec] + [wspec] * 10

    kernel = functools.partial(
        _block_kernel_col, tp=tp, wp=wp, win=win, hp=hp, h=h, w=w,
        heads=num_heads, shift=shift, delta=delta, nloads=nloads,
        chunk=chunk, key_w=key_w, plan=plan, quant=quantize)
    return pl.pallas_call(
        kernel,
        grid=(b, nwh),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, tp, c), lambda bi, g: (bi, g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nwh, tp, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)
