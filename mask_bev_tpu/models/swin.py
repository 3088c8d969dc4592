"""Swin-Transformer BEV backbone (TPU-native flax implementation).

Rebuilds the behavior of the reference's vendored ``CustomSwinTransformer``
(reference ``models/networks/swin/swin.py:22-774`` and its config factory
``models/backbones/mask_bev_backbone.py:41-64``): patch embed (conv k=s=patch),
4 stages of window MSA with relative position bias + cyclic-shifted windows,
patch merging between stages, per-stage output LayerNorms, rectangular grids,
optional interpolated absolute position embedding, and the ``swap_dims``
option. Defaults: depths (2,2,6,2), heads (3,6,12,24), mlp_ratio 4, window 10,
drop_path 0 — reference ``mask_bev_backbone.py:41-64``.

TPU-first notes: all shapes are static at trace time, so window padding,
shift masks, and relative-position index tables are computed as compile-time
constants; attention runs as batched (nW, w², C) matmuls on the MXU.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _rel_pos_index(wh: int, ww: int) -> np.ndarray:
    """Static (wh*ww, wh*ww) index into the (2wh-1)*(2ww-1) bias table."""
    coords = np.stack(
        np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij")
    ).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)  # (N, N)


def _shift_attn_mask(hp: int, wp: int, window: int, shift: int) -> np.ndarray:
    """Static additive mask (nW, w², w²) for shifted-window attention."""
    img_mask = np.zeros((hp, wp), np.int32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img_mask[hs, ws] = cnt
            cnt += 1
    mw = img_mask.reshape(hp // window, window, wp // window, window)
    mw = mw.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = mw[:, None, :] != mw[:, :, None]
    return np.where(diff, -100.0, 0.0).astype(np.float32)


class DenseWithBias(nn.Module):
    """Linear with setup-time params (same tree as nn.Dense: kernel, bias),
    so fused kernels can read the weights without tracing the layer."""

    in_features: int
    features: int

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features))
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.features,))

    def __call__(self, x):
        return x @ self.kernel + self.bias


class LayerNormP(nn.Module):
    """LayerNorm with setup-time params (same tree as nn.LayerNorm: scale,
    bias) so the fused block kernel can read them directly. Matches flax
    semantics: stats in float32, eps 1e-6, output in input dtype."""

    features: int
    eps: float = 1e-6

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones,
                                (self.features,))
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.features,))

    def __call__(self, x):
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        xc = x32 - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        y = xc * jax.lax.rsqrt(var + self.eps)
        y = y * self.scale.astype(jnp.float32) + self.bias.astype(jnp.float32)
        return y.astype(x.dtype)


def int8_sim_dense(x, kernel, bias=None):
    """XLA emulation of the fused kernels' int8 dynamic quantization
    (``ops/pallas_swin_block.py`` ``_q8_act``/``qw``/``_qdot``): per-token
    activation scale, per-output-channel weight scale, int8 x int8 -> int32
    matmul, f32 dequant. Lets ``backbone_quantize='int8'`` run (and be
    end-metric-validated) through the unfused XLA path on any backend."""
    x32 = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True),
                     1e-6) / 127.0
    xq = jnp.clip(jnp.round(x32 / sx), -127.0, 127.0).astype(jnp.int8)
    w32 = kernel.astype(jnp.float32)
    sw = jnp.maximum(jnp.max(jnp.abs(w32), axis=0, keepdims=True),
                     1e-8) / 127.0
    wq = jnp.clip(jnp.round(w32 / sw), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, wq, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * sx * sw
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


class WindowMSA(nn.Module):
    """Multi-head self-attention within fixed windows + relative position bias.

    Behavior of reference ``swin.py:22-124`` (qkv bias on, scaled dot product,
    truncated-normal-initialized bias table). Setup-style so the fused
    Pallas path can read qkv/proj weights and the bias table directly.
    """

    dim: int
    num_heads: int
    window: int

    def setup(self):
        self.qkv = DenseWithBias(self.dim, 3 * self.dim)
        self.proj = DenseWithBias(self.dim, self.dim)
        self.rel_pos_bias_table = self.param(
            "rel_pos_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window - 1) ** 2, self.num_heads),
        )

    def rel_bias(self, n: int):
        """(h, n, n) relative-position bias from the table."""
        idx = _rel_pos_index(self.window, self.window)
        return (self.rel_pos_bias_table[idx.reshape(-1)]
                .reshape(n, n, self.num_heads).transpose(2, 0, 1))

    def __call__(self, x, attn_mask=None, quantize: bool = False):
        # x: (B_, N, C) with N = window², B_ = B * nW
        b_, n, c = x.shape
        h = self.num_heads
        head_dim = c // h
        qkv = (int8_sim_dense(x, self.qkv.kernel, self.qkv.bias)
               if quantize else self.qkv(x))
        qkv = qkv.reshape(b_, n, 3, h, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum(
            "bhnd,bhmd->bhnm", q * (head_dim**-0.5), k,
            preferred_element_type=jnp.float32,
        )

        bias = self.rel_bias(n)
        if attn_mask is not None:  # (nW, N, N)
            # fold the static shift mask INTO the bias: one add over the big
            # (B_, h, n, n) tensor instead of two (the mask add otherwise
            # costs a full extra HBM pass per shifted block)
            nw = attn_mask.shape[0]
            combined = (bias[None] + attn_mask[:, None]).astype(attn.dtype)
            attn = attn.reshape(b_ // nw, nw, h, n, n) + combined[None]
            attn = attn.reshape(b_, h, n, n)
        else:
            attn = attn + bias[None].astype(attn.dtype)

        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
        if quantize:
            return int8_sim_dense(out, self.proj.kernel, self.proj.bias)
        return self.proj(out)


class ShiftWindowMSA(nn.Module):
    """Pad to window multiples, (optionally) cyclic-shift, window-partition,
    attend, reverse. Reference ``swin.py:127-284``.

    On TPU inference the attention itself runs as a fused Pallas kernel
    (``ops/pallas_window_msa.py``) with the shift mask pre-folded into the
    per-window bias; partitioning stays in XLA.
    """

    dim: int
    num_heads: int
    window: int
    shift: int = 0
    use_pallas: bool = True

    def setup(self):
        self.w_msa = WindowMSA(self.dim, self.num_heads, self.window)

    def __call__(self, x, hw: Tuple[int, int], train: bool = True,
                 quantize: bool = False):
        h, w = hw
        b, _, c = x.shape
        win = self.window
        x = x.reshape(b, h, w, c)
        hp = int(np.ceil(h / win)) * win
        wp = int(np.ceil(w / win)) * win
        x = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))

        shift = self.shift
        if min(hp, wp) == win:
            shift = 0  # window covers the grid; no shift needed (ref :180-184)
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(hp, wp, win, shift))
        else:
            mask = None

        nw_h, nw_w = hp // win, wp // win
        nw = nw_h * nw_w
        n = win * win
        xw = x.reshape(b, nw_h, win, nw_w, win, c).transpose(0, 1, 3, 2, 4, 5)

        fuse = (self.use_pallas and not train and not quantize
                and jax.default_backend() == "tpu"
                and c % self.num_heads == 0)
        if fuse:
            from mask_bev_tpu.ops.pallas_window_msa import fused_window_msa

            bias = self.w_msa.rel_bias(n)[None]  # (1, h, n, n)
            bias = jnp.broadcast_to(
                bias, (nw, self.num_heads, n, n))
            if mask is not None:
                bias = bias + mask[:, None]
            out = fused_window_msa(
                xw.reshape(b, nw, n, c), bias,
                self.w_msa.qkv.kernel, self.w_msa.qkv.bias,
                self.w_msa.proj.kernel, self.w_msa.proj.bias,
                num_heads=self.num_heads)
            xw = out.reshape(b, nw_h, nw_w, win, win, c)
        else:
            yw = self.w_msa(xw.reshape(b * nw, n, c), mask,
                            quantize=quantize)
            xw = yw.reshape(b, nw_h, nw_w, win, win, c)

        x = xw.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)

        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = x[:, :h, :w]
        return x.reshape(b, h * w, c)


class SwinBlock(nn.Module):
    """LN -> (S)W-MSA -> residual -> LN -> MLP -> residual (ref swin.py:287-374).

    ``drop_path`` is stochastic depth on both residual branches (timm/mmcv
    DropPath semantics: per-sample Bernoulli, rescaled by keep-prob), active
    only in training.

    Setup-style so that :meth:`fused` (the whole-block Pallas kernel used on
    TPU inference) can read the raw parameters; the parameter tree matches
    the previous compact layout exactly (norm1/attn/norm2/ffn_1/ffn_2).
    """

    dim: int
    num_heads: int
    window: int
    shift: bool
    mlp_ratio: int = 4
    drop_path: float = 0.0
    use_pallas: bool = True
    # int8 dynamic quantization of the dense matmuls on the UNFUSED XLA
    # path (eval only) — the same scheme the fused kernels apply in-kernel;
    # lets backbone_quantize='int8' run/validate on any backend
    quantize: bool = False

    def setup(self):
        self.norm1 = LayerNormP(self.dim)
        self.attn = ShiftWindowMSA(
            self.dim, self.num_heads, self.window,
            shift=self.window // 2 if self.shift else 0,
            use_pallas=self.use_pallas)
        self.norm2 = LayerNormP(self.dim)
        self.ffn_1 = DenseWithBias(self.dim, self.dim * self.mlp_ratio)
        self.ffn_2 = DenseWithBias(self.dim * self.mlp_ratio, self.dim)

    def _drop_path(self, y, train: bool, dp=None):
        # dp: traced per-block rate when the block runs under nn.scan
        # (rates differ across scan steps, so they ride in as scan inputs);
        # None -> the static attribute.
        if not train or (dp is None and self.drop_path <= 0.0):
            return y
        keep = 1.0 - (self.drop_path if dp is None else dp)
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (y.shape[0], 1, 1))
        # scale in f32, cast back: a traced f32 `keep` must not upcast a
        # bf16 residual (scan carries require a dtype-stable block output)
        return y * (mask / keep).astype(y.dtype)

    def __call__(self, x, hw, train: bool = True, drop_path=None):
        q8 = self.quantize and not train
        shortcut = x
        y = self.norm1(x)
        y = self.attn(y, hw, train=train, quantize=q8)
        x = shortcut + self._drop_path(y, train, drop_path)
        y = self.norm2(x)
        if q8:
            y = nn.gelu(int8_sim_dense(y, self.ffn_1.kernel,
                                       self.ffn_1.bias), approximate=False)
            y = int8_sim_dense(y, self.ffn_2.kernel, self.ffn_2.bias)
        else:
            y = self.ffn_2(nn.gelu(self.ffn_1(y), approximate=False))
        return x + self._drop_path(y, train, drop_path)

    def fused(self, xg, hw: Tuple[int, int], hw_pad: Tuple[int, int],
              roll_in: int, interpret: bool = False,
              quantize: bool = False):
        """Whole-block Pallas kernel on a flat padded (B, hp*wp, C) grid.

        ``xg`` rows are stored rolled by ``roll_in``; returns
        (out, roll_out) with ``out`` stored rolled by this block's shift
        (chain into the next block; un-roll rows once at stage end —
        columns are never rolled, the kernel folds the column shift into
        its precomputed band bias).
        """
        from mask_bev_tpu.ops.pallas_swin_block import fused_swin_block

        hp, wp = hw_pad
        shift = self.window // 2 if self.shift else 0
        if min(hp, wp) == self.window:
            shift = 0  # window covers the grid (ref swin.py:180-184)
        msa = self.attn.w_msa
        out = fused_swin_block(
            xg, msa.rel_bias(self.window * self.window),
            self.norm1.scale, self.norm1.bias,
            msa.qkv.kernel, msa.qkv.bias, msa.proj.kernel, msa.proj.bias,
            self.norm2.scale, self.norm2.bias,
            self.ffn_1.kernel, self.ffn_1.bias,
            self.ffn_2.kernel, self.ffn_2.bias,
            h=hw[0], w=hw[1], hp=hp, wp=wp, win=self.window,
            num_heads=self.num_heads,
            roll_in=roll_in, shift=shift, quantize=quantize,
            interpret=interpret)
        return out, shift

    def fused_col(self, xc, hw: Tuple[int, int], hw_pad: Tuple[int, int],
                  roll_in: int, interpret: bool = False,
                  quantize: bool = False, attn_mode: str = "banded"):
        """Col-major-band variant with banded-chunk or window-aligned
        (``attn_mode='wpair'``) attention (see ``ops/pallas_swin_block.py``).
        ``xc``: (B, nwh, Tp, C) bands."""
        from mask_bev_tpu.ops.pallas_swin_block import fused_swin_block_col

        hp, wp = hw_pad
        shift = self.window // 2 if self.shift else 0
        if min(hp, wp) == self.window:
            shift = 0  # window covers the grid (ref swin.py:180-184)
        msa = self.attn.w_msa
        out = fused_swin_block_col(
            xc, msa.rel_bias(self.window * self.window),
            self.norm1.scale, self.norm1.bias,
            msa.qkv.kernel, msa.qkv.bias, msa.proj.kernel, msa.proj.bias,
            self.norm2.scale, self.norm2.bias,
            self.ffn_1.kernel, self.ffn_1.bias,
            self.ffn_2.kernel, self.ffn_2.bias,
            h=hw[0], w=hw[1], hp=hp, wp=wp, win=self.window,
            num_heads=self.num_heads,
            roll_in=roll_in, shift=shift, attn_mode=attn_mode,
            quantize=quantize, interpret=interpret)
        return out, shift


class SwinBlockPair(nn.Module):
    """One ``nn.scan`` step: an (unshifted, shifted) block pair.

    Deep stages re-trace/re-compile identical block pairs (stage 2 has
    three); scanning them compiles ONE pair body. Both execution paths live
    in the body under the same stacked param layout (``stage{i}_pairs/
    block{0,1}``): the XLA blocks (train/CPU) and the fused Pallas kernels
    (TPU eval). For the fused path the carry enters and leaves each step
    stored row-rolled by ``win//2`` (the shifted block's roll state), so
    every step is identical and the parent rolls once before/after the
    scan.
    """

    dim: int
    num_heads: int
    window: int
    mlp_ratio: int
    hw: Tuple[int, int]
    use_pallas: bool = True
    fused: bool = False
    fused_interpret: bool = False
    quantize: bool = False
    train: bool = True

    def setup(self):
        self.block0 = SwinBlock(
            self.dim, self.num_heads, self.window, shift=False,
            mlp_ratio=self.mlp_ratio, use_pallas=self.use_pallas,
            quantize=self.quantize)
        self.block1 = SwinBlock(
            self.dim, self.num_heads, self.window, shift=True,
            mlp_ratio=self.mlp_ratio, use_pallas=self.use_pallas,
            quantize=self.quantize)

    def __call__(self, x, dps):
        if self.fused:
            win = self.window
            hh, ww = self.hw
            hp = int(np.ceil(hh / win)) * win
            wp = int(np.ceil(ww / win)) * win
            s_pair = 0 if min(hp, wp) == win else win // 2
            xg, r = self.block0.fused(
                x, self.hw, (hp, wp), s_pair,
                interpret=self.fused_interpret, quantize=self.quantize)
            xg, r = self.block1.fused(
                xg, self.hw, (hp, wp), r, interpret=self.fused_interpret,
                quantize=self.quantize)
            assert r == s_pair, (r, s_pair)  # uniform carry roll state
            return xg, None
        x = self.block0(x, self.hw, train=self.train, drop_path=dps[0])
        x = self.block1(x, self.hw, train=self.train, drop_path=dps[1])
        return x, None


class PatchMerging(nn.Module):
    """2x2 patch concat -> LN -> Linear(4C -> 2C, no bias). Ref: mmdet PatchMerging."""

    out_dim: int

    @nn.compact
    def __call__(self, x, hw):
        h, w = hw
        b, _, c = x.shape
        x = x.reshape(b, h, w, c)
        hp, wp = (h + 1) // 2 * 2, (w + 1) // 2 * 2
        x = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
        # sampling order matches torch unfold: (x0 x1 / x2 x3) -> [x0, x2, x1, x3]
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = x.reshape(b, (hp // 2) * (wp // 2), 4 * c)
        x = nn.LayerNorm(name="norm")(x)
        x = nn.Dense(self.out_dim, use_bias=False, name="reduction")(x)
        return x, (hp // 2, wp // 2)


class SwinTransformer(nn.Module):
    """BEV pseudo-image (B, H, W, C) -> 4-scale pyramid [(B, Hi, Wi, Ci)].

    NHWC end-to-end (TPU conv/layout-friendly; the encoder produces NHWC and
    the pixel decoder consumes it — no layout transposes anywhere).
    out dims = embed_dim * (1, 2, 4, 8) at strides patch*(1, 2, 4, 8).
    """

    embed_dim: int = 192
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window: int = 10
    patch_size: int = 4
    patch_stride: Optional[int] = None  # None = patch_size (ref strides[0])
    mlp_ratio: int = 4
    drop_path_rate: float = 0.0  # linearly scaled over depth, ref swin.py:548
    use_abs_pos_embed: bool = False
    abs_pos_grid: Optional[Tuple[int, int]] = None  # pretrain grid; None = runtime grid
    swap_dims: bool = False
    out_indices: Sequence[int] = (0, 1, 2, 3)
    use_pallas: bool = True  # experimental window-MSA-only kernel (off by default upstream)
    use_pallas_block: bool = True  # whole-block fused kernel on TPU inference
    fused_interpret: bool = False  # run the fused path in interpret mode (tests)
    # 'col': col-major bands + banded-chunk attention for large unscanned
    # stages (bands >= col_min_band tokens) — ~3.4x fewer attention FLOPs
    # at stage 0 (tests lower col_min_band to force the path on tiny grids).
    # 'wpair': col-major bands + window-aligned chunk attention
    # (_wpair_plan) — near-ideal attention FLOPs/softmax (~8x less than
    # 'row' at stage 0, ~2x less than 'col')
    band_layout: str = "row"
    col_min_band: int = 512
    # int8 dynamic quantization of the fused blocks' dense matmuls (row
    # layout only; A/B-gated, fidelity documented in ARCHITECTURE.md)
    quantize_int8: bool = False
    # fused Pallas token-LayerNorm for patch_norm/out_norm on the eval
    # path: LOST its r5 A/B (full 35.66 vs 34.42 ms/b8 — XLA fuses these
    # LNs with their neighbors; the standalone kernel breaks that and adds
    # narrow-lane pipeline overhead). Kept opt-in for future libtpus.
    fuse_ln: bool = False
    # rematerialize blocks in training (trade recompute for activation
    # memory; lets bigger global batches fit HBM)
    remat: bool = False
    # nn.scan deep stages' (unshifted, shifted) block pairs: one compiled
    # pair body instead of `depth` traced blocks (stacked param layout)
    scan_pairs: bool = True
    # fused-eval fast path for scanned stages: read the stacked
    # stage{i}_pairs params directly and chain the fused block kernels
    # UNROLLED (no lax.while step overhead, no uniform-carry pre/post rolls;
    # same params, same math — equivalence-tested)
    unroll_eval: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True, canvas_flat=None):
        """``canvas_flat``: optional ``(flat (H*W, B*C), (H, W, B))`` —
        the batch-minor flat canvas of the fused encoder path; patch embed
        + patch_norm then run as ONE Pallas kernel reading it natively
        (``ops/pallas_patch_embed``), skipping the conv custom-call's 0.5
        GB/b8 layout copy. Caller guarantees stride == patch, no padding
        needed, and no abs-pos-embed."""
        p = self.patch_size
        stride = self.patch_stride or p
        fuse_blocks = (
            self.use_pallas_block and not train
            and not self.is_initializing()  # init traces f32 at full dims
            and (self.fused_interpret or jax.default_backend() == "tpu"))

        def _ln(name: str, t):
            # opt-in fused token LayerNorm (see fuse_ln attr: measured
            # LOSS vs XLA's neighbor-fused lowering on v5e, default off);
            # params stay under the flax module names either way
            if fuse_blocks and self.fuse_ln:
                from mask_bev_tpu.ops.pallas_layer_norm import (
                    fused_layer_norm)

                lp = self.variables["params"][name]
                return fused_layer_norm(t, lp["scale"], lp["bias"],
                                        interpret=self.fused_interpret)
            return nn.LayerNorm(name=name)(t)

        if canvas_flat is not None:
            from mask_bev_tpu.ops.pallas_patch_embed import fused_patch_embed

            flat, (h, w, b) = canvas_flat
            assert stride == p and h % p == 0 and w % p == 0, (h, w, p, stride)
            assert not self.use_abs_pos_embed
            gh, gw = h // p, w // p
            pe = self.variables["params"]["patch_embed"]
            pn = self.variables["params"]["patch_norm"]
            x = fused_patch_embed(
                flat, pe["kernel"], pe["bias"], pn["scale"], pn["bias"],
                h=h, w=w, bsz=b, patch=p, out_dtype=flat.dtype,
                interpret=self.fused_interpret)
        else:
            b, h, w, c = x.shape
            # mmdet PatchEmbed AdaptivePadding 'corner': pad bottom-right
            # only, sized for kernel p at stride s (XLA's SAME pads
            # symmetrically and would break checkpoint activation parity
            # when stride != patch)
            gh = int(np.ceil(h / stride))
            gw = int(np.ceil(w / stride))
            pad_h = max((gh - 1) * stride + p - h, 0)
            pad_w = max((gw - 1) * stride + p - w, 0)
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            x = nn.Conv(self.embed_dim, (p, p), strides=(stride, stride),
                        padding="VALID", name="patch_embed")(x)
            x = x.reshape(b, gh * gw, self.embed_dim)
            x = _ln("patch_norm", x)

        if self.use_abs_pos_embed:
            pg = self.abs_pos_grid or (gh, gw)
            ape = self.param(
                "absolute_pos_embed",
                nn.initializers.truncated_normal(0.02),
                (pg[0], pg[1], self.embed_dim),
            )
            if self.swap_dims:
                ape = jnp.transpose(ape, (1, 0, 2))  # ref swin.py swap_dims fix
            if ape.shape[:2] != (gh, gw):
                ape = jax.image.resize(ape, (gh, gw, self.embed_dim), "bicubic")
            x = x + ape.reshape(1, gh * gw, self.embed_dim).astype(x.dtype)

        outs = []
        hw = (gh, gw)
        dim = self.embed_dim
        total_depth = sum(self.depths)
        # per-block stochastic-depth rates, linearly scaled to drop_path_rate
        dpr = [self.drop_path_rate * i / max(total_depth - 1, 1)
               for i in range(total_depth)]
        block_idx = 0
        for i, depth in enumerate(self.depths):
            # compiled fusion only at production head dims (hd = 64k): tiny
            # test configs (hd 12-32) would force Mosaic onto narrow-lane
            # matmul layouts the kernel is not tuned (or validated) for.
            # interpret mode (correctness tests) has no such constraint.
            # The kernel holds all block weights resident in VMEM, so deep
            # stages (dim 1536: ~57 MB bf16, ~113 MB f32 of weights) must
            # clear a budget or fall back to the XLA blocks — those stages
            # have few tokens anyway (16x16 at stride 32).
            esize = 2 if x.dtype == jnp.bfloat16 else 4
            weight_bytes = esize * (4 * dim * dim
                                    + 2 * self.mlp_ratio * dim * dim)
            stage_fused = fuse_blocks and (
                self.fused_interpret
                or (dim // self.num_heads[i] % 64 == 0
                    and weight_bytes <= 64 * 1024 * 1024))

            win = self.window
            hh, ww = hw
            hp = int(np.ceil(hh / win)) * win
            wp = int(np.ceil(ww / win)) * win

            if self.scan_pairs and depth % 2 == 0 and depth >= 4:
                # deep stage: scan over (unshifted, shifted) block pairs —
                # one traced/compiled pair body instead of depth blocks
                # (params stacked under stage{i}_pairs/block{0,1})
                dps = jnp.asarray(
                    dpr[block_idx:block_idx + depth],
                    jnp.float32).reshape(depth // 2, 2)
                block_idx += depth
                if stage_fused and self.unroll_eval:
                    # fused-eval unroll: chain the fused block kernels over
                    # the stacked stage{i}_pairs params directly — the
                    # lax.while scan step (per-step stacked-weight slices,
                    # uniform-carry pre/post rolls) costs ~1 ms/b8 at stage 2
                    # and buys nothing at eval (the pair body is one compiled
                    # Pallas kernel either way). Same params, same math.
                    from mask_bev_tpu.ops.pallas_swin_block import (
                        fused_swin_block)

                    pt = self.variables["params"][f"stage{i}_pairs"]
                    s_shift = 0 if min(hp, wp) == win else win // 2
                    n_tok = win * win
                    xg = jnp.pad(
                        x.reshape(b, hh, ww, dim),
                        ((0, 0), (0, hp - hh), (0, wp - ww), (0, 0))
                    ).reshape(b, hp * wp, dim)
                    roll = 0
                    for g in range(depth // 2):
                        for bi, shift in ((0, 0), (1, s_shift)):
                            bp = jax.tree.map(lambda a: a[g],
                                              pt[f"block{bi}"])
                            msa = bp["attn"]["w_msa"]
                            idx = _rel_pos_index(win, win)
                            rel = (msa["rel_pos_bias_table"][idx.reshape(-1)]
                                   .reshape(n_tok, n_tok, self.num_heads[i])
                                   .transpose(2, 0, 1))
                            xg = fused_swin_block(
                                xg, rel,
                                bp["norm1"]["scale"], bp["norm1"]["bias"],
                                msa["qkv"]["kernel"], msa["qkv"]["bias"],
                                msa["proj"]["kernel"], msa["proj"]["bias"],
                                bp["norm2"]["scale"], bp["norm2"]["bias"],
                                bp["ffn_1"]["kernel"], bp["ffn_1"]["bias"],
                                bp["ffn_2"]["kernel"], bp["ffn_2"]["bias"],
                                h=hh, w=ww, hp=hp, wp=wp, win=win,
                                num_heads=self.num_heads[i],
                                roll_in=roll, shift=shift,
                                quantize=self.quantize_int8,
                                interpret=self.fused_interpret)
                            roll = shift
                    xg = xg.reshape(b, hp, wp, dim)
                    if roll:
                        xg = jnp.roll(xg, roll, axis=1)
                    x = xg[:, :hh, :ww].reshape(b, hh * ww, dim)
                    if i in self.out_indices:
                        y = _ln(f"out_norm{i}", x)
                        outs.append(y.reshape(b, hw[0], hw[1], dim))
                    if i < len(self.depths) - 1:
                        x, hw = PatchMerging(dim * 2, name=f"merge{i}")(x, hw)
                        dim *= 2
                    continue
                pair_cls = SwinBlockPair
                if self.remat and train:
                    pair_cls = nn.remat(
                        SwinBlockPair,
                        static_argnums=())  # carry + dps both traced
                pair = nn.scan(
                    pair_cls,
                    variable_axes={"params": 0},
                    split_rngs={"params": True, "dropout": True},
                    in_axes=0, out_axes=0, length=depth // 2,
                )(dim=dim, num_heads=self.num_heads[i], window=win,
                  mlp_ratio=self.mlp_ratio, hw=hw,
                  use_pallas=self.use_pallas, fused=stage_fused,
                  fused_interpret=self.fused_interpret,
                  quantize=self.quantize_int8, train=train,
                  name=f"stage{i}_pairs")
                if stage_fused:
                    s_pair = 0 if min(hp, wp) == win else win // 2
                    xg = jnp.pad(
                        x.reshape(b, hh, ww, dim),
                        ((0, 0), (0, hp - hh), (0, wp - ww), (0, 0)))
                    # pre-roll rows to the scan's uniform carry state
                    if s_pair:
                        xg = jnp.roll(xg, -s_pair, axis=1)
                    xg, _ = pair(xg.reshape(b, hp * wp, dim), dps)
                    xg = xg.reshape(b, hp, wp, dim)
                    if s_pair:
                        xg = jnp.roll(xg, s_pair, axis=1)
                    x = xg[:, :hh, :ww].reshape(b, hh * ww, dim)
                else:
                    x, _ = pair(x, dps)
                if i in self.out_indices:
                    y = _ln(f"out_norm{i}", x)
                    outs.append(y.reshape(b, hw[0], hw[1], dim))
                if i < len(self.depths) - 1:
                    x, hw = PatchMerging(dim * 2, name=f"merge{i}")(x, hw)
                    dim *= 2
                continue

            blocks = []
            # remat in training: recompute each block in the backward pass
            # instead of storing its activations (static args: hw, train)
            block_cls = (nn.remat(SwinBlock, static_argnums=(2, 3))
                         if (self.remat and train) else SwinBlock)
            for d in range(depth):
                blocks.append(block_cls(
                    dim, self.num_heads[i], self.window,
                    shift=(d % 2 == 1), mlp_ratio=self.mlp_ratio,
                    drop_path=dpr[block_idx],
                    use_pallas=self.use_pallas,
                    quantize=self.quantize_int8,
                    name=f"stage{i}_block{d}"))
                block_idx += 1
            if stage_fused:
                # whole stage on the flat padded window grid: pad once, run
                # every block as one fused kernel (row-roll state chained
                # through the kernels' shifted band loads; column shifts
                # live in the kernels' bias), un-roll rows + slice once
                xg = jnp.pad(
                    x.reshape(b, hh, ww, dim),
                    ((0, 0), (0, hp - hh), (0, wp - ww), (0, 0)))
                tband = wp * win
                if (self.band_layout in ("col", "wpair")
                        and tband >= self.col_min_band):
                    # col-major bands: banded-chunk (or window-aligned
                    # 'wpair') attention (one repack in/out per stage; rows
                    # un-roll like the row path — band g holds canonical
                    # rows g*win + roll + [0, win))
                    from mask_bev_tpu.ops.pallas_swin_block import (
                        from_col_bands, to_col_bands)

                    tp = ((tband + 127) // 128) * 128
                    xc = to_col_bands(xg, win, tp)
                    roll = 0
                    for blk in blocks:
                        xc, roll = blk.fused_col(
                            xc, hw, (hp, wp), roll,
                            interpret=self.fused_interpret,
                            quantize=self.quantize_int8,
                            attn_mode=("wpair"
                                       if self.band_layout == "wpair"
                                       else "banded"))
                    xg = from_col_bands(xc, win, hp, wp)
                else:
                    xg = xg.reshape(b, hp * wp, dim)
                    roll = 0
                    for blk in blocks:
                        xg, roll = blk.fused(
                            xg, hw, (hp, wp), roll,
                            interpret=self.fused_interpret,
                            quantize=self.quantize_int8)
                    xg = xg.reshape(b, hp, wp, dim)
                if roll:
                    xg = jnp.roll(xg, roll, axis=1)
                x = xg[:, :hh, :ww].reshape(b, hh * ww, dim)
            else:
                for blk in blocks:
                    # positional: remat static_argnums address (hw, train)
                    x = blk(x, hw, train)
            if i in self.out_indices:
                y = _ln(f"out_norm{i}", x)
                outs.append(y.reshape(b, hw[0], hw[1], dim))  # (B, H, W, C)
            if i < len(self.depths) - 1:
                x, hw = PatchMerging(dim * 2, name=f"merge{i}")(x, hw)
                dim *= 2
        return outs
