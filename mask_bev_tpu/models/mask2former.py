"""Mask2Former-style query decoder with masked cross-attention.

Rebuilds the behavior of the reference's vendored head (reference
``models/networks/mask2former_head/mask2former_head.py:428-562``):

  * learned ``query_feat`` / ``query_embed`` / ``level_embed`` (ref :110-114);
  * per-layer head pass (ref ``_forward_head`` :428-472): decoder-norm ->
    linear cls, 3-layer mask MLP, mask logits = einsum('bqc,bchw->bqhw')
    (ref :459), optional 12-way height classification (ref :116-120,451);
  * attention mask = sigmoid(resized mask logits) < 0.5, detached, with
    all-background query rows cleared (ref :460-470, 538-539);
  * 9 decoder layers cycling memory levels i % 3 (/32, /16, /8), each layer
    masked cross-attn -> self-attn -> FFN with post-norm residuals;
  * predictions returned for the initial head pass + every layer
    (10 outputs, stacked along a leading axis instead of python lists).

TPU-first: everything static-shape; attention masks are additive big-negative
biases so the whole decoder is one fused XLA graph; outputs stack to
(L+1, B, Q, ...) tensors.

Compile time: the 9 layers are ``nn.scan``-ned as 3 groups of one
level-triple each (the three levels have different memory shapes, so one
scan step = layers 3g, 3g+1, 3g+2) — XLA traces/compiles ONE group body
instead of 9 layers + 9 head passes. The shared prediction heads cannot
live inside the scan (scan stacks every param of its target), so their
parameters are read off the bound ``MaskHeads`` module and passed through
the scan as broadcast inputs to a pure function.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mask_bev_tpu.models.positional import sine_positional_encoding_2d
from mask_bev_tpu.models.swin import DenseWithBias, LayerNormP

_NEG = -1e9


class DecoderOutputs(NamedTuple):
    """Stacked per-layer predictions (leading axis = L+1 head passes)."""

    cls_logits: jax.Array  # (L+1, B, Q, num_classes+1)
    mask_logits: jax.Array  # (L+1, B, Q, H/4, W/4)
    height_logits: Optional[jax.Array]  # (L+1, B, Q, num_height_bins) | None


class MultiHeadAttention(nn.Module):
    """Standard MHA with optional additive attention bias (B, Q, K) or
    (B, H, Q, K). Setup-style params (same tree as the nn.Dense version)
    so the fused decoder-layer kernel can read the weights directly."""

    dim: int
    num_heads: int

    def setup(self):
        c = self.dim
        self.q = DenseWithBias(c, c)
        self.k = DenseWithBias(c, c)
        self.v = DenseWithBias(c, c)
        self.out = DenseWithBias(c, c)

    def param_tree(self) -> Dict:
        return {n: {"kernel": getattr(self, n).kernel,
                    "bias": getattr(self, n).bias}
                for n in ("q", "k", "v", "out")}

    def __call__(self, q, k, v, attn_bias=None):
        b, nq, c = q.shape
        h = self.num_heads
        hd = c // h
        qp = self.q(q).reshape(b, nq, h, hd)
        kp = self.k(k).reshape(b, k.shape[1], h, hd)
        vp = self.v(v).reshape(b, v.shape[1], h, hd)
        attn = jnp.einsum("bqhd,bkhd->bhqk", qp * (hd**-0.5), kp,
                          preferred_element_type=jnp.float32)
        if attn_bias is not None:
            if attn_bias.ndim == 3:
                attn_bias = attn_bias[:, None]
            attn = attn + attn_bias
        attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vp,
                         preferred_element_type=jnp.float32).astype(q.dtype)
        return self.out(out.reshape(b, nq, c))


class FFN(nn.Module):
    dim: int
    hidden: int

    def setup(self):
        self.fc1 = DenseWithBias(self.dim, self.hidden)
        self.fc2 = DenseWithBias(self.hidden, self.dim)

    def param_tree(self) -> Dict:
        return {n: {"kernel": getattr(self, n).kernel,
                    "bias": getattr(self, n).bias}
                for n in ("fc1", "fc2")}

    def __call__(self, x):
        return self.fc2(nn.relu(self.fc1(x)))


def _mask_embed(hp: Dict, query):
    """decoder-norm + 3-layer mask MLP -> (normed query, mask embedding)."""
    x32 = query.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    x = (xc * jax.lax.rsqrt(var + 1e-6)
         * hp["decoder_norm"]["scale"] + hp["decoder_norm"]["bias"])
    x = x.astype(query.dtype)
    y = nn.relu(x @ hp["mask_mlp1"]["kernel"] + hp["mask_mlp1"]["bias"])
    y = nn.relu(y @ hp["mask_mlp2"]["kernel"] + hp["mask_mlp2"]["bias"])
    mask_embed = y @ hp["mask_mlp3"]["kernel"] + hp["mask_mlp3"]["bias"]
    return x, mask_embed


def _heads_apply(hp: Dict, query, mask_features, predict_height: bool):
    """Per-layer prediction heads as a pure function of the param tree.

    ``hp`` is the ``MaskHeads`` parameter tree (see
    :meth:`MaskHeads.param_tree`); shared across all L+1 head passes
    (ref ``_forward_head`` :428-459), including the ones inside the
    layer-group scan where flax submodule sharing is unavailable.
    """
    x, mask_embed = _mask_embed(hp, query)
    cls_logits = x @ hp["cls_embed"]["kernel"] + hp["cls_embed"]["bias"]
    mask_logits = jnp.einsum(
        "bqc,bhwc->bqhw", mask_embed, mask_features,
        preferred_element_type=jnp.float32,
    ).astype(query.dtype)
    height_logits = None
    if predict_height:
        height_logits = (x @ hp["height_embed"]["kernel"]
                         + hp["height_embed"]["bias"])
    return cls_logits, mask_logits, height_logits


class MaskHeads(nn.Module):
    """Per-layer prediction heads, shared across layers (ref :428-459).

    Setup-style param holders so :meth:`param_tree` can hand the (traced)
    parameter values into the scanned layer groups as broadcast inputs.
    """

    num_classes: int
    feat_channels: int
    out_channels: int
    predict_height: bool = False
    num_height_bins: int = 12

    def setup(self):
        c = self.feat_channels
        self.decoder_norm = LayerNormP(c)
        self.cls_embed = DenseWithBias(c, self.num_classes + 1)
        self.mask_mlp1 = DenseWithBias(c, self.feat_channels)
        self.mask_mlp2 = DenseWithBias(self.feat_channels, self.feat_channels)
        self.mask_mlp3 = DenseWithBias(self.feat_channels, self.out_channels)
        if self.predict_height:
            self.height_embed = DenseWithBias(c, self.num_height_bins)

    def param_tree(self) -> Dict:
        hp = {
            "decoder_norm": {"scale": self.decoder_norm.scale,
                             "bias": self.decoder_norm.bias},
            "cls_embed": {"kernel": self.cls_embed.kernel,
                          "bias": self.cls_embed.bias},
            "mask_mlp1": {"kernel": self.mask_mlp1.kernel,
                          "bias": self.mask_mlp1.bias},
            "mask_mlp2": {"kernel": self.mask_mlp2.kernel,
                          "bias": self.mask_mlp2.bias},
            "mask_mlp3": {"kernel": self.mask_mlp3.kernel,
                          "bias": self.mask_mlp3.bias},
        }
        if self.predict_height:
            hp["height_embed"] = {"kernel": self.height_embed.kernel,
                                  "bias": self.height_embed.bias}
        return hp

    def __call__(self, query, mask_features):
        return _heads_apply(self.param_tree(), query, mask_features,
                            self.predict_height)


def _bias_from_logits(m, b, q, hl, wl):
    """Level-resolution mask logits -> additive attn bias (B, Q, hl*wl).

    sigmoid(m) < 0.5 -> blocked (big negative); query rows that would block
    everything are cleared (ref mask2former_head.py:460-470, 538-539).
    """
    blocked = jax.nn.sigmoid(m) < 0.5
    blocked = blocked.reshape(b, q, hl * wl)
    all_blocked = jnp.all(blocked, axis=-1, keepdims=True)
    blocked = jnp.where(all_blocked, False, blocked)
    bias = jnp.where(blocked, _NEG, 0.0).astype(jnp.float32)
    return jax.lax.stop_gradient(bias)


def _make_attn_bias(mask_logits, target_hw):
    """mask logits (B, Q, H, W) -> additive bias (B, Q, hl*wl), detached."""
    b, q, _, _ = mask_logits.shape
    hl, wl = target_hw
    # antialias=False: the reference downsamples with F.interpolate(bilinear,
    # align_corners=False), which never antialiases (mask2former_head.py:459)
    m = jax.image.resize(mask_logits, (b, q, hl, wl), method="bilinear",
                         antialias=False)
    return _bias_from_logits(m, b, q, hl, wl)


class DecoderLayerGroup(nn.Module):
    """One scan step: decoder layers for memory levels 0..nl-1 (= layers
    3g, 3g+1, 3g+2 of the reference's flat list, level cycling i % 3).

    ``final_only``: inference mode — the per-layer full-resolution mask
    logits exist only to be RESIZED into the next layer's attention bias,
    and bilinear resize is linear while mask logits are linear in the mask
    features, so ``resize(emb @ F) == emb @ resize(F)`` exactly. The carry
    holds the mask *embedding* instead of full-res logits, each level's
    bias comes from a small einsum against pre-resized features, and no
    intermediate (B, Q, H/4, W/4) tensors are ever materialized.
    """

    dim: int
    num_heads: int
    ffn_dim: int
    hws: Tuple[Tuple[int, int], ...]
    predict_height: bool = False
    final_only: bool = False

    def setup(self):
        c = self.dim
        for lvl in range(len(self.hws)):
            setattr(self, f"lvl{lvl}_cross",
                    MultiHeadAttention(c, self.num_heads))
            setattr(self, f"lvl{lvl}_self",
                    MultiHeadAttention(c, self.num_heads))
            setattr(self, f"lvl{lvl}_norm1", LayerNormP(c))
            setattr(self, f"lvl{lvl}_norm2", LayerNormP(c))
            setattr(self, f"lvl{lvl}_norm3", LayerNormP(c))
            setattr(self, f"lvl{lvl}_ffn", FFN(c, self.ffn_dim))

    def _lvl(self, lvl: int, name: str):
        return getattr(self, f"lvl{lvl}_{name}")

    def _lvl_params(self, lvl: int) -> Dict:
        def lnp(m):
            return {"scale": m.scale, "bias": m.bias}

        return {"cross": self._lvl(lvl, "cross").param_tree(),
                "self_": self._lvl(lvl, "self").param_tree(),
                "norm1": lnp(self._lvl(lvl, "norm1")),
                "norm2": lnp(self._lvl(lvl, "norm2")),
                "norm3": lnp(self._lvl(lvl, "norm3")),
                "ffn": self._lvl(lvl, "ffn").param_tree()}

    def __call__(self, carry, mems, pes, qpos, mask_features, head_params):
        out, mask_l = carry  # mask_l: full-res logits, or mask embedding
        ys_cls, ys_mask, ys_h = [], [], []
        for lvl in range(len(self.hws)):
            hl, wl = self.hws[lvl]
            if self.final_only:
                # mask_features is the tuple of per-level resized features
                m = jnp.einsum("bqc,bhwc->bqhw", mask_l, mask_features[lvl],
                               preferred_element_type=jnp.float32)
                bias = _bias_from_logits(m, m.shape[0], m.shape[1], hl, wl)
            else:
                bias = _make_attn_bias(mask_l, (hl, wl))
            # masked cross-attention (queries attend to foreground pixels)
            y = self._lvl(lvl, "cross")(
                out + qpos, mems[lvl] + pes[lvl], mems[lvl], attn_bias=bias)
            out = self._lvl(lvl, "norm1")(out + y)
            # self-attention among queries
            y = self._lvl(lvl, "self")(out + qpos, out + qpos, out)
            out = self._lvl(lvl, "norm2")(out + y)
            y = self._lvl(lvl, "ffn")(out)
            out = self._lvl(lvl, "norm3")(out + y)

            if self.final_only:
                _, mask_l = _mask_embed(head_params, out)
                continue
            cls_l, mask_l, h_l = _heads_apply(
                head_params, out, mask_features, self.predict_height)
            ys_cls.append(cls_l)
            ys_mask.append(mask_l)
            ys_h.append(h_l)
        if self.final_only:
            return (out, mask_l), None
        ys = (jnp.stack(ys_cls), jnp.stack(ys_mask))
        if self.predict_height:
            ys = ys + (jnp.stack(ys_h),)
        return (out, mask_l), ys


class Mask2FormerDecoder(nn.Module):
    """Queries x 3-level memories -> per-layer (cls, mask[, height]) logits."""

    num_queries: int = 45
    num_classes: int = 1
    num_layers: int = 9
    feat_channels: int = 256
    out_channels: int = 256
    num_heads: int = 8
    ffn_dim: int = 2048
    predict_height: bool = False
    num_height_bins: int = 12
    # scan the layer triples (3x less decoder tracing/compile); falls back
    # to the unrolled python loop when num_layers isn't a multiple of the
    # level count (different param tree: layer{i}_* vs layers/lvl{l}_*)
    scan_layers: bool = True
    # whole-stack fused Pallas kernel on the final_only inference path: all
    # num_layers layers in ONE kernel, queries VMEM-resident throughout
    # (the XLA head runs ~30 tiny ops per layer and sits ~25x above its
    # FLOP floor); requires the scan param layout
    use_pallas: bool = False
    pallas_interpret: bool = False

    @nn.compact
    def __call__(self, mask_features, memories: Sequence[jax.Array],
                 train: bool = True, final_only: bool = False
                 ) -> DecoderOutputs:
        """``final_only=True`` (inference): return ONLY the final head pass
        (stacked with leading axis 1, so callers' ``[-1]`` still works);
        intermediate layers compute their attention biases from pre-resized
        mask features (exact — see ``DecoderLayerGroup``), skipping 9
        full-resolution mask einsums, their HBM round trips, and the
        per-layer cls/height heads."""
        c = self.feat_channels
        b = mask_features.shape[0]
        nl = len(memories)  # 3

        query_feat = self.param(
            "query_feat", nn.initializers.normal(1.0), (self.num_queries, c))
        query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0), (self.num_queries, c))
        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (nl, c))

        # flatten NHWC memories + precompute static sine PEs
        mems, pes, hws = [], [], []
        for i, mem in enumerate(memories):
            _, hl, wl, mc = mem.shape
            hws.append((hl, wl))
            flat = mem.reshape(b, hl * wl, mc)
            mems.append(flat + level_embed[i][None, None])
            pes.append(
                sine_positional_encoding_2d(hl, wl, num_feats=c // 2)
                .astype(mem.dtype)[None]
            )

        heads = MaskHeads(
            self.num_classes, c, self.out_channels,
            self.predict_height, self.num_height_bins, name="heads",
        )

        out = jnp.broadcast_to(query_feat[None], (b, self.num_queries, c))
        qpos = query_embed[None]

        if final_only:
            # per-level resized mask features (f32: the bias threshold is
            # taken on f32 logits, like the reference's resized logits)
            f32feat = mask_features.astype(jnp.float32)
            feats_r = tuple(
                jax.image.resize(f32feat, (b, hl, wl, f32feat.shape[-1]),
                                 method="bilinear", antialias=False)
                for (hl, wl) in hws)
            _, emb_0 = _mask_embed(heads.param_tree(), out)
            carry0 = (out, emb_0)
        else:
            cls_0, mask_0, height_0 = heads(out, mask_features)
            carry0 = (out, mask_0)

        if self.scan_layers and self.num_layers % nl == 0:
            groups = self.num_layers // nl
            fuse_stack = (self.use_pallas and final_only
                          and not self.is_initializing()
                          and (self.pallas_interpret
                               or jax.default_backend() == "tpu"))
            if fuse_stack:
                from mask_bev_tpu.ops.pallas_decoder_stack import (
                    fused_decoder_stack)

                lt = self.variables["params"]["layers"]
                lvl_trees = [
                    {"cross": lt[f"lvl{l}_cross"],
                     "self_": lt[f"lvl{l}_self"],
                     "norm1": lt[f"lvl{l}_norm1"],
                     "norm2": lt[f"lvl{l}_norm2"],
                     "norm3": lt[f"lvl{l}_norm3"],
                     "ffn": lt[f"lvl{l}_ffn"]}
                    for l in range(nl)]
                out_f = fused_decoder_stack(
                    carry0[0], carry0[1], query_embed,
                    [m for m in mems], [p[0] for p in pes],
                    [f.reshape(b, hl * wl, -1)
                     for f, (hl, wl) in zip(feats_r, hws)],
                    lvl_trees, heads.param_tree(),
                    num_heads=self.num_heads, num_groups=groups,
                    interpret=self.pallas_interpret)
                cls_f, mask_f, h_f = heads(out_f, mask_features)
                return DecoderOutputs(
                    cls_f[None], mask_f[None],
                    h_f[None] if self.predict_height else None)
            scanned = nn.scan(
                DecoderLayerGroup,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=nn.broadcast,
                out_axes=0,
                length=groups,
            )(dim=c, num_heads=self.num_heads, ffn_dim=self.ffn_dim,
              hws=tuple(hws), predict_height=self.predict_height,
              final_only=final_only, name="layers")
            (out_f, _), ys = scanned(
                carry0, tuple(mems), tuple(pes), qpos,
                feats_r if final_only else mask_features,
                heads.param_tree())
            if final_only:
                cls_f, mask_f, h_f = heads(out_f, mask_features)
                return DecoderOutputs(
                    cls_f[None], mask_f[None],
                    h_f[None] if self.predict_height else None)
            # (G, nl, ...) -> (L, ...), layer index = 3g + lvl
            cls_s = ys[0].reshape((self.num_layers,) + ys[0].shape[2:])
            mask_s = ys[1].reshape((self.num_layers,) + ys[1].shape[2:])
            cls_all = jnp.concatenate([cls_0[None], cls_s])
            mask_all = jnp.concatenate([mask_0[None], mask_s])
            if self.predict_height:
                h_s = ys[2].reshape((self.num_layers,) + ys[2].shape[2:])
                height_all = jnp.concatenate([height_0[None], h_s])
            return DecoderOutputs(cls_all, mask_all,
                                  height_all if self.predict_height else None)

        if final_only:
            out, emb_l = carry0
            for i in range(self.num_layers):
                lvl = i % nl
                hl, wl = hws[lvl]
                m = jnp.einsum("bqc,bhwc->bqhw", emb_l, feats_r[lvl],
                               preferred_element_type=jnp.float32)
                bias = _bias_from_logits(m, b, self.num_queries, hl, wl)
                y = MultiHeadAttention(
                    c, self.num_heads, name=f"layer{i}_cross")(
                    out + qpos, mems[lvl] + pes[lvl], mems[lvl],
                    attn_bias=bias)
                out = nn.LayerNorm(name=f"layer{i}_norm1")(out + y)
                y = MultiHeadAttention(
                    c, self.num_heads, name=f"layer{i}_self")(
                    out + qpos, out + qpos, out)
                out = nn.LayerNorm(name=f"layer{i}_norm2")(out + y)
                y = FFN(c, self.ffn_dim, name=f"layer{i}_ffn")(out)
                out = nn.LayerNorm(name=f"layer{i}_norm3")(out + y)
                if i < self.num_layers - 1:
                    _, emb_l = _mask_embed(heads.param_tree(), out)
            cls_f, mask_f, h_f = heads(out, mask_features)
            return DecoderOutputs(
                cls_f[None], mask_f[None],
                h_f[None] if self.predict_height else None)

        cls_list, mask_list, height_list = [cls_0], [mask_0], [height_0]
        mask_l = mask_0
        for i in range(self.num_layers):
            lvl = i % nl
            bias = _make_attn_bias(mask_l, hws[lvl])
            # masked cross-attention (queries attend to foreground pixels)
            y = MultiHeadAttention(c, self.num_heads, name=f"layer{i}_cross")(
                out + qpos, mems[lvl] + pes[lvl], mems[lvl], attn_bias=bias)
            out = nn.LayerNorm(name=f"layer{i}_norm1")(out + y)
            # self-attention among queries
            y = MultiHeadAttention(c, self.num_heads, name=f"layer{i}_self")(
                out + qpos, out + qpos, out)
            out = nn.LayerNorm(name=f"layer{i}_norm2")(out + y)
            y = FFN(c, self.ffn_dim, name=f"layer{i}_ffn")(out)
            out = nn.LayerNorm(name=f"layer{i}_norm3")(out + y)

            cls_l, mask_l, height_l = heads(out, mask_features)
            cls_list.append(cls_l)
            mask_list.append(mask_l)
            height_list.append(height_l)

        return DecoderOutputs(
            cls_logits=jnp.stack(cls_list),
            mask_logits=jnp.stack(mask_list),
            height_logits=(jnp.stack(height_list) if self.predict_height
                           else None),
        )
