#!/usr/bin/env python3
"""Flagship-dimension converter/activation parity spot-check (f32, CPU).

The torch-parity test suite proves the converter + Swin semantics at tiny
dims; this script re-runs the same cross-implementation comparison at the
REAL flagship dimensions, covering the dimension-dependent paths the tiny
tests cannot reach (ref swin.py:674-743 for the checkpoint-loading
semantics being mirrored):

* 500x500x128 input -> 125x125 tokens: odd-grid patch-merging padding at
  every stage boundary (125 -> 63 -> 32 -> 16);
* the mmdet Unfold channel-order permutation at 4C = 768/1536/3072;
* the nn.scan'd stage-2 stacked-parameter converter layout (depth 6);
* window-10 shift masks on a non-multiple grid (125 % 10 != 0);
* the relative-position bias-table bicubic resize at real table dims
  (window-7 checkpoint (169, heads) -> window-10 model (361, heads)),
  cross-checked against torch's own F.interpolate(mode='bicubic')
  (reference swin.py:714-739).

Run: python scripts/flagship_parity.py  (slow: f32 CPU forwards + compile;
writes measurements/r4/flagship_parity.log via tee in the session driver).
"""
from __future__ import annotations

import os
import pathlib
import sys
import time

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))

import torch  # noqa: E402
import torch.nn as tnn  # noqa: E402

from test_torch_parity import TBlock, TPatchMerging  # noqa: E402

from mask_bev_tpu.models.convert import convert_torch_swin  # noqa: E402
from mask_bev_tpu.models.swin import SwinTransformer  # noqa: E402

EMBED, DEPTHS, HEADS, WINDOW = 192, (2, 2, 6, 2), (3, 6, 12, 24), 10
IN_CHANS, GRID = 128, 500


class TPatchMergingPad(TPatchMerging):
    """mmdet PatchMerging pads odd grids bottom/right before sampling."""

    def forward(self, x, hw):
        h, w = hw
        b, _, c = x.shape
        if h % 2 or w % 2:
            x = x.view(b, h, w, c)
            x = torch.nn.functional.pad(x, (0, 0, 0, w % 2, 0, h % 2))
            h, w = h + h % 2, w + w % 2
            x = x.reshape(b, h * w, c)
        return super().forward(x, (h, w))


class TSwinFlagship(tnn.Module):
    """4-stage mmdet-flavor torch Swin re-expression at flagship dims."""

    def __init__(self):
        super().__init__()
        self.proj = tnn.Conv2d(IN_CHANS, EMBED, 4, stride=4)
        self.pnorm = tnn.LayerNorm(EMBED)
        self.stages = tnn.ModuleList()
        self.merges = tnn.ModuleList()
        self.out_norms = tnn.ModuleList()
        for i, depth in enumerate(DEPTHS):
            dim = EMBED * (2 ** i)
            self.stages.append(tnn.ModuleList(
                [TBlock(dim, HEADS[i], WINDOW, d % 2 == 1)
                 for d in range(depth)]))
            if i < len(DEPTHS) - 1:
                self.merges.append(TPatchMergingPad(dim, "mmdet"))
            self.out_norms.append(tnn.LayerNorm(dim))

    @torch.no_grad()
    def forward(self, img):  # (B, C, H, W)
        x = self.proj(img)
        b, c, gh, gw = x.shape
        x = x.flatten(2).transpose(1, 2)
        x = self.pnorm(x)
        hw = (gh, gw)
        outs = []
        for i, blocks in enumerate(self.stages):
            for blk in blocks:
                x = blk(x, hw)
            dim = EMBED * (2 ** i)
            outs.append(self.out_norms[i](x).view(b, *hw, dim))
            if i < len(self.merges):
                x, hw = self.merges[i](x, hw)
        return outs

    def export_state_dict(self):
        out = {
            "patch_embed.projection.weight": self.proj.weight.numpy(),
            "patch_embed.projection.bias": self.proj.bias.numpy(),
            "patch_embed.norm.weight": self.pnorm.weight.numpy(),
            "patch_embed.norm.bias": self.pnorm.bias.numpy(),
        }
        for i, blocks in enumerate(self.stages):
            for d, blk in enumerate(blocks):
                p = f"stages.{i}.blocks.{d}"
                out[f"{p}.norm1.weight"] = blk.norm1.weight.numpy()
                out[f"{p}.norm1.bias"] = blk.norm1.bias.numpy()
                out[f"{p}.norm2.weight"] = blk.norm2.weight.numpy()
                out[f"{p}.norm2.bias"] = blk.norm2.bias.numpy()
                a = blk.attn
                out[f"{p}.attn.w_msa.relative_position_bias_table"] = (
                    a.relative_position_bias_table.detach().numpy())
                out[f"{p}.attn.w_msa.qkv.weight"] = a.qkv.weight.detach().numpy()
                out[f"{p}.attn.w_msa.qkv.bias"] = a.qkv.bias.detach().numpy()
                out[f"{p}.attn.w_msa.proj.weight"] = a.proj.weight.detach().numpy()
                out[f"{p}.attn.w_msa.proj.bias"] = a.proj.bias.detach().numpy()
                out[f"{p}.ffn.layers.0.0.weight"] = blk.fc1.weight.detach().numpy()
                out[f"{p}.ffn.layers.0.0.bias"] = blk.fc1.bias.detach().numpy()
                out[f"{p}.ffn.layers.1.weight"] = blk.fc2.weight.detach().numpy()
                out[f"{p}.ffn.layers.1.bias"] = blk.fc2.bias.detach().numpy()
        for i, mg in enumerate(self.merges):
            p = f"stages.{i}.downsample"
            out[f"{p}.norm.weight"] = mg.norm.weight.detach().numpy()
            out[f"{p}.norm.bias"] = mg.norm.bias.detach().numpy()
            out[f"{p}.reduction.weight"] = mg.reduction.weight.detach().numpy()
        for i, n in enumerate(self.out_norms):
            out[f"norm{i}.weight"] = n.weight.detach().numpy()
            out[f"norm{i}.bias"] = n.bias.detach().numpy()
        return out


def main():
    import jax
    import jax.numpy as jnp

    cpu = jax.devices("cpu")[0]
    torch.manual_seed(0)
    tm = TSwinFlagship().eval()
    print(f"torch params: "
          f"{sum(p.numel() for p in tm.parameters()) / 1e6:.1f} M")

    img = torch.randn(1, IN_CHANS, GRID, GRID)
    t0 = time.time()
    touts = tm(img)
    print(f"torch forward: {time.time() - t0:.1f}s "
          f"shapes={[tuple(o.shape) for o in touts]}")

    fm = SwinTransformer(
        embed_dim=EMBED, depths=DEPTHS, num_heads=HEADS, window=WINDOW,
        patch_size=4, out_indices=(0, 1, 2, 3), use_pallas=False,
        use_pallas_block=False)
    x = jnp.asarray(img.permute(0, 2, 3, 1).numpy())
    with jax.default_device(cpu):
        t0 = time.time()
        variables = jax.jit(lambda: fm.init(
            jax.random.PRNGKey(0), x, train=False))()
        print(f"flax init: {time.time() - t0:.1f}s")
        converted = convert_torch_swin(
            tm.export_state_dict(), {"backbone": variables["params"]})
        t0 = time.time()
        fouts = jax.jit(lambda p, x: fm.apply(
            {"params": p["backbone"]}, x, train=False))(converted, x)
        fouts = [np.asarray(o) for o in fouts]
        print(f"flax compile+forward: {time.time() - t0:.1f}s")

    ok = True
    for i, (t, f) in enumerate(zip(touts, fouts)):
        t = t.numpy()
        scale = np.abs(t).max()
        d = np.abs(t - f).max()
        rel = d / scale
        print(f"stage{i}: shape {f.shape} max|diff|={d:.3e} "
              f"scale={scale:.3f} rel={rel:.3e}")
        ok &= rel < 2e-5
    # ------------------------------------------------------------------
    # bias-table bicubic resize at real dims: a window-7 checkpoint table
    # (169, heads) must land as a (361, heads) resized table; cross-check
    # our jax.image bicubic against torch's F.interpolate bicubic, the
    # reference's resize (ref swin.py:714-739).
    # ------------------------------------------------------------------
    sd7 = tm.export_state_dict()
    rng = np.random.default_rng(0)
    for k in list(sd7):
        if "relative_position_bias_table" in k:
            heads = sd7[k].shape[1]
            sd7[k] = rng.normal(0, 0.02, (13 * 13, heads)).astype(np.float32)
    with jax.default_device(cpu):
        conv7 = convert_torch_swin(sd7, {"backbone": variables["params"]})

    def t_resize(tab):  # torch's own bicubic (reference semantics)
        heads = tab.shape[1]
        img = torch.from_numpy(tab).reshape(13, 13, heads).permute(
            2, 0, 1)[None]
        out = torch.nn.functional.interpolate(
            img, size=(19, 19), mode="bicubic", align_corners=False)
        return out[0].permute(1, 2, 0).reshape(361, heads).numpy()

    # stage0 block0 table: flat name; stage2 rides the scanned pairs
    b0 = conv7["backbone"]["stage0_block0"]["attn"]["w_msa"][
        "rel_pos_bias_table"]
    src = sd7["stages.0.blocks.0.attn.w_msa.relative_position_bias_table"]
    ours = np.asarray(b0)
    theirs = t_resize(src)
    d = np.abs(ours - theirs).max()
    print(f"bias-table resize (169->361, heads=3): ours-vs-torch-bicubic "
          f"max|diff|={d:.3e} (table std {src.std():.3f})")
    assert ours.shape == (361, 3), ours.shape
    st2 = conv7["backbone"]["stage2_pairs"]["block1"]["attn"]["w_msa"][
        "rel_pos_bias_table"]
    print(f"scanned stage2 stacked tables: {np.asarray(st2).shape}")
    assert np.asarray(st2).shape == (3, 361, 12), np.asarray(st2).shape

    print("FLAGSHIP PARITY " + ("OK" if ok else "FAIL"))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
