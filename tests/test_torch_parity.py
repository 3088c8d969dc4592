"""Activation parity: flax Swin + converter vs torch re-expressions.

The converter (``models/convert.py``) claims compatibility with mmdet-style
and microsoft-style Swin checkpoints. Here both flavors are re-expressed in
torch with their canonical idioms (mmdet: Unfold-based PatchMerging,
channel-major 4C ordering; microsoft: position-major concat), random-init
weights are exported as state_dicts, converted, and the full forward
activations are compared. This resolves the patch-merging channel-order
question flagged in round 1 by construction (ref ``swin.py:674-743``).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from mask_bev_tpu.models.convert import convert_torch_swin  # noqa: E402
from mask_bev_tpu.models.swin import SwinTransformer  # noqa: E402

DIM, HEADS, WINDOW, DEPTHS = 16, (2, 4), 3, (2, 2)


def _rel_index(w):
    coords = torch.stack(torch.meshgrid(
        torch.arange(w), torch.arange(w), indexing="ij")).flatten(1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += w - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    return rel.sum(-1)


class TWindowMSA(tnn.Module):
    def __init__(self, dim, heads, window):
        super().__init__()
        self.h, self.window = heads, window
        self.scale = (dim // heads) ** -0.5
        self.qkv = tnn.Linear(dim, 3 * dim)
        self.proj = tnn.Linear(dim, dim)
        self.relative_position_bias_table = tnn.Parameter(
            torch.randn((2 * window - 1) ** 2, heads) * 0.02)
        self.register_buffer("rpi", _rel_index(window))

    def forward(self, x, mask=None):
        b_, n, c = x.shape
        qkv = self.qkv(x).reshape(b_, n, 3, self.h, c // self.h).permute(
            2, 0, 3, 1, 4)
        q, k, v = qkv[0] * self.scale, qkv[1], qkv[2]
        attn = q @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[self.rpi.view(-1)].view(
            n, n, self.h).permute(2, 0, 1)
        attn = attn + bias.unsqueeze(0)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(b_ // nw, nw, self.h, n, n) + mask[None, :, None]
            attn = attn.view(b_, self.h, n, n)
        attn = attn.softmax(-1)
        x = (attn @ v).transpose(1, 2).reshape(b_, n, c)
        return self.proj(x)


class TBlock(tnn.Module):
    def __init__(self, dim, heads, window, shift):
        super().__init__()
        self.window, self.shift = window, (window // 2 if shift else 0)
        self.norm1 = tnn.LayerNorm(dim)
        self.attn = TWindowMSA(dim, heads, window)
        self.norm2 = tnn.LayerNorm(dim)
        self.fc1 = tnn.Linear(dim, 4 * dim)
        self.fc2 = tnn.Linear(4 * dim, dim)

    def forward(self, x, hw):
        h, w = hw
        b, _, c = x.shape
        win = self.window
        shortcut = x
        y = self.norm1(x).view(b, h, w, c)
        hp = -(-h // win) * win
        wp = -(-w // win) * win
        y = torch.nn.functional.pad(y, (0, 0, 0, wp - w, 0, hp - h))
        s = 0 if min(hp, wp) == win else self.shift
        if s:
            y = torch.roll(y, (-s, -s), dims=(1, 2))
            img = torch.zeros(hp, wp)
            cnt = 0
            for hs in (slice(0, -win), slice(-win, -s), slice(-s, None)):
                for ws in (slice(0, -win), slice(-win, -s), slice(-s, None)):
                    img[hs, ws] = cnt
                    cnt += 1
            mw = img.view(hp // win, win, wp // win, win).permute(
                0, 2, 1, 3).reshape(-1, win * win)
            mask = torch.where(mw[:, None, :] != mw[:, :, None],
                               torch.tensor(-100.0), torch.tensor(0.0))
        else:
            mask = None
        yw = y.view(b, hp // win, win, wp // win, win, c).permute(
            0, 1, 3, 2, 4, 5).reshape(-1, win * win, c)
        yw = self.attn(yw, mask)
        y = yw.view(b, hp // win, wp // win, win, win, c).permute(
            0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
        if s:
            y = torch.roll(y, (s, s), dims=(1, 2))
        y = y[:, :h, :w].reshape(b, h * w, c)
        x = shortcut + y
        y = self.norm2(x)
        y = self.fc2(torch.nn.functional.gelu(self.fc1(y)))
        return x + y


class TPatchMerging(tnn.Module):
    def __init__(self, dim, flavor):
        super().__init__()
        self.flavor = flavor
        self.norm = tnn.LayerNorm(4 * dim)
        self.reduction = tnn.Linear(4 * dim, 2 * dim, bias=False)

    def forward(self, x, hw):
        h, w = hw
        b, _, c = x.shape
        x = x.view(b, h, w, c)
        if self.flavor == "mmdet":
            # nn.Unfold(k=2, s=2): channel-major, positions row-major
            xc = x.permute(0, 3, 1, 2)  # (B, C, H, W)
            xc = torch.nn.functional.unfold(xc, 2, stride=2)  # (B, 4C, L)
            x = xc.transpose(1, 2)  # (B, L, 4C)
        else:  # microsoft: position-major concat
            x0 = x[:, 0::2, 0::2]
            x1 = x[:, 1::2, 0::2]
            x2 = x[:, 0::2, 1::2]
            x3 = x[:, 1::2, 1::2]
            x = torch.cat([x0, x1, x2, x3], -1).view(b, -1, 4 * c)
        return self.reduction(self.norm(x)), (h // 2, w // 2)


class TSwin(tnn.Module):
    def __init__(self, flavor):
        super().__init__()
        self.flavor = flavor
        self.proj = tnn.Conv2d(3, DIM, 4, stride=4)
        self.pnorm = tnn.LayerNorm(DIM)
        self.blocks0 = tnn.ModuleList(
            [TBlock(DIM, HEADS[0], WINDOW, d % 2 == 1) for d in range(DEPTHS[0])])
        self.merge0 = TPatchMerging(DIM, flavor)
        self.blocks1 = tnn.ModuleList(
            [TBlock(2 * DIM, HEADS[1], WINDOW, d % 2 == 1) for d in range(DEPTHS[1])])
        self.out0 = tnn.LayerNorm(DIM)
        self.out1 = tnn.LayerNorm(2 * DIM)

    def forward(self, img):  # (B, 3, H, W)
        x = self.proj(img)
        b, c, gh, gw = x.shape
        x = x.flatten(2).transpose(1, 2)
        x = self.pnorm(x)
        hw = (gh, gw)
        for blk in self.blocks0:
            x = blk(x, hw)
        o0 = self.out0(x).view(b, *hw, DIM)
        x, hw = self.merge0(x, hw)
        for blk in self.blocks1:
            x = blk(x, hw)
        o1 = self.out1(x).view(b, *hw, 2 * DIM)
        return o0, o1

    def export_state_dict(self):
        out = {}
        pe = "patch_embed.projection" if self.flavor == "mmdet" else "patch_embed.proj"
        out[f"{pe}.weight"] = self.proj.weight.detach().numpy()
        out[f"{pe}.bias"] = self.proj.bias.detach().numpy()
        out["patch_embed.norm.weight"] = self.pnorm.weight.detach().numpy()
        out["patch_embed.norm.bias"] = self.pnorm.bias.detach().numpy()
        stage = "stages" if self.flavor == "mmdet" else "layers"
        attn = "attn.w_msa" if self.flavor == "mmdet" else "attn"
        for i, blocks in enumerate([self.blocks0, self.blocks1]):
            for d, blk in enumerate(blocks):
                p = f"{stage}.{i}.blocks.{d}"
                out[f"{p}.norm1.weight"] = blk.norm1.weight.detach().numpy()
                out[f"{p}.norm1.bias"] = blk.norm1.bias.detach().numpy()
                out[f"{p}.norm2.weight"] = blk.norm2.weight.detach().numpy()
                out[f"{p}.norm2.bias"] = blk.norm2.bias.detach().numpy()
                out[f"{p}.{attn}.relative_position_bias_table"] = (
                    blk.attn.relative_position_bias_table.detach().numpy())
                out[f"{p}.{attn}.qkv.weight"] = blk.attn.qkv.weight.detach().numpy()
                out[f"{p}.{attn}.qkv.bias"] = blk.attn.qkv.bias.detach().numpy()
                out[f"{p}.{attn}.proj.weight"] = blk.attn.proj.weight.detach().numpy()
                out[f"{p}.{attn}.proj.bias"] = blk.attn.proj.bias.detach().numpy()
                if self.flavor == "mmdet":
                    out[f"{p}.ffn.layers.0.0.weight"] = blk.fc1.weight.detach().numpy()
                    out[f"{p}.ffn.layers.0.0.bias"] = blk.fc1.bias.detach().numpy()
                    out[f"{p}.ffn.layers.1.weight"] = blk.fc2.weight.detach().numpy()
                    out[f"{p}.ffn.layers.1.bias"] = blk.fc2.bias.detach().numpy()
                else:
                    out[f"{p}.mlp.fc1.weight"] = blk.fc1.weight.detach().numpy()
                    out[f"{p}.mlp.fc1.bias"] = blk.fc1.bias.detach().numpy()
                    out[f"{p}.mlp.fc2.weight"] = blk.fc2.weight.detach().numpy()
                    out[f"{p}.mlp.fc2.bias"] = blk.fc2.bias.detach().numpy()
        out[f"{stage}.0.downsample.norm.weight"] = self.merge0.norm.weight.detach().numpy()
        out[f"{stage}.0.downsample.norm.bias"] = self.merge0.norm.bias.detach().numpy()
        out[f"{stage}.0.downsample.reduction.weight"] = (
            self.merge0.reduction.weight.detach().numpy())
        out["norm0.weight"] = self.out0.weight.detach().numpy()
        out["norm0.bias"] = self.out0.bias.detach().numpy()
        out["norm1.weight"] = self.out1.weight.detach().numpy()
        out["norm1.bias"] = self.out1.bias.detach().numpy()
        return out


@pytest.mark.parametrize("flavor", ["mmdet", "microsoft"])
def test_swin_activations_match_torch(flavor):
    import jax
    import jax.numpy as jnp

    torch.manual_seed(0)
    tm = TSwin(flavor).eval()
    img = torch.randn(2, 3, 24, 24)
    with torch.no_grad():
        t0, t1 = tm(img)

    # use_pallas=False: parity is defined against the XLA path; the fused
    # kernel cannot lower on the CPU-pinned device anyway
    fm = SwinTransformer(
        embed_dim=DIM, depths=DEPTHS, num_heads=HEADS, window=WINDOW,
        patch_size=4, out_indices=(0, 1), use_pallas=False)
    x = jnp.asarray(img.permute(0, 2, 3, 1).numpy())  # NHWC
    # pin to CPU: a force-registered TPU backend would run f32 matmuls
    # through bf16 passes, far outside the parity tolerances
    with jax.default_device(jax.devices("cpu")[0]):
        variables = fm.init(jax.random.PRNGKey(0), x, train=False)
        converted = convert_torch_swin(
            tm.export_state_dict(), {"backbone": variables["params"]})
        outs = fm.apply({"params": converted["backbone"]}, x, train=False)
        outs = [np.asarray(o) for o in outs]

    np.testing.assert_allclose(
        np.asarray(outs[0]), t0.numpy(), rtol=2e-3, atol=1e-4,
        err_msg=f"stage0 mismatch ({flavor})")
    np.testing.assert_allclose(
        np.asarray(outs[1]), t1.numpy(), rtol=2e-3, atol=2e-4,
        err_msg=f"stage1 mismatch ({flavor})")
