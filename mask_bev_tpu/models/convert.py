"""Torch Swin checkpoint -> flax params conversion.

Parity with the reference's pretrained-checkpoint loading
(``swin.py:674-743``): consume an mmdet/mmcls-style Swin ``state_dict``
(numpy arrays; call ``torch.load`` + ``.numpy()`` upstream), remap to this
framework's parameter tree, and bicubically resize relative-position bias
tables (and the absolute position embedding) when window/grid sizes differ.

Only the backbone is convertible — the reference likewise only loads
pretrained weights into Swin.
"""
from __future__ import annotations

import re
from typing import Dict

import numpy as np


def _resize_bias_table(table: np.ndarray, target_len: int) -> np.ndarray:
    """((2w-1)², H) -> ((2w'-1)², H) bicubic resize (ref swin.py:714-739)."""
    if table.shape[0] == target_len:
        return table
    src = int(round(np.sqrt(table.shape[0])))
    dst = int(round(np.sqrt(target_len)))
    heads = table.shape[1]
    img = table.reshape(src, src, heads)
    try:
        import jax

        out = np.asarray(jax.image.resize(img, (dst, dst, heads), "bicubic"))
    except Exception:
        from scipy import ndimage

        zoom = (dst / src, dst / src, 1)
        out = ndimage.zoom(img, zoom, order=3)
    return out.reshape(dst * dst, heads)


def convert_torch_swin(state_dict: Dict[str, np.ndarray],
                       flax_params: Dict, prefix: str = "backbone"
                       ) -> Dict:
    """Overwrite matching entries of ``flax_params[prefix]`` in place.

    Accepts both mmdet checkpoints (keys like ``stages.0.blocks.1.attn.
    w_msa.qkv.weight``) and the original microsoft release
    (``layers.0.blocks.1.attn.qkv.weight``).
    """
    import copy

    params = copy.deepcopy(dict(flax_params))
    bb = params[prefix] = dict(params[prefix])

    def put(dst_path, value):
        node = bb
        for k in dst_path[:-1]:
            node[k] = dict(node[k])
            node = node[k]
        want = np.asarray(node[dst_path[-1]]).shape
        value = np.asarray(value)
        if "rel_pos_bias_table" in dst_path[-1] and value.shape != want:
            value = _resize_bias_table(value, want[0])
        if dst_path[-1] == "absolute_pos_embed" and value.shape != want:
            # torch stores (1, L, C); ours is (H, W, C)
            if value.ndim == 3 and value.shape[0] == 1:
                src = int(round(np.sqrt(value.shape[1])))
                value = value.reshape(src, src, value.shape[2])
            try:
                import jax

                value = np.asarray(jax.image.resize(value, want, "bicubic"))
            except Exception:
                pass
        assert value.shape == want, (dst_path, value.shape, want)
        node[dst_path[-1]] = value.astype(np.float32)

    # mmdet's PatchMerging samples with nn.Unfold: 4C channels ordered
    # channel-major with positions (0,0),(0,1),(1,0),(1,1) inside each
    # channel. This framework (like the original microsoft release)
    # concatenates position-major [x(0,0), x(1,0), x(0,1), x(1,1)] x C.
    # Detect the flavor BEFORE key canonicalization and permute merge
    # weights accordingly (verified by activation parity tests against
    # torch re-expressions of both flavors, tests/test_torch_parity.py).
    is_mmdet = any(("w_msa" in k) or k.split("backbone.")[-1].startswith("stages.")
                   for k in state_dict)

    def _merge_perm(four_c: int) -> np.ndarray:
        c = four_c // 4
        ours_pos = [(0, 0), (1, 0), (0, 1), (1, 1)]
        mmdet_pos = [(0, 0), (0, 1), (1, 0), (1, 1)]
        perm = np.empty(four_c, np.int64)
        for j in range(four_c):
            pos, ch = ours_pos[j // c], j % c
            perm[j] = ch * 4 + mmdet_pos.index(pos)
        return perm

    def norm(k: str) -> str:
        k = k.replace("backbone.", "")
        # microsoft 'layers.N' -> 'stages.N' — anchored, so mmdet's
        # 'ffn.layers.0.0.weight' block keys are NOT mangled
        k = re.sub(r"^layers\.", "stages.", k)
        return k.replace("attn.w_msa.", "attn.")

    sd = {norm(k): np.asarray(v) for k, v in state_dict.items()}

    for key, v in sd.items():
        # patch embed
        if key in ("patch_embed.projection.weight", "patch_embed.proj.weight"):
            put(["patch_embed", "kernel"], v.transpose(2, 3, 1, 0))
        elif key in ("patch_embed.projection.bias", "patch_embed.proj.bias"):
            put(["patch_embed", "bias"], v)
        elif key in ("patch_embed.norm.weight",):
            put(["patch_norm", "scale"], v)
        elif key in ("patch_embed.norm.bias",):
            put(["patch_norm", "bias"], v)
        elif key == "absolute_pos_embed":
            put(["absolute_pos_embed"], v)
        # stage blocks
        elif m := re.match(r"stages\.(\d+)\.blocks\.(\d+)\.(.+)", key):
            i, d, rest = int(m.group(1)), int(m.group(2)), m.group(3)
            blk = f"stage{i}_block{d}"
            if blk not in bb:
                continue
            if rest == "norm1.weight":
                put([blk, "norm1", "scale"], v)
            elif rest == "norm1.bias":
                put([blk, "norm1", "bias"], v)
            elif rest == "norm2.weight":
                put([blk, "norm2", "scale"], v)
            elif rest == "norm2.bias":
                put([blk, "norm2", "bias"], v)
            elif rest == "attn.relative_position_bias_table":
                put([blk, "attn", "w_msa", "rel_pos_bias_table"], v)
            elif rest == "attn.qkv.weight":
                put([blk, "attn", "w_msa", "qkv", "kernel"], v.T)
            elif rest == "attn.qkv.bias":
                put([blk, "attn", "w_msa", "qkv", "bias"], v)
            elif rest == "attn.proj.weight":
                put([blk, "attn", "w_msa", "proj", "kernel"], v.T)
            elif rest == "attn.proj.bias":
                put([blk, "attn", "w_msa", "proj", "bias"], v)
            elif rest in ("ffn.layers.0.0.weight", "mlp.fc1.weight"):
                put([blk, "ffn_1", "kernel"], v.T)
            elif rest in ("ffn.layers.0.0.bias", "mlp.fc1.bias"):
                put([blk, "ffn_1", "bias"], v)
            elif rest in ("ffn.layers.1.weight", "mlp.fc2.weight"):
                put([blk, "ffn_2", "kernel"], v.T)
            elif rest in ("ffn.layers.1.bias", "mlp.fc2.bias"):
                put([blk, "ffn_2", "bias"], v)
        # patch merging
        elif m := re.match(r"stages\.(\d+)\.downsample\.(.+)", key):
            i, rest = int(m.group(1)), m.group(2)
            mg = f"merge{i}"
            if mg not in bb:
                continue
            if rest == "norm.weight":
                put([mg, "norm", "scale"],
                    v[_merge_perm(v.shape[0])] if is_mmdet else v)
            elif rest == "norm.bias":
                put([mg, "norm", "bias"],
                    v[_merge_perm(v.shape[0])] if is_mmdet else v)
            elif rest == "reduction.weight":
                # torch Linear weight (out, in): permute the 4C input dim
                vt = v[:, _merge_perm(v.shape[1])] if is_mmdet else v
                put([mg, "reduction", "kernel"], vt.T)
        # output norms (mmdet: norm0..norm3)
        elif m := re.match(r"norm(\d+)\.(weight|bias)", key):
            i, wb = int(m.group(1)), m.group(2)
            name = f"out_norm{i}"
            if name in bb:
                put([name, "scale" if wb == "weight" else "bias"], v)
    return params
