"""Torch checkpoint -> flax params conversion.

Two entry points:

* :func:`convert_torch_swin` — parity with the reference's pretrained-
  checkpoint loading (``swin.py:674-743``): consume an mmdet/mmcls-style
  Swin ``state_dict`` (numpy arrays; call ``torch.load`` + ``.numpy()``
  upstream), remap to this framework's parameter tree, and bicubically
  resize relative-position bias tables (and the absolute position
  embedding) when window/grid sizes differ.

* :func:`convert_torch_maskbev` — a FULL reference ``MaskBevModule``
  checkpoint (reference ``mask_bev_module.py:34-100``): PFN linears +
  BatchNorms (``_encoder._voxel_encoder.pfn_layers.*``), the pseudo-image
  LayerNorm (``_encoder._layer_norm``), the Swin backbone
  (``_backbone._backbone.*``), and the Mask2Former query decoder + heads
  (``_panoptic_head._panoptic_head.*``, mmdet naming: packed
  ``in_proj_weight`` MultiheadAttention, ``norms.{0,1,2}``,
  ``ffn.layers.0.0``/``ffn.layers.1``, ``transformer_decoder.post_norm``,
  ``query_feat/query_embed/level_embed`` Embeddings, ``cls_embed``,
  ``mask_embed.{0,2,4}``, optional ``height_embed``). The MSDeformAttn
  pixel decoder is a documented architectural deviation (conv-FPN here,
  SURVEY §2.2 N4) and has no weight mapping — its params keep their flax
  initialization.
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

    def put(dst_path, value, g=None):
        """Write a leaf; ``g`` indexes the stacked leading axis of an
        nn.scan'd stage (``stage{i}_pairs`` layout)."""
        node = bb
        for k in dst_path[:-1]:
            node[k] = dict(node[k])
            node = node[k]
        cur = np.asarray(node[dst_path[-1]])
        want = cur.shape if g is None else cur.shape[1:]
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
        assert value.shape == want, (dst_path, value.shape, want, g)
        if g is None:
            node[dst_path[-1]] = value.astype(np.float32)
        else:
            arr = np.array(cur, dtype=np.float32)
            arr[g] = value
            node[dst_path[-1]] = arr

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
        # stage blocks (flat layer{d} names, or nn.scan'd stage{i}_pairs
        # with (block d) -> (group d//2, child block{d%2}) stacked layout)
        elif m := re.match(r"stages\.(\d+)\.blocks\.(\d+)\.(.+)", key):
            i, d, rest = int(m.group(1)), int(m.group(2)), m.group(3)
            if f"stage{i}_block{d}" in bb:
                pre, g = [f"stage{i}_block{d}"], None
            elif f"stage{i}_pairs" in bb:
                pre, g = [f"stage{i}_pairs", f"block{d % 2}"], d // 2
            else:
                continue
            if rest == "norm1.weight":
                put(pre + ["norm1", "scale"], v, g)
            elif rest == "norm1.bias":
                put(pre + ["norm1", "bias"], v, g)
            elif rest == "norm2.weight":
                put(pre + ["norm2", "scale"], v, g)
            elif rest == "norm2.bias":
                put(pre + ["norm2", "bias"], v, g)
            elif rest == "attn.relative_position_bias_table":
                put(pre + ["attn", "w_msa", "rel_pos_bias_table"], v, g)
            elif rest == "attn.qkv.weight":
                put(pre + ["attn", "w_msa", "qkv", "kernel"], v.T, g)
            elif rest == "attn.qkv.bias":
                put(pre + ["attn", "w_msa", "qkv", "bias"], v, g)
            elif rest == "attn.proj.weight":
                put(pre + ["attn", "w_msa", "proj", "kernel"], v.T, g)
            elif rest == "attn.proj.bias":
                put(pre + ["attn", "w_msa", "proj", "bias"], v, g)
            elif rest in ("ffn.layers.0.0.weight", "mlp.fc1.weight"):
                put(pre + ["ffn_1", "kernel"], v.T, g)
            elif rest in ("ffn.layers.0.0.bias", "mlp.fc1.bias"):
                put(pre + ["ffn_1", "bias"], v, g)
            elif rest in ("ffn.layers.1.weight", "mlp.fc2.weight"):
                put(pre + ["ffn_2", "kernel"], v.T, g)
            elif rest in ("ffn.layers.1.bias", "mlp.fc2.bias"):
                put(pre + ["ffn_2", "bias"], v, g)
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


def _as_mutable(tree):
    return ({k: _as_mutable(v) for k, v in tree.items()}
            if isinstance(tree, dict) or hasattr(tree, "items") else tree)


def convert_torch_maskbev(state_dict: Dict[str, np.ndarray],
                          variables: Dict) -> Dict:
    """Reference ``MaskBevModule`` state_dict -> MaskBev flax variables.

    ``variables`` is the full ``{"params": ..., "batch_stats": ...}`` tree
    from ``MaskBev.init``; a converted deep copy is returned. Keys the
    architecture deliberately lacks (pixel decoder) are skipped; every
    consumed key is shape-checked against the flax tree.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params = _as_mutable(variables["params"])
    batch_stats = _as_mutable(variables.get("batch_stats", {}))
    out = dict(variables)
    out["params"] = params
    if batch_stats:
        out["batch_stats"] = batch_stats

    def put(tree, path, value, transform=None):
        node = tree
        for k in path[:-1]:
            node = node[k]
        if transform:
            value = transform(value)
        want = np.asarray(node[path[-1]]).shape
        assert value.shape == want, (path, value.shape, want)
        node[path[-1]] = value.astype(np.float32)

    # --- encoder: PFN layers + pseudo-image LayerNorm ---
    # reference: mmdet3d PillarFeatureNet PFNLayer = Linear(bias=False) +
    # BatchNorm1d (mask_bev_encoders.py:70); LayerNorm([C, H, W], eps=1e-3)
    # stored (C, H, W) -> ours (H, W, C) (mask_bev_encoders.py:75)
    for key, v in sd.items():
        if m := re.match(
                r"_encoder\._voxel_encoder\.pfn_layers\.(\d+)\.(.+)", key):
            i, rest = int(m.group(1)), m.group(2)
            base = ["encoder", "pillar_feature_net", f"pfn_{i}"]
            if rest == "linear.weight":
                put(params, base + ["linear", "kernel"], v.T)
            elif rest == "norm.weight":
                put(params, base + ["norm", "scale"], v)
            elif rest == "norm.bias":
                put(params, base + ["norm", "bias"], v)
            elif rest == "norm.running_mean":
                put(batch_stats, base + ["norm", "mean"], v)
            elif rest == "norm.running_var":
                put(batch_stats, base + ["norm", "var"], v)
        elif key == "_encoder._layer_norm.weight":
            put(params, ["encoder", "norm", "scale"], v.transpose(1, 2, 0))
        elif key == "_encoder._layer_norm.bias":
            put(params, ["encoder", "norm", "bias"], v.transpose(1, 2, 0))

    # --- backbone: delegate to the Swin converter ---
    swin_sd = {k[len("_backbone._backbone."):]: v for k, v in sd.items()
               if k.startswith("_backbone._backbone.")}
    if swin_sd:
        converted = convert_torch_swin(swin_sd, {"backbone": params["backbone"]})
        params["backbone"] = converted["backbone"]

    # --- decoder + per-layer heads ---
    hp = "_panoptic_head._panoptic_head."
    dec = params.get("decoder", {})
    # scanned decoder (default): layer params live under decoder/layers/
    # lvl{l}_* with a stacked leading group axis (layer i = group i//3,
    # level i%3); the unscanned fallback keeps flat layer{i}_* names
    scanned = "layers" in dec

    def dput(path, v, transform=None):
        put(params, ["decoder"] + path, v, transform)

    def lput(i, kind, leaf_path, v):
        """Write torch decoder-layer i's param; handles both layouts."""
        if not scanned:
            node = params["decoder"][f"layer{i}_{kind}"]
            for k in leaf_path[:-1]:
                node = node[k]
            want = np.asarray(node[leaf_path[-1]]).shape
            assert v.shape == want, (i, kind, leaf_path, v.shape, want)
            node[leaf_path[-1]] = v.astype(np.float32)
            return
        g, lvl = divmod(i, 3)
        node = params["decoder"]["layers"][f"lvl{lvl}_{kind}"]
        for k in leaf_path[:-1]:
            node = node[k]
        arr = np.array(node[leaf_path[-1]], dtype=np.float32)
        assert v.shape == arr.shape[1:], (i, kind, leaf_path, v.shape,
                                          arr.shape)
        arr[g] = v
        node[leaf_path[-1]] = arr

    for key, v in sd.items():
        if not key.startswith(hp):
            continue
        k = key[len(hp):]
        if k == "query_feat.weight":
            dput(["query_feat"], v)
        elif k == "query_embed.weight":
            dput(["query_embed"], v)
        elif k == "level_embed.weight":
            dput(["level_embed"], v)
        elif k == "transformer_decoder.post_norm.weight":
            dput(["heads", "decoder_norm", "scale"], v)
        elif k == "transformer_decoder.post_norm.bias":
            dput(["heads", "decoder_norm", "bias"], v)
        elif k == "cls_embed.weight":
            dput(["heads", "cls_embed", "kernel"], v.T)
        elif k == "cls_embed.bias":
            dput(["heads", "cls_embed", "bias"], v)
        elif k == "height_embed.weight" and "height_embed" in dec.get("heads", {}):
            dput(["heads", "height_embed", "kernel"], v.T)
        elif k == "height_embed.bias" and "height_embed" in dec.get("heads", {}):
            dput(["heads", "height_embed", "bias"], v)
        elif m := re.match(r"mask_embed\.(\d+)\.(weight|bias)", k):
            # torch Sequential(Linear, ReLU, Linear, ReLU, Linear): 0, 2, 4
            idx = {0: "mask_mlp1", 2: "mask_mlp2", 4: "mask_mlp3"}[int(m.group(1))]
            if m.group(2) == "weight":
                dput(["heads", idx, "kernel"], v.T)
            else:
                dput(["heads", idx, "bias"], v)
        elif m := re.match(
                r"transformer_decoder\.layers\.(\d+)\.(.+)", k):
            i, rest = int(m.group(1)), m.group(2)
            for kind, ours in (("cross_attn", "cross"),
                               ("self_attn", "self")):
                c = None
                if rest == f"{kind}.attn.in_proj_weight":
                    c = v.shape[0] // 3
                    for j, nm in enumerate("qkv"):
                        lput(i, ours, [nm, "kernel"],
                             np.ascontiguousarray(v[j * c:(j + 1) * c].T))
                elif rest == f"{kind}.attn.in_proj_bias":
                    c = v.shape[0] // 3
                    for j, nm in enumerate("qkv"):
                        lput(i, ours, [nm, "bias"], v[j * c:(j + 1) * c])
                elif rest == f"{kind}.attn.out_proj.weight":
                    lput(i, ours, ["out", "kernel"],
                         np.ascontiguousarray(v.T))
                elif rest == f"{kind}.attn.out_proj.bias":
                    lput(i, ours, ["out", "bias"], v)
            # mmdet Mask2FormerTransformerDecoderLayer norm order:
            # norms.0 after cross-attn, norms.1 after self-attn, norms.2
            # after FFN (mask2former_head.py:535-556 layer call)
            if m2 := re.match(r"norms\.(\d)\.(weight|bias)", rest):
                nm = f"norm{int(m2.group(1)) + 1}"
                lput(i, nm,
                     ["scale" if m2.group(2) == "weight" else "bias"], v)
            elif rest == "ffn.layers.0.0.weight":
                lput(i, "ffn", ["fc1", "kernel"], np.ascontiguousarray(v.T))
            elif rest == "ffn.layers.0.0.bias":
                lput(i, "ffn", ["fc1", "bias"], v)
            elif rest == "ffn.layers.1.weight":
                lput(i, "ffn", ["fc2", "kernel"], np.ascontiguousarray(v.T))
            elif rest == "ffn.layers.1.bias":
                lput(i, "ffn", ["fc2", "bias"], v)
    return out
