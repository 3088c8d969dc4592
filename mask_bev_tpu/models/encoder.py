"""Pillar encoder: padded pillars -> BEV pseudo-image.

TPU-native rebuild of the reference encoder stack
(``mask_bev_encoders.py:21-123``): range filter + hard voxelization
(see :mod:`mask_bev_tpu.ops.voxelize`), a PointPillars-style pillar feature
net with decorated per-point features (cluster offset, pillar-center offset,
distance — ``with_distance=True`` per reference ``mask_bev_module.py:74``),
a scatter into the (C, H, W) canvas (reference uses
``mmdet3d.PointPillarsScatter``), and a LayerNorm over the full pseudo-image
(reference ``mask_bev_encoders.py:75``: ``nn.LayerNorm([C, H, W], eps=1e-3)``).

Everything operates on static-shape padded buffers with validity masks; the
whole encoder is jit/pjit-able and batch-vmapped.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mask_bev_tpu.ops.voxelize import PillarBatch, pillarize_batch
from mask_bev_tpu.models.positional import LearnableFourierPositionalEncoding


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over channel dim with a validity mask.

    Matches the reference's ``nn.BatchNorm1d(C, eps=1e-3, momentum=0.01)``
    inside mmdet3d's PFNLayer, but computes statistics only over valid
    (non-padded) pillar points, which the CUDA path got implicitly from its
    dynamic shapes.
    """

    momentum: float = 0.99  # torch momentum 0.01 == ema decay 0.99
    eps: float = 1e-3
    use_running_average: bool | None = None

    @nn.compact
    def __call__(self, x, mask, use_running_average: bool | None = None):
        # x: (..., C); mask: (...,) bool
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,)))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            m = mask[..., None].astype(x.dtype)
            count = jnp.maximum(jnp.sum(m), 1.0)
            mean = jnp.sum(x * m, axis=tuple(range(x.ndim - 1))) / count
            var = (
                jnp.sum(jnp.square(x - mean) * m, axis=tuple(range(x.ndim - 1)))
                / count
            )
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        y = (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return jnp.where(mask[..., None], y, 0.0)


class PFNLayer(nn.Module):
    """One pillar-feature-net layer (mmdet3d semantics).

    linear (no bias) -> masked BN -> relu -> masked max over points;
    non-last layers concat the pooled feature back onto every point.
    """

    out_channels: int
    last: bool = False

    @nn.compact
    def __call__(self, x, mask, train: bool):
        # x: (B, P, K, Cin); mask: (B, P, K)
        units = self.out_channels if self.last else self.out_channels // 2
        x = nn.Dense(units, use_bias=False, name="linear")(x)
        x = MaskedBatchNorm(name="norm")(x, mask, use_running_average=not train)
        x = nn.relu(x)
        x = jnp.where(mask[..., None], x, 0.0)
        pooled = jnp.max(jnp.where(mask[..., None], x, -jnp.inf), axis=-2)
        pooled = jnp.where(jnp.any(mask, axis=-1)[..., None], pooled, 0.0)
        if self.last:
            return pooled
        rep = jnp.broadcast_to(pooled[..., None, :], x.shape[:-1] + (units,))
        return jnp.concatenate([x, rep], axis=-1)


class PillarFeatureNet(nn.Module):
    """Decorate + encode pillars to per-pillar features (B, P, C)."""

    feat_channels: Sequence[int]
    x_range: Tuple[float, float]
    y_range: Tuple[float, float]
    z_range: Tuple[float, float]
    voxel_size: float
    point_dim: int = 4
    with_distance: bool = True
    encoding_type: str = "vanilla"  # vanilla | fourier | cosine
    fourier_enc_group: int = 1

    @nn.compact
    def __call__(self, pb: PillarBatch, train: bool = True):
        feats, num_points, coords = pb.feats, pb.num_points, pb.coords
        b, p, k, d = feats.shape
        mask = (
            jnp.arange(k)[None, None, :] < num_points[..., None]
        )  # (B, P, K)
        fm = mask[..., None].astype(feats.dtype)

        xyz = feats[..., :3]
        counts = jnp.maximum(num_points[..., None, None], 1).astype(feats.dtype)
        cluster_mean = jnp.sum(xyz * fm, axis=-2, keepdims=True) / counts
        f_cluster = xyz - cluster_mean  # (B,P,K,3)

        # pillar center offsets (x, y): reference PillarFeatureNet decoration
        cx = (
            coords[..., 1:2].astype(feats.dtype) * self.voxel_size
            + self.x_range[0]
            + 0.5 * self.voxel_size
        )
        cy = (
            coords[..., 0:1].astype(feats.dtype) * self.voxel_size
            + self.y_range[0]
            + 0.5 * self.voxel_size
        )
        f_center = jnp.stack(
            [xyz[..., 0] - cx, xyz[..., 1] - cy], axis=-1
        )  # (B,P,K,2)

        parts = [feats, f_cluster, f_center]
        if self.with_distance:
            dist = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
            parts.append(dist)
        if self.encoding_type == "fourier":
            pe = LearnableFourierPositionalEncoding(
                groups=self.fourier_enc_group, m_dim=3, f_dim=128, h_dim=64,
                d_dim=16, name="fourier_pe",
            )(xyz)
            parts.append(pe)
        elif self.encoding_type == "cosine":
            freqs = 2.0 ** jnp.arange(4, dtype=feats.dtype)
            ang = xyz[..., None] * freqs  # (B,P,K,3,4)
            parts.append(jnp.sin(ang).reshape(b, p, k, -1))
            parts.append(jnp.cos(ang).reshape(b, p, k, -1))
        x = jnp.concatenate(parts, axis=-1)
        x = jnp.where(mask[..., None], x, 0.0)

        n = len(self.feat_channels)
        for i, ch in enumerate(self.feat_channels):
            x = PFNLayer(ch, last=(i == n - 1), name=f"pfn_{i}")(x, mask, train)
        return x  # (B, P, C)


def scatter_to_canvas(pillar_feats, coords, valid, grid_hw):
    """(B, P, C) + (B, P, 2[yx]) -> (B, H, W, C) BEV pseudo-image (NHWC).

    Equivalent of mmdet3d PointPillarsScatter (reference
    ``mask_bev_encoders.py:91``), restructured for TPU: instead of scattering
    P C-vector rows into the canvas (slow sequential scatter), scatter P
    *scalar* slot ids into a (H*W,) index map, then GATHER each canvas cell's
    feature row — gathers vectorize onto the VPU. Invalid pillars index a
    zero row appended at position P.
    """
    h, w = grid_hw
    b, p, c = pillar_feats.shape
    cell = jnp.where(valid, coords[..., 0] * w + coords[..., 1], h * w)

    def one(f, cells):
        # scatter only P scalar slot-ids (cheap: HBM scatter cost scales
        # with update-row count), then build the canvas with a row GATHER
        # (fast). jnp.searchsorted is avoided — measured 10-40x slower
        # than this scatter+gather on TPU for dense queries.
        idxmap = jnp.full((h * w + 1,), p, jnp.int32)
        idxmap = idxmap.at[cells].set(
            jnp.arange(p, dtype=jnp.int32), mode="drop")[: h * w]
        padded = jnp.concatenate([f, jnp.zeros((1, c), f.dtype)])
        return padded[idxmap].reshape(h, w, c)

    return jax.vmap(one)(pillar_feats, cell)  # (B, H, W, C)


class PseudoImageNorm(nn.Module):
    """LayerNorm over the pseudo-image (NHWC).

    mode='full' matches the reference exactly: ``nn.LayerNorm([C, H, W],
    eps=1e-3)`` normalizes each sample over all C*H*W elements with a full
    per-element affine (reference ``mask_bev_encoders.py:75,92``; stored
    here as (H, W, C)). mode='channel' is a cheaper per-channel affine
    alternative (2C params instead of 2CHW) over the same reduction axes.
    """

    mode: str = "full"
    eps: float = 1e-3

    @nn.compact
    def __call__(self, x, stats=None):  # x: (B, H, W, C)
        _, h, w, c = x.shape
        if stats is None:
            xf = x.astype(jnp.float32)  # stats in f32 even under bf16
            mean = jnp.mean(xf, axis=(1, 2, 3), keepdims=True)
            var = jnp.var(xf, axis=(1, 2, 3), keepdims=True)
        else:
            # precomputed per-sample (mean, var) — the encoder derives them
            # from the (P, C) pillar table (the canvas is pooled features +
            # zeros), avoiding two full-canvas passes
            mean, var = stats
            mean = mean.reshape(-1, 1, 1, 1)
            var = var.reshape(-1, 1, 1, 1)
        y = ((x.astype(jnp.float32) - mean)
             * jax.lax.rsqrt(var + self.eps)).astype(x.dtype)
        if self.mode == "full":
            scale = self.param("scale", nn.initializers.ones, (h, w, c))
            bias = self.param("bias", nn.initializers.zeros, (h, w, c))
        else:
            scale = self.param("scale", nn.initializers.ones, (1, 1, c))
            bias = self.param("bias", nn.initializers.zeros, (1, 1, c))
        return y * scale[None] + bias[None]


class MaskBevEncoder(nn.Module):
    """points (B, N, D) + mask -> pseudo-image (B, H, W, C) [NHWC].

    Full TPU equivalent of the reference ``MaskBevEncoder``
    (``mask_bev_encoders.py:21-123``): range filtering happens inside
    pillarize; voxelization/decoration/PFN/scatter/norm are fused into one
    jittable graph.
    """

    x_range: Tuple[float, float]
    y_range: Tuple[float, float]
    z_range: Tuple[float, float]
    voxel_size: float
    feat_channels: Sequence[int] = (128, 128, 128)
    max_points_per_pillar: int = 32
    max_pillars: int = 32768
    point_dim: int = 4
    encoding_type: str = "vanilla"
    fourier_enc_group: int = 1
    pseudo_image_norm: str = "full"

    @property
    def grid_hw(self):
        h = int(round((self.y_range[1] - self.y_range[0]) / self.voxel_size))
        w = int(round((self.x_range[1] - self.x_range[0]) / self.voxel_size))
        return (h, w)

    @nn.compact
    def __call__(self, points, point_mask, train: bool = True):
        """points (B, N, D) + mask -> pseudo-image (B, H, W, C) [NHWC]."""
        pb = pillarize_batch(
            points,
            point_mask,
            x_range=self.x_range,
            y_range=self.y_range,
            z_range=self.z_range,
            voxel_size=self.voxel_size,
            max_points_per_pillar=self.max_points_per_pillar,
            max_pillars=self.max_pillars,
        )
        pf = PillarFeatureNet(
            feat_channels=self.feat_channels,
            x_range=self.x_range,
            y_range=self.y_range,
            z_range=self.z_range,
            voxel_size=self.voxel_size,
            point_dim=self.point_dim,
            encoding_type=self.encoding_type,
            fourier_enc_group=self.fourier_enc_group,
            name="pillar_feature_net",
        )(pb, train=train)
        # LayerNorm stats computed on the (P, C) pillar table: canvas cells
        # are pooled features or exact zeros, so Σ and Σ² over the canvas
        # equal those over valid pillars — two full-canvas passes saved.
        h, w = self.grid_hw
        c = pf.shape[-1]
        pf32 = jnp.where(pb.valid[..., None], pf.astype(jnp.float32), 0.0)
        elems = jnp.float32(h * w * c)
        mean = pf32.sum(axis=(1, 2)) / elems  # (B,)
        var = jnp.square(pf32).sum(axis=(1, 2)) / elems - jnp.square(mean)
        canvas = scatter_to_canvas(pf, pb.coords, pb.valid, self.grid_hw)
        return PseudoImageNorm(mode=self.pseudo_image_norm, name="norm")(
            canvas, stats=(mean, var))
