"""FKAConv point-convolution layer (feature-kernel alignment).

TPU-native rebuild of the reference's experimental FKAConv
(``/root/reference/mask_bev/models/networks/fkaconv/fkaconv.py:13-135``,
itself adapted from LightConvPoint). The reference copy is dead code (only
referenced from commented-out encoders) and its final conv is mis-shaped;
this is a *working* implementation of the intended math on static-shape
neighborhoods, jit/vmap friendly:

  * local coordinates are normalized by a running mean neighborhood radius
    (momentum 0.1, like the reference's ``norm_radius`` buffer);
  * soft distance weights ``sigmoid(-alpha * d + beta)`` are normalized to
    sum to K over each neighborhood (reference ``forward`` distance_weight);
  * a 3-layer MLP over local coords with two distance-weighted max-pool
    concat steps estimates the (K, kernel_size) alignment matrix;
  * features are projected through the alignment matrix and a final linear
    kernel maps (in_channels * kernel_size) -> out_channels.

Layout is TPU-friendly channels-last: features (B, S, K, I), neighbor
coords relative to the support point (B, S, K, D) -> (B, S, O).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class FKAConv(nn.Module):
    in_channels: int
    out_channels: int
    kernel_size: int = 16
    dim: int = 3
    use_bias: bool = False
    norm_radius_momentum: float = 0.1
    eps: float = 1e-6

    @nn.compact
    def __call__(self, features, rel_coords, train: bool = True):
        """features (B, S, K, I), rel_coords (B, S, K, D) -> (B, S, O)."""
        b, s, k, i = features.shape
        ks = self.kernel_size

        radius = self.variable(
            "batch_stats", "norm_radius", lambda: jnp.ones(()))
        alpha = self.param("alpha", nn.initializers.ones, ())
        beta = self.param("beta", nn.initializers.ones, ())

        dist = jnp.sqrt(
            jnp.maximum(jax.lax.stop_gradient(
                jnp.sum(rel_coords ** 2, -1)), 0.0))          # (B, S, K)
        if train and not self.is_initializing():
            # running mean of the max neighborhood radius (ref :99-105)
            mean_radius = dist.max(-1).mean()
            radius.value = (radius.value * (1 - self.norm_radius_momentum)
                            + mean_radius * self.norm_radius_momentum)
        pts = rel_coords / radius.value

        # soft distance weights, normalized to sum K per neighborhood
        w = jax.nn.sigmoid(-alpha * dist + beta)
        ws = w.sum(-1, keepdims=True)
        w = w / (ws + (ws == 0) + self.eps) * k               # (B, S, K)

        def inorm(x, name):
            # InstanceNorm over the neighborhood axis with affine, the jax
            # equivalent of the reference's InstanceNorm2d(kernel_size)
            mu = x.mean(-2, keepdims=True)
            var = x.var(-2, keepdims=True)
            g = self.param(f"{name}_scale", nn.initializers.ones, (ks,))
            c = self.param(f"{name}_bias", nn.initializers.zeros, (ks,))
            return (x - mu) * jax.lax.rsqrt(var + 1e-5) * g + c

        mat = nn.relu(inorm(
            nn.Dense(ks, use_bias=False, name="fc1")(pts), "bn1"))
        mp1 = (mat * w[..., None]).max(-2, keepdims=True)     # (B, S, 1, ks)
        mat = jnp.concatenate(
            [mat, jnp.broadcast_to(mp1, mat.shape)], axis=-1)
        mat = nn.relu(inorm(
            nn.Dense(ks, use_bias=False, name="fc2")(mat), "bn2"))
        mp2 = (mat * w[..., None]).max(-2, keepdims=True)
        mat = jnp.concatenate(
            [mat, jnp.broadcast_to(mp2, mat.shape)], axis=-1)
        mat = nn.relu(nn.Dense(ks, use_bias=False, name="fc3")(mat))
        mat = mat * w[..., None]                              # (B, S, K, ks)

        # align features onto the kernel: (B, S, I, ks) -> linear -> (B, S, O)
        aligned = jnp.einsum("bski,bskj->bsij", features, mat)
        return nn.Dense(self.out_channels, use_bias=self.use_bias,
                        name="cv")(aligned.reshape(b, s, i * ks))
