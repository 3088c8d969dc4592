"""Positional encodings.

- :class:`LearnableFourierPositionalEncoding`: learnable Fourier features
  (arXiv 2106.02795 Alg. 1), rebuilt from the behavior of the reference
  ``models/positional_encoding/learnable_fourier_positional_encoding.py:6-68``
  (linear projection -> cos/sin -> per-group MLP).
- :func:`sine_positional_encoding_2d`: DETR-style fixed sine embedding used
  by the reference pixel decoder / transformer decoder
  (``SinePositionalEncoding(num_feats=128, normalize=True)`` configured at
  reference ``mask_bev_panoptic_head.py:147-215``).
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp


class LearnableFourierPositionalEncoding(nn.Module):
    """Positions (..., M) -> encodings (..., groups * d_dim).

    Algorithm 1 of "Learnable Fourier Features for Multi-Dimensional Spatial
    Positional Encoding": r = [cos(xW_r), sin(xW_r)] / sqrt(F), then a GELU
    MLP to D dims, applied per position group.
    """

    groups: int = 1  # G
    m_dim: int = 3  # M: position dims per group
    f_dim: int = 128  # F: fourier feature dim (must be even)
    h_dim: int = 64  # H: hidden layer
    d_dim: int = 16  # D: output dim per group

    @nn.compact
    def __call__(self, pos):
        # pos: (..., G*M) or (..., M) with G==1
        shape = pos.shape
        g, m = self.groups, self.m_dim
        x = pos.reshape(shape[:-1] + (g, m))
        # W_r ~ N(0, gamma^-2); reference uses default init — keep normal(1/m)
        w = nn.Dense(self.f_dim // 2, use_bias=False, name="w_r")(x)
        f = jnp.concatenate([jnp.cos(w), jnp.sin(w)], axis=-1)
        f = f / math.sqrt(self.f_dim)
        y = nn.Dense(self.h_dim, name="mlp_hidden")(f)
        y = nn.gelu(y, approximate=False)  # torch nn.GELU is exact erf
        y = nn.Dense(self.d_dim, name="mlp_out")(y)
        return y.reshape(shape[:-1] + (g * self.d_dim,))


def sine_positional_encoding_2d(h: int, w: int, num_feats: int = 128,
                                temperature: float = 10000.0,
                                normalize: bool = True,
                                scale: float = 2 * math.pi,
                                eps: float = 1e-6,
                                dtype=jnp.float32):
    """DETR sine positional encoding for a full (h, w) grid -> (h*w, 2*num_feats).

    Matches mmdet ``SinePositionalEncoding`` semantics with no padding mask
    (all positions valid): y/x embed interleaved sin/cos, y first.
    """
    y = jnp.arange(1, h + 1, dtype=dtype)[:, None] * jnp.ones((1, w), dtype)
    x = jnp.arange(1, w + 1, dtype=dtype)[None, :] * jnp.ones((h, 1), dtype)
    if normalize:
        y = y / (h + eps) * scale
        x = x / (w + eps) * scale
    dim_t = temperature ** (
        2 * (jnp.arange(num_feats, dtype=dtype) // 2) / num_feats
    )
    pos_x = x[..., None] / dim_t
    pos_y = y[..., None] / dim_t
    pos_x = jnp.stack(
        [jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], axis=-1
    ).reshape(h, w, num_feats)
    pos_y = jnp.stack(
        [jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], axis=-1
    ).reshape(h, w, num_feats)
    pos = jnp.concatenate([pos_y, pos_x], axis=-1)  # (h, w, 2*num_feats)
    return pos.reshape(h * w, 2 * num_feats)
