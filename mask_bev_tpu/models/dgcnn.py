"""Dynamic EdgeConv (DGCNN) building block.

TPU-native rebuild of the reference's experimental factory
(``/root/reference/mask_bev/models/networks/dgcnn/dgcnn.py:6-22``), which is
dead code there (references an undefined ``F`` and torch_geometric's
``DynamicEdgeConv``). This is a working static-shape version: kNN in
feature space via a dense pairwise-distance matrix (fine for the point
counts the experiment targeted), an ``h_theta([x_i, x_j - x_i])`` MLP
(linear -> gelu -> linear, matching the reference's HTheta), and max or
mean aggregation over the K neighbors.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def knn_indices(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """(B, N, C) -> (B, N, K) indices of the K nearest neighbors
    (excluding self) in feature space."""
    d2 = (jnp.sum(x * x, -1)[:, :, None]
          - 2.0 * jnp.einsum("bnc,bmc->bnm", x, x)
          + jnp.sum(x * x, -1)[:, None, :])
    n = x.shape[1]
    d2 = jnp.where(jnp.eye(n, dtype=bool), jnp.inf, d2)  # exclude self
    return jnp.argsort(d2, axis=-1)[..., :k]


class DynamicEdgeConv(nn.Module):
    """EdgeConv with per-layer dynamic feature-space kNN graphs."""

    in_channels: int
    out_channels: int
    k: int = 16
    aggr: str = "max"  # max | mean

    @nn.compact
    def __call__(self, x):
        """(B, N, C_in) -> (B, N, C_out)."""
        idx = knn_indices(x, self.k)                     # (B, N, K)
        neigh = jnp.take_along_axis(
            x[:, None], idx[..., None], axis=2)          # (B, N, K, C)
        center = jnp.broadcast_to(x[:, :, None], neigh.shape)
        e = jnp.concatenate([center, neigh - center], -1)
        h = nn.Dense(2 * self.in_channels, name="linear1")(e)
        h = nn.gelu(h)
        h = nn.Dense(self.out_channels, name="linear2")(h)
        if self.aggr == "max":
            return h.max(axis=2)
        if self.aggr == "mean":
            return h.mean(axis=2)
        raise ValueError(f"unknown aggr {self.aggr!r}")


def make_edge_conv(in_channels: int, out_channels: int, k: int,
                   aggr: str = "max") -> DynamicEdgeConv:
    """Factory mirroring the reference's ``make_edge_conv`` signature."""
    return DynamicEdgeConv(in_channels, out_channels, k=k, aggr=aggr)
