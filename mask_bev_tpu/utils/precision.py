"""compute_dtype plumbing: one config switch for bf16 inference.

The reference trains/serves fp32 (``train_mask_bev.py:96``); on TPU the MXU
wants bfloat16. ``compute_dtype: bfloat16`` in the config casts parameters
and inputs to bf16 (matmul accumulation stays f32 via
``preferred_element_type`` at the attention/einsum sites); float32 keeps
reference-exact numerics.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def resolve_dtype(compute_dtype: str):
    d = {"float32": jnp.float32, "fp32": jnp.float32,
         "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16}.get(compute_dtype)
    if d is None:
        raise ValueError(f"unknown compute_dtype: {compute_dtype!r}")
    return d


def cast_float_leaves(tree, dtype):
    """Cast every float32 array leaf to ``dtype`` (ints/bools untouched)."""
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)


def apply_compute_dtype(variables, cfg):
    """Cast model variables per ``cfg.compute_dtype`` (no-op for float32)."""
    dtype = resolve_dtype(cfg.compute_dtype)
    if dtype == jnp.float32:
        return variables
    return cast_float_leaves(variables, dtype)
