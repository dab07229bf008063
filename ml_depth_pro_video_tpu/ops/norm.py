"""Normalization ops."""

from __future__ import annotations

import jax.numpy as jnp


def layer_norm(x: jnp.ndarray, g: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """LayerNorm over the last dim, computed in fp32 (timm ViT uses eps=1e-6)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    y = y * g.astype(jnp.float32) + b.astype(jnp.float32)
    return y.astype(dtype)
