"""Elementary numerical ops shared by all towers.

These are written so XLA fuses them into the surrounding matmuls; norm
accumulation is always fp32 regardless of activation dtype (bf16 on TPU).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Llama RMSNorm; accumulate in fp32, scale in input dtype (matches HF
    LlamaRMSNorm semantics: normalize fp32, cast, then multiply by weight)."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    x32 = x32 * jax.lax.rsqrt(var + eps)
    return weight * x32.astype(dtype)


def layer_norm(
    x: jax.Array, weight: jax.Array, bias: jax.Array, eps: float = 1e-5
) -> jax.Array:
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y.astype(dtype) * weight + bias).astype(dtype)


def quick_gelu(x: jax.Array) -> jax.Array:
    """CLIP's activation: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


def act_fn(name: str):
    # HF "gelu" is the exact erf form (torch nn.GELU default);
    # jax.nn.gelu defaults to the tanh approximation — be explicit.
    return {
        "gelu": lambda x: jax.nn.gelu(x, approximate=False),
        "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
        "gelu_pytorch_tanh": lambda x: jax.nn.gelu(x, approximate=True),
        "quick_gelu": quick_gelu,
        "silu": jax.nn.silu,
        "relu": jax.nn.relu,
    }[name]


def rotary_embedding(
    positions: jax.Array, head_dim: int, theta: float = 10000.0
) -> tuple:
    """RoPE cos/sin tables for given positions.

    Matches HF Llama: inv_freq over even dims, angles computed in fp32.

    Args:
      positions: [...,] int positions.
    Returns:
      (cos, sin): [..., head_dim] each (half-duplicated layout).
    """
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., hd/2]
    emb = jnp.concatenate([angles, angles], axis=-1)  # [..., hd]
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Apply rotary embedding.

    Args:
      x: [..., S, H, D] or [..., H, D] query/key.
      cos, sin: broadcastable to x's [..., S, D] (caller inserts head axis).
    """
    return (x * cos + _rotate_half(x) * sin).astype(x.dtype)
