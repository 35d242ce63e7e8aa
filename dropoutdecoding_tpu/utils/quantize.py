"""Weight-only int8 quantization for the Llama tower.

Decode at batch<=K+1 is HBM-bound: per-token latency ~ bytes(weights)/BW.
Per-output-channel symmetric int8 halves the streamed bytes vs bf16 for
the seven big projection matrices per layer (+ lm_head), which is a ~2x
decode-throughput lever at equal arithmetic (XLA fuses the int8->bf16
dequant into the MXU feed).

Representation: a quantized matrix is the dict {"q": int8 [.., D, E],
"s": bf16 [.., 1, E]} (scale per output channel, broadcast over the
stacked-layer leading axis).  models/llama._mm dispatches on this shape,
so quantized and dense params flow through the same tower code.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_QUANT_NAMES = (
    "q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj",
)


def quantize_matrix(w: jax.Array, axis: int = -1) -> dict:
    """Symmetric per-output-channel int8: q = round(w / s), s = amax/127."""
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=-2, keepdims=True)  # per output col
    s = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w32 / s), -127, 127).astype(jnp.int8)
    # scales stay fp32: negligible bytes ([1, E]) and avoids a bf16
    # rescale error on top of the int8 rounding
    return {"q": q, "s": s}


def dequantize_matrix(wq: dict, dtype=jnp.float32) -> jax.Array:
    return (wq["q"].astype(jnp.float32) * wq["s"].astype(jnp.float32)).astype(dtype)


def quantize_kv(x: jax.Array):
    """Per-(token, head) symmetric int8 for K/V cache entries.

    Args:
      x: [..., D] keys or values (any leading dims).
    Returns:
      {"q": int8 [..., D], "s": f32 [..., 1]} — at LLaVA cache shapes the
      scale overhead is 1/(2D) of the original bf16 bytes, and the cache
      stream during decode halves (the decode bottleneck at large batch).
    """
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    s = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(x32 / s), -127, 127).astype(jnp.int8)
    return {"q": q, "s": s}


def quantize_llama_params(params: dict, quantize_lm_head: bool = True) -> dict:
    """Quantize the per-layer projections (+ optionally lm_head) of a
    models/llama parameter pytree.  Norms and embeddings stay bf16."""
    out = dict(params)
    layers = dict(params["layers"])
    for name in _QUANT_NAMES:
        layers[name] = quantize_matrix(layers[name])
    out["layers"] = layers
    if quantize_lm_head:
        out["lm_head"] = quantize_matrix(params["lm_head"])
    return out


def quantize_activations(x: jax.Array):
    """Per-row (last-axis) symmetric int8 for activations — the "a8" half
    of the w8a8 prefill mode.  Unlike weights (quantized once, offline),
    activations are quantized on the fly per token row; the scale rides
    along and folds into the int32 matmul output together with the
    weight's per-output-channel scale.

    Returns (q int8 [..., D], s f32 [..., 1]).  Same per-row symmetric
    scheme as the KV-cache quantizer — delegate so the two paths can
    never diverge."""
    d = quantize_kv(x)
    return d["q"], d["s"]
