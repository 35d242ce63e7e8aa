"""HF-semantics logits warping + categorical sampling.

The reference's sampling surface is HF ``GenerationMixin`` kwargs: the
harnesses pass ``do_sample=True, temperature=1.0, top_p=1, top_k=None``
on the VCD path (reference chair_test.py:331-334, test_vcd.py:244-247),
and the VCD sampler applies the logits warpers AFTER the contrastive
cutoff (reference models/VCD/vcd_sample.py:155-161).  HF's warper order
is temperature -> top-k -> top-p (GenerationMixin._get_logits_warper).

``warp_logits`` mirrors the three warpers' exact filter rules
(transformers TemperatureLogitsWarper / TopKLogitsWarper /
TopPLogitsWarper, min_tokens_to_keep=1); the draw itself is
``jax.random.categorical`` — distributionally identical to
``torch.multinomial`` but a different RNG stream (SURVEY.md §7: metrics
parity, not bitwise RNG parity, is the target).

All three knobs are static Python values (GenerationConfig fields), so
neutral settings compile to nothing.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_FILTER = -float("inf")


def warp_logits(
    logits: jax.Array,
    temperature: float = 1.0,
    top_k: int | None = None,
    top_p: float = 1.0,
) -> jax.Array:
    """Apply HF's temperature / top-k / top-p warpers (in that order).

    Args:
      logits: [..., V] raw logits.
      temperature: divide logits (HF TemperatureLogitsWarper).
      top_k: keep the k highest logits, ties at the k-th value kept
        (HF TopKLogitsWarper uses ``scores < kth_value``).
      top_p: nucleus filtering — drop the smallest-probability tokens
        whose ascending cumulative probability stays <= 1 - top_p,
        always keeping at least one token (HF TopPLogitsWarper).
    """
    V = logits.shape[-1]
    if temperature != 1.0:
        logits = logits / temperature
    if top_k is not None and top_k > 0 and top_k < V:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, _FILTER, logits)
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)  # ascending, like HF
        cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
        remove_sorted = cum <= (1.0 - top_p)
        # min_tokens_to_keep=1: the highest-probability token survives
        remove_sorted = remove_sorted.at[..., -1].set(False)
        inv = jnp.argsort(jnp.argsort(logits, axis=-1), axis=-1)
        remove = jnp.take_along_axis(remove_sorted, inv, axis=-1)
        logits = jnp.where(remove, _FILTER, logits)
    return logits


def sample_token(key: jax.Array, logits: jax.Array, gen) -> jax.Array:
    """Draw next tokens [...,] from warped logits per GenerationConfig."""
    warped = warp_logits(logits, gen.temperature, gen.top_k, gen.top_p)
    return jax.random.categorical(key, warped, axis=-1).astype(jnp.int32)
