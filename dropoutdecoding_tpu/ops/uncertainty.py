"""Visual-token uncertainty quantification.

Port target: ``calculate_vision_uncertainty`` (reference models/llava.py:
710-756, identical copy at instructblip.py:511-557) and
``calculate_entropy_varentropy`` (llava.py:687-708).

Given the prefill logits restricted to the visual-token span
``logits in R^[B, L_vis, V]`` (the "projection of visual tokens onto the
text-token space"), compute per token i with p_i = softmax(logits_i):

  - aleatoric  A_i = H(p_i)              = -sum_v p_iv log p_iv
  - epistemic  E_i = KL(p_i || p_bar)    with p_bar = mean_i p_i
  - variance   Var_v(p_iv)               (Bessel-corrected, like torch.var)

plus image-level means over L_vis.  The reference computes this with five
materialized [B, L, V] temporaries in fp32 torch; here it is a single fused
XLA program (and a Pallas kernel in ops/pallas_uncertainty.py that streams
V-tiles through VMEM without materializing probabilities in HBM).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-10  # matches reference log(p + 1e-10)


def vision_uncertainty(logits: jax.Array, valid: jax.Array | None = None) -> dict:
    """jnp reference implementation (fp32).

    Args:
      logits: [B, L, V] visual-token logits.
      valid: optional [B, L] bool — True marks REAL visual tokens when the
        span is statically padded (LLaVA-NeXT anyres).  The ensemble mean
        p_avg and the image-level means run over valid rows only, matching
        the reference, which slices exactly the real span
        (llavanext.py:223-228 start/end_image_pos).  Per-token values at
        invalid rows are junk and masked by every consumer.
    Returns:
      dict with per-token [B, L] and image-level [B] uncertainty fields,
      keys identical to the reference dict (llava.py:747-756).
    """
    logits = logits.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)  # [B, L, V]

    # torch.var uses correction=1 (unbiased); match it exactly.
    variance_per_token = jnp.var(probs, axis=-1, ddof=1)  # [B, L]

    if valid is None:
        p_avg = jnp.mean(probs, axis=1)  # [B, V]
        mean_rows = lambda x: jnp.mean(x, axis=-1)
    else:
        w = valid.astype(jnp.float32)
        n = jnp.maximum(jnp.sum(w, axis=1), 1.0)  # [B]
        p_avg = jnp.einsum("bl,blv->bv", w, probs) / n[:, None]
        mean_rows = lambda x: jnp.sum(x * w, axis=-1) / n

    epi_per_token = jnp.sum(
        probs * (jnp.log(probs + _EPS) - jnp.log(p_avg[:, None, :] + _EPS)),
        axis=-1,
    )  # [B, L]
    alea_per_token = -jnp.sum(probs * jnp.log(probs + _EPS), axis=-1)  # [B, L]

    return {
        "variance_per_token": variance_per_token,
        "epis_uncert_per_token": epi_per_token,
        "alea_uncert_per_token": alea_per_token,
        "variance": mean_rows(variance_per_token),
        "epis_uncert": mean_rows(epi_per_token),
        "alea_uncert": mean_rows(alea_per_token),
    }


def vision_uncertainty_auto(
    logits: jax.Array, valid: jax.Array | None = None
) -> dict:
    """Dispatch to the fused Pallas kernel on TPU (O(L) HBM traffic
    instead of several [L, V] fp32 temporaries), jnp elsewhere.

    Uses ``lax.platform_dependent`` so the choice follows the LOWERING
    platform, not the process default backend (this container's TPU plugin
    stays default even when a program targets the CPU mesh)."""
    from .pallas_uncertainty import vision_uncertainty_fused

    if valid is None:

        def tpu_impl(x):
            return vision_uncertainty_fused(x)

        return jax.lax.platform_dependent(
            logits, tpu=tpu_impl, default=vision_uncertainty
        )

    def tpu_impl_v(x, v):
        return vision_uncertainty_fused(x, valid=v)

    return jax.lax.platform_dependent(
        logits, valid, tpu=tpu_impl_v, default=vision_uncertainty
    )


def exact_top_k_ids(logits: jax.Array, k: int) -> jax.Array:
    """Indices of the k largest entries along the last axis, exactly
    matching ``jax.lax.top_k``'s order (descending value, ties broken
    toward the lower index — argmax's tie rule).

    ``lax.top_k`` lowers to a sort over the full vocab axis (~12.6 ms for
    [576, 32k] on v5e); k sequential argmax+mask passes are pure VPU
    streaming (~1 ms) and exact for the small k (5/10) the projection
    tables use.
    """
    x = logits
    V = x.shape[-1]
    ids = []
    for _ in range(k):
        idx = jnp.argmax(x, axis=-1)
        ids.append(idx)
        x = jnp.where(jax.nn.one_hot(idx, V, dtype=bool), -jnp.inf, x)
    return jnp.stack(ids, axis=-1).astype(jnp.int32)


def entropy_varentropy(logits: jax.Array) -> tuple:
    """Entropy (base 2) and varentropy of one distribution.

    Port of calculate_entropy_varentropy (llava.py:687-708): uses exact
    log_softmax (no +eps) and base-2 entropy.

    Args:
      logits: [V]
    Returns:
      (entropy, varentropy) scalars.
    """
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    probs = jnp.exp(log_probs)
    ln2 = jnp.log(2.0)
    entropy = -jnp.sum(probs * log_probs) / ln2
    varentropy = jnp.sum(probs * (log_probs / ln2 + entropy) ** 2)
    return entropy, varentropy


def topk_token_ids(logits: jax.Array, k: int) -> tuple:
    """Top-k text-token projection table per visual token.

    Port of get_topk_token_id (llava.py:428-441; k=5 for LLaVA-1.5 at
    llava.py:408, k=10 for InstructBLIP/LLaVA-NeXT).

    Args:
      logits: [B, L, V]
    Returns:
      (values [B, L, k], ids [B, L, k])
    """
    return jax.lax.top_k(logits, k)


def kl_to_current(image_logits: jax.Array, logits: jax.Array) -> jax.Array:
    """Per-visual-token KL(softmax(current step logits) || softmax(image token
    logits)) as used by lowest_percent_kl_indices (llava.py:758-776).

    Note the reference calls F.kl_div(log_softmax(image), softmax(cur)) which
    computes sum target * (log target - input) = KL(cur || image_token).

    Args:
      image_logits: [L, V] visual-token logits (prefill projection).
      logits: [V] current-step logits.
    Returns:
      [L] KL divergences.
    """
    log_q = jax.nn.log_softmax(image_logits.astype(jnp.float32), axis=-1)
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    # F.kl_div(input=log_q, target=p) = sum p * (log p - log_q)
    log_p = jnp.log(p)
    terms = jnp.where(p > 0, p * (log_p - log_q), 0.0)
    return jnp.sum(terms, axis=-1)


def lowest_percent_kl_indices_mask(
    image_logits: jax.Array, logits: jax.Array, percent: float = 0.1
) -> jax.Array:
    """Boolean [L] mask of the lowest-`percent` KL visual tokens
    (llava.py:758-776; used by the epis_kl policy, instructblip.py:483-485).
    """
    kl = kl_to_current(image_logits, logits)
    num = int(percent * kl.shape[0])
    if num == 0:
        return jnp.zeros(kl.shape, dtype=bool)
    _, idx = jax.lax.top_k(-kl, num)
    return jnp.zeros(kl.shape, dtype=bool).at[idx].set(True)
