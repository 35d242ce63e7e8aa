"""Dropout-mask policies over the visual-token span.

Port targets (behavioral spec per SURVEY.md §7):
- LLaVA-1.5  "epis": stochastic Bernoulli with uncertainty-scaled
  probabilities + overlap restore (reference llava.py:589-662), masks
  ACCUMULATING across ensemble members within a step (no restore between
  members, llava.py:344 commented out).
- InstructBLIP "epis": DETERMINISTIC top-(prob)-quantile epis mask +
  overlap restore (instructblip.py:447-460); "epis_kl" restores the
  lowest-10%-KL tokens instead (instructblip.py:464-485).
- LLaVA-NeXT: stochastic epis like LLaVA-1.5 but the mask is restored to
  all-ones before each member (llavanext.py:546); ``use_random`` switches to
  "epis_no_overlap" (llavanext.py:547-551).
- Ablations: "random_image" (uniform Bernoulli, llava.py:542-547),
  "aggressive" (fixed-count random subset, llava.py:570-588), "all_image",
  "keep_overlap", "none".

All functions are pure and jit/vmap-compatible: they return a boolean
*drop* mask over the N visual tokens (True = mask this token out of the
member's attention).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def epis_mask_probs(
    epis: jax.Array,
    prob_cap: jax.Array,
    floor: float = 0.1,
    valid: jax.Array | None = None,
) -> jax.Array:
    """Linear map of epistemic uncertainty to per-token mask probability:

        p_i = floor + (cap - floor) * (epis_i - min) / (max - min)

    (reference llava.py:638-647; q_low/q_high are quantile(0)/quantile(1)
    i.e. exactly min/max).  Degenerate all-equal epis => probability 0
    (the reference would emit NaN and consequently mask nothing; we encode
    that outcome without the NaN).

    ``valid`` restricts the min/max statistics to real tokens when the
    visual span is padded to a static maximum (LLaVA-NeXT variable tile
    counts, SURVEY.md §7 hard part #3).
    """
    if valid is not None:
        lo = jnp.min(jnp.where(valid, epis, jnp.inf))
        hi = jnp.max(jnp.where(valid, epis, -jnp.inf))
    else:
        lo = jnp.min(epis)
        hi = jnp.max(epis)
    denom = hi - lo
    scaled = jnp.where(denom > 0, (epis - lo) / jnp.where(denom > 0, denom, 1.0), 0.0)
    scaled = jnp.clip(scaled, 0.0, 1.0)
    return jnp.where(denom > 0, floor + (prob_cap - floor) * scaled, 0.0)


def overlap_keep_mask(argmax_id: jax.Array, topk_ids: jax.Array) -> jax.Array:
    """Visual tokens whose top-k text projection contains the current step's
    unmasked argmax token (reference get_overlap_image_tokens,
    llava.py:443-482).

    Args:
      argmax_id: [] current-step argmax token id.
      topk_ids: [N, k] per-visual-token top-k projected text ids.
    Returns:
      [N] bool, True = keep (never mask).
    """
    return jnp.any(topk_ids == argmax_id, axis=-1)


def overlap_keep_mask_multi(probe_ids: jax.Array, topk_ids: jax.Array) -> jax.Array:
    """Union of keep-sets over several probe token ids (the reference's
    "VQA" method loops get_overlap_image_tokens over the POPE probe words,
    llava.py:519-538; probe capture instructblip.py:653-659).

    Args:
      probe_ids: [P] token ids, -1 = padding.
      topk_ids: [N, k].
    Returns:
      [N] bool keep mask.
    """
    valid = probe_ids >= 0  # [P]
    hits = jnp.any(
        topk_ids[:, None, :] == probe_ids[None, :, None], axis=-1
    )  # [N, P]
    return jnp.any(hits & valid[None, :], axis=-1)


def build_member_drop_mask(
    key: jax.Array,
    policy: str,
    epis: jax.Array,
    prob_cap,
    overlap_keep: jax.Array,
    prev_drop: jax.Array,
    accumulate: bool,
    kl_keep: jax.Array | None = None,
    floor: float = 0.1,
    valid: jax.Array | None = None,
) -> jax.Array:
    """Drop mask for one ensemble member.

    Args:
      key: PRNG key for this (step, member).
      policy: mask policy name.
      epis: [N] per-visual-token epistemic uncertainty.
      prob_cap: scalar mask-probability cap for this member.
      overlap_keep: [N] bool keep-set from the unmasked argmax.
      prev_drop: [N] bool drop mask carried from the previous member
        (all-False for the first member or non-accumulating models).
      accumulate: whether drops accumulate across members (LLaVA-1.5).
      kl_keep: [N] bool lowest-KL keep set (epis_kl only).
    Returns:
      [N] bool drop mask.
    """
    N = epis.shape[0]
    if policy == "epis":
        probs = epis_mask_probs(epis, prob_cap, floor, valid)
        drop = jax.random.uniform(key, (N,)) < probs
        if accumulate:
            drop = drop | prev_drop
        drop = drop & ~overlap_keep
    elif policy == "epis_no_overlap":
        drop = jax.random.uniform(key, (N,)) < epis_mask_probs(
            epis, prob_cap, floor, valid
        )
        if accumulate:
            drop = drop | prev_drop
    elif policy == "epis_quantile":
        # InstructBLIP deterministic variant (instructblip.py:447-460):
        # mask the top-`prob` proportion by epis, then restore overlap.
        if valid is not None:
            threshold = jnp.nanquantile(
                jnp.where(valid, epis, jnp.nan), 1.0 - prob_cap
            )
        else:
            threshold = jnp.quantile(epis, 1.0 - prob_cap)
        drop = (epis >= threshold) & ~overlap_keep
    elif policy == "epis_kl":
        probs = epis_mask_probs(epis, prob_cap, floor, valid)
        drop = jax.random.uniform(key, (N,)) < probs
        if kl_keep is not None:
            drop = drop & ~kl_keep
    elif policy == "random_image":
        drop = jax.random.uniform(key, (N,)) < prob_cap
        if accumulate:
            drop = drop | prev_drop
    elif policy in ("keep_overlap", "vqa"):
        # "vqa" differs only in how the caller builds overlap_keep (union
        # over probe ids via overlap_keep_mask_multi)
        drop = (jax.random.uniform(key, (N,)) < prob_cap) & ~overlap_keep
    elif policy == "aggressive":
        # Fixed-count random subset.  The reference additionally freezes the
        # subset for the whole generation via self.ag_mask_ids
        # (llava.py:573-588, a stateful cache whose reuse branch returns
        # None and would crash); we redraw per step, which matches the
        # policy's intent (a fixed-fraction random ablation).
        num = (prob_cap * (N - 1)).astype(jnp.int32) if hasattr(prob_cap, "astype") else int(prob_cap * (N - 1))
        scores = jax.random.uniform(key, (N,))
        order = jnp.argsort(scores)
        rank = jnp.argsort(order)
        drop = rank < num
    elif policy == "all_image":
        drop = jnp.ones((N,), bool)
    elif policy == "none":
        drop = jnp.zeros((N,), bool)
    else:
        raise ValueError(f"unknown mask policy: {policy}")
    return drop
