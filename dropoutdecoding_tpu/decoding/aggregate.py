"""Ensemble aggregation: majority vote / logit averaging.

Port targets: ``select_by_vote`` (reference llava.py:22-36, llavanext.py:
26-39 — identical semantics) and ``select_by_average`` (llava.py:37-52).

Vote tie-breaking matches python Counter.most_common + first-match-return
exactly: the winner is the FIRST member whose argmax token id attains the
maximal count (see tests/test_aggregate.py for the equivalence argument).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def select_by_vote(member_logits: jax.Array):
    """Majority vote over members' last-token logits.

    Args:
      member_logits: [K, V]
    Returns:
      (winner_index [], next_token []): index of the winning member and its
      argmax token id.
    """
    ids = jnp.argmax(member_logits, axis=-1)  # [K]
    counts = jnp.sum(ids[None, :] == ids[:, None], axis=-1)  # [K]
    winner = jnp.argmax(counts)  # first member attaining max count
    return winner, ids[winner]


def select_by_average(member_logits: jax.Array):
    """Logit averaging (reference select_by_average averages the last-token
    logits across members and substitutes them into member 0's output, so
    the propagated KV cache is member 0's; llava.py:37-52).

    Returns:
      (winner_index (always 0), next_token from the averaged logits).
    """
    avg = jnp.mean(member_logits.astype(jnp.float32), axis=0)
    return jnp.zeros((), jnp.int32), jnp.argmax(avg)


def aggregate(member_logits: jax.Array, use_avg: bool):
    return select_by_average(member_logits) if use_avg else select_by_vote(member_logits)
