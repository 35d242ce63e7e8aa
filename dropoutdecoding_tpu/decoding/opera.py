"""OPERA decoding math: Over-trust Penalty and Retrospection-Allocation.

Clean-room implementation of the OPERA beam-search modification (Huang et
al., CVPR 2024).  The reference repo reaches OPERA only through generate
kwargs against an external patched-transformers package it does not ship
(reference chair_test.py:312-323 `opera_decoding=True, scale_factor,
threshold, num_attn_candidates, penalty_weights`; test_opera.py:196-208
passes the same surface through minigpt4) — this module implements the
algorithm natively so the kwargs surface actually decodes.

The method, on top of beam search over the GENERATED window:

* **Over-trust penalty.**  Hallucinations correlate with a "knowledge
  aggregation" attention pattern: a column of the causal self-attention
  over recently generated tokens collects most of the attention mass (a
  "summary token") and later tokens over-trust it.  At step ``t`` with
  candidate token ``y``, scale the candidate's self-attention row over
  generated columns by ``scale_factor`` (attention entries on recent
  tokens are small) and form the column-wise product of scaled values in
  the lower triangle; the penalty is the maximum column product

      phi = max_c  prod_{i=c+1..t} (scale * w[i, c])

  and the candidate's beam score becomes
  ``logp(y) - penalty_weights * phi``.  The argmax column is the
  candidate's *summary-token location*.

* **Retrospection-allocation.**  If the committed summary-token location
  stays constant for ``threshold`` consecutive steps, decoding is rolled
  back to the position just after the summary token and the tokens every
  beam chose there are banned from re-selection, forcing the search onto
  a different continuation.  Per-position rollbacks are capped so the
  loop terminates.

All functions here are pure jnp math over fixed-shape buffers (jit/scan
compatible); the beam loop lives in engine/opera.py.
"""
from __future__ import annotations

import jax.numpy as jnp

NEG = -1e9


def attn_log_row(attn_row, scale, gen_start, step, eps=1e-20):
    """Log of the scaled attention over the GENERATED window.

    Args:
      attn_row: [..., Smax] attention probabilities of the current token
        (head-mean) over all cache slots.
      scale: OPERA scale_factor (sigma).
      gen_start: scalar — cache position of generated token 0 (prompt
        length).
      step: scalar — the current generated position t; columns >= t are
        outside the window.
    Returns:
      [..., T_win] log(scale * w) over generated columns 0..T_win-1 with
      out-of-window columns set to 0 (additive identity for the column
      sums).  T_win = attn_row.shape[-1] - that caller slice; here the
      caller passes the full row and a static window length via slicing,
      so this helper only masks + logs.
    """
    t_cols = attn_row.shape[-1]
    col = jnp.arange(t_cols)
    valid = col < step
    logw = jnp.log(jnp.maximum(attn_row * scale, eps))
    del gen_start  # the caller already sliced to the generated window
    return jnp.where(valid, logw, 0.0)


def overtrust_phi(attn_log, step):
    """Over-trust penalty from accumulated log-attention rows.

    Args:
      attn_log: [T, T] where ``attn_log[i, c]`` is log(scale * w_{i,c})
        for generated row i over generated column c (c < i), and 0
        outside the lower triangle / beyond the current step.
      step: scalar int — rows 0..step (inclusive) are populated; the
        candidate row is expected to already be written at index
        ``step``.
    Returns:
      (phi, loc): the maximum column product exp(sum_{i=c+1..step} ...)
      over columns c in [0, step-1] and its argmax column.  With no
      valid column (step == 0), phi == 0 and loc == 0 (no penalty on the
      first generated token).
    """
    T = attn_log.shape[0]
    rows = jnp.arange(T)[:, None]
    cols = jnp.arange(T)[None, :]
    # contributions: rows c+1..step for column c
    in_range = (rows > cols) & (rows <= step)
    colsum = jnp.sum(jnp.where(in_range, attn_log, 0.0), axis=0)  # [T]
    valid_col = (cols[0] < step)
    colsum = jnp.where(valid_col, colsum, -jnp.inf)
    loc = jnp.argmax(colsum).astype(jnp.int32)
    phi = jnp.where(step > 0, jnp.exp(colsum[loc]), 0.0)
    return phi, loc


def rollback_trigger(loc_hist, step, threshold):
    """Retrospection condition: the last ``threshold`` committed
    summary-token locations (rows step-threshold+1..step of loc_hist)
    are all equal.

    Args:
      loc_hist: [T] int32 — committed summary location per generated
        step (valid up to ``step`` inclusive).
      step: scalar int — last committed generated position.
      threshold: static int (the OPERA ``threshold`` kwarg, default 15).
    Returns:
      (trigger, loc): bool scalar and the shared location.
    """
    idx = jnp.arange(loc_hist.shape[0])
    recent = (idx > step - threshold) & (idx <= step)
    cur = loc_hist[jnp.maximum(step, 0)]
    all_equal = jnp.all(jnp.where(recent, loc_hist == cur, True))
    enough = step >= threshold - 1
    return all_equal & enough, cur
