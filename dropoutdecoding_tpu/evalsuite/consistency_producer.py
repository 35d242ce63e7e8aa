"""Producer for the LM-consistency analysis inputs.

evalsuite/consistency.lm_consistency consumes
``{image_id: {word_idx: {word: prob}}}`` — the language model's next-word
distribution at each caption-word position given a BLANK image.  The
reference ships only the dormant consumer (lm_consistency.py:34-62 reads
precomputed pickles that don't exist in its repo); this module makes the
analysis actually runnable end to end (`--consistency` on the chair CLI).

Method: teacher-force the generated caption through the SAME engine with
an all-zero image (so only language priors drive the logits), read the
full-sequence logits from one prefill pass, and record the top-k
next-token distribution at each caption word's START token, decoding
candidate tokens to word strings.  Word -> token alignment encodes each
whitespace word with a leading space (the Llama BPE mid-sentence
convention); sub-word candidates map to their decoded text — a standard
first-subtoken approximation, stated here because the reference never
defined one (its pickles are absent).

llava-1.5 only, like the reference analysis (its lm_consistency was
written against LLaVA outputs).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..models import llama as llama_mod


def caption_word_starts(tokenizer, caption: str):
    """[(word, first-token-index-within-caption-token-stream)] plus the
    flat caption token ids."""
    words = caption.split()
    tok_ids = []
    starts = []
    for i, w in enumerate(words):
        piece = (" " + w) if i > 0 else w
        ids = tokenizer(piece, add_special_tokens=False)["input_ids"]
        starts.append((w, len(tok_ids)))
        tok_ids.extend(int(t) for t in ids)
    return starts, tok_ids


def blank_image_distributions(
    engine, processor, prompt: str, caption: str, topk: int = 50
):
    """{word_idx: {word: prob}} for one caption under a blank image.

    word_idx indexes caption.split() — the indexing
    evalsuite/consistency.lm_consistency's ``hallucination_idxs`` uses.
    """
    cfg = engine.cfg
    params = engine.params
    tokenizer = processor.tokenizer

    enc = processor(prompt)
    prompt_ids = np.asarray(enc["input_ids"], np.int32)
    starts, cap_ids = caption_word_starts(tokenizer, caption)
    if not cap_ids:
        return {}
    ids = np.concatenate(
        [prompt_ids, np.asarray([cap_ids], np.int32)], axis=1
    )
    sz = cfg.vision.image_size
    blank = np.zeros((1, 3, sz, sz), np.float32)

    merged, real_len, _aux = engine._merge(params, jnp.asarray(ids), blank)
    B, S, _ = merged.shape
    positions = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
    hidden, _kv = llama_mod.prefill(params.lm, cfg.text, merged, positions)
    import jax

    logits = llama_mod.lm_head(params.lm, hidden)[0]  # [S, V]
    probs = np.asarray(jax.nn.softmax(logits, axis=-1))

    # caption token i sits at merged position S - len(cap_ids) + i; its
    # next-word distribution is the row one position BEFORE it
    base = S - len(cap_ids)
    out = {}
    for w_idx, (_word, t_start) in enumerate(starts):
        row = probs[base + t_start - 1]
        top = np.argsort(row)[::-1][:topk]
        dist = {}
        for t in top:
            word = tokenizer.decode([int(t)]).strip()
            if not word:
                continue
            # merge sub-token duplicates at their max (rank-preserving)
            dist[word] = max(dist.get(word, 0.0), float(row[t]))
        out[w_idx] = dist
    return out
