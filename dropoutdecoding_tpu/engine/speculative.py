"""Greedy speculative decoding — exact target-greedy output from cheap
drafts.

A spec cycle drafts ``gamma`` tokens autoregressively with a cheap tower
(the int4 tier of the same model is the natural self-draft), then runs
ONE target forward over [last_token, d_1..d_gamma] (prefill_extend over
the masked shared cache) and accepts the longest prefix where the
target's own greedy choices match the draft.  Greedy acceptance makes
the output EXACTLY the target-only greedy sequence regardless of draft
quality (tests pin token identity even for a random-weights draft); the
draft only controls speed:

    bytes/token ~ (gamma * draft_bytes + target_bytes) / E[accepted + 1]

At 7B with an int4 draft (3.6 GB) over an int8 target (6.8 GB) and the
acceptance rates trained int4 self-drafts show (~0.7-0.9), gamma=4 puts
this at ~1.3-1.5x single-stream greedy; on this container's synthetic
random weights acceptance is ~0.5 (cli/fused_gap.py --study int4's
greedy agreement), so the bench reports the measured alpha, the measured
rate, and the alpha=1 machinery bound (draft == target weights) — see
STATUS.md.

Zero rollback copies: acceptance only moves the cur_len pointer; rows
past it are junk that the NEXT cycle's verify append always overwrites
before anything can attend them (the append window [cur', cur'+gamma]
is a superset of the junk window for every acceptance count).

The reference has no speculative tier (HF greedy loop throughout);
per-token cost there is K+1 sequential forwards (llava.py:292-376).
Works on dense AND int8-KV engines: the verify extend reads the
quantized prefix directly (ops.attention.extend_attention_int8prefix)
and the block append quantizes per row, bit-identical to the engine's
sequential appends.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama as llama_mod


@dataclass
class SpeculativeGreedy:
    """Wraps a greedy (ensemble=False) engine with a draft tower.

    Args:
      engine: LlavaEngine-family engine (dense KV cache, greedy).
      draft_lm: llama param tree of the SAME architecture (e.g.
        utils.quantize.quantize_llama_params_int4(target_lm)).
      gamma: drafted tokens per cycle.
    """

    engine: Any
    draft_lm: dict
    gamma: int = 4

    def __post_init__(self):
        if getattr(self.engine, "ensemble", True):
            raise ValueError(
                "speculative decoding accelerates the GREEDY baseline "
                "(--original); build the engine with ensemble=False"
            )
        self._cycle = jax.jit(self._cycle_impl, donate_argnums=(2, 3))
        self._draft_prefill = jax.jit(self._draft_prefill_impl)

    # ------------------------------------------------------------------
    def _draft_prefill_impl(self, params, draft_lm, ids, *rest):
        """Draft cache over the same merged prompt embeddings (vision /
        merge shared with the target; only the LM tower differs)."""
        eng = self.engine
        merged, real_len, _aux = eng._merge_embeds_impl(params, ids, *rest)
        B, S, _ = merged.shape
        positions = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
        key_mask = jnp.arange(S)[None, :] < real_len
        _, kv = llama_mod.prefill(
            draft_lm, eng.cfg.text, merged, positions, key_mask=key_mask
        )
        cache = llama_mod.empty_cache(
            eng.cfg.text, B, eng.max_len, eng.param_dtype
        )
        return llama_mod.cache_seed(cache, kv)

    def _cycle_impl(self, params, draft_lm, tcache, dcache, cur_len, token):
        """One spec cycle.  B=1; ``token`` [1] = last emitted (unprocessed)
        token; ``cur_len`` [1] = its position.  Returns the updated caches,
        pointers, the gamma+1 candidate tokens, and the acceptance count."""
        eng = self.engine
        cfg = eng.cfg
        G = self.gamma
        Smax = eng.max_len

        def dstep(carry, _):
            dc, tok, pos = carry
            x = llama_mod.embed(draft_lm, tok)
            mask = (jnp.arange(Smax)[None, :] < pos[:, None])[:, None, :]
            h, kn, vn = llama_mod.decode_step(
                draft_lm, cfg.text, x[:, None], pos, dc, mask
            )
            logits = llama_mod.lm_head(draft_lm, h)[:, 0]
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            dc = llama_mod.cache_set_rows(dc, pos, kn[:, :, 0], vn[:, :, 0])
            return (dc, nxt, pos + 1), nxt

        (dcache, _, _), drafts = jax.lax.scan(
            dstep, (dcache, token, cur_len), None, length=G
        )
        drafts = drafts[:, 0]  # [G]

        toks = jnp.concatenate([token, drafts])[None]  # [1, G+1]
        emb = llama_mod.embed(params.lm, toks)
        positions = cur_len[:, None] + jnp.arange(G + 1)[None]
        prefix_mask = jnp.arange(Smax)[None, :] < cur_len[:, None]
        hidden, kv_new = llama_mod.prefill_extend(
            params.lm, cfg.text, emb, positions, tcache,
            prefix_mask=prefix_mask,
        )
        logits = llama_mod.lm_head(params.lm, hidden)  # [1, G+1, V]
        g = jnp.argmax(logits, axis=-1)[0].astype(jnp.int32)  # [G+1]

        matches = g[:G] == drafts
        n_acc = jnp.sum(jnp.cumprod(matches.astype(jnp.int32)))

        # append the verify KV at rows [cur, cur+G]; rows past the
        # accepted prefix are junk the next cycle's append overwrites.
        # int8 caches quantize per row, so the block write is
        # bit-identical to the engine's sequential appends.
        tcache = llama_mod.cache_write_span(tcache, cur_len[0], kv_new)
        new_cur = cur_len + n_acc + 1
        new_token = g[n_acc][None]
        return tcache, dcache, new_cur, new_token, g, n_acc

    # ------------------------------------------------------------------
    def generate(self, input_ids, *rest):
        """Greedy generation, token-identical to ``engine.generate`` on
        the same inputs (exactness is the point; tested).  Returns
        (tokens [T'], cycles, accepted_total) — acceptance stats feed the
        bench's alpha report."""
        eng = self.engine
        state = eng.prefill(input_ids, *rest)
        dcache = self._draft_prefill(
            eng.params, self.draft_lm, jnp.asarray(input_ids), *rest
        )
        tcache = state.cache
        cur = state.cur_len
        token = state.first_token
        T = eng.gen.max_new_tokens
        eos = eng.gen.eos_token_id

        out = [int(np.asarray(token)[0])]
        cycles = 0
        accepted = 0
        while len(out) < T and out[-1] != eos:
            tcache, dcache, cur, token, g, n_acc = self._cycle(
                eng.params, self.draft_lm, tcache, dcache, cur, token
            )
            n = int(np.asarray(n_acc))
            ems = np.asarray(g)[: n + 1]
            cycles += 1
            accepted += n
            for t in ems:
                out.append(int(t))
                if len(out) >= T or int(t) == eos:
                    break
        return np.asarray(out[:T], np.int32), cycles, accepted
