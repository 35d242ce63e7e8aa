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

Two draft sources (``draft=``):

- ``"lm"``: a draft LM tower of the same architecture (the int4
  self-draft).  Cycle cost = gamma draft streams + one verify stream;
  wins only when acceptance outruns the draft's weight traffic.
- ``"ngram"``: prompt-lookup drafting (the vLLM "ngram" speculator /
  LLMA): match the last bigram of the emitted sequence against its own
  history and propose the tokens that followed last time.  The draft is
  pure data movement — ZERO extra weight streams — so cycle cost is one
  verify stream (== one greedy decode stream at B=1, where weights
  dominate), and ANY positive acceptance is a net win; zero acceptance
  degenerates to greedy speed.  Output is still exactly target-greedy.
  Wins on workloads whose output repeats n-grams (greedy captioning
  loops, extraction/echo, code); measured on-chip in cli/spec_bench.py.
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
    draft_lm: dict | None
    gamma: int = 4
    draft: str = "lm"  # "lm" (draft tower) | "ngram" (prompt lookup)

    def __post_init__(self):
        if getattr(self.engine, "ensemble", True):
            raise ValueError(
                "speculative decoding accelerates the GREEDY baseline "
                "(--original); build the engine with ensemble=False"
            )
        if self.draft not in ("lm", "ngram"):
            raise ValueError(f"draft must be 'lm' or 'ngram': {self.draft}")
        if self.draft == "lm" and self.draft_lm is None:
            raise ValueError("draft='lm' needs a draft_lm tower")
        if self.draft == "lm" and type(self.engine).__name__ != "LlavaEngine":
            # _draft_prefill shares the base engine's merged-embedding
            # signature; the NeXT/InstructBLIP prefill pipelines
            # preprocess their host args before _merge_embeds_impl, so
            # the raw *rest forward would TypeError mid-trace.  The
            # ngram draft (no draft prefill) works for every family.
            raise NotImplementedError(
                "draft='lm' is implemented for LlavaEngine; use "
                "draft='ngram' for LLaVA-NeXT / InstructBLIP engines"
            )
        if self.draft == "lm":
            self._cycle = jax.jit(self._cycle_impl, donate_argnums=(2, 3))
            self._draft_prefill = jax.jit(self._draft_prefill_impl)
        else:
            self._verify = jax.jit(self._verify_cycle_impl,
                                   donate_argnums=(1,))

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

        tcache, g, n_acc = self._verify_body(
            params, tcache, cur_len, token, drafts
        )
        new_cur = cur_len + n_acc + 1
        new_token = g[n_acc][None]
        return tcache, dcache, new_cur, new_token, g, n_acc

    def _verify_body(self, params, tcache, cur_len, token, drafts):
        """ONE target forward over [token, d_1..d_gamma] (prefill_extend
        over the masked shared cache) + longest-matching-prefix
        acceptance.  Shared by both draft sources — the draft only
        chooses the candidate tokens."""
        eng = self.engine
        cfg = eng.cfg
        G = self.gamma
        Smax = eng.max_len

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
        return tcache, g, n_acc

    def _verify_cycle_impl(self, params, tcache, cur_len, token, drafts):
        """Verify-only cycle for externally supplied drafts (the ngram
        host loop): same math as _cycle_impl minus the draft scan."""
        tcache, g, n_acc = self._verify_body(
            params, tcache, cur_len, token, drafts
        )
        new_cur = cur_len + n_acc + 1
        new_token = g[n_acc][None]
        return tcache, new_cur, new_token, g, n_acc

    # ------------------------------------------------------------------
    def _generate_fused_impl(self, params, draft_lm, tcache, dcache,
                             cur_len, token):
        """WHOLE-generation speculative program: every spec cycle runs
        inside ONE `lax.while_loop` dispatch, like the greedy engine's
        whole-decode program.

        Round-3's per-cycle host loop paid a dispatch + host fetch per
        cycle (~25-30 ms over the axon tunnel against ~40 ms of device
        time — the measured 30.5 t/s draft==target bound was
        machinery-bound, round-4 verdict item 5); here the tunnel cost is
        paid once per generation.  Token-identical to `generate`
        (tested): acceptance, EOS handling, and cache movement are the
        same math, only the host/device boundary moved.
        """
        eng = self.engine
        G = self.gamma
        T = eng.gen.max_new_tokens
        eos = eng.gen.eos_token_id
        pad = eng.gen.pad_token_id

        def cycle(carry):
            (tcache, dcache, cur, tok, buf, n_out, done, iters) = carry
            tcache, dcache, new_cur, new_tok, g, n_acc = self._cycle_body(
                params, draft_lm, tcache, dcache, cur, tok
            )
            # tokens emitted this cycle: g[0..n_acc] (n_acc+1 of them),
            # truncated at the first EOS inside the accepted prefix
            idx = jnp.arange(G + 1)
            valid = idx <= n_acc
            is_eos = valid & (g == eos)
            first_eos = jnp.min(jnp.where(is_eos, idx, G + 1))
            n_adv = jnp.minimum(n_acc + 1, first_eos + 1)
            hit_eos = jnp.any(is_eos)

            # write all G+1 candidates at n_out; only n_adv of them are
            # kept (the next cycle's write overwrites the tail)
            emit = jnp.where(idx < n_adv, g, pad)
            buf = jax.lax.dynamic_update_slice(buf, emit, (n_out,))
            n_out2 = n_out + n_adv
            # the caller prepends the prefill argmax: T-1 emitted tokens
            # fill the generation budget
            done2 = done | hit_eos | (n_out2 >= T - 1)
            # when EOS cut the prefix short, the resume token/cur must
            # follow the EMITTED prefix, not the full acceptance
            cur2 = cur + n_adv
            tok2 = g[jnp.minimum(n_adv, G)][None]
            cur2 = jnp.where(hit_eos, cur2, new_cur)
            tok2 = jnp.where(hit_eos, tok2, new_tok)
            return (tcache, dcache, cur2, tok2, buf, n_out2, done2,
                    iters + 1)

        def cond(carry):
            done, iters = carry[6], carry[7]
            return ~done & (iters < T)

        buf = jnp.full((T + G + 1,), pad, jnp.int32)
        # slot 0: the prefill's first token (already emitted by the caller)
        carry = (tcache, dcache, cur_len, token, buf, jnp.int32(0),
                 jnp.zeros((), bool), jnp.int32(0))
        carry = jax.lax.while_loop(cond, cycle, carry)
        tcache, dcache = carry[0], carry[1]
        buf, n_out, iters = carry[4], carry[5], carry[7]
        # the final caches are returned (and discarded by callers) so the
        # donated input cache buffers have matching outputs to alias —
        # without them XLA warns "donated buffers were not usable" and
        # copies the caches at dispatch entry instead of reusing them
        return buf[:T], jnp.minimum(n_out, T), iters, tcache, dcache

    def _cycle_body(self, params, draft_lm, tcache, dcache, cur_len, token):
        """The in-program cycle math shared by _cycle_impl (per-cycle
        dispatch, keeps acceptance stats visible to the host) and
        _generate_fused_impl (whole-generation dispatch): same trace,
        different host/device boundary."""
        return self._cycle_impl(
            params, draft_lm, tcache, dcache, cur_len, token
        )

    # ------------------------------------------------------------------
    # ngram (prompt-lookup) draft: pure data movement, zero weight streams
    def _ngram_drafts(self, buf, n, token):
        """Propose G tokens by matching the emitted sequence's last
        bigram against its own history (most recent match wins — greedy
        loops repeat their latest cycle) and replaying what followed.
        ``buf`` [BUF] holds the n emitted tokens (slot 0 = the prefill
        argmax); entries >= n are pad.  Falls back to repeating the
        current token when no bigram match exists (n < 3 included)."""
        G = self.gamma
        BUF = buf.shape[0]
        idx = jnp.arange(BUF)
        prev = buf[jnp.maximum(n - 2, 0)]
        cur = token[0]
        nxt = jnp.concatenate([buf[1:], jnp.full((1,), -1, buf.dtype)])
        m = (buf == prev) & (nxt == cur) & (idx < n - 2)
        i_star = jnp.max(jnp.where(m, idx, -1))
        found = jax.lax.dynamic_slice(
            buf, (jnp.maximum(i_star, 0) + 2,), (G,)
        )
        return jnp.where(i_star >= 0, found, jnp.full((G,), cur, buf.dtype))

    @staticmethod
    def ngram_propose_np(hist, gamma, pad):
        """Host mirror of _ngram_drafts for the stats-keeping host loop
        (`generate`).  ``hist`` = list/array of emitted tokens."""
        hist = list(hist)
        n = len(hist)
        if n >= 3:
            prev, cur = hist[-2], hist[-1]
            for i in range(n - 3, -1, -1):
                if hist[i] == prev and hist[i + 1] == cur:
                    cont = hist[i + 2 : i + 2 + gamma]
                    out = np.full((gamma,), pad, np.int32)
                    out[: len(cont)] = cont
                    return out
        return np.full((gamma,), hist[-1] if n else pad, np.int32)

    def _generate_fused_ngram_impl(self, params, tcache, cur_len, token,
                                   buf):
        """Whole-generation ngram-speculative program: ONE while_loop
        dispatch; each cycle proposes from the emitted buffer (zero
        weight cost) and runs one verify extend.  ``buf`` arrives with
        the prefill argmax in slot 0; token identity with the greedy
        engine is the acceptance guarantee (tested)."""
        eng = self.engine
        G = self.gamma
        T = eng.gen.max_new_tokens
        eos = eng.gen.eos_token_id
        pad = eng.gen.pad_token_id

        def cycle(carry):
            (tcache, cur, tok, buf, n_out, done, iters) = carry
            drafts = self._ngram_drafts(buf, n_out, tok)
            tcache, g, n_acc = self._verify_body(
                params, tcache, cur, tok, drafts
            )
            new_cur = cur + n_acc + 1
            new_tok = g[n_acc][None]

            idx = jnp.arange(G + 1)
            valid = idx <= n_acc
            is_eos = valid & (g == eos)
            first_eos = jnp.min(jnp.where(is_eos, idx, G + 1))
            n_adv = jnp.minimum(n_acc + 1, first_eos + 1)
            hit_eos = jnp.any(is_eos)

            emit = jnp.where(idx < n_adv, g, pad)
            buf = jax.lax.dynamic_update_slice(buf, emit, (n_out,))
            n_out2 = n_out + n_adv
            done2 = done | hit_eos | (n_out2 >= T)
            cur2 = cur + n_adv
            tok2 = g[jnp.minimum(n_adv, G)][None]
            cur2 = jnp.where(hit_eos, cur2, new_cur)
            tok2 = jnp.where(hit_eos, tok2, new_tok)
            return (tcache, cur2, tok2, buf, n_out2, done2, iters + 1)

        def cond(carry):
            done, iters = carry[5], carry[6]
            return ~done & (iters < T)

        carry = (tcache, cur_len, token, buf, jnp.int32(1),
                 jnp.zeros((), bool), jnp.int32(0))
        carry = jax.lax.while_loop(cond, cycle, carry)
        buf, n_out, iters = carry[3], carry[4], carry[6]
        # return the final cache so the donated tcache aliases an output
        # (see _generate_fused_impl) — callers discard it
        return buf, jnp.minimum(n_out, T), iters, carry[0]

    def _check_headroom(self, state):
        """The verify appends G+1 KV rows at the current position: the
        cache needs ``gamma`` rows past prompt + max_new_tokens, or the
        final cycles' (clamped) block write would corrupt earlier rows
        while the loop is still running."""
        eng = self.engine
        need = int(np.asarray(state.cur_len)[0]) + eng.gen.max_new_tokens \
            + self.gamma
        if need > eng.max_len:
            raise ValueError(
                f"engine max_len={eng.max_len} lacks speculative headroom: "
                f"needs prompt+max_new_tokens+gamma={need} rows "
                f"(build the engine with max_len >= that)"
            )

    def generate_fused(self, input_ids, *rest):
        """Greedy generation through the whole-generation speculative
        program (ONE device dispatch after prefill).  Returns
        (tokens [T'], cycles) — per-cycle acceptance stats live in
        `generate`; this is the deployment path."""
        eng = self.engine
        state = eng.prefill(input_ids, *rest)
        if state.first_token.shape[0] != 1:
            # cycle math is single-stream: block writes land at row 0's
            # cur_len and drafts read row 0 only — a B>1 state would be
            # silently corrupted, not batched
            raise ValueError("speculative decoding runs one image per call")
        self._check_headroom(state)
        first = int(np.asarray(state.first_token)[0])
        T = eng.gen.max_new_tokens
        eos = eng.gen.eos_token_id
        pad = eng.gen.pad_token_id
        if T == 1 or first == eos:
            return np.asarray([first], np.int32), 0
        if self.draft == "ngram":
            if not hasattr(self, "_fused_ng"):
                self._fused_ng = jax.jit(
                    self._generate_fused_ngram_impl, donate_argnums=(1, 4)
                )
            buf0 = jnp.full((T + self.gamma + 1,), pad, jnp.int32)
            buf0 = buf0.at[0].set(first)
            buf, n_out, iters, _ = self._fused_ng(
                eng.params, state.cache, state.cur_len,
                state.first_token, buf0,
            )
            out = np.asarray(buf)[: max(int(np.asarray(n_out)), 1)]
            out = out[:T].astype(np.int32)
        else:
            dcache = self._draft_prefill(
                eng.params, self.draft_lm, jnp.asarray(input_ids), *rest
            )
            if not hasattr(self, "_fused"):
                self._fused = jax.jit(
                    self._generate_fused_impl, donate_argnums=(2, 3)
                )
            # the fused program emits from the token AFTER the prefill
            # argmax
            buf, n_out, iters, _, _ = self._fused(
                eng.params, self.draft_lm, state.cache, dcache,
                state.cur_len, state.first_token,
            )
            buf = np.asarray(buf)[: max(int(np.asarray(n_out)), 0)]
            out = np.concatenate([[first], buf])[:T].astype(np.int32)
        # truncate at eos like the engine's harvest
        hits = np.where(out == eos)[0]
        if hits.size:
            out = out[: hits[0] + 1]
        return out, int(np.asarray(iters))

    def generate(self, input_ids, *rest):
        """Greedy generation, token-identical to ``engine.generate`` on
        the same inputs (exactness is the point; tested).  Returns
        (tokens [T'], cycles, accepted_total) — acceptance stats feed the
        bench's alpha report."""
        eng = self.engine
        state = eng.prefill(input_ids, *rest)
        if state.first_token.shape[0] != 1:
            raise ValueError("speculative decoding runs one image per call")
        self._check_headroom(state)
        ngram = self.draft == "ngram"
        if not ngram:
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
            if ngram:
                drafts = self.ngram_propose_np(
                    out, self.gamma, eng.gen.pad_token_id
                )
                tcache, cur, token, g, n_acc = self._verify(
                    eng.params, tcache, cur, token, jnp.asarray(drafts)
                )
            else:
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
