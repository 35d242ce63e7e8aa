"""OPERA decoding engine: beam search with Over-trust Penalty and
Retrospection-Allocation (decoding/opera.py documents the math).

Reference parity: the reference repo drives OPERA purely through generate
kwargs against an external patched-transformers package it does not ship
(`opera_decoding=True, scale_factor, threshold, num_attn_candidates,
penalty_weights` — chair_test.py:312-323, test_opera.py:196-208).  This
module implements the decoding natively over the shared Llama decoder, so
the `--opera` CLI arm actually runs for all three model families (any
engine whose prefill yields a llama-cache PrefillState).

TPU shape of the search: per step, ONE batched forward scores every
(beam x attention-candidate) pair — `num_beams * num_attn_candidates`
rows of models/llama.decode_step_attn, which also captures each
candidate's self-attention row for the penalty — instead of the
reference-style per-candidate sequential forwards.  Rollback is a
fixed-shape reset inside the same `lax.while_loop` (step/cur snap back,
buffers truncate by masking; the committed KV prefix stays valid in the
cache, so only the logits of the resume position are recomputed — one
extra nb-row forward per rollback, not a replay).  A per-position
rollback cap plus a global iteration bound make the loop provably
terminating.

The compiled search program is cached per (engine, kwargs) — prompt
length and prefill state are runtime arguments, so a 500-image CHAIR run
compiles once.

Cost note: like the reference's OPERA, this is a baseline-quality path —
the candidate fan-out gathers `num_attn_candidates` copies of the beam
cache per step.  It is not served by the fused ensemble kernels.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..decoding.opera import rollback_trigger
from ..models import llama as llama_mod
from .generate import GenerationResult

NEG = -1e9


def _opera_runner(engine, nb, nc, scale_factor, threshold,
                  penalty_weights, length_penalty, max_rollbacks):
    """Build the jitted OPERA search program for one engine + kwargs."""
    gen = engine.gen
    T = gen.max_new_tokens
    cfg = engine.cfg
    eos = gen.eos_token_id
    pad = gen.pad_token_id
    max_iters = T * (1 + max_rollbacks)
    all_live = jnp.ones((nb,), bool)

    # lm params are a TRACED argument, not a closure capture: closing
    # over them bakes the whole tower into the program as constants
    # (measured: 6.88 GB captured during lowering at 7B, >18 min compile)
    @jax.jit
    def run(lm, cache0, prompt_logits, prompt_len):
        Smax = jax.tree.leaves(cache0)[0].shape[2]

        def fwd(cache, tok, pos_scalar, rows):
            """decode_step_attn over `rows` flat rows; mask = < pos."""
            x = llama_mod.embed(lm, tok)  # [rows, D]
            pos = jnp.full((rows,), pos_scalar, jnp.int32)
            key_mask = jnp.arange(Smax)[None, :] < pos_scalar
            key_mask = jnp.broadcast_to(key_mask, (rows, Smax))
            h, k_new, v_new, attn = llama_mod.decode_step_attn(
                lm, cfg.text, x, pos, cache, key_mask
            )
            logits = llama_mod.lm_head(lm, h)  # [rows, V]
            return logits, k_new, v_new, attn

        def cand_phi(attn_log_beams, cand_logrow, step):
            """Over-trust penalty per candidate
            (decoding/opera.overtrust_phi with the candidate row fused
            in, batched over beams x candidates).

            attn_log_beams: [nb, T, T] committed log(scale*w) rows;
            cand_logrow: [nb, nc, T] each candidate's would-be row at
            index ``step``.  Returns (phi [nb, nc], loc [nb, nc])."""
            rows_i = jnp.arange(T)[:, None]
            col = jnp.arange(T)
            # committed contributions to column c: rows c+1 .. step-1
            in_range = (rows_i > col[None, :]) & (rows_i <= step - 1)
            prefix = jnp.sum(
                jnp.where(in_range[None], attn_log_beams, 0.0), axis=1
            )  # [nb, T]
            colsum = prefix[:, None, :] + jnp.where(
                col[None, None, :] < step, cand_logrow, 0.0
            )  # [nb, nc, T]
            colsum = jnp.where(col[None, None, :] < step, colsum, -jnp.inf)
            loc = jnp.argmax(colsum, axis=-1).astype(jnp.int32)
            phi = jnp.where(
                step > 0,
                jnp.exp(
                    jnp.take_along_axis(colsum, loc[..., None], -1)[..., 0]
                ),
                0.0,
            )
            return phi, loc

        def select(cand_scores, cand_tok_flat, buf, hyp_toks, hyp_sc,
                   hcount, seq_len):
            """HF BeamSearchScorer.process over the pooled nb*nc
            candidates: scan the top min(2nb, nb*nc) in penalized-score
            order — EOS candidates with rank < nb become stored
            hypotheses, others refill the nb beams.  Returns the FLAT
            candidate indices selected."""
            n_scan = min(2 * nb, int(cand_scores.shape[0]))
            top_sc, top_ix = jax.lax.top_k(cand_scores, n_scan)

            def scan_cand(c, r):
                hyp_toks, hyp_sc, hcount, sel_ix, sel_s, nsel = c
                ix = top_ix[r]
                b = ix // nc
                t_ = cand_tok_flat[ix]
                s = top_sc[r]
                is_eos = t_ == eos
                norm = s / seq_len**length_penalty
                worst = jnp.argmin(hyp_sc)
                can_store = is_eos & (r < nb)
                do_store = can_store & (
                    (hcount < nb) | (norm > hyp_sc[worst])
                )
                hyp_toks = jnp.where(
                    do_store, hyp_toks.at[worst].set(buf[b]), hyp_toks
                )
                hyp_sc = jnp.where(
                    do_store, hyp_sc.at[worst].set(norm), hyp_sc
                )
                hcount = jnp.where(
                    can_store, jnp.minimum(hcount + 1, nb), hcount
                )
                take = (~is_eos) & (nsel < nb)
                slot = jnp.clip(nsel, 0, nb - 1)
                sel_ix = jnp.where(take, sel_ix.at[slot].set(ix), sel_ix)
                sel_s = jnp.where(take, sel_s.at[slot].set(s), sel_s)
                nsel = jnp.where(take, nsel + 1, nsel)
                return (
                    hyp_toks, hyp_sc, hcount, sel_ix, sel_s, nsel
                ), None

            init = (
                hyp_toks, hyp_sc, hcount,
                jnp.zeros((nb,), jnp.int32),
                jnp.full((nb,), NEG),
                jnp.zeros((), jnp.int32),
            )
            (hyp_toks, hyp_sc, hcount, sel_ix, sel_s, _), _ = jax.lax.scan(
                scan_cand, init, jnp.arange(n_scan)
            )
            return hyp_toks, hyp_sc, hcount, sel_ix, sel_s

        def step_core(carry, logits_cur, step, live):
            """Candidates -> penalty -> selection -> commit for position
            ``step``.  ``live`` [nb] masks beams that may source
            candidates (only beam 0 at step 0, HF first expansion)."""
            (cache, buf, scores, score_hist, attn_log, loc_hist, hyp_toks,
             hyp_sc, hcount, bans, rb_count, total_rb) = carry

            logp = jax.nn.log_softmax(logits_cur, axis=-1)  # [nb, V]
            cand_logp, cand_tok = jax.lax.top_k(logp, nc)  # [nb, nc]
            cand_tok = cand_tok.astype(jnp.int32)
            banned = jnp.any(
                cand_tok[:, :, None] == bans[step][None, None, :], axis=-1
            )
            cand_logp = jnp.where(banned | ~live[:, None], NEG, cand_logp)

            # one batched forward scores all nb*nc candidates
            flat_tok = cand_tok.reshape(nb * nc)
            parent = jnp.repeat(jnp.arange(nb, dtype=jnp.int32), nc)
            cache_cand = jax.tree.map(lambda a: a[:, parent], cache)
            pos = prompt_len + step
            logits_next, k_new, v_new, attn = fwd(
                cache_cand, flat_tok, pos, nb * nc
            )
            # attention over generated columns 0..T-1 (the window)
            row = jax.lax.dynamic_slice_in_dim(attn, prompt_len, T, axis=1)
            logrow = jnp.log(
                jnp.maximum(row * scale_factor, 1e-20)
            ).reshape(nb, nc, T)
            phi, loc = cand_phi(attn_log, logrow, step)  # [nb, nc]

            cand_scores = (
                scores[:, None] + cand_logp - penalty_weights * phi
            ).reshape(nb * nc)
            seq_len = (prompt_len + step + 1).astype(jnp.float32)
            hyp_toks, hyp_sc, hcount, sel_ix, sel_s = select(
                cand_scores, flat_tok, buf, hyp_toks, hyp_sc, hcount,
                seq_len,
            )
            sel_p = sel_ix // nc  # parent beam per selected slot
            sel_t = flat_tok[sel_ix]

            # commit: gather parent rows, write selected candidates' K/V
            cache = jax.tree.map(lambda a: a[:, sel_p], cache)
            cache = llama_mod.cache_set_rows(
                cache,
                jnp.full((nb,), pos, jnp.int32),
                k_new[:, sel_ix],
                v_new[:, sel_ix],
            )
            buf = buf[sel_p].at[:, step].set(sel_t)
            sel_row = logrow.reshape(nb * nc, T)[sel_ix]  # [nb, T]
            sel_row = jnp.where(
                jnp.arange(T)[None, :] < step, sel_row, 0.0
            )
            attn_log = jax.lax.dynamic_update_slice_in_dim(
                attn_log[sel_p], sel_row[:, None, :], step, axis=1
            )
            loc_hist = loc_hist[sel_p].at[:, step].set(
                loc.reshape(nb * nc)[sel_ix]
            )
            scores = sel_s
            score_hist = score_hist[sel_p].at[:, step].set(sel_s)
            logits_sel = logits_next[sel_ix]

            return (
                (cache, buf, scores, score_hist, attn_log, loc_hist,
                 hyp_toks, hyp_sc, hcount, bans, rb_count, total_rb),
                logits_sel,
            )

        def maybe_rollback(carry, step):
            """Retrospection-allocation on the best beam; returns
            (carry, new_step, rolled)."""
            (cache, buf, scores, score_hist, attn_log, loc_hist, hyp_toks,
             hyp_sc, hcount, bans, rb_count, total_rb) = carry
            best = jnp.argmax(scores)
            trig, loc = rollback_trigger(loc_hist[best], step, threshold)
            s = loc + 1  # regenerate just after the summary token
            ok = (
                trig
                & (s >= 1)
                & (s <= step)
                & (rb_count[s] < 1)
                & (total_rb < max_rollbacks)
            )

            idx = jnp.arange(T)
            beyond = idx >= s  # [T] positions to truncate
            bans = bans.at[s].set(jnp.where(ok, buf[:, s], bans[s]))
            buf = jnp.where(ok & beyond[None, :], pad, buf)
            attn_log = jnp.where(
                ok & beyond[None, :, None], 0.0, attn_log
            )
            loc_hist = jnp.where(ok & beyond[None, :], -1, loc_hist)
            scores = jnp.where(
                ok, score_hist[:, jnp.maximum(s - 1, 0)], scores
            )
            score_hist = jnp.where(ok & beyond[None, :], 0.0, score_hist)
            rb_count = jnp.where(ok, rb_count.at[s].add(1), rb_count)
            total_rb = total_rb + jnp.where(ok, 1, 0)
            new_step = jnp.where(ok, s, step + 1)
            return (
                (cache, buf, scores, score_hist, attn_log, loc_hist,
                 hyp_toks, hyp_sc, hcount, bans, rb_count, total_rb),
                new_step,
                ok,
            )

        buf = jnp.full((nb, T), pad, jnp.int32)
        scores = jnp.zeros((nb,))
        score_hist = jnp.zeros((nb, T))
        attn_log = jnp.zeros((nb, T, T), jnp.float32)
        loc_hist = jnp.full((nb, T), -1, jnp.int32)
        hyp_toks = jnp.full((nb, T), pad, jnp.int32)
        hyp_sc = jnp.full((nb,), -jnp.inf)
        hcount = jnp.zeros((), jnp.int32)
        bans = jnp.full((T, nb), -1, jnp.int32)
        rb_count = jnp.zeros((T,), jnp.int32)
        total_rb = jnp.zeros((), jnp.int32)

        carry = (cache0, buf, scores, score_hist, attn_log, loc_hist,
                 hyp_toks, hyp_sc, hcount, bans, rb_count, total_rb)

        # step 0: candidates come from the prompt logits; beams are
        # identical, so only beam 0 is live (HF first expansion)
        logits0 = jnp.broadcast_to(
            prompt_logits, (nb, prompt_logits.shape[-1])
        )
        live0 = jnp.arange(nb) == 0
        carry, logits_cur = step_core(carry, logits0, jnp.int32(0), live0)

        def body(st):
            carry, logits_cur, step, iters, done, rolled = st
            # after a rollback the threaded logits belong to the old
            # branch: recompute from the committed prefix (one nb-row
            # forward; the cache prefix itself is still valid)
            def recompute(c_and_buf):
                cache, buf = c_and_buf
                tok_prev = buf[:, step - 1]
                lg, _, _, _ = fwd(
                    cache, tok_prev, prompt_len + step - 1, nb
                )
                return lg

            logits_cur = jax.lax.cond(
                rolled, recompute, lambda _: logits_cur,
                (carry[0], carry[1]),
            )
            carry, logits_cur = step_core(
                carry, logits_cur, step, all_live
            )
            carry, new_step, rolled = maybe_rollback(carry, step)
            # HF is_done (early_stopping=False): worst stored hypothesis
            # beats the best running beam at the current length
            scores, hyp_sc, hcount = carry[2], carry[7], carry[8]
            sl = (prompt_len + step + 1).astype(jnp.float32)
            best_running = jnp.max(scores) / sl**length_penalty
            done = (hcount >= nb) & (jnp.min(hyp_sc) >= best_running)
            done = done & ~rolled
            return carry, logits_cur, new_step, iters + 1, done, rolled

        def cond(st):
            _, _, step, iters, done, _ = st
            return (step < T) & ~done & (iters < max_iters)

        st = (carry, logits_cur, jnp.int32(1), jnp.int32(0),
              jnp.zeros((), bool), jnp.zeros((), bool))
        carry, _, step, _, _, _ = jax.lax.while_loop(cond, body, st)
        (cache, buf, scores, score_hist, attn_log, loc_hist, hyp_toks,
         hyp_sc, hcount, bans, rb_count, total_rb) = carry

        # finalize (HF): top up with running beams at the exit length
        sl = (prompt_len + step).astype(jnp.float32)

        def add_running(i, stt):
            hyp_toks, hyp_sc, hcount = stt
            norm = scores[i] / sl**length_penalty
            worst = jnp.argmin(hyp_sc)
            do = (hcount < nb) & (norm > hyp_sc[worst])
            hyp_toks = jnp.where(
                do, hyp_toks.at[worst].set(buf[i]), hyp_toks
            )
            hyp_sc = jnp.where(do, hyp_sc.at[worst].set(norm), hyp_sc)
            hcount = jnp.where(do, hcount + 1, hcount)
            return hyp_toks, hyp_sc, hcount

        hyp_toks, hyp_sc, _ = jax.lax.fori_loop(
            0, nb, add_running, (hyp_toks, hyp_sc, hcount)
        )
        return hyp_toks[jnp.argmax(hyp_sc)], total_rb

    return run


def opera_generate(
    engine,
    input_ids=None,
    pixel_values=None,
    state=None,
    num_beams: int = 3,
    scale_factor: float = 50.0,
    threshold: int = 15,
    num_attn_candidates: int = 5,
    penalty_weights: float = 1.0,
    length_penalty: float = 1.0,
    max_rollbacks: int = 8,
):
    """OPERA beam decode.  Pass ``state`` directly for engines with
    non-(ids, pixels) prefill signatures (InstructBLIP / LLaVA-NeXT).

    Kwargs mirror the reference generate surface (test_opera.py:196-208;
    chair_test.py:312-323 uses scale_factor=5, threshold=15,
    num_attn_candidates=1, penalty_weights=1 with num_beams=3).
    ``max_rollbacks`` bounds total retrospections (not part of the
    reference surface; each position may trigger at most once).

    B=1 only: rollback makes per-image step counters diverge, so batched
    images would serialize anyway — the CLI loops images.
    """
    if state is None:
        state = engine.prefill(input_ids, pixel_values)
    if state.first_token.shape[0] != 1:
        raise ValueError("opera_generate runs one image per call (B=1)")
    if num_attn_candidates < 1:
        raise ValueError("num_attn_candidates must be >= 1")

    key = (
        num_beams, float(scale_factor), int(threshold),
        num_attn_candidates, float(penalty_weights), float(length_penalty),
        int(max_rollbacks),
    )
    runners = engine.__dict__.setdefault("_opera_runners", {})
    if key not in runners:
        runners[key] = _opera_runner(
            engine, num_beams, num_attn_candidates, float(scale_factor),
            int(threshold), float(penalty_weights), float(length_penalty),
            int(max_rollbacks),
        )

    # beams: cache rows 0..nb-1 (all start as copies of the prompt row)
    nb = num_beams
    cache0 = jax.tree.map(
        lambda a: jnp.broadcast_to(
            a, (a.shape[0], nb) + a.shape[2:]
        ) + jnp.zeros((), a.dtype),
        state.cache,
    )
    prompt_len = state.cur_len.astype(jnp.int32)[0]
    tokens, _total_rb = runners[key](
        engine.params.lm, cache0, state.last_logits[0], prompt_len
    )
    pad = engine.gen.pad_token_id
    tokens = np.asarray(tokens)[None]
    num = np.array(
        [
            (np.where(r == pad)[0][0]) if (r == pad).any() else len(r)
            for r in tokens
        ]
    )
    num = np.maximum(num, 1)
    return GenerationResult(tokens=tokens, num_tokens=num)
