"""Baseline samplers sharing the engine's towers: VCD and beam search.

VCD (reference models/VCD/vcd_sample.py:24-223 — a monkey-patched HF
sample loop running two models sequentially per step): here the clean and
noised contexts are two batch rows of ONE decode program, each with its
own slice of a stacked KV cache; the contrastive logit combination + the
multinomial draw are fused into the same program.

Beam search (the reference's beam baseline is plain HF `num_beams`,
chair_test.py:295-305): standard batched beam decode — all beams are one
batch axis, cache rows reordered by a gather at each step.  Supports HF's
length_penalty and early_stopping (False / True / "never") knobs with
BeamHypotheses-exact normalization and stopping rules.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..decoding.vcd import contrastive_logits, diffusion_noise
from ..models import llama as llama_mod
from ..models.llama import KVCache
from ..ops.sampling import warp_logits
from .generate import GenerationResult


# ---------------------------------------------------------------------------
# VCD
# ---------------------------------------------------------------------------

def vcd_generate(
    engine, input_ids=None, pixel_values=None, seed: int = 0, states=None
):
    """Visual-contrastive decoding.

    Two prefills (clean / diffusion-noised pixels, noise step
    gen.cd_noise_step — reference test_vcd.py:230 uses 500), then a single
    jitted sampling loop over the stacked contexts.

    Pass ``states=(clean_state, noised_state)`` for engines with
    non-(ids, pixels) prefill signatures (InstructBLIP / LLaVA-NeXT).

    Batching: every row draws noise and samples with the SAME key stream a
    B=1 call would use (per-row vmap with a shared key), so a batched run
    is token-identical to running each image serially — the batched
    `--batch-size` CHAIR path relies on this.

    JAX-version dependency (ADVICE r3): that identity leans on JAX's
    current threefry semantics — random bits depend only on the FLAT
    element count, so a (1, N) draw equals an (N,) draw.  A JAX upgrade
    that changes key derivation (as ``jax_threefry_partitionable`` once
    did) would break batched==serial at runtime without touching any
    shape; the parity tests (tests/test_baselines.py,
    tests/test_chair_cli_end_to_end.py batched-vcd) are the guard — if
    they fail right after a JAX bump, look here first.
    """
    gen = engine.gen
    key = jax.random.key(seed)
    k_noise, k_sample = jax.random.split(key)

    if states is not None:
        state, state_cd = states
    else:
        pixels = jnp.asarray(pixel_values)
        # per-row noise with the shared key == the serial B=1 draw for
        # each image (jax PRNG bits depend on flat element count only)
        noised = jax.vmap(
            lambda p: diffusion_noise(k_noise, p, gen.cd_noise_step)
        )(pixels)
        state = engine.prefill(input_ids, pixels)
        state_cd = engine.prefill(input_ids, np.asarray(noised))

    if llama_mod.cache_is_quantized(state.cache):
        raise NotImplementedError(
            "vcd_generate requires a dense-KV engine (int8_kv=False): the "
            "stacked-context cache concat is dense-layout only"
        )
    B = state.first_token.shape[0]
    T = gen.max_new_tokens
    cfg = engine.cfg

    # stack contexts: rows [0:B] clean, [B:2B] noised
    cache = KVCache(
        jnp.concatenate([state.cache.k, state_cd.cache.k], axis=1),
        jnp.concatenate([state.cache.v, state_cd.cache.v], axis=1),
    )

    # warpers apply AFTER the contrastive cutoff, exactly like the
    # reference (vcd_sample.py:150-161: cutoff -> diffs -> temperature ->
    # top-k -> top-p -> multinomial); neutral knobs compile to nothing
    def _warp(l):
        return warp_logits(l, gen.temperature, gen.top_k, gen.top_p)

    # per-row draw with a SHARED key: row i samples exactly as a B=1 call
    # would (batched == serial token identity)
    def _draw(skey, logits):  # [B, V] -> [B]
        return jax.vmap(lambda l: jax.random.categorical(skey, l))(
            logits
        ).astype(jnp.int32)

    first_logits = contrastive_logits(
        state.last_logits, state_cd.last_logits, gen.cd_alpha, gen.cd_beta
    )
    first_token = _draw(jax.random.fold_in(k_sample, 0), _warp(first_logits))

    def loop_impl(params, cache, cur_len, first_token, k_sample):
        tokens_buf = jnp.full((B, T), gen.pad_token_id, jnp.int32)
        tokens_buf = tokens_buf.at[:, 0].set(first_token)
        done = first_token == gen.eos_token_id
        Smax = cache.k.shape[2]

        def body(carry):
            cache, cur, tok, step, buf, done = carry
            x = llama_mod.embed(params.lm, tok)  # [B, D]
            x2 = jnp.concatenate([x, x], axis=0)[:, None]  # [2B, 1, D]
            cur2 = jnp.concatenate([cur, cur])
            mask = (jnp.arange(Smax)[None, None, :] < cur2[:, None, None])
            mask = jnp.broadcast_to(mask, (2 * B, 1, Smax))
            h, k_new, v_new = llama_mod.decode_step(
                params.lm, cfg.text, x2, cur2, cache, mask
            )
            logits2 = llama_mod.lm_head(params.lm, h)[:, 0]  # [2B, V]
            cd = contrastive_logits(
                logits2[:B], logits2[B:], gen.cd_alpha, gen.cd_beta
            )
            skey = jax.random.fold_in(jax.random.fold_in(k_sample, 1), step)
            nxt = _draw(skey, _warp(cd))
            cache = KVCache(
                cache.k.at[:, jnp.arange(2 * B), cur2].set(k_new[:, :, 0]),
                cache.v.at[:, jnp.arange(2 * B), cur2].set(v_new[:, :, 0]),
            )
            nxt = jnp.where(done, gen.pad_token_id, nxt)
            buf = buf.at[:, step].set(nxt)
            new_done = done | (nxt == gen.eos_token_id)
            return cache, cur + jnp.where(done, 0, 1), nxt, step + 1, buf, new_done

        def cond(carry):
            _, _, _, step, _, done = carry
            return (step < T) & ~jnp.all(done)

        carry = (cache, cur_len, first_token, jnp.ones((), jnp.int32), tokens_buf, done)
        carry = jax.lax.while_loop(cond, body, carry)
        return carry[4]

    # compiled-loop cache: a per-call @jax.jit closure would re-trace and
    # recompile the whole decode program EVERY call (and bake the PRNG key
    # in as a constant) — at 7B that is tens of seconds per image in the
    # CHAIR loop.  Keyed on everything the trace depends on.
    loops = engine.__dict__.setdefault("_vcd_loops", {})
    lk = (B, T, gen)
    if lk not in loops:
        loops[lk] = jax.jit(loop_impl)
    tokens = np.asarray(
        loops[lk](engine.params, cache, state.cur_len, first_token, k_sample)
    )
    eos = gen.eos_token_id
    num = np.array(
        [(np.where(r == eos)[0][0] + 1) if (r == eos).any() else len(r) for r in tokens]
    )
    return GenerationResult(tokens=tokens, num_tokens=num)


# ---------------------------------------------------------------------------
# beam search
# ---------------------------------------------------------------------------

def beam_generate(
    engine,
    input_ids=None,
    pixel_values=None,
    num_beams: int = 3,
    state=None,
    length_penalty: float = 1.0,
    early_stopping=False,
):
    """Beam-search decode.  Pass ``state`` directly for engines with
    non-(ids, pixels) prefill signatures.

    Batched: a [B]-prompt state runs B independent beam searches in ONE
    program — beams flatten to a [B*nb] batch axis for the decode step
    (image i owns rows i*nb..i*nb+nb-1), candidate selection and
    hypothesis bookkeeping vmap per image, and finished images freeze
    (their carry is held by `where`, exactly the state their own serial
    loop exited with; per-image stop steps are recorded so finalize
    normalizes at each image's own exit length).  Row i of the result is
    token-identical to a B=1 call on that prompt.

    Implements HF BeamSearchScorer semantics: per step the top 2*nb
    candidates are scanned in score order — EOS candidates with rank < nb
    become stored hypotheses (without the EOS token appended, normalized
    by ``total_seq_len ** length_penalty``, HF BeamHypotheses.add), others
    refill the nb active beams; the search ends per
    ``early_stopping``/HF is_done:

    - False (default): worst stored hypothesis beats the best running
      beam's score normalized at the CURRENT length;
    - True: nb hypotheses stored;
    - "never": normalized at max length when length_penalty > 0, else at
      the current length (HF's exact rule).

    Known divergence (documented per ADVICE r3): the FIRST expansion
    takes the top-nb prompt-logit tokens directly; HF scans the top 2*nb
    and would divert an EOS candidate with rank < nb into a stored
    hypothesis at step 1.  Reachable only when the model's single most
    likely continuation of the PROMPT is EOS-or-near-EOS (an empty
    caption) — not a captioning regime; every multi-step path is
    HF-exact (pinned across length_penalty x early_stopping grids in
    tests/test_baselines.py).
    """
    if early_stopping not in (False, True, "never"):
        raise ValueError(
            f"early_stopping must be False, True, or 'never'; got"
            f" {early_stopping!r}"
        )
    gen = engine.gen
    if state is None:
        state = engine.prefill(input_ids, pixel_values)
    if llama_mod.cache_is_quantized(state.cache):
        raise NotImplementedError(
            "beam_generate requires a dense-KV engine (int8_kv=False): the "
            "per-step beam-reorder cache gather is dense-layout only"
        )
    nb = num_beams
    B = state.first_token.shape[0]
    T = gen.max_new_tokens
    cfg = engine.cfg
    eos = gen.eos_token_id
    NEG = -1e9

    # image i owns flat cache rows [i*nb, (i+1)*nb)
    cache0 = KVCache(
        jnp.repeat(state.cache.k, nb, axis=1), jnp.repeat(state.cache.v, nb, axis=1)
    )
    # first expansion from the prompt logits: HF takes top nb over vocab
    # of [0 + logp, -inf + ...duplicated beams], i.e. simply top-nb tokens.
    logp0 = jax.nn.log_softmax(state.last_logits, axis=-1)  # [B, V]
    top0, tok0 = jax.lax.top_k(logp0, nb)  # [B, nb]

    def _select(cand_beam, cand_tok, cand_scores, buf_i, hyp_toks0, hyp_sc0,
                hcount0, seq_len):
        """One image's candidate scan (HF BeamSearchScorer.process):
        EOS candidates with rank < nb become stored hypotheses, others
        refill the nb active beams.  vmapped over the image axis."""

        def scan_cand(c, r):
            (hyp_toks, hyp_sc, hcount, sel_beam, sel_tok, sel_score, nsel) = c
            b = cand_beam[r]
            t_ = cand_tok[r]
            s = cand_scores[r]
            is_eos = t_ == eos
            # store hypothesis (eos, rank<nb, slots or better than worst)
            norm = s / seq_len**length_penalty
            worst = jnp.argmin(hyp_sc)
            can_store = is_eos & (r < nb)
            do_store = can_store & ((hcount < nb) | (norm > hyp_sc[worst]))
            hyp_toks = jnp.where(
                do_store, hyp_toks.at[worst].set(buf_i[b]), hyp_toks
            )
            hyp_sc = jnp.where(do_store, hyp_sc.at[worst].set(norm), hyp_sc)
            hcount = jnp.where(can_store, jnp.minimum(hcount + 1, nb), hcount)
            # fill active slot with non-eos candidate
            take = (~is_eos) & (nsel < nb)
            slot = jnp.clip(nsel, 0, nb - 1)
            sel_beam = jnp.where(take, sel_beam.at[slot].set(b), sel_beam)
            sel_tok = jnp.where(take, sel_tok.at[slot].set(t_), sel_tok)
            sel_score = jnp.where(take, sel_score.at[slot].set(s), sel_score)
            nsel = jnp.where(take, nsel + 1, nsel)
            return (hyp_toks, hyp_sc, hcount, sel_beam, sel_tok, sel_score, nsel), None

        init = (
            hyp_toks0,
            hyp_sc0,
            hcount0,
            jnp.zeros((nb,), jnp.int32),
            jnp.full((nb,), gen.pad_token_id, jnp.int32),
            jnp.full((nb,), NEG),
            jnp.zeros((), jnp.int32),
        )
        (hyp_toks, hyp_sc, hcount, sel_beam, sel_tok, sel_score, _), _ = (
            jax.lax.scan(scan_cand, init, jnp.arange(2 * nb))
        )
        return hyp_toks, hyp_sc, hcount, sel_beam, sel_tok, sel_score

    def loop_impl(params, cache, cur_len0, top0, tok0):
        Smax = cache.k.shape[2]
        prompt_len = cur_len0  # [B]
        buf = jnp.full((B, nb, T), gen.pad_token_id, jnp.int32)
        buf = buf.at[:, :, 0].set(tok0)
        scores = top0  # [B, nb] running sum-logprob per active beam
        hyp_tokens = jnp.full((B, nb, T), gen.pad_token_id, jnp.int32)
        hyp_scores = jnp.full((B, nb), -jnp.inf)
        hyp_count = jnp.zeros((B,), jnp.int32)
        rows = jnp.arange(B)[:, None]

        def body(carry):
            (cache, cur, tok, step, buf, scores, hyp_tokens, hyp_scores,
             hyp_count, done, fin_step) = carry
            x = llama_mod.embed(params.lm, tok.reshape(B * nb))[:, None]
            mask = jnp.broadcast_to(
                jnp.arange(Smax)[None, None, :] < cur[:, None, None],
                (B * nb, 1, Smax),
            )
            h, k_new, v_new = llama_mod.decode_step(
                params.lm, cfg.text, x, cur, cache, mask
            )
            # frozen rows keep cur, so this writes junk at their (never
            # attended, mask is `< cur`) next slot — overwritten, unread
            cache = KVCache(
                cache.k.at[:, jnp.arange(B * nb), cur].set(k_new[:, :, 0]),
                cache.v.at[:, jnp.arange(B * nb), cur].set(v_new[:, :, 0]),
            )
            logits = llama_mod.lm_head(params.lm, h)[:, 0]  # [B*nb, V]
            logp = jax.nn.log_softmax(logits, axis=-1).reshape(B, nb, -1)
            V = logp.shape[-1]
            total = (scores[:, :, None] + logp).reshape(B, nb * V)
            cand_scores, cand_idx = jax.lax.top_k(total, 2 * nb)  # [B, 2nb]
            cand_beam = cand_idx // V
            cand_tok = (cand_idx % V).astype(jnp.int32)

            # HF (4.57 stateless _beam_search, utils.py:3087) normalizes a
            # finished candidate by its GENERATED length INCLUDING the eos
            # token: cur_len + 1 - decoder_prompt_len = step + 1 here (the
            # hyp holds `step` buffered tokens + the eos).  Round-5 fix:
            # the prompt term used to be included, which neutralized the
            # length penalty for long prompts and mis-ranked hypotheses
            # of different lengths (verified empirically vs HF on the
            # eos-mid-search test).
            seq_len = jnp.full_like(prompt_len, step + 1).astype(jnp.float32)

            (n_hyp_tokens, n_hyp_scores, n_hyp_count, sel_beam, sel_tok,
             sel_score) = jax.vmap(_select)(
                cand_beam, cand_tok, cand_scores, buf, hyp_tokens,
                hyp_scores, hyp_count, seq_len,
            )

            # freeze finished images: identity reorder, held carry
            sel_beam = jnp.where(done[:, None], jnp.arange(nb)[None, :], sel_beam)
            sel_tok = jnp.where(done[:, None], tok, sel_tok)
            sel_score = jnp.where(done[:, None], scores, sel_score)
            n_hyp_tokens = jnp.where(done[:, None, None], hyp_tokens, n_hyp_tokens)
            n_hyp_scores = jnp.where(done[:, None], hyp_scores, n_hyp_scores)
            n_hyp_count = jnp.where(done, hyp_count, n_hyp_count)

            flat_sel = (rows * nb + sel_beam).reshape(-1)
            cache = KVCache(cache.k[:, flat_sel], cache.v[:, flat_sel])
            buf = buf[rows, sel_beam].at[:, :, step].set(
                jnp.where(done[:, None], buf[rows, sel_beam][:, :, step], sel_tok)
            )
            cur2 = cur.reshape(B, nb)[rows, sel_beam] + jnp.where(
                done[:, None], 0, 1
            )

            # per-image stop test == the serial loop's cond at step+1
            # (HF is_done; early_stopping=False normalizes the best running
            # beam at the CURRENT length, "never" at max length when
            # length_penalty > 0)
            if early_stopping is True:
                search_done = n_hyp_count >= nb
            else:
                # generated-length normalization (HF is_done divides by
                # cur_len - decoder_prompt_len; the running beam holds
                # step + 1 generated tokens after this step)
                if early_stopping == "never" and length_penalty > 0.0:
                    sl = jnp.full_like(prompt_len, T).astype(jnp.float32)
                else:
                    sl = jnp.full_like(prompt_len, step + 1).astype(
                        jnp.float32
                    )
                best_running = jnp.max(sel_score, axis=1) / sl**length_penalty
                search_done = (n_hyp_count >= nb) & (
                    jnp.min(n_hyp_scores, axis=1) >= best_running
                )
            new_done = done | search_done
            fin_step = jnp.where(done | ~new_done, fin_step, step + 1)
            return (
                cache,
                cur2.reshape(-1),
                sel_tok,
                step + 1,
                buf,
                sel_score,
                n_hyp_tokens,
                n_hyp_scores,
                n_hyp_count,
                new_done,
                fin_step,
            )

        def cond(carry):
            step, done = carry[3], carry[9]
            return (step < T) & ~jnp.all(done)

        cur = jnp.repeat(cur_len0.astype(jnp.int32), nb)
        carry = (
            cache,
            cur,
            tok0.astype(jnp.int32),
            jnp.ones((), jnp.int32),
            buf,
            scores,
            hyp_tokens,
            hyp_scores,
            hyp_count,
            jnp.zeros((B,), bool),
            jnp.full((B,), T, jnp.int32),
        )
        carry = jax.lax.while_loop(cond, body, carry)
        (_, _, _, step, buf, scores, hyp_tokens, hyp_scores, hyp_count,
         _, fin_step) = carry
        # finalize (HF BeamSearchScorer.finalize): running beams of
        # NON-done images are offered to the hypothesis set, normalized
        # by each image's own generated exit length; add uses HF's OR
        # rule (store while slots remain OR replace the worst).  Done
        # images are skipped, exactly as HF skips self._done batches.
        seq_len = fin_step.astype(jnp.float32)  # [B] generated lengths
        exit_done = carry[9]

        def finalize(buf_i, scores_i, hyp_toks0, hyp_sc0, hcount0, sl,
                     done_i):
            def add_running(i, st):
                hyp_toks, hyp_sc, hcount = st
                norm = scores_i[i] / sl**length_penalty
                worst = jnp.argmin(hyp_sc)
                do = (~done_i) & ((hcount < nb) | (norm > hyp_sc[worst]))
                hyp_toks = jnp.where(do, hyp_toks.at[worst].set(buf_i[i]), hyp_toks)
                hyp_sc = jnp.where(do, hyp_sc.at[worst].set(norm), hyp_sc)
                hcount = jnp.where(
                    do, jnp.minimum(hcount + 1, nb), hcount
                )
                return hyp_toks, hyp_sc, hcount

            hyp_toks, hyp_sc, _ = jax.lax.fori_loop(
                0, nb, add_running, (hyp_toks0, hyp_sc0, hcount0)
            )
            return hyp_toks[jnp.argmax(hyp_sc)]

        return jax.vmap(finalize)(
            buf, scores, hyp_tokens, hyp_scores, hyp_count, seq_len,
            exit_done,
        )

    # compiled-loop cache (see vcd_generate): a per-call @jax.jit closure
    # would recompile the whole beam program per image AND bake the
    # prompt-expansion logits in as constants
    loops = engine.__dict__.setdefault("_beam_loops", {})
    lk = (B, nb, T, float(length_penalty), early_stopping, gen)
    if lk not in loops:
        loops[lk] = jax.jit(loop_impl)
    tokens = np.asarray(
        loops[lk](engine.params, cache0, state.cur_len, top0, tok0)
    )
    num = np.array(
        [
            (np.where(r == gen.pad_token_id)[0][0])
            if (r == gen.pad_token_id).any()
            else len(r)
            for r in tokens
        ]
    )
    num = np.maximum(num, 1)
    return GenerationResult(tokens=tokens, num_tokens=num)
