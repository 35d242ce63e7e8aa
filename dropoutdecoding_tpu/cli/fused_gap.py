"""Quantify the fused-step semantic gap (exact vs fused dropout decoding).

The exact mode reproduces the reference's step semantics: the overlap
keep-set is derived from the CURRENT step's unmasked argmax (reference
llava.py:305->345), costing a second forward per token.  The fused mode
(EnsembleConfig.fused_step) folds the unmasked member into one width-(K+1)
forward and uses the PREVIOUS step's unmasked argmax for the keep-set —
one weight stream per token, but a one-step lag in the overlap source.

This study measures what that lag does to outputs:

- token agreement between exact and fused runs from the same prefill and
  the same RNG stream (the semantic gap);
- token agreement between two exact runs under different RNG seeds (the
  method's intrinsic run-to-run noise floor — the reference itself varies
  by +-2 CHAIRs across seeds, SURVEY.md §6);
- exact vs plain greedy (the method's effect size, for scale);
- per-step vote-winner index distributions for exact vs fused (total
  variation distance).

Every study loop is validated against the engine: the exact replica's
tokens must equal LlavaEngine.generate's before any number is reported.

Usage:  python -m dropoutdecoding_tpu.cli.fused_gap [--prompts N]
        [--seeds N] [--tokens T] [--hidden D] [--layers L] [--json]
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _build(hidden, layers, vocab, seed):
    import jax
    import jax.numpy as jnp

    from ..models import llava as llava_mod
    from ..utils.config import ClipVisionConfig, LlamaConfig, LlavaConfig

    cfg = LlavaConfig(
        text=LlamaConfig(
            vocab_size=vocab,
            hidden_size=hidden,
            intermediate_size=hidden * 2,
            num_hidden_layers=layers,
            num_attention_heads=8,
            num_key_value_heads=4,
            head_dim=hidden // 8,
        ),
        vision=ClipVisionConfig(
            hidden_size=hidden // 2,
            intermediate_size=hidden,
            num_hidden_layers=2,
            num_attention_heads=4,
            image_size=56,
            patch_size=14,
        ),
        image_token_index=vocab - 2,
        pad_token_id=vocab - 1,
    )
    params = llava_mod.init_params(cfg, jax.random.key(seed), jnp.float32)
    return cfg, params


def _engine(cfg, params, *, fused, ensemble=True, seed, T,
            mask_policy="epis"):
    import jax.numpy as jnp

    from ..engine.generate import LlavaEngine
    from ..utils.config import EnsembleConfig, GenerationConfig

    e = LlavaEngine(
        cfg=cfg,
        params=params,
        ens=EnsembleConfig(fused_step=fused, mask_policy=mask_policy),
        gen=GenerationConfig(max_new_tokens=T, eos_token_id=-1, pad_token_id=0),
        max_len=64 + T,
        ensemble=ensemble,
        seed=seed,
    )
    e.param_dtype = jnp.float32
    return e


def _stepper(engine, fused):
    """One decode step mirroring engine._one_step's two modes, but also
    returning the vote-winner index.  Faithfulness is asserted by the
    caller (replica tokens == engine.generate tokens)."""
    import jax
    import jax.numpy as jnp

    from ..decoding.aggregate import select_by_vote
    from ..models import llama as llama_mod

    cfg = engine.cfg
    K = engine.ens.k
    Smax = engine.max_len

    def step(params, state, cache, cur_len, token, steps, tm, prev_argmax0,
             prev_logits0):
        B = token.shape[0]
        x = llama_mod.embed(params.lm, token)
        base = jnp.arange(Smax)[None, :] < cur_len[:, None]
        if fused:
            # lagged sources: previous step's unmasked argmax (overlap)
            # and logits (epis_kl keep-set) — engine _one_step fused mode
            drop = engine._member_drop_slots(
                state, prev_argmax0, prev_logits0, steps, cur_len, tm
            )
            masks = jnp.concatenate(
                [base[:, None, :], base[:, None, :] & ~drop], axis=1
            )
            xa = jnp.broadcast_to(x[:, None], (B, K + 1, x.shape[-1]))
            ha, ka, va = llama_mod.decode_step(
                params.lm, cfg.text, xa, cur_len, cache, masks
            )
            logits_all = llama_mod.lm_head(params.lm, ha)
            argmax0 = jnp.argmax(logits_all[:, 0], -1)
            winner, next_token = jax.vmap(select_by_vote)(logits_all[:, 1:])
            kw = jnp.take_along_axis(
                ka, (winner + 1)[None, :, None, None, None], 2
            )[:, :, 0]
            vw = jnp.take_along_axis(
                va, (winner + 1)[None, :, None, None, None], 2
            )[:, :, 0]
        else:
            h0, _, _ = llama_mod.decode_step(
                params.lm, cfg.text, x[:, None], cur_len, cache, base[:, None]
            )
            logits0 = llama_mod.lm_head(params.lm, h0)[:, 0]
            argmax0 = jnp.argmax(logits0, -1)
            drop = engine._member_drop_slots(
                state, argmax0, logits0, steps, cur_len, tm
            )
            xk = jnp.broadcast_to(x[:, None], (B, K, x.shape[-1]))
            hk, kk, vk = llama_mod.decode_step(
                params.lm, cfg.text, xk, cur_len, cache, base[:, None] & ~drop
            )
            logits_k = llama_mod.lm_head(params.lm, hk)
            winner, next_token = jax.vmap(select_by_vote)(logits_k)
            kw = jnp.take_along_axis(
                kk, winner[None, :, None, None, None], 2
            )[:, :, 0]
            vw = jnp.take_along_axis(
                vk, winner[None, :, None, None, None], 2
            )[:, :, 0]
        cache = llama_mod.cache_set_rows(cache, cur_len, kw, vw)
        if fused:
            logits0 = logits_all[:, 0]
        new_prev_logits0 = (
            logits0 if engine._lag_kl else prev_logits0
        )
        return (cache, next_token.astype(jnp.int32), winner, argmax0,
                new_prev_logits0)

    return jax.jit(step)


def _run_with_winners(engine, state, T, fused, step=None):
    """Decode T tokens step by step, returning (tokens, winners).

    Pass a prebuilt ``step`` (from ``_stepper``) to reuse its compiled
    program across prompts/runs — at the 7B shape each ``_stepper`` call
    would otherwise recompile."""
    import jax.numpy as jnp

    from ..engine.generate import TextMaskState

    B = state.first_token.shape[0]
    tm = TextMaskState(
        jnp.zeros((B, T), jnp.float32),
        jnp.zeros((B, T), jnp.float32),
        jnp.zeros((B, T), jnp.float32),
    )
    if step is None:
        step = _stepper(engine, fused)
    cache, cur_len = state.cache, state.cur_len
    token = state.first_token
    prev_argmax0 = state.first_token.astype(jnp.int32)
    prev_logits0 = (
        state.last_logits
        if engine._lag_kl
        else jnp.zeros((B, 1), jnp.float32)
    )
    tokens, winners = [int(token[0])], []
    for s in range(1, T):
        cache, token, winner, prev_argmax0, prev_logits0 = step(
            engine.params, state, cache, cur_len,
            token, jnp.full((B,), s, jnp.int32), tm, prev_argmax0,
            prev_logits0,
        )
        cur_len = cur_len + 1
        tokens.append(int(token[0]))
        winners.append(int(winner[0]))
    return np.asarray(tokens), np.asarray(winners)


def _agreement(a: np.ndarray, b: np.ndarray) -> dict:
    eq = a == b
    first_div = int(np.argmin(eq)) if not eq.all() else len(a)
    return {"match_rate": float(eq.mean()), "prefix_len": first_div}


def run_study(hidden, layers, vocab, n_prompts, n_seeds, T, model_seed=0,
              mask_policy="epis"):
    import jax.numpy as jnp

    cfg, params = _build(hidden, layers, vocab, model_seed)
    r = np.random.default_rng(model_seed)
    img = cfg.image_token_index

    rows = []
    winner_counts = {"exact": np.zeros(3), "fused": np.zeros(3)}
    for p in range(n_prompts):
        ids = np.array(
            [[1, int(r.integers(3, vocab - 3)), img,
              int(r.integers(3, vocab - 3)), 5]], np.int32
        )
        px = r.normal(size=(1, 3, 56, 56)).astype(np.float32)
        for s in range(n_seeds):
            seed = 24 + 1000 * s
            exact = _engine(cfg, params, fused=False, seed=seed, T=T,
                            mask_policy=mask_policy)
            fusedE = _engine(cfg, params, fused=True, seed=seed, T=T,
                             mask_policy=mask_policy)
            exact2 = _engine(cfg, params, fused=False, seed=seed + 7, T=T,
                             mask_policy=mask_policy)
            greedy = _engine(cfg, params, fused=False, ensemble=False,
                             seed=seed, T=T)

            st = exact.prefill(ids, px)
            tok_e, win_e = _run_with_winners(exact, st, T, fused=False)
            # faithfulness: replica == engine's own while_loop generate
            eng_tokens = np.asarray(exact._decode(exact.params, st)[0])[0]
            np.testing.assert_array_equal(tok_e, eng_tokens)

            tok_f, win_f = _run_with_winners(fusedE, st, T, fused=True)
            eng_tokens_f = np.asarray(fusedE._decode(fusedE.params, st)[0])[0]
            np.testing.assert_array_equal(tok_f, eng_tokens_f)

            tok_e2 = np.asarray(exact2._decode(exact2.params, st)[0])[0]
            tok_g = np.asarray(greedy._decode(greedy.params, st)[0])[0]

            rows.append({
                "prompt": p, "seed": s,
                "exact_vs_fused": _agreement(tok_e, tok_f),
                "exact_vs_exact_seed": _agreement(tok_e, tok_e2),
                "exact_vs_greedy": _agreement(tok_e, tok_g),
            })
            for w in win_e:
                winner_counts["exact"][w] += 1
            for w in win_f:
                winner_counts["fused"][w] += 1

    def summarize(key):
        m = [r[key]["match_rate"] for r in rows]
        pl = [r[key]["prefix_len"] for r in rows]
        return {
            "mean_match_rate": round(float(np.mean(m)), 4),
            "mean_prefix_len": round(float(np.mean(pl)), 2),
            "runs": len(m),
        }

    pe = winner_counts["exact"] / max(winner_counts["exact"].sum(), 1)
    pf = winner_counts["fused"] / max(winner_counts["fused"].sum(), 1)
    return {
        "config": {"hidden": hidden, "layers": layers, "vocab": vocab,
                   "prompts": n_prompts, "seeds": n_seeds, "tokens": T,
                   "mask_policy": mask_policy},
        "exact_vs_fused": summarize("exact_vs_fused"),
        "exact_vs_exact_seed_noise_floor": summarize("exact_vs_exact_seed"),
        "exact_vs_greedy_effect_size": summarize("exact_vs_greedy"),
        "winner_dist_exact": [round(float(x), 4) for x in pe],
        "winner_dist_fused": [round(float(x), 4) for x in pf],
        "winner_tv_distance": round(float(np.abs(pe - pf).sum() / 2), 4),
    }


def run_int8_study(hidden, layers, vocab, n_prompts, n_seeds, T, model_seed=0):
    """int8 (weights + KV cache) vs full-precision token agreement, with
    the method's cross-seed variability as the noise floor — the quality
    evidence for the int8 deployment config (utils/quantize.py +
    engine int8_kv).  Unlike the fused study, each arm runs its own
    prefill (quantized weights change the prefill logits too)."""
    import jax.numpy as jnp

    from ..utils.quantize import quantize_llama_params

    cfg, params = _build(hidden, layers, vocab, model_seed)
    qparams = params._replace(lm=quantize_llama_params(params.lm))
    r = np.random.default_rng(model_seed)
    img = cfg.image_token_index

    prompts = []
    for p in range(n_prompts):
        ids = np.array(
            [[1, int(r.integers(3, vocab - 3)), img,
              int(r.integers(3, vocab - 3)), 5]], np.int32
        )
        px = r.normal(size=(1, 3, 56, 56)).astype(np.float32)
        prompts.append((ids, px))

    def mk(prm, int8_kv, seed, ensemble=True):
        e = _engine(cfg, prm, fused=False, seed=seed, T=T, ensemble=ensemble)
        e.int8_kv = int8_kv
        e.__post_init__()
        return e

    rows = []
    for s in range(n_seeds):
        seed = 24 + 1000 * s
        # compile each arm once per seed; reuse across prompts
        arms = {
            "fp": mk(params, False, seed),
            "int8": mk(qparams, True, seed),
            "fp_seed2": mk(params, False, seed + 7),
            "g_fp": mk(params, False, seed, ensemble=False),
            "g_int8": mk(qparams, True, seed, ensemble=False),
        }

        def gen(e, ids, px):
            st = e.prefill(ids, px)
            return np.asarray(e._decode(e.params, st)[0])[0]

        for ids, px in prompts:
            tok = {name: gen(e, ids, px) for name, e in arms.items()}
            rows.append({
                "fp_vs_int8": _agreement(tok["fp"], tok["int8"]),
                "fp_vs_fp_seed": _agreement(tok["fp"], tok["fp_seed2"]),
                "greedy_fp_vs_int8": _agreement(tok["g_fp"], tok["g_int8"]),
            })

    def summarize(key):
        m = [r[key]["match_rate"] for r in rows]
        pl = [r[key]["prefix_len"] for r in rows]
        return {
            "mean_match_rate": round(float(np.mean(m)), 4),
            "mean_prefix_len": round(float(np.mean(pl)), 2),
            "runs": len(m),
        }

    return {
        "config": {"hidden": hidden, "layers": layers, "vocab": vocab,
                   "prompts": n_prompts, "seeds": n_seeds, "tokens": T},
        "exact_fp_vs_int8": summarize("fp_vs_int8"),
        "exact_fp_vs_fp_seed_noise_floor": summarize("fp_vs_fp_seed"),
        "greedy_fp_vs_int8": summarize("greedy_fp_vs_int8"),
    }


def run_int4_study(hidden, layers, vocab, n_prompts, n_seeds, T, model_seed=0):
    """int4 (group-wise packed weights + int8 KV) vs full precision AND vs
    the int8 deployment arm, with the cross-seed noise floor — the quality
    evidence for --quantize int4 (utils/quantize.quantize_matrix_int4).
    The int8-vs-int4 comparison isolates the extra drift of dropping from
    8 to 4 weight bits under the identical cache/config."""
    import jax.numpy as jnp  # noqa: F401

    from ..utils.quantize import (
        quantize_llama_params,
        quantize_llama_params_int4,
    )

    cfg, params = _build(hidden, layers, vocab, model_seed)
    g = 128
    while hidden % (2 * g) or (2 * hidden) % (2 * g):
        g //= 2
    q8 = params._replace(lm=quantize_llama_params(params.lm))
    q4 = params._replace(lm=quantize_llama_params_int4(params.lm, group_size=g))
    r = np.random.default_rng(model_seed)
    img = cfg.image_token_index

    prompts = []
    for _p in range(n_prompts):
        ids = np.array(
            [[1, int(r.integers(3, vocab - 3)), img,
              int(r.integers(3, vocab - 3)), 5]], np.int32
        )
        px = r.normal(size=(1, 3, 56, 56)).astype(np.float32)
        prompts.append((ids, px))

    def mk(prm, int8_kv, seed, ensemble=True):
        e = _engine(cfg, prm, fused=False, seed=seed, T=T, ensemble=ensemble)
        e.int8_kv = int8_kv
        e.__post_init__()
        return e

    rows = []
    for s in range(n_seeds):
        seed = 24 + 1000 * s
        arms = {
            "fp": mk(params, False, seed),
            "int8": mk(q8, True, seed),
            "int4": mk(q4, True, seed),
            "fp_seed2": mk(params, False, seed + 7),
            "g_fp": mk(params, False, seed, ensemble=False),
            "g_int4": mk(q4, True, seed, ensemble=False),
        }

        def gen(e, ids, px):
            st = e.prefill(ids, px)
            return np.asarray(e._decode(e.params, st)[0])[0]

        for ids, px in prompts:
            tok = {name: gen(e, ids, px) for name, e in arms.items()}
            rows.append({
                "fp_vs_int4": _agreement(tok["fp"], tok["int4"]),
                "int8_vs_int4": _agreement(tok["int8"], tok["int4"]),
                "fp_vs_fp_seed": _agreement(tok["fp"], tok["fp_seed2"]),
                "greedy_fp_vs_int4": _agreement(tok["g_fp"], tok["g_int4"]),
            })

    def summarize(key):
        m = [r[key]["match_rate"] for r in rows]
        pl = [r[key]["prefix_len"] for r in rows]
        return {
            "mean_match_rate": round(float(np.mean(m)), 4),
            "mean_prefix_len": round(float(np.mean(pl)), 2),
            "runs": len(m),
        }

    return {
        "config": {"hidden": hidden, "layers": layers, "vocab": vocab,
                   "prompts": n_prompts, "seeds": n_seeds, "tokens": T,
                   "int4_group": g},
        "exact_fp_vs_int4": summarize("fp_vs_int4"),
        "exact_int8_vs_int4": summarize("int8_vs_int4"),
        "exact_fp_vs_fp_seed_noise_floor": summarize("fp_vs_fp_seed"),
        "greedy_fp_vs_int4": summarize("greedy_fp_vs_int4"),
    }


def run_w8a8_study(hidden, layers, vocab, n_prompts, n_seeds, T, model_seed=0):
    """w8a8 prefill (int8 activations on the int8 MXU) vs bf16-activation
    prefill over IDENTICAL int8 weights — isolates the activation-
    quantization drift of models/llama._mm_w8a8, with the method's
    cross-seed variability as the noise floor.  Decode is identical in
    both arms (w8a8 is prefill-only), so any disagreement enters through
    the prefill logits / uncertainty / projection tables / first token."""
    import jax.numpy as jnp

    from ..utils.quantize import quantize_llama_params

    cfg, params = _build(hidden, layers, vocab, model_seed)
    qparams = params._replace(lm=quantize_llama_params(params.lm))
    r = np.random.default_rng(model_seed)
    img = cfg.image_token_index

    prompts = []
    for p in range(n_prompts):
        ids = np.array(
            [[1, int(r.integers(3, vocab - 3)), img,
              int(r.integers(3, vocab - 3)), 5]], np.int32
        )
        px = r.normal(size=(1, 3, 56, 56)).astype(np.float32)
        prompts.append((ids, px))

    def mk(w8a8, seed, ensemble=True):
        e = _engine(cfg, qparams, fused=False, seed=seed, T=T, ensemble=ensemble)
        e.w8a8_prefill = w8a8
        e.__post_init__()
        return e

    rows = []
    for s in range(n_seeds):
        seed = 24 + 1000 * s
        arms = {
            "a16": mk(False, seed),
            "a8": mk(True, seed),
            "a16_seed2": mk(False, seed + 7),
            "g_a16": mk(False, seed, ensemble=False),
            "g_a8": mk(True, seed, ensemble=False),
        }

        def gen(e, ids, px):
            st = e.prefill(ids, px)
            return np.asarray(e._decode(e.params, st)[0])[0]

        for ids, px in prompts:
            tok = {name: gen(e, ids, px) for name, e in arms.items()}
            rows.append({
                "a16_vs_a8": _agreement(tok["a16"], tok["a8"]),
                "a16_vs_a16_seed": _agreement(tok["a16"], tok["a16_seed2"]),
                "greedy_a16_vs_a8": _agreement(tok["g_a16"], tok["g_a8"]),
            })

    def summarize(key):
        m = [r[key]["match_rate"] for r in rows]
        pl = [r[key]["prefix_len"] for r in rows]
        return {
            "mean_match_rate": round(float(np.mean(m)), 4),
            "mean_prefix_len": round(float(np.mean(pl)), 2),
            "runs": len(m),
        }

    return {
        "config": {"hidden": hidden, "layers": layers, "vocab": vocab,
                   "prompts": n_prompts, "seeds": n_seeds, "tokens": T},
        "exact_a16_vs_a8": summarize("a16_vs_a8"),
        "exact_a16_vs_a16_seed_noise_floor": summarize("a16_vs_a16_seed"),
        "greedy_a16_vs_a8": summarize("greedy_a16_vs_a8"),
    }


def run_w8a8_decode_study(hidden, layers, vocab, n_prompts, n_seeds, T,
                          model_seed=0):
    """w8a8 DECODE projections (models/llama.decode_step(w8a8=True), the
    int8-MXU feed for the compute-bound large-batch configs) vs the bf16
    feed over IDENTICAL int8 weights.  Unlike the prefill study the
    activation-quantization error here compounds across decode steps (each
    step's hidden state feeds the next through the KV cache and token
    choice), so the study reports token agreement against the method's
    cross-seed noise floor.  Prefill is bf16-activation in BOTH arms."""
    from ..utils.quantize import quantize_llama_params

    cfg, params = _build(hidden, layers, vocab, model_seed)
    qparams = params._replace(lm=quantize_llama_params(params.lm))
    r = np.random.default_rng(model_seed)
    img = cfg.image_token_index

    prompts = []
    for p in range(n_prompts):
        ids = np.array(
            [[1, int(r.integers(3, vocab - 3)), img,
              int(r.integers(3, vocab - 3)), 5]], np.int32
        )
        px = r.normal(size=(1, 3, 56, 56)).astype(np.float32)
        prompts.append((ids, px))

    def mk(w8a8, seed, ensemble=True):
        e = _engine(cfg, qparams, fused=False, seed=seed, T=T, ensemble=ensemble)
        e.w8a8_decode = w8a8
        e.__post_init__()
        return e

    rows = []
    for s in range(n_seeds):
        seed = 24 + 1000 * s
        arms = {
            "a16": mk(False, seed),
            "a8": mk(True, seed),
            "a16_seed2": mk(False, seed + 7),
            "g_a16": mk(False, seed, ensemble=False),
            "g_a8": mk(True, seed, ensemble=False),
        }

        def gen(e, ids, px):
            st = e.prefill(ids, px)
            return np.asarray(e._decode(e.params, st)[0])[0]

        for ids, px in prompts:
            tok = {name: gen(e, ids, px) for name, e in arms.items()}
            rows.append({
                "a16_vs_a8": _agreement(tok["a16"], tok["a8"]),
                "a16_vs_a16_seed": _agreement(tok["a16"], tok["a16_seed2"]),
                "greedy_a16_vs_a8": _agreement(tok["g_a16"], tok["g_a8"]),
            })

    def summarize(key):
        m = [r[key]["match_rate"] for r in rows]
        pl = [r[key]["prefix_len"] for r in rows]
        return {
            "mean_match_rate": round(float(np.mean(m)), 4),
            "mean_prefix_len": round(float(np.mean(pl)), 2),
            "runs": len(m),
        }

    return {
        "config": {"hidden": hidden, "layers": layers, "vocab": vocab,
                   "prompts": n_prompts, "seeds": n_seeds, "tokens": T},
        "exact_a16_vs_a8decode": summarize("a16_vs_a8"),
        "exact_a16_vs_a16_seed_noise_floor": summarize("a16_vs_a16_seed"),
        "greedy_a16_vs_a8decode": summarize("greedy_a16_vs_a8"),
    }


def run_production_study(n_prompts, T, voting_probs, model_seed=0,
                         mask_policy="epis"):
    """Exact-vs-fused semantic gap at EXACT LLaVA-1.5-7B shape — 32
    layers, h4096, V=32064, ViT-L/336 — with synthetic int8 weights +
    int8 KV cache, i.e. the deployment configuration the fused-mode
    headline claims are made for (round-2 verdict: the lag evidence must
    be at the scale of the claim, reference llava.py:305->345).

    Compile-reuse design: ONE engine per mode; RNG variation for the
    noise floor goes through ``state.rng_id`` (the engine folds
    fold_in(fold_in(key(seed), step), rng_id) per draw), so reseeding
    never recompiles the 7B programs."""
    import jax
    import jax.numpy as jnp

    from ..engine.generate import LlavaEngine
    from ..utils.config import EnsembleConfig, GenerationConfig
    from ..utils.synthetic import synthetic_llava_7b

    cfg, params = synthetic_llava_7b(jax.random.key(model_seed))
    K = len(voting_probs)

    def mk(fused, ensemble=True):
        return LlavaEngine(
            cfg=cfg,
            params=params,
            ens=EnsembleConfig(
                voting_probs=tuple(voting_probs),
                fused_step=fused,
                mask_policy=mask_policy,
            ),
            gen=GenerationConfig(
                max_new_tokens=T, eos_token_id=-1, pad_token_id=0
            ),
            max_len=608 + T,
            ensemble=ensemble,
            seed=24,
            int8_kv=True,
        )

    exact = mk(False)
    fusedE = mk(True)
    greedy = mk(False, ensemble=False)
    step_e = _stepper(exact, fused=False)
    step_f = _stepper(fusedE, fused=True)

    r = np.random.default_rng(model_seed)
    img = cfg.image_token_index
    rows = []
    wc = {"exact": np.zeros(K), "fused": np.zeros(K)}
    validated = False
    for p in range(n_prompts):
        row = [1] + [int(x) for x in r.integers(4, 30000, 30)] + [5]
        row[4] = img
        ids = np.asarray([row], np.int32)
        px = r.normal(size=(1, 3, 336, 336)).astype(np.float32)
        st = exact.prefill(ids, px)

        tok_e, win_e = _run_with_winners(exact, st, T, fused=False, step=step_e)
        tok_f, win_f = _run_with_winners(fusedE, st, T, fused=True, step=step_f)
        if not validated:
            # faithfulness: replica == the engine's own while_loop generate
            np.testing.assert_array_equal(
                tok_e, np.asarray(exact._decode(exact.params, st)[0])[0]
            )
            np.testing.assert_array_equal(
                tok_f, np.asarray(fusedE._decode(fusedE.params, st)[0])[0]
            )
            validated = True
        # noise floor: identical prompt, independent RNG stream
        st2 = st._replace(rng_id=st.rng_id + 104729 * (p + 1))
        tok_e2, _ = _run_with_winners(exact, st2, T, fused=False, step=step_e)
        tok_g = np.asarray(greedy._decode(greedy.params, st)[0])[0]

        rows.append({
            "prompt": p,
            "exact_vs_fused": _agreement(tok_e, tok_f),
            "exact_vs_exact_seed": _agreement(tok_e, tok_e2),
            "exact_vs_greedy": _agreement(tok_e, tok_g),
        })
        for w in win_e:
            wc["exact"][w] += 1
        for w in win_f:
            wc["fused"][w] += 1

    def summarize(key):
        m = [r_[key]["match_rate"] for r_ in rows]
        pl = [r_[key]["prefix_len"] for r_ in rows]
        return {
            "mean_match_rate": round(float(np.mean(m)), 4),
            "mean_prefix_len": round(float(np.mean(pl)), 2),
            "runs": len(m),
        }

    pe = wc["exact"] / max(wc["exact"].sum(), 1)
    pf = wc["fused"] / max(wc["fused"].sum(), 1)
    return {
        "config": {
            "shape": "llava-1.5-7b (synthetic int8 weights, int8 KV)",
            "mask_policy": mask_policy,
            "hidden": cfg.text.hidden_size,
            "layers": cfg.text.num_hidden_layers,
            "vocab": cfg.text.vocab_size,
            "K": K,
            "voting_probs": list(voting_probs),
            "prompts": n_prompts,
            "tokens": T,
        },
        "exact_vs_fused": summarize("exact_vs_fused"),
        "exact_vs_exact_seed_noise_floor": summarize("exact_vs_exact_seed"),
        "exact_vs_greedy_effect_size": summarize("exact_vs_greedy"),
        "winner_dist_exact": [round(float(x), 4) for x in pe],
        "winner_dist_fused": [round(float(x), 4) for x in pf],
        "winner_tv_distance": round(float(np.abs(pe - pf).sum() / 2), 4),
    }


def run_int4_production_study(n_prompts, T, voting_probs, model_seed=0):
    """int8-vs-int4 token drift at EXACT LLaVA-1.5-7B shape, both towers
    quantized from the SAME synthetic bf16 base (utils/synthetic.
    synthetic_llava_7b_dual) with int8 KV in both arms — isolates the
    8->4 weight-bit drop at the scale the --quantize int4 flag deploys.
    Random weights are the incompressible worst case for RTN; trained
    checkpoints quantize far better, so these are pessimistic bounds.
    Compile-reuse mirrors run_production_study (rng_id, not reseed)."""
    import jax

    from ..engine.generate import LlavaEngine
    from ..utils.config import EnsembleConfig, GenerationConfig
    from ..utils.synthetic import synthetic_llava_7b_dual

    cfg, p8, p4 = synthetic_llava_7b_dual(jax.random.key(model_seed))
    K = len(voting_probs)

    def mk(params, ensemble=True):
        return LlavaEngine(
            cfg=cfg,
            params=params,
            ens=EnsembleConfig(voting_probs=tuple(voting_probs)),
            gen=GenerationConfig(
                max_new_tokens=T, eos_token_id=-1, pad_token_id=0
            ),
            max_len=608 + T,
            ensemble=ensemble,
            seed=24,
            int8_kv=True,
        )

    e8, e4 = mk(p8), mk(p4)
    g8, g4 = mk(p8, ensemble=False), mk(p4, ensemble=False)
    step8 = _stepper(e8, fused=False)
    step4 = _stepper(e4, fused=False)

    r = np.random.default_rng(model_seed)
    img = cfg.image_token_index
    hi_id = min(30000, cfg.text.vocab_size - 3)
    px_hw = cfg.vision.image_size
    rows = []
    wc = {"int8": np.zeros(K), "int4": np.zeros(K)}
    for p in range(n_prompts):
        row = [1] + [int(x) for x in r.integers(4, hi_id, 30)] + [5]
        row[4] = img
        ids = np.asarray([row], np.int32)
        px = r.normal(size=(1, 3, px_hw, px_hw)).astype(np.float32)
        st8 = e8.prefill(ids, px)
        st4 = e4.prefill(ids, px)

        tok8, win8 = _run_with_winners(e8, st8, T, fused=False, step=step8)
        tok4, win4 = _run_with_winners(e4, st4, T, fused=False, step=step4)
        # noise floor: int8 arm, identical prompt, independent RNG stream
        st8b = st8._replace(rng_id=st8.rng_id + 104729 * (p + 1))
        tok8b, _ = _run_with_winners(e8, st8b, T, fused=False, step=step8)
        tg8 = np.asarray(g8._decode(g8.params, st8)[0])[0]
        tg4 = np.asarray(g4._decode(g4.params, st4)[0])[0]

        rows.append({
            "int8_vs_int4": _agreement(tok8, tok4),
            "int8_vs_int8_seed": _agreement(tok8, tok8b),
            "greedy_int8_vs_int4": _agreement(tg8, tg4),
        })
        for w in win8:
            wc["int8"][w] += 1
        for w in win4:
            wc["int4"][w] += 1

    def summarize(key):
        m = [r_[key]["match_rate"] for r_ in rows]
        pl = [r_[key]["prefix_len"] for r_ in rows]
        return {
            "mean_match_rate": round(float(np.mean(m)), 4),
            "mean_prefix_len": round(float(np.mean(pl)), 2),
            "runs": len(m),
        }

    pe = wc["int8"] / max(wc["int8"].sum(), 1)
    pf = wc["int4"] / max(wc["int4"].sum(), 1)
    return {
        "config": {
            "shape": "llava-1.5-7b (paired int8/int4 from one bf16 base, int8 KV)",
            "K": K,
            "voting_probs": list(voting_probs),
            "prompts": n_prompts,
            "tokens": T,
        },
        "exact_int8_vs_int4": summarize("int8_vs_int4"),
        "int8_seed_noise_floor": summarize("int8_vs_int8_seed"),
        "greedy_int8_vs_int4": summarize("greedy_int8_vs_int4"),
        "winner_tv_distance": round(float(np.abs(pe - pf).sum() / 2), 4),
    }


K8_PROBS = (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--prompts", type=int, default=4)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--tokens", type=int, default=24)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--vocab", type=int, default=512)
    ap.add_argument(
        "--study",
        default="fused",
        choices=["fused", "epis_kl", "int8", "int4", "w8a8", "w8a8decode",
                 "production", "int4prod"],
        help="fused: exact-vs-fused overlap-lag gap; int8: full-precision "
        "vs int8-weights+cache gap; w8a8: bf16- vs int8-activation "
        "prefill over identical int8 weights; production: exact-vs-fused "
        "at EXACT 7B shape with synthetic int8 weights (run on TPU; "
        "--k selects the prob ladder); int4prod: int8-vs-int4 drift at 7B "
        "shape, both towers from one bf16 base (run on TPU)",
    )
    ap.add_argument(
        "--k",
        type=int,
        default=3,
        choices=[3, 8],
        help="production study only: 3 = the paper's K=3 ladder, "
        "8 = the K=8 stretch ladder (0.1..0.8)",
    )
    ap.add_argument(
        "--policy",
        default="epis",
        help="production study mask policy (epis | epis_kl — the latter "
        "exercises the lagged-logits fused variant at 7B shape)",
    )
    ap.add_argument("--json", action="store_true")
    ap.add_argument(
        "--platform",
        default="cpu",
        choices=["cpu", "default"],
        help="tiny-model studies; cpu avoids tying up the TPU (the "
        "production study forces 'default' — it is a TPU measurement)",
    )
    args = ap.parse_args(argv)

    if args.platform == "cpu" and args.study not in ("production", "int4prod"):
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.study == "int4prod":
        from ..utils.config import EnsembleConfig

        probs = (
            EnsembleConfig.voting_probs_for(3) if args.k == 3 else K8_PROBS
        )
        out = run_int4_production_study(args.prompts, args.tokens, probs)
    elif args.study == "production":
        from ..utils.config import EnsembleConfig

        probs = (
            EnsembleConfig.voting_probs_for(3) if args.k == 3 else K8_PROBS
        )
        out = run_production_study(
            args.prompts, args.tokens, probs, mask_policy=args.policy
        )
    else:
        import functools

        study = {
            "fused": run_study,
            # the lagged-logits fused variant of the KL keep-set policy
            # (round-2 verdict next-item 9): same harness, policy epis_kl
            "epis_kl": functools.partial(run_study, mask_policy="epis_kl"),
            "int8": run_int8_study,
            "int4": run_int4_study,
            "w8a8": run_w8a8_study,
            "w8a8decode": run_w8a8_decode_study,
        }[args.study]
        out = study(
            args.hidden, args.layers, args.vocab,
            args.prompts, args.seeds, args.tokens,
        )
    if args.json:
        print(json.dumps(out))
    else:
        print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
