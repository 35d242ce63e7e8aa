"""Multi-step equivalence proof for the core TPU design claim
(SURVEY.md §7): the batched shared-cache ensemble with winner-KV scatter
is EXACTLY the reference's execution — K+1 sequential forwards, each on a
deepcopied cache, carrying forward the vote winner's cache
(reference llava.py:292-376).

An independent reference-style implementation (explicit per-member cache
copies, sequential M=1 forwards) is driven with the SAME mask draws as the
engine and must produce identical tokens for several steps.
"""
import numpy as np

import jax
import jax.numpy as jnp

from dropoutdecoding_tpu.decoding.aggregate import select_by_vote
from dropoutdecoding_tpu.decoding.masks import (
    build_member_drop_mask,
    overlap_keep_mask,
)
from dropoutdecoding_tpu.engine.generate import LlavaEngine
from dropoutdecoding_tpu.models import llama, llava
from dropoutdecoding_tpu.utils.config import EnsembleConfig, GenerationConfig

PROBS = (0.3, 0.5, 0.7)
SEED = 24


def reference_style_generate(cfg, params, state, n_steps, ens: EnsembleConfig):
    """The reference's decode loop re-implemented literally: per step,
    (1) unmasked forward on the canonical cache, (2) for each member, a
    FULL COPY of the pre-step cache + sequential forward under its mask,
    (3) vote, (4) the winner's copied cache becomes canonical."""
    lm = params.lm
    tcfg = cfg.text
    Smax = state.cache.k.shape[2]
    N = cfg.vision.num_patches

    cache_k = np.array(state.cache.k)  # mutable host copies
    cache_v = np.array(state.cache.v)
    cur = int(state.cur_len[0])
    token = int(state.first_token[0])
    epis = state.epis
    topk = state.topk_ids
    tokens = []

    for step in range(1, n_steps + 1):
        x = llama.embed(lm, jnp.asarray([token]))[:, None]
        base = jnp.broadcast_to(jnp.arange(Smax)[None, None, :] < cur, (1, 1, Smax))
        cache = llama.KVCache(jnp.asarray(cache_k), jnp.asarray(cache_v))
        # (1) unmasked forward (its KV appendix is DISCARDED, llava.py:294)
        h0, _, _ = llama.decode_step(lm, tcfg, x, jnp.asarray([cur]), cache, base)
        logits0 = llama.lm_head(lm, h0)[:, 0]
        argmax0 = jnp.argmax(logits0[0])

        # (2) members: same mask sampler as the engine (same keys)
        overlap = overlap_keep_mask(argmax0, topk[0])
        step_key = jax.random.fold_in(jax.random.key(SEED), step)
        b_key = jax.random.fold_in(step_key, 0)
        member_logits = []
        member_kv = []
        prev = jnp.zeros((N,), bool)
        for m, cap in enumerate(PROBS):
            mk = jax.random.fold_in(b_key, m)
            drop = build_member_drop_mask(
                mk, ens.mask_policy, epis[0], cap, overlap, prev,
                ens.mask_accumulate, valid=jnp.ones((N,), bool),
            )
            prev = drop
            # member's own full cache copy (the deepcopy)
            mem_cache = llama.KVCache(
                jnp.asarray(cache_k.copy()), jnp.asarray(cache_v.copy())
            )
            slot_drop = jnp.zeros((Smax,), bool)
            p = int(state.image_pos[0])
            slot_drop = slot_drop.at[p : p + N].set(drop)
            mask = (jnp.arange(Smax) < cur) & ~slot_drop
            hm, km, vm = llama.decode_step(
                lm, tcfg, x, jnp.asarray([cur]), mem_cache, mask[None, None, :]
            )
            member_logits.append(llama.lm_head(lm, hm)[0, 0])
            member_kv.append((km[:, 0, 0], vm[:, 0, 0]))  # [L, KH, D]

        # (3) vote over members; (4) winner's cache carries forward
        winner, next_token = select_by_vote(jnp.stack(member_logits))
        kw, vw = member_kv[int(winner)]
        cache_k[:, 0, cur] = np.asarray(kw)
        cache_v[:, 0, cur] = np.asarray(vw)
        token = int(next_token)
        tokens.append(token)
        cur += 1
    return tokens


def test_engine_matches_reference_style_loop(tiny_llava):
    _, cfg, params, input_ids, _, pixels = tiny_llava
    ens = EnsembleConfig(mask_policy="epis", mask_accumulate=True, voting_probs=PROBS)
    engine = LlavaEngine(
        cfg=cfg,
        params=params,
        ens=ens,
        gen=GenerationConfig(max_new_tokens=6, eos_token_id=-1, pad_token_id=0),
        max_len=64,
        ensemble=True,
        seed=SEED,
    )
    engine.param_dtype = jnp.float32
    state = engine.prefill(input_ids, pixels)

    ref_tokens = reference_style_generate(cfg, params, state, 5, ens)
    out = engine.generate(input_ids, pixels)
    assert list(out.tokens[0][1:6]) == ref_tokens, (out.tokens[0][1:6], ref_tokens)
