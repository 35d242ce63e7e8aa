"""fp32 parity of the Llama tower vs HF transformers on tiny random models
(SURVEY.md §4 'parity' tier; hard part #1 in §7)."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from dropoutdecoding_tpu.models import llama
from dropoutdecoding_tpu.utils.config import LlamaConfig
from dropoutdecoding_tpu.utils.hf_io import state_dict_from_torch_module

pytestmark = pytest.mark.slow  # excluded from the fast core gate (docs/TESTS.md)


def make_tiny_hf_llama(seed=0, num_kv_heads=4):
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM

    torch.manual_seed(seed)
    hf_cfg = HFLlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=8,
        num_key_value_heads=num_kv_heads,
        max_position_embeddings=256,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        attn_implementation="eager",
    )
    model = LlamaForCausalLM(hf_cfg).eval().float()
    cfg = LlamaConfig.from_hf_dict(hf_cfg.to_dict())
    params = llama.params_from_hf(cfg, state_dict_from_torch_module(model), jnp.float32)
    return model, cfg, params


@pytest.mark.parametrize("num_kv_heads", [8, 4])
def test_prefill_logits_match_hf(rng, num_kv_heads):
    model, cfg, params = make_tiny_hf_llama(num_kv_heads=num_kv_heads)
    B, S = 2, 13
    input_ids = rng.integers(0, 128, size=(B, S))

    with torch.no_grad():
        ref = model(torch.from_numpy(input_ids)).logits.numpy()

    x = llama.embed(params, jnp.asarray(input_ids))
    positions = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
    hidden, kv = llama.prefill(params, cfg, x, positions)
    ours = np.asarray(llama.lm_head(params, hidden))

    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)
    assert kv.k.shape == (3, B, S, num_kv_heads, 8)


def test_decode_step_matches_hf_incremental(rng):
    """Greedy decode: our shared-cache decode_step must equal HF's
    cache-based incremental forward."""
    model, cfg, params = make_tiny_hf_llama()
    B, S = 1, 9
    input_ids = rng.integers(0, 128, size=(B, S))

    with torch.no_grad():
        out = model(torch.from_numpy(input_ids), use_cache=True)
        past = out.past_key_values
        tok = out.logits[:, -1].argmax(-1)
        ref_logits = []
        for t in range(4):
            out = model(tok[:, None], past_key_values=past, use_cache=True)
            past = out.past_key_values
            ref_logits.append(out.logits[:, -1].numpy())
            tok = out.logits[:, -1].argmax(-1)

    # ours
    Smax = 32
    x = llama.embed(params, jnp.asarray(input_ids))
    positions = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
    hidden, kv = llama.prefill(params, cfg, x, positions)
    cache = llama.KVCache.empty(cfg, B, Smax, jnp.float32)
    cache = llama.KVCache(
        cache.k.at[:, :, :S].set(kv.k), cache.v.at[:, :, :S].set(kv.v)
    )
    tok = jnp.argmax(llama.lm_head(params, hidden[:, -1]), -1)
    cur = S
    for t in range(4):
        xe = llama.embed(params, tok)[:, None]  # [B, 1, D]
        mask = (jnp.arange(Smax)[None, None, :] < cur).astype(bool)
        mask = jnp.broadcast_to(mask, (B, 1, Smax))
        h, k_new, v_new = llama.decode_step(
            params, cfg, xe, jnp.full((B,), cur), cache, mask
        )
        logits = llama.lm_head(params, h)[:, 0]
        np.testing.assert_allclose(
            np.asarray(logits), ref_logits[t], rtol=2e-4, atol=2e-4
        )
        cache = llama.KVCache(
            cache.k.at[:, :, cur].set(k_new[:, :, 0]),
            cache.v.at[:, :, cur].set(v_new[:, :, 0]),
        )
        tok = jnp.argmax(logits, -1)
        cur += 1


def test_masked_decode_matches_hf_2d_mask(rng):
    """Ensemble-member masking: key-position dropout must equal HF's 2-D
    attention_mask semantics (the mechanism behind reference
    llava.py:345-359)."""
    model, cfg, params = make_tiny_hf_llama()
    B, S = 1, 11
    input_ids = rng.integers(0, 128, size=(B, S))
    drop = np.zeros(S + 1, dtype=np.int64)
    drop[[2, 3, 7]] = 1  # mask some prompt positions

    with torch.no_grad():
        out = model(torch.from_numpy(input_ids), use_cache=True)
        past = out.past_key_values
        tok = out.logits[:, -1].argmax(-1)
        attn = torch.from_numpy(1 - drop)[None, :]
        out = model(
            tok[:, None],
            attention_mask=attn,
            past_key_values=past,
            position_ids=torch.tensor([[S]]),
            use_cache=True,
        )
        ref = out.logits[:, -1].numpy()

    Smax = 32
    x = llama.embed(params, jnp.asarray(input_ids))
    positions = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
    hidden, kv = llama.prefill(params, cfg, x, positions)
    cache = llama.KVCache.empty(cfg, B, Smax, jnp.float32)
    cache = llama.KVCache(
        cache.k.at[:, :, :S].set(kv.k), cache.v.at[:, :, :S].set(kv.v)
    )
    tok = jnp.argmax(llama.lm_head(params, hidden[:, -1]), -1)
    mask = (jnp.arange(Smax) < S) & ~jnp.asarray(
        np.pad(drop[:S], (0, Smax - S)).astype(bool)
    )
    h, _, _ = llama.decode_step(
        params,
        cfg,
        llama.embed(params, tok)[:, None],
        jnp.full((B,), S),
        cache,
        jnp.broadcast_to(mask[None, None], (B, 1, Smax)),
    )
    ours = np.asarray(llama.lm_head(params, h)[:, 0])
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)


def test_vmapped_members_equal_sequential(rng):
    """The batched member axis must give identical results to running each
    mask separately (the reference's sequential loop)."""
    model, cfg, params = make_tiny_hf_llama()
    B, S, M = 1, 10, 3
    input_ids = rng.integers(0, 128, size=(B, S))
    x = llama.embed(params, jnp.asarray(input_ids))
    positions = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
    hidden, kv = llama.prefill(params, cfg, x, positions)
    Smax = 16
    cache = llama.KVCache.empty(cfg, B, Smax, jnp.float32)
    cache = llama.KVCache(
        cache.k.at[:, :, :S].set(kv.k), cache.v.at[:, :, :S].set(kv.v)
    )
    tok = jnp.argmax(llama.lm_head(params, hidden[:, -1]), -1)
    xe = llama.embed(params, tok)

    masks = np.ones((B, M, Smax), bool)
    masks[:, :, S:] = False
    masks[0, 0, [1, 4]] = False
    masks[0, 1, [2, 3, 5]] = False
    masks[0, 2, [6]] = False
    masks = jnp.asarray(masks)

    xm = jnp.broadcast_to(xe[:, None], (B, M, xe.shape[-1]))
    h_all, k_all, v_all = llama.decode_step(
        params, cfg, xm, jnp.full((B,), S), cache, masks
    )
    for m in range(M):
        h1, k1, v1 = llama.decode_step(
            params, cfg, xe[:, None], jnp.full((B,), S), cache, masks[:, m : m + 1]
        )
        np.testing.assert_allclose(
            np.asarray(h_all[:, m]), np.asarray(h1[:, 0]), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(k_all[:, :, m]), np.asarray(k1[:, :, 0]), rtol=1e-5, atol=1e-5
        )
