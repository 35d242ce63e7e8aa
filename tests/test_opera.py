"""OPERA decoding: hand-computed penalty/rollback math, attention-capture
forward parity, and engine-level behavior (beam equivalence at
penalty_weights=0, rollback bans, termination).

Reference parity target: the kwargs surface of reference
chair_test.py:312-323 / test_opera.py:196-208 (`opera_decoding=True,
scale_factor, threshold, num_attn_candidates, penalty_weights`), which
the reference itself can only run against an external patched package.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dropoutdecoding_tpu.decoding.opera import overtrust_phi, rollback_trigger

pytestmark = pytest.mark.slow  # excluded from the fast core gate (docs/TESTS.md)


# ---------------------------------------------------------------------------
# pure math, hand-computed
# ---------------------------------------------------------------------------

def test_overtrust_phi_hand_computed():
    # T=4 window; rows hold log(scale*w); step=3 (rows 1..3 committed)
    M = np.zeros((4, 4), np.float32)
    # column 0 contributions from rows 1..3
    M[1, 0] = math.log(2.0)
    M[2, 0] = math.log(0.5)
    M[3, 0] = math.log(3.0)  # product: 2*0.5*3 = 3
    # column 1 contributions from rows 2..3
    M[2, 1] = math.log(4.0)
    M[3, 1] = math.log(0.5)  # product: 2
    # column 2 contribution from row 3
    M[3, 2] = math.log(1.5)  # product: 1.5
    phi, loc = overtrust_phi(jnp.asarray(M), jnp.int32(3))
    assert np.isclose(float(phi), 3.0, rtol=1e-5)
    assert int(loc) == 0

    # at step 1 only column 0 is in-window: phi = exp(M[1,0]) = 2
    phi1, loc1 = overtrust_phi(jnp.asarray(M), jnp.int32(1))
    assert np.isclose(float(phi1), 2.0, rtol=1e-5)
    assert int(loc1) == 0

    # step 0: no window, no penalty
    phi0, _ = overtrust_phi(jnp.asarray(M), jnp.int32(0))
    assert float(phi0) == 0.0


def test_overtrust_phi_picks_max_column():
    M = np.zeros((4, 4), np.float32)
    M[2, 1] = math.log(10.0)
    M[3, 1] = math.log(10.0)  # column 1 product: 100
    M[1, 0] = math.log(5.0)   # column 0 product: 5
    phi, loc = overtrust_phi(jnp.asarray(M), jnp.int32(3))
    assert int(loc) == 1
    # column 1 accumulates rows 2..3: 10 * 10 = 100 > column 0's 5
    assert np.isclose(float(phi), 100.0, rtol=1e-5)


def test_rollback_trigger_run_lengths():
    hist = jnp.asarray(np.array([0, 2, 2, 2, -1, -1], np.int32))
    # last 3 committed locations (steps 1..3) all equal 2 -> trigger at
    # threshold 3
    trig, loc = rollback_trigger(hist, jnp.int32(3), 3)
    assert bool(trig) and int(loc) == 2
    # threshold 4 needs steps 0..3 equal — step 0 is 0, so no trigger
    trig4, _ = rollback_trigger(hist, jnp.int32(3), 4)
    assert not bool(trig4)
    # not enough committed steps yet
    trig_early, _ = rollback_trigger(hist, jnp.int32(1), 3)
    assert not bool(trig_early)


def test_rollback_trigger_mixed_tail():
    hist = jnp.asarray(np.array([1, 1, 3, 1, 1], np.int32))
    trig, _ = rollback_trigger(hist, jnp.int32(4), 3)
    assert not bool(trig)  # tail 3,1,1 is not constant
    trig2, loc = rollback_trigger(hist, jnp.int32(4), 2)
    assert bool(trig2) and int(loc) == 1  # tail 1,1 constant


# ---------------------------------------------------------------------------
# decode_step_attn: parity with decode_step + attention row correctness
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny_lm():
    from dropoutdecoding_tpu.models import llama
    from dropoutdecoding_tpu.utils.config import LlamaConfig

    cfg = LlamaConfig(
        vocab_size=64,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
    )
    params = {"lm": llama.init_params(cfg, jax.random.key(0), jnp.float32)}
    return cfg, params


def test_decode_step_attn_matches_decode_step(tiny_lm):
    from dropoutdecoding_tpu.models import llama

    cfg, params = tiny_lm
    B, S = 3, 10
    r = np.random.default_rng(0)
    cache = llama.KVCache(
        jnp.asarray(r.normal(size=(2, B, S, 2, cfg.head_dim)), jnp.float32),
        jnp.asarray(r.normal(size=(2, B, S, 2, cfg.head_dim)), jnp.float32),
    )
    tok = jnp.asarray([3, 5, 7], jnp.int32)
    pos = jnp.asarray([6, 6, 6], jnp.int32)
    x = llama.embed(params["lm"], tok)
    key_mask = jnp.arange(S)[None, :] < 6
    key_mask = jnp.broadcast_to(key_mask, (B, S))

    h1, k1, v1, attn = llama.decode_step_attn(
        params["lm"], cfg, x, pos, cache, key_mask
    )
    h2, k2, v2 = llama.decode_step(
        params["lm"], cfg, x[:, None], pos, cache,
        key_mask[:, None, :],
    )
    np.testing.assert_allclose(h1, h2[:, 0], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(k1, k2[:, :, 0], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(v1, v2[:, :, 0], rtol=2e-5, atol=2e-5)
    # attention probabilities: masked slots get 0; total over cache slots
    # is <= 1 (the remainder is the token's self-attention)
    a = np.asarray(attn)
    assert a.shape == (B, S)
    assert np.all(a[:, 6:] < 1e-12)
    assert np.all(a.sum(-1) <= 1.0 + 1e-5)
    assert np.all(a.sum(-1) > 0.0)


def test_decode_step_attn_int8_cache(tiny_lm):
    """int8-cache path agrees with the dense path on the dequantized
    values (the int8 layout stores q head-flattened + per-slot scales)."""
    from dropoutdecoding_tpu.models import llama

    cfg, params = tiny_lm
    B, S, KH, Dh = 2, 8, 2, cfg.head_dim
    r = np.random.default_rng(1)
    kq = r.integers(-127, 128, (2, B, S, KH * Dh)).astype(np.int8)
    vq = r.integers(-127, 128, (2, B, S, KH * Dh)).astype(np.int8)
    ks = np.full((2, B, KH, S), 1 / 127.0, np.float32)
    vs = np.full((2, B, KH, S), 1 / 127.0, np.float32)
    cache_q = llama.KVCache(
        {"q": jnp.asarray(kq), "s": jnp.asarray(ks)},
        {"q": jnp.asarray(vq), "s": jnp.asarray(vs)},
    )
    dense = llama.KVCache(
        jnp.asarray(kq.reshape(2, B, S, KH, Dh), jnp.float32) / 127.0,
        jnp.asarray(vq.reshape(2, B, S, KH, Dh), jnp.float32) / 127.0,
    )
    tok = jnp.asarray([3, 9], jnp.int32)
    pos = jnp.asarray([5, 5], jnp.int32)
    x = llama.embed(params["lm"], tok)
    key_mask = jnp.broadcast_to(jnp.arange(S)[None, :] < 5, (B, S))
    h_q, _, _, attn_q = llama.decode_step_attn(
        params["lm"], cfg, x, pos, cache_q, key_mask
    )
    h_d, _, _, attn_d = llama.decode_step_attn(
        params["lm"], cfg, x, pos, dense, key_mask
    )
    np.testing.assert_allclose(h_q, h_d, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(attn_q, attn_d, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# engine level
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def llava_engine(request):
    tl = request.getfixturevalue("tiny_llava")
    model, cfg, params, input_ids, expanded_ids, pixels = tl
    from dropoutdecoding_tpu.engine.generate import LlavaEngine
    from dropoutdecoding_tpu.utils.config import (
        EnsembleConfig,
        GenerationConfig,
    )

    def mk(max_new=8, num_beams=3):
        return LlavaEngine(
            cfg=cfg,
            params=params,
            ens=EnsembleConfig(),
            gen=GenerationConfig(
                max_new_tokens=max_new,
                eos_token_id=-1,  # never fires: full-length search
                pad_token_id=0,
                num_beams=num_beams,
            ),
            max_len=40,
            ensemble=False,
            seed=0,
        )

    return mk, input_ids, pixels


def test_opera_pw0_equals_beam(llava_engine):
    """With penalty_weights=0 and num_attn_candidates >= 2*num_beams the
    candidate pool per beam covers HF's top-2nb, so OPERA must reproduce
    plain beam search exactly."""
    from dropoutdecoding_tpu.engine.baselines import beam_generate
    from dropoutdecoding_tpu.engine.opera import opera_generate

    mk, ids, px = llava_engine
    eng = mk()
    beam = beam_generate(eng, ids, px, num_beams=3)
    op = opera_generate(
        eng, ids, px,
        num_beams=3,
        penalty_weights=0.0,
        num_attn_candidates=6,
        threshold=10**6,  # never rolls back
    )
    np.testing.assert_array_equal(op.tokens, beam.tokens)
    np.testing.assert_array_equal(op.num_tokens, beam.num_tokens)


def test_opera_penalty_changes_selection(llava_engine):
    """A large penalty weight must be able to change the decoded
    sequence (the over-trust term re-ranks candidates)."""
    from dropoutdecoding_tpu.engine.opera import opera_generate

    mk, ids, px = llava_engine
    eng = mk()
    base = opera_generate(
        eng, ids, px, num_beams=2, penalty_weights=0.0,
        num_attn_candidates=4, threshold=10**6, scale_factor=50.0,
    )
    heavy = opera_generate(
        eng, ids, px, num_beams=2, penalty_weights=10**4,
        num_attn_candidates=4, threshold=10**6, scale_factor=50.0,
    )
    assert base.tokens.shape == heavy.tokens.shape
    # random tiny weights give near-uniform attention; with scale 50 the
    # column products differ across candidates, so a huge weight re-ranks
    assert not np.array_equal(base.tokens, heavy.tokens)


def test_opera_rollback_bans_and_terminates(llava_engine):
    """threshold=1 triggers retrospection immediately; the committed
    token at the rollback position must be banned on the retry, and the
    bounded loop must terminate."""
    from dropoutdecoding_tpu.engine.opera import opera_generate

    mk, ids, px = llava_engine
    eng = mk(max_new=6)
    no_rb = opera_generate(
        eng, ids, px, num_beams=2, penalty_weights=0.0,
        num_attn_candidates=4, threshold=10**6,
    )
    rb = opera_generate(
        eng, ids, px, num_beams=2, penalty_weights=0.0,
        num_attn_candidates=4, threshold=1, max_rollbacks=3,
    )
    assert rb.tokens.shape == no_rb.tokens.shape
    assert rb.num_tokens[0] >= 1
    # the sequences must diverge at some regenerated position: rollback
    # banned the originally committed token there
    assert not np.array_equal(rb.tokens, no_rb.tokens)


def test_opera_runner_cached(llava_engine):
    """Consecutive images reuse ONE compiled search program."""
    from dropoutdecoding_tpu.engine.opera import opera_generate

    mk, ids, px = llava_engine
    eng = mk()
    opera_generate(eng, ids, px, num_beams=2, num_attn_candidates=2)
    assert len(eng._opera_runners) == 1
    opera_generate(eng, ids, px, num_beams=2, num_attn_candidates=2)
    assert len(eng._opera_runners) == 1


def test_opera_rejects_batched_state(llava_engine):
    from dropoutdecoding_tpu.engine.opera import opera_generate

    mk, ids, px = llava_engine
    eng = mk()
    state = eng.prefill(
        np.repeat(ids, 2, axis=0), np.repeat(px, 2, axis=0)
    )
    with pytest.raises(ValueError, match="B=1"):
        opera_generate(eng, state=state)
